package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CoreSpec extends SparkSpec {
  import spark.implicits._

  test("mdhash matches the reference compute_mdhash_id rule") {
    // python: 'chunk-' + md5('hello world'.encode()).hexdigest()
    val got = Seq("hello world").toDF("c")
      .select(Ids.mdhash(Ids.ChunkNs, col("c"))).as[String].head()
    assert(got == "chunk-5eb63bbbe01eeed093cb22bb8f5acdc3")
  }

  test("textProcessing matches the reference byte-for-byte") {
    // reference misc_utils.py:80-85 on mixed input
    val cases = Seq(
      "Héllo, World! 42" -> "h llo  world  42",
      "  A.B.C  " -> "a b c",
      "ALL CAPS-123" -> "all caps 123",
      "" -> "")
    val got = cases.map(_._1).toDF("c")
      .select(TextOps.textProcessing(col("c"))).as[String].collect()
    // lower('Héllo, World! 42') = 'héllo, world! 42'; é,!,, → spaces; trim
    assert(got.toSeq == cases.map(_._2))
  }

  test("normalizeAnswer: articles, punctuation, whitespace") {
    val got = Seq("The  Quick, (Brown) Fox's a an answer!")
      .toDF("c").select(TextOps.normalizeAnswer(col("c"))).as[String].head()
    assert(got == "quick brown foxs answer")
  }

  test("dictionary: deterministic dense ids = sorted rank, any partitioning") {
    val keys = (0 until 997).map(i => f"k${(i * 7919) % 997}%04d").toDF("key")
    val a = Ids.dictionary(keys.repartition(2), "key").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Ids.dictionary(keys.repartition(13), "key").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
    val sorted = a.keys.toSeq.sorted
    sorted.zipWithIndex.foreach { case (k, i) => assert(a(k) == i.toLong) }
  }

  test("pages synthesis is deterministic and parallelism-invariant") {
    val p1 = graft.ingest.PageSynth.pagesDF(spark, 128, numPartitions = 2)
      .select("url", "text").as[(String, String)].collect().toMap
    val p2 = graft.ingest.PageSynth.pagesDF(spark, 128, numPartitions = 16)
      .select("url", "text").as[(String, String)].collect().toMap
    assert(p1 == p2)
    assert(p1.size == 128)
  }

  test("byte-scan text kernels == their regex counterparts (property)") {
    import org.apache.spark.sql.graftx
    // adversarial corpus: ASCII mixes, runs of dots/spaces, caps runs at
    // edges, unicode (2- and 3-byte), empties — plus 500 random strings
    val alphabet = "aA zZ09.!-éß中 ..AB Cd9"
    val rnd = new scala.util.Random(7)
    val strs = Seq(
      "", " ", ".", "...", "A", "aA", "A.B.C.", ".leading", "trailing.",
      "  sp  aces  ", "ÉCLAIR met Ångström.", "Ent0042 cites Ent0007",
      "中文 Mixed ASCII", "K KELVINK sign", "ALL. CAPS. RUNS.",
      // U+0130: the one root-locale lowercase that EXPANDS (-> i + U+0307),
      // shifting token boundaries under the builtin chain
      "İ", "İstanbul", "aİb cİ", "İİ", "Xİ9") ++
      (0 until 500).map(_ => (0 until rnd.nextInt(40))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = strs.toDF("s")
    def arrEq(name: String, mine: org.apache.spark.sql.Column,
              ref: org.apache.spark.sql.Column): Unit = {
      val bad = df.select(col("s"), mine.as("m"), ref.as("r"))
        .where(not(col("m") <=> col("r"))).collect()
      assert(bad.isEmpty, s"$name diverges, e.g. ${bad.take(3).mkString("; ")}")
    }
    arrEq("normalize",
      graftx.column(graftx.TextNormalize(graftx.expression(col("s")))),
      trim(regexp_replace(lower(col("s")), "[^a-z0-9 ]", " ")))
    arrEq("spaceTokens",
      graftx.column(graftx.SpaceTokens(graftx.expression(col("s")))),
      filter(split(col("s"), " +"), t => t =!= lit("")))
    arrEq("splitByte",
      graftx.column(graftx.SplitByte(graftx.expression(col("s")), '.'.toByte)),
      split(col("s"), "\\."))
    arrEq("capRuns",
      graftx.column(graftx.CapRuns(graftx.expression(col("s")))),
      expr("regexp_extract_all(s, '[A-Z][A-Za-z0-9]*', 0)"))
    arrEq("capRunsToSpace",
      graftx.column(graftx.CapRunsToSpace(graftx.expression(col("s")))),
      regexp_replace(col("s"), "[A-Z][A-Za-z0-9]*", " "))
  }

  test("stripTags kernel == regexp_replace '<[^>]*>' (property, tag-heavy corpus)") {
    import org.apache.spark.sql.graftx
    // adversarial: nested '<', unclosed '<', bare '>', empty tags '<>',
    // attributes with quotes, unicode inside and outside tags, newlines
    val alphabet = "<>ab \"=/pé中\n"
    val rnd = new scala.util.Random(11)
    val strs = Seq(
      "", "<", ">", "<>", "<a>", "a<b>c", "<a><b>", "a<b", "a>b",
      "<a<b>", "<<x>>", "x<!-- c -->y", "<p class=\"d\">t</p>",
      "tail<unclosed", "<a\nmultiline=\"1\">x</a>", "é<中>ß",
      "<html><body>Ent0001 visited Ent0002.</body></html>") ++
      (0 until 700).map(_ => (0 until rnd.nextInt(50))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val bad = strs.toDF("s")
      .select(col("s"), TextOps.stripTags(col("s")).as("m"),
        regexp_replace(col("s"), "<[^>]*>", "").as("r"))
      .where(not(col("m") <=> col("r"))).collect()
    assert(bad.isEmpty, s"stripTags diverges, e.g. ${bad.take(3).mkString("; ")}")
  }

  test("urlHost kernel == lower(regexp_extract '://([^/:?#]*)') (property)") {
    // adversarial: no scheme, empty host, ports, userinfo-less forms,
    // query/fragment cut points, uppercase, unicode, multiple '://'
    val alphabet = ":/?#.abAB中éÉΩß9-"
    val rnd = new scala.util.Random(17)
    val strs = Seq(
      "", "x", "://", "a://", "https://", "https://Example.COM/p/1",
      "http://h0.example.org:8080/x?y#z", "ftp://A.B.C?q", "s://H#f",
      "no-scheme/path", "https://中文.example/p", "a://b://c",
      "http://É.example/", "https://ΩMEGA.Example.COM/x", "s://ÀÈÌ#f",
      "https://h12.example.org/p/34") ++
      (0 until 700).map(_ => (0 until rnd.nextInt(30))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val bad = strs.toDF("s")
      .select(col("s"), TextOps.urlHost(col("s")).as("m"),
        lower(regexp_extract(col("s"), "://([^/:?#]*)", 1)).as("r"))
      .where(not(col("m") <=> col("r"))).collect()
    assert(bad.isEmpty, s"urlHost diverges, e.g. ${bad.take(3).mkString("; ")}")
  }

  test("htmlText recovers the byte-identical text column from PageSynth html") {
    // The input_hint invariant end-to-end through the html path: decode
    // the binary html column, strip tags, get back `text` exactly.
    val pages = graft.ingest.PageSynth.pagesDF(spark, 128)
    val bad = pages.select(col("url"), col("text"),
        TextOps.htmlText(col("html")).as("stripped"))
      .where(col("stripped") =!= col("text")).count()
    assert(bad == 0L)
  }

  test("sequenceRatio == python difflib SequenceMatcher.ratio (goldens)") {
    // expected values generated with CPython difflib (autojunk default)
    val cases = Seq(
      ("", "", 1.0),
      ("", "abc", 0.0),
      ("abc", "", 0.0),
      ("abc", "abc", 1.0),
      ("alice visited paris", "alice visited paris", 1.0),
      ("alice visited paris", "alice visits paris", 0.918918918918919),
      ("the quick brown fox", "quick brown foxes", 0.8333333333333334),
      ("abcdef", "fedcba", 0.16666666666666666),
      ("aaaa", "aa", 0.6666666666666666),
      ("('alice', 'visited', 'paris')", "('alice', 'visited', 'rome')", 0.8771929824561403),
      ("graph memory engine", "graph-memory engine!", 0.9230769230769231),
      ("abab", "baba", 0.75),
      ("xyzzy", "zzyzx", 0.6),
      ("montebello links paris", "montebellos cites paris", 0.8444444444444444),
      ("a b c d e", "e d c b a", 0.3333333333333333),
      // random CPython-generated pairs (seed 42, alphabet "abcab ")
      ("aa cbbb a  babaaaabb", "babb   bababcab ", 0.6666666666666666),
      ("ccbbcaaaaccbc", "a abaaabc bcbb aa bcabaac", 0.47368421052631576),
      (" cbccb c   ab ", "b bba", 0.3157894736842105),
      ("c  bb cabaca", "abb cb a", 0.5),
      (" abcbb bbc b", "bacbbbaaaab b", 0.48),
      (" abaaababcba  a bc cacaba", "", 0.0),
      ("  cbbba c bbbbcbbbabcaaaccbabb", "aa aabbb abbcbbabb  b ca  caba", 0.43333333333333335),
      ("bba", "abbbbbaa  ", 0.46153846153846156),
      ("b", "ac", 0.0),
      ("bb", " abbb bb", 0.4),
      ("baabaa acaaa a ", " aaa cabbbbababcabaa", 0.34285714285714286),
      ("baa baabbaaabaabaaacaca  ", "b  abbcbab ba caababbbaba", 0.48),
      ("baba baabbbbabaa bbbccb  cb", "ab  caca", 0.2857142857142857),
      ("", "bbaabbbcbcabcc", 0.0),
      ("ab cb", " ba bc abcaa bbccbb cb  c", 0.3333333333333333),
      ("acaa acaacb cb a", " abaaa bbacbbbaba", 0.5454545454545454),
      ("cacb b ac", "bab bbbbaab ca  bcb aaaa", 0.36363636363636365),
      ("baccbba", "baccacc ba bcaacbbcaa", 0.5),
      ("ac cabbaabbca aabb ", "   bcaa cbc a cbc aca c", 0.38095238095238093),
      ("bba a  bbbcabaccb", "bb caaa bba b", 0.3333333333333333),
      ("acb  bcab cbbbaababaa", " bb  aaabb  a", 0.47058823529411764),
      ("aabb baabbaaba bbbcab babab ", "aacb cba bcaa cbcccbabbba b", 0.5454545454545454),
      ("baaacbaaabaab abaaacca", "ab  bbbabcaaaac  a babbbaab", 0.4489795918367347),
      (" aa ababacacbaccac", "acaaa bacb a aabbabbbba ", 0.38095238095238093),
      // autojunk regime (|b| >= 200): popular chars drop out of the
      // index; the extension steps must still re-attach them
      ("ab" * 150, "ab" * 150 + "c" * 20, 0.967741935483871),
      ("abcab" * 50, "abcba" * 50, 0.012),
      ("x" * 250, "x" * 100 + "y" * 100, 0.4444444444444444),
      // astral-plane codepoints: CPython iterates str by CODEPOINT, so an
      // emoji is ONE element — a UTF-16 code-unit scan would double-count
      // it (the denominator |a|+|b| and the match lengths both shift).
      // Raw LLM-returned strings are not guaranteed BMP-only.
      ("a😀b", "a😀b", 1.0),
      ("a😀b", "a😁b", 0.6666666666666666),
      ("😀😁x", "x😀😁", 0.6666666666666666),
      ("naïve 🚀 rocket", "naive 🚀 rocket", 0.9285714285714286),
      ("𐐀abc", "abc𐐀", 0.75))
    val got = cases.map(c => (c._1, c._2)).toDF("a", "b")
      .select(TextOps.sequenceRatio(col("a"), col("b"))).as[Double].collect()
    cases.zip(got).foreach { case ((a, b, want), g) =>
      assert(math.abs(g - want) < 1e-15,
        s"ratio('${a.take(30)}','${b.take(30)}') = $g, want $want")
    }
  }

  test("fuzzy match-back picks the highest-ratio candidate per returned row (J7)") {
    val returned = Seq((1L, "alice visited pariss"), (2L, "bob founded acme inc"))
      .toDF("rid", "rtext")
    val candidates = Seq((10L, "alice visited paris"), (11L, "bob founded acme"),
        (12L, "carol cites alice"))
      .toDF("cid", "ctext")
    val got = graft.retrieve.Retriever.fuzzyMatchBack(returned, candidates)
      .collect().map(r => r.getAs[Long]("rid") -> r.getAs[Long]("cid")).toMap
    assert(got == Map(1L -> 10L, 2L -> 11L))
  }

  test("codegen'd dot product equals builtin composition") {
    import graft.functions.VectorOps
    val df = (0 until 50).map { i =>
      (graft.extract.Embeddings.hashUnit(s"a$i", 16),
       graft.extract.Embeddings.hashUnit(s"b$i", 16))
    }.toDF("a", "b")
    val diff = df.select(
        abs(VectorOps.dot(col("a"), col("b")) -
            VectorOps.dotBuiltin(col("a"), col("b"))).as("d"))
      .agg(max("d")).as[Double].head()
    assert(diff < 1e-12)
  }
}
