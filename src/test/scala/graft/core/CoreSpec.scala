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
