package graft.retrieve

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.extract.Extract

/** Mirrors the reference lifecycle integration flow
  * (reference tests/integration/_shared.py:5-15 over the 9-doc corpus,
  * utils/sample_data.py): index → retrieve → reopen from disk → identical
  * retrieve → incremental index → delete → retrieve back to original.
  */
class LifecycleSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    "Alice visited Paris. Paris hosts Louvre.",
    "Bob founded Acme. Acme acquired Paris Office.",
    "Louvre describes Art. Alice reviewed Art.",
    "Carol cites Alice. Carol visited Acme.",
    "Dave endorses Paris. Dave quotes Bob.")
  private val extraDocs = Seq(
    "Eve mentions Montebello. Montebello links Paris.",
    "Frank cites Montebello. Montebello hosts Festival.")

  private def freshStore(): GraphStore = {
    val dir = java.nio.file.Files.createTempDirectory("graft_store").toString
    new GraphStore(spark, dir)
  }

  test("index → retrieve → reopen → incremental → delete lifecycle") {
    val store = freshStore()
    val stats1 = Indexer.index(store, docs.toDF("content"))
    assert(stats1.totalChunks == 5L)
    assert(stats1.entities > 0 && stats1.edges > 0)

    val queries = Seq(0L -> "where is the Louvre", 1L -> "who founded Acme")
    val r1 = Retriever.retrieve(store, queries,
        Retriever.RetrieveConfig(retrievalTopK = 5))
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[String]("chunk_id"))).toSet
    assert(r1.nonEmpty)

    // Reopen from disk: a brand-new store object over the same root must
    // return identical rankings (snapshot persistence, I4).
    val reopened = new GraphStore(spark, store.root)
    val r2 = Retriever.retrieve(reopened, queries,
        Retriever.RetrieveConfig(retrievalTopK = 5))
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[String]("chunk_id"))).toSet
    assert(r1 == r2, "reopened store must retrieve identically")

    // Idempotent re-index: same docs, no growth (I1 / SO5).
    val statsRe = Indexer.index(store, docs.toDF("content"))
    assert(statsRe.totalChunks == 5L)
    assert(statsRe.entities == stats1.entities)
    assert(statsRe.edges == stats1.edges)

    // Incremental index: extra docs share entity "paris" (refcount>1).
    val stats2 = Indexer.index(store, extraDocs.toDF("content"))
    assert(stats2.totalChunks == 7L)
    assert(stats2.entities > stats1.entities)

    // Delete the extras: back to the original state exactly (I3).
    val stats3 = Indexer.delete(store, extraDocs.toDF("content"))
    assert(stats3.totalChunks == 5L)
    assert(stats3.entities == stats1.entities, "shared entities must survive, orphans go")
    assert(stats3.edges == stats1.edges)
    val r3 = Retriever.retrieve(store, queries,
        Retriever.RetrieveConfig(retrievalTopK = 5))
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[String]("chunk_id"))).toSet
    assert(r1 == r3, "post-delete retrieval must match the original")
  }

  test("synonymy edges appear for string-similar entities and respect τ/cap") {
    val store = freshStore()
    Indexer.index(store, Seq(
      "Montebello links Paris. Montebellos cites Paris.",
      "Montebello hosts Festival. Montebellos mentions Festival.").toDF("content"))
    val syn = store.edges.read().where(col("etype") === graft.graph.GraphBuild.Synonym)
    // 'montebello' vs 'montebellos' share almost all trigrams → cos ≥ 0.8.
    assert(syn.count() >= 2, "expected synonymy edges between near-identical phrases")
    val verts = store.vertices.read()
    val synNames = syn.join(verts.select(col("key").as("src"), col("content").as("src_name")), "src")
      .select("src_name").distinct().as[String].collect().toSet
    assert(synNames.contains("montebello") || synNames.contains("montebellos"))
  }

  test("incremental index: extraction touches only new chunks; end state == from-scratch (I2)") {
    val storeA = freshStore()
    var extracted = List.empty[Long]
    val countingExtractor: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = { df =>
      extracted = extracted :+ df.count()
      Extract.sentenceTriples(df)
    }
    Indexer.index(storeA, docs.toDF("content"), countingExtractor)
    assert(extracted.last == 5)
    Indexer.index(storeA, extraDocs.toDF("content"), countingExtractor)
    assert(extracted.last == 2, "incremental batch must extract ONLY the 2 new chunks")

    val storeB = freshStore()
    Indexer.index(storeB, (docs ++ extraDocs).toDF("content"))

    def edgeSet(s: GraphStore) = s.edges.read()
      .select("src", "dst", "weight", "etype").collect()
      .map(r => (r.getString(0), r.getString(1),
        math.round(r.getDouble(2) * 1e9), r.getInt(3))).toSet
    assert(edgeSet(storeA) == edgeSet(storeB),
      "delta-maintained edges (incl. synonymy) must equal a from-scratch rebuild")
    def vertSet(s: GraphStore) = s.vertices.read().select("key")
      .collect().map(_.getString(0)).toSet
    assert(vertSet(storeA) == vertSet(storeB))
  }

  test("incremental delete == from-scratch rebuild at the family level (I3 delta)") {
    val storeA = freshStore()
    Indexer.index(storeA, (docs ++ extraDocs).toDF("content"))
    Indexer.delete(storeA, extraDocs.toDF("content"))
    val storeB = freshStore()
    Indexer.index(storeB, docs.toDF("content"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("src", "dst", "weight").collect()
      .map(r => (r.getString(0), r.getString(1), math.round(r.getDouble(2) * 1e9))).toSet
    assert(rows(storeA.factEdges.read()) == rows(storeB.factEdges.read()),
      "subtracted fact edges must equal a from-scratch derivation")
    assert(rows(storeA.passageEdges.read()) == rows(storeB.passageEdges.read()))
    assert(rows(storeA.synEdges.read()) == rows(storeB.synEdges.read()),
      "delta synonymy after delete must equal a full re-KNN")
    def ids(t: graft.lake.SnapshotTable) =
      t.read().select("hash_id").collect().map(_.getString(0)).toSet
    assert(ids(storeA.entityEmb) == ids(storeB.entityEmb),
      "dead entities must leave the embedding store")
  }

  test("delete synonymy delta re-runs KNN ONLY for queries that lost a neighbor") {
    // Surviving embeddings place q2 right next to c (dot 1.0 ≥ τ): if the
    // delta re-ran the KNN for q2, a (q2, c) edge would appear. q2 did not
    // lose a neighbor, so its stored list must pass through VERBATIM.
    def unit(hot: Int): Array[Float] = Array.tabulate(8)(i => if (i == hot) 1f else 0f)
    val emb = Seq(
      ("q1", "aaaa", unit(0)), ("a", "bbbb", unit(0)),      // q1 ~ a
      ("q2", "cccc", unit(1)), ("c", "dddd", unit(1)),      // q2 ~ c
      ("b", "eeee", unit(2))
    ).toDF("hash_id", "content", "embedding")
    val stored = Seq(
      ("q1", "x", 0.95, 2), ("q1", "a", 0.9, 2), // q1 held dead neighbor x
      ("q2", "a", 0.9, 2)                        // q2's list has no dead entry
    ).toDF("src", "dst", "weight", "etype")
    val dead = Seq("x").toDF("hash_id")
    val out = Indexer.deltaSynonymyDelete(stored, emb, dead,
        Indexer.SynonymyConfig(topK = 5, cap = 3))
      .full
      .select("src", "dst", "weight").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(out.contains(("q1", "a", 1.0)), s"affected q1 must re-derive from embeddings: $out")
    assert(!out.exists { case (s, d, _) => s == "q1" && d == "x" }, "dead neighbor must vanish")
    assert(out.filter(_._1 == "q2") == Set(("q2", "a", 0.9)),
      s"unaffected q2 must keep its stored list verbatim (no re-KNN): $out")
  }

  test("chunk metadata map survives index → reopen (S7)") {
    val store = freshStore()
    val df = Seq(("Alice visited Paris. Paris hosts Louvre.",
        Map("lang" -> "en", "source" -> "crawl")))
      .toDF("content", "metadata")
    Indexer.index(store, df)
    val reopened = new GraphStore(spark, store.root)
    val m = reopened.chunks.read().select("metadata")
      .as[Map[String, String]].collect().head
    assert(m == Map("lang" -> "en", "source" -> "crawl"))
  }

  test("indexing into a pre-metadata chunk store pads the old snapshot instead of throwing") {
    val store = freshStore()
    Indexer.index(store, docs.toDF("content"))
    // Simulate a store whose chunks table was committed before the S7
    // metadata column existed: only (chunk_id, content).
    store.chunks.commit(store.chunks.read().select("chunk_id", "content"), "downgrade")
    val stats = Indexer.index(store, extraDocs.toDF("content"))
    assert(stats.totalChunks == 7L)
    assert(store.chunks.read().columns.contains("metadata"),
      "upgraded store must carry the padded metadata column forward")
  }

  test("synonymy above the exact-KNN gate plans an LSH equi-join, not a nested-loop join") {
    val emb = Seq("montebello", "montebellos", "alphaville", "alphavilles")
      .map(s => (graft.core.Ids.mdhashStr(graft.core.Ids.EntityNs, s), s,
        graft.extract.Embeddings.trigramUnit(s)))
      .toDF("hash_id", "content", "embedding")
    val edges = Indexer.synonymyEdges(emb,
      Indexer.SynonymyConfig(exactMaxEntities = 1L))
    val plan = edges.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "above the gate the synonymy KNN must not cross-join")
    // and the LSH path still finds the near-identical pair
    val pairs = edges.select("src", "dst").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val mb = graft.core.Ids.mdhashStr(graft.core.Ids.EntityNs, "montebello")
    val mbs = graft.core.Ids.mdhashStr(graft.core.Ids.EntityNs, "montebellos")
    assert(pairs.contains((mb, mbs)) || pairs.contains((mbs, mb)))
  }

  test("PPR strategy selector: the CSR branch is gated on Q×V state, not V alone") {
    val cfg = Retriever.RetrieveConfig()
    assert(Retriever.chooseStrategy(3000000L, 1L, 1L, cfg) == "shuffle",
      "graph past csrMaxVertices must shuffle")
    assert(Retriever.chooseStrategy(1000L, 1000L, 64L, cfg) == "shard",
      "many queries over a collectable graph → query-sharded")
    assert(Retriever.chooseStrategy(1000000L, 50000000L, 2L, cfg) == "csr",
      "few queries, graph too big to collect but V×Q state fits → CSR")
    // The round-2 hole: 10k dense-seeded queries over a 2M-vertex graph
    // took the CSR branch and materialized Q×V on the driver. Now: shuffle.
    assert(Retriever.chooseStrategy(2000000L, 50000000L, 10000L, cfg) == "shuffle",
      "Q×V past csrStateBound with an uncollectable graph must shuffle")
    // Q < 4 but state past a (tight) bound: sharding still only
    // broadcasts the O(E) graph.
    assert(Retriever.chooseStrategy(2000L, 4000L, 2L,
      cfg.copy(csrStateBound = 1000L)) == "shard")
  }

  test("CSR-branch retrieval (64 dense-seeded queries) == query-sharded path") {
    val store = freshStore()
    Indexer.index(store, docs.toDF("content"))
    val queries = (0 until 64).map(i => i.toLong -> s"paris louvre query number $i")
    val cfgShard = Retriever.RetrieveConfig(retrievalTopK = 5)
    val cfgCsr = cfgShard.copy(shardMaxArcs = 0L) // selector → "csr" (unit-tested above)
    def res(cfg: Retriever.RetrieveConfig) =
      Retriever.retrieve(store, queries, cfg).collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[String]("chunk_id")) ->
          (r.getAs[Int]("rank"), r.getAs[Double]("score"))).toMap
    val shard = res(cfgShard)
    val csr = res(cfgCsr)
    assert(shard.keySet == csr.keySet, "both strategies must rank the same passages")
    assert(shard.forall { case (k, (rank, _)) => csr(k)._1 == rank },
      "ranks must agree across strategies")
    val maxDiff = shard.map { case (k, (_, s)) => math.abs(s - csr(k)._2) }.max
    assert(maxDiff < 1e-9, s"cross-strategy score drift $maxDiff")
  }

  test("k-doc delete writes O(k) bytes, not O(corpus) (manifest/tombstone commits)") {
    // A corpus big enough that live table bytes dwarf per-file parquet
    // overhead; deleting 2 of 240 docs must write a small fraction of
    // what the initial index wrote. Before round 4 every delete rewrote
    // all seven derived tables (delete bytes ≈ index bytes).
    def sentence(i: Int): String = {
      val a = s"Node${i % 97}"; val b = s"Node${(i * 7 + 3) % 97}"
      val c = s"Node${(i * 13 + 5) % 97}"
      s"$a cites $b. $b links $c. $c mentions $a. $a reviewed Topic${i % 31}."
    }
    val corpus = (0 until 240).map(sentence)
    val store = freshStore()
    def bytes(): Long = {
      val root = java.nio.file.Paths.get(store.root)
      val s = java.nio.file.Files.walk(root)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
    Indexer.index(store, corpus.toDF("content"))
    val indexBytes = bytes()
    val before = bytes()
    Indexer.delete(store, corpus.take(2).toDF("content"))
    val deleteBytes = bytes() - before // segments are immutable: growth == bytes written
    assert(deleteBytes > 0)
    assert(deleteBytes < indexBytes / 5,
      s"2-doc delete wrote $deleteBytes bytes vs $indexBytes for the full " +
      "index — maintenance commits must be O(delta), not O(corpus)")
    // and the deleted docs are really gone
    val gone = graft.extract.Extract.chunks(corpus.take(2).toDF("content"), "content", Seq.empty)
      .select("chunk_id")
    assert(store.chunks.read().join(gone, Seq("chunk_id"), "left_semi").count() == 0)
  }

  test("snapshot isolation: reader pinned pre-maintenance survives delta + maintain()") {
    // Round-5 ask #8: a reader pinned at snapshot N must survive a later
    // delta commit plus maintain()'s compaction + GC. keepSnapshots counts
    // PRE-maintenance snapshots, so the default (2) covers a reader pinned
    // at the snapshot that was current when the delta landed.
    val store = freshStore()
    Indexer.index(store, docs.toDF("content"))
    val pinSnap = store.chunks.currentSnapshot.get
    val pinnedIds = store.chunks.read().select("chunk_id")
      .collect().map(_.getString(0)).toSet
    Indexer.index(store, extraDocs.toDF("content")) // delta commits on top
    store.maintain() // compacts every table, GCs past the retention window
    val after = store.chunks.readAt(pinSnap).select("chunk_id")
      .collect().map(_.getString(0)).toSet
    assert(after == pinnedIds,
      "a reader pinned within the retention window must read its exact old rows " +
      "after maintain() — GC may never delete segments its manifest references")
    assert(store.chunks.read().select("chunk_id").collect().map(_.getString(0)).toSet
      .size > pinnedIds.size, "current state must still include the delta docs")
  }

  test("store maintenance: compaction + snapshot GC preserve state and serving") {
    val store = freshStore()
    Indexer.index(store, docs.toDF("content"))
    Indexer.index(store, extraDocs.toDF("content"))   // delta commits
    Indexer.delete(store, extraDocs.toDF("content"))  // tombstone commits
    val queries = Seq(0L -> "where is the Louvre")
    val cfg = Retriever.RetrieveConfig(retrievalTopK = 5)
    def res() = Retriever.retrieve(store, queries, cfg).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("chunk_id"))).toSet
    val before = res()
    def state() = store.tables.map(t =>
      if (t.isEmpty) Set.empty[String]
      else t.read().collect().map(_.toString).toSet)
    val stateBefore = state()
    store.maintain(keepSnapshots = 1)
    // keepSnapshots counts PRE-maintenance snapshots (round-6 isolation
    // contract): a compacting table keeps its pre-maintenance current
    // snapshot plus the fresh compaction — at most 2 markers.
    assert(store.tables.forall(t => t.isEmpty || t.snapshots.size <= 2))
    assert(store.tables.forall(t =>
      t.isEmpty || t.manifest(t.currentSnapshot.get).entries.size == 1),
      "every table must be a single compacted segment after maintain()")
    assert(state() == stateBefore, "maintenance must not change any table's content")
    assert(res() == before, "retrieval must be identical after maintenance")
  }

  test("serving graph is cached across retrieve batches, invalidated by commits") {
    val store = freshStore()
    Indexer.index(store, docs.toDF("content"))
    val queries = Seq(0L -> "where is the Louvre", 1L -> "who founded Acme")
    val cfg = Retriever.RetrieveConfig(retrievalTopK = 5)
    def res() = Retriever.retrieve(store, queries, cfg).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[String]("chunk_id"))).toSet
    val r1 = res()
    assert(store.servingBuilds.get() == 1L)
    val csrAfterFirst = store.servingCsrBuilds.get()
    val r2 = res()
    assert(store.servingBuilds.get() == 1L,
      "second batch must NOT rebuild the dictionary/arcs")
    assert(store.servingCsrBuilds.get() == csrAfterFirst,
      "second batch must NOT re-collect the CSR")
    assert(r1 == r2, "cached serving graph must retrieve identically")
    // A commit moves the snapshot ids → next batch rebuilds exactly once.
    Indexer.index(store, extraDocs.toDF("content"))
    res()
    assert(store.servingBuilds.get() == 2L,
      "an index commit must invalidate the cached serving graph")
  }

  test("linking score map is the seed weights trimmed to top 30 (W4)") {
    val store = freshStore()
    Indexer.index(store, docs.toDF("content"))
    val m = Retriever.linkingScoreMap(store, Seq(0L -> "where is the Louvre"))
      .collect()
    assert(m.nonEmpty && m.length <= 30)
    val ranks = m.map(_.getAs[Int]("rank")).sorted.toSeq
    assert(ranks == (1 to m.length), "ranks must be dense 1..n")
    val ws = m.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("weight")).toSeq
    assert(ws == ws.sorted.reverse, "weights must be non-increasing by rank")
    // phrase seeds (entity keys) and passage seeds both present
    val keys = m.map(_.getAs[String]("key"))
    assert(keys.exists(_.startsWith("entity-")) && keys.exists(_.startsWith("chunk-")))
  }

  test("IRCoT loop: merged ranking == max-score merge of per-step retrievals (U5)") {
    // Reference retrieve_ircot (HippoRAG.py:509-547): step 0 retrieves the
    // raw queries; each later step derives a thought from the current top
    // docs and retrieves it; per-doc scores merge by MAX across steps.
    // Oracle here: run the two steps by hand with the SAME deterministic
    // reason fn and max-merge the collected scores driver-side.
    val store = freshStore()
    Indexer.index(store, (docs ++ extraDocs).toDF("content"))
    val queries = Seq(0L -> "where is the Louvre", 1L -> "who founded Acme")
    val cfg = Retriever.RetrieveConfig(retrievalTopK = 6)

    def scores(qs: Seq[(Long, String)]): Map[(Long, String), Double] =
      Retriever.retrieve(store, qs, cfg).collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[String]("chunk_id")) ->
          r.getAs[Double]("score")).toMap

    // --- hand-run the loop (maxSteps = 2, default reasonStub) ---
    val step0 = scores(queries)
    val top0 = Retriever.retrieve(store, queries, cfg).collect()
      .groupBy(_.getAs[Long]("qid"))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[String]("content")).toSeq
      }
    val thoughts = queries.map { case (q, text) =>
      q -> Retriever.reasonStub(text, top0(q).take(5), Nil)
    }
    val step1 = scores(thoughts)
    val expect = (step0.keySet ++ step1.keySet).map { k =>
      k -> math.max(step0.getOrElse(k, Double.NegativeInfinity),
        step1.getOrElse(k, Double.NegativeInfinity))
    }.toMap
    val expectRanked = expect.groupBy(_._1._1).flatMap { case (q, m) =>
      m.toSeq.map { case ((_, c), s) => (c, s) }
        .sortBy { case (c, s) => (-s, c) }.take(cfg.retrievalTopK)
        .zipWithIndex.map { case ((c, s), i) => (q, c) -> (i + 1, s) }
    }

    val got = Retriever.retrieveIrcot(store, queries, maxSteps = 2, cfg = cfg)
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[String]("chunk_id")) ->
        (r.getAs[Int]("rank"), r.getAs[Double]("score"))).toMap
    assert(got.keySet == expectRanked.keySet,
      s"IRCoT doc set mismatch: ${got.keySet} vs ${expectRanked.keySet}")
    got.foreach { case (k, (rank, s)) =>
      assert(rank == expectRanked(k)._1, s"rank mismatch at $k")
      assert(math.abs(s - expectRanked(k)._2) < 1e-12, s"score mismatch at $k")
    }

    // --- early termination: a thought carrying the reference's answer
    // marker stops that query BEFORE its extra retrieval, so a 5-step
    // loop with an always-terminating reason fn == plain single retrieve.
    val done = Retriever.retrieveIrcot(store, queries, maxSteps = 5,
        reason = (_, _, _) => "So the answer is: Paris", cfg = cfg)
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[String]("chunk_id")) ->
        (r.getAs[Int]("rank"), r.getAs[Double]("score"))).toMap
    val single = Retriever.retrieve(store, queries, cfg).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[String]("chunk_id")) ->
        (r.getAs[Int]("rank"), r.getAs[Double]("score"))).toMap
    assert(done == single,
      "answer-marker thoughts must stop the loop before any re-retrieval")
  }

  test("per-row invariant: text byte-identical per url through the pipeline") {
    val pages = graft.ingest.PageSynth.pagesDF(spark, 64)
    val chunks = Extract.chunks(pages, "text", Seq("url"))
    val joined = pages.select(col("url"), col("text"))
      .join(chunks.select(col("url"), col("content")), "url")
    assert(joined.count() == 64)
    assert(joined.where(col("text") =!= col("content")).count() == 0)
    assert(joined.where(sha2(col("text"), 256) =!= sha2(col("content"), 256)).count() == 0)
  }
}
