package graft.retrieve

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.algo.{Ppr, PprConfig, PprCsr, PprShard}
import graft.core.Ids
import graft.extract.Embeddings
import graft.functions.VectorOps

/** Multi-query retrieval: the reference `retrieve` loop
  * (src/hipporag/HippoRAG.py:413-499 → graph_search_with_fact_entities
  * 1544-1656 → run_ppr 1709-1749) re-expressed as ONE DataFrame pipeline
  * for all queries at once — per-query python loops become `qid`-keyed
  * joins, and all queries converge inside a single multi-source PPR job
  * (SURVEY.md §3.2(b)).
  *
  * Deterministic divergences from the reference (documented, tie-only):
  *  - fact tie-break at equal scores: reference keeps the later-inserted
  *    fact first (np.argsort stability, HippoRAG.py:1685-1688); our fact
  *    order is fact_id-sorted, ties break to larger fact_id.
  *  - phrase-tie order at equal linking scores: reference = set iteration
  *    order (nondeterministic); ours = smaller phrase first.
  *  - the DSPy rerank filter (U4, rerank.py:15-131) is the identity
  *    pass-through: candidate order is preserved.
  */
object Retriever {

  case class RetrieveConfig(
      linkTopK: Int = 5,            // config_utils.py:184-187
      retrievalTopK: Int = 200,     // config_utils.py:188-191
      passageNodeWeight: Double = 0.05, // config_utils.py:91-94
      damping: Double = 0.5,        // config_utils.py:192-195
      pprTol: Double = 1e-12,
      // Broadcast-or-shuffle selection (north rule): below these bounds
      // the rank state / CSR fit in memory, so PPR runs on a broadcast
      // kernel (query-sharded or vertex-major CSR — see the selection in
      // retrieve()); above them, the sparse shuffle path takes over.
      csrMaxVertices: Long = 2000000L,
      shardMaxArcs: Long = 5000000L,
      // Query embedder — must match the STORE's embedders for the dot
      // products to mean anything (reference: the same embedding model
      // encodes queries with task instructions and stores without,
      // HippoRAG.py:1391-1425). Default mirrors the reference's mock;
      // pass Embeddings.trigramUnitUdf for stores built with trigram
      // embedders.
      embedQuery: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        Embeddings.hashUnitUdf,
      // The vertex-major CSR kernel holds (and broadcasts) a dense V×Q
      // rank state and collects a ≤ V×Q seed frame — both are gated on
      // this bound (entries; 2^24 doubles = 128 MB). Past it the branch
      // is WRONG regardless of V alone: 10k dense-seeded queries over a
      // 2M-vertex graph is 160 GB of driver state. Such jobs fall through
      // to the fully distributed shuffle path.
      csrStateBound: Long = 1L << 24)

  /** Query embeddings mirror the two instruction channels
    * (HippoRAG.py:1391-1425, prompts/linking.py): one vector for fact
    * scoring, one for passage scoring.
    */
  def queryFrame(spark: SparkSession, queries: Seq[(Long, String)],
                 embed: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                   Embeddings.hashUnitUdf): DataFrame = {
    import spark.implicits._
    queries.toDF("qid", "query")
      .withColumn("qvec_fact",
        embed(concat(lit("query_to_fact:"), col("query"))))
      .withColumn("qvec_passage",
        embed(concat(lit("query_to_passage:"), col("query"))))
  }

  /** Fact scores per query: dot against every fact embedding, min-max
    * normalized per query (get_fact_scores, HippoRAG.py:1427-1465).
    */
  def factScores(queries: DataFrame, factEmb: DataFrame): DataFrame = {
    val scored = factEmb.join(broadcast(queries.select("qid", "qvec_fact")))
      .select(col("qid"), col("hash_id").as("fact_id"), col("content"),
        VectorOps.dot(col("qvec_fact"), col("embedding")).as("raw"))
    val w = Window.partitionBy("qid")
    scored
      .withColumn("mn", min("raw").over(w))
      .withColumn("mx", max("raw").over(w))
      .withColumn("score",
        when(col("mx") === col("mn"), lit(1.0))
          .otherwise((col("raw") - col("mn")) / (col("mx") - col("mn"))))
      .select("qid", "fact_id", "content", "score")
  }

  /** DPR: passage scores per query, min-max normalized
    * (dense_passage_retrieval, HippoRAG.py:1467-1502).
    */
  def dprScores(queries: DataFrame, chunkEmb: DataFrame): DataFrame = {
    val scored = chunkEmb.join(broadcast(queries.select("qid", "qvec_passage")))
      .select(col("qid"), col("hash_id").as("chunk_id"),
        VectorOps.dot(col("qvec_passage"), col("embedding")).as("raw"))
    val w = Window.partitionBy("qid")
    scored
      .withColumn("mn", min("raw").over(w))
      .withColumn("mx", max("raw").over(w))
      .withColumn("dpr",
        when(col("mx") === col("mn"), lit(1.0))
          .otherwise((col("raw") - col("mn")) / (col("mx") - col("mn"))))
      .select("qid", "chunk_id", "dpr")
  }

  /** Seed-weight construction shared by [[retrieve]] and
    * [[linkingScoreMap]]: W2 top-k facts → G2 phrase weights → W3 keep →
    * DPR passage weights, one (qid, key, weight) frame.
    */
  private def seedWeights(store: GraphStore, qdf: DataFrame,
                          cfg: RetrieveConfig): DataFrame = {
    val triplesNow = store.triples.read()
    // A4: df = |chunks containing the entity| (ent_node_to_chunk_ids) ==
    // the stored passage-edge in-degree (edges are distinct (chunk,
    // entity) pairs) — a groupBy over the precomputed edge family
    // instead of re-deriving chunk-entity sets from the whole triples
    // table on EVERY retrieve call. Pre-family stores fall back to the
    // triples derivation.
    val entityDf =
      if (!store.passageEdges.isEmpty)
        store.passageEdges.read()
          .groupBy(col("dst").as("entity_id")).agg(count(lit(1)).as("df"))
      else
        graft.extract.Extract.chunkEntities(triplesNow)
          .select(Ids.mdhash(Ids.EntityNs, col("entity")).as("entity_id"), col("chunk_id"))
          .groupBy("entity_id").agg(countDistinct("chunk_id").as("df"))

    // --- W2: top-k facts per query (argsort desc, ties → larger id first)
    val fs = factScores(qdf, store.factEmb.read())
    val wf = Window.partitionBy("qid").orderBy(col("score").desc, col("fact_id").desc)
    val topFacts = fs.withColumn("rn", row_number().over(wf))
      .where(col("rn") <= cfg.linkTopK)

    // Parse the fact tuple back to (s,p,o) — we store s,p,o as columns
    // instead of eval()ing strings (F10): join back to the facts table.
    val facts = graft.extract.Extract.facts(triplesNow)
    val tf = topFacts.join(facts, Seq("fact_id"))

    // --- G2 phrase weights: mean over fact occurrences of score/df.
    // Phrases absent from the graph are SKIPPED (reference phrase_id None
    // path, HippoRAG.py:1597) — hence the inner join; every graph entity
    // has df ≥ 1, so the np.divide where≠0 guard (HippoRAG.py:1608) can
    // only fire for df=0 rows, which cannot exist here.
    val phraseContrib = tf.select(col("qid"), col("score"), col("subj").as("phrase"))
      .unionAll(tf.select(col("qid"), col("score"), col("obj").as("phrase")))
      .withColumn("entity_id", Ids.mdhash(Ids.EntityNs, col("phrase")))
      .join(entityDf, Seq("entity_id"))
      .withColumn("contrib", col("score") / col("df"))
    val phraseWeights = phraseContrib
      .groupBy("qid", "entity_id", "phrase")
      .agg((sum("contrib") / count(lit(1))).as("pw"))

    // --- W3: keep linking_top_k phrases per query, zero the rest.
    val wp = Window.partitionBy("qid").orderBy(col("pw").desc, col("phrase").asc)
    val keptPhrases = phraseWeights.withColumn("rn", row_number().over(wp))
      .where(col("rn") <= cfg.linkTopK)
      .select(col("qid"), col("entity_id").as("key"), col("pw").as("weight"))

    // --- passage weights: minmax(DPR) × passage_node_weight, all passages.
    val dpr = dprScores(qdf, store.chunkEmb.read())
    val passageWeights = dpr.select(col("qid"), col("chunk_id").as("key"),
      (col("dpr") * cfg.passageNodeWeight).as("weight"))

    keptPhrases.unionByName(passageWeights)
  }

  /** W4 — the reference's linking-score telemetry (HippoRAG.py:1641-1642):
    * per query, the seed weight map trimmed to its TOP 30 entries by score
    * (the reference trims a text-keyed dict; ties here break to key asc —
    * the reference's dict-order tie is nondeterministic).
    * @return (qid, key, weight, rank ≤ 30)
    */
  def linkingScoreMap(store: GraphStore, queries: Seq[(Long, String)],
                      cfg: RetrieveConfig = RetrieveConfig()): DataFrame = {
    val qdf = queryFrame(store.spark, queries, cfg.embedQuery)
    val w = Window.partitionBy("qid").orderBy(col("weight").desc, col("key").asc)
    seedWeights(store, qdf, cfg)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 30)
  }

  /** Full graph retrieval for a batch of queries.
    * @return (qid, chunk_id, content, score, rank) — top `retrievalTopK`
    *         passages per query by PPR score.
    */
  def retrieve(
      store: GraphStore,
      queries: Seq[(Long, String)],
      cfg: RetrieveConfig = RetrieveConfig()): DataFrame = {
    val spark = store.spark
    // NOT cached: the frame is Q local rows + a hash-embedding projection —
    // recomputing it per consumer is cheaper than a cache entry, and two
    // retrieve() calls with the same queries would re-cache an identical
    // plan (CacheManager warning spam).
    val qdf = queryFrame(spark, queries, cfg.embedQuery)
    val seedsByKey = seedWeights(store, qdf, cfg)

    // --- encode to vids, run multi-query PPR over the symmetrized graph.
    // The dictionary / symmetrize+encode / CSR collect are all amortized
    // on the store's snapshot-keyed serving cache (round-3 verdict #2):
    // consecutive batches over an unchanged store pay ZERO graph prep.
    val verts = store.vertices.read()
    val sg = store.servingGraph()
    val dict = sg.dict
    val nVertices = sg.nVertices
    val arcs = sg.arcs
    val seeds = seedsByKey.join(dict, "key").select("qid", "vid", "weight")

    // Strategy selection (north rule "broadcast-or-shuffle", three-way):
    //  - many queries over a driver-collectable graph → query-sharded
    //    (CSR broadcast once, queries embarrassingly parallel);
    //  - few queries, V×Q rank state still fits → vertex-major broadcast
    //    CSR (the graph itself stays distributed as AdjBlocks);
    //  - otherwise → sparse shuffle gather-scatter, fully distributed.
    val pprCfg = PprConfig(damping = cfg.damping, tol = cfg.pprTol)
    val scores: DataFrame =
      chooseStrategy(nVertices, sg.nArcs, queries.size.toLong, cfg) match {
        case "shard" =>
          // Query-sharded: the cached runner's CSR broadcast is reused
          // across batches; the seed frame stays DISTRIBUTED
          // (hash-repartitioned by qid, grouped inside tasks). Passage
          // weights are dense over all chunks per query (reference
          // semantics), so a driver collect here would be Q×V rows — the
          // round-1 OOM path this replaces. LAZY (round 7): the readout
          // below is the single consumer, so the eager persist+count was
          // a whole extra pass over the Q×V score rows per batch.
          sg.runner.runFrameLazy(seeds, pprCfg)
        case "csr" =>
          val blocks = graft.graph.Adjacency.csrBlocks(spark, arcs,
            edgesPerBlock = 1 << 16)
          val outW = {
            val a = new Array[Double](nVertices.toInt)
            graft.graph.Adjacency.outWeights(arcs).collect()
              .foreach(r => a(r.getAs[Long]("src").toInt) = r.getAs[Double]("out_w"))
            a
          }
          // Both the seed collect (≤ V·Q rows, dense passage weights) and
          // the kernel's V×Q rank state are bounded by csrStateBound —
          // chooseStrategy refuses this branch otherwise.
          val (arr, _) = PprCsr.run(blocks, outW, collectSeeds(seeds), pprCfg)
          PprCsr.toFrame(spark, arr)
        case _ =>
          Ppr.run(spark, arcs, nVertices, seeds, pprCfg)._1
      }

    // --- W6 readout: passage nodes only, rank desc per query — the
    // (vid, chunk_id, content) frame is snapshot-constant, so it lives
    // on the serving-graph cache with the dictionary (each warm batch
    // re-derived the lake read + dictionary join before round 7).
    val passages = sg.passages(verts)
    val ranked = scores.join(passages, "vid")
      .select(col("qid"), col("chunk_id"), col("content"), col("score"))
    val wr = Window.partitionBy("qid").orderBy(col("score").desc, col("chunk_id").asc)
    val out = ranked.withColumn("rank", row_number().over(wr))
      .where(col("rank") <= cfg.retrievalTopK)
    // Serving hygiene: the kernel's score frame is persisted by the
    // runner (finish() materializes it for stats); pin the SMALL ranked
    // result (≤ topK rows/query) and release the V-sized score cache so
    // repeated batches don't accumulate one cached frame each.
    val pinned = out.localCheckpoint(true)
    scores.unpersist(false) // no-op for the lazy shard plan; frees csr/shuffle paths
    pinned
  }

  /** Execution-strategy selector for the PPR stage (unit-tested). `nArcs`
    * stays by-name for callers that would have to count for it; the
    * serving path passes the cache's precomputed count.
    */
  private[retrieve] def chooseStrategy(nVertices: Long, nArcs: => Long,
                                       nQueries: Long, cfg: RetrieveConfig): String =
    if (nVertices > cfg.csrMaxVertices) "shuffle"
    else if (nQueries >= 4 && nArcs <= cfg.shardMaxArcs) "shard"
    else if (nVertices * nQueries <= cfg.csrStateBound) "csr"
    // Few queries but a V×Q state past the bound: sharding still works —
    // it broadcasts only the O(E) graph, never a V×Q state.
    else if (nArcs <= cfg.shardMaxArcs) "shard"
    else "shuffle"

  private def collectSeeds(seeds: DataFrame): Seq[(Long, Seq[(Long, Double)])] =
    seeds.collect()
      .groupBy(_.getAs[Long]("qid")).toSeq.sortBy(_._1)
      .map { case (q, rows) =>
        q -> rows.toSeq.map(r => (r.getAs[Long]("vid"), r.getAs[Double]("weight")))
      }

  /** W7 — IRCoT merged ranking (reference HippoRAG.py:540-547): across
    * retrieval steps, a doc's score is the MAX over steps, then re-sorted.
    * @param steps (qid, chunk_id, score) from successive retrieve calls
    */
  def ircotMerge(steps: DataFrame, topK: Int): DataFrame = {
    val merged = steps.groupBy("qid", "chunk_id").agg(max("score").as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("chunk_id").asc)
    merged.withColumn("rank", row_number().over(w)).where(col("rank") <= topK)
  }

  /** The deterministic stand-in for the reference's `reason_step` LLM call
    * (the only non-data-processing piece of the IRCoT loop): a follow-up
    * "thought" grounded in the current top passage — the original query
    * plus the leading tokens of the best-ranked doc. Injectable via
    * [[retrieveIrcot]]'s `reason` parameter for real LLM wiring.
    */
  def reasonStub(query: String, topDocs: Seq[String], thoughts: Seq[String]): String =
    query + " " + topDocs.headOption.getOrElse("")
      .split("\\s+").take(6).mkString(" ")

  /** IRCoT retrieval loop (reference HippoRAG.py:509-547 retrieve_ircot):
    * alternate retrieval and one-step reasoning, merging per-doc scores by
    * MAX across steps. Step 0 retrieves the raw queries; each later step
    * derives a per-query `thought` from the CURRENT merged ranking's top
    * docs (reference: reason_step over ranked_docs[:num_to_retrieve]),
    * stops that query early when the thought contains "So the answer is:"
    * (the reference's termination marker), retrieves the still-active
    * thoughts as a new batch, and max-merges ([[ircotMerge]] semantics,
    * HippoRAG.py:540-542).
    *
    * Batch shape: all queries advance together — each step is ONE batched
    * [[retrieve]] over the active thoughts (the reference loops queries
    * one at a time; per-query python loops become qid-keyed joins, same
    * argument as [[retrieve]] itself). The thought construction collects
    * only the per-query top-doc strings (≤ Q × topDocsForReason rows) —
    * the LLM/reason boundary is inherently driver-side text.
    *
    * @param reason (query, rankedTopDocs, priorThoughts) → thought; the
    *               default [[reasonStub]] is deterministic (U5's analog of
    *               the U1/U3 deterministic extraction/embedding stubs).
    * @return (qid, chunk_id, content, score, rank ≤ retrievalTopK) — the
    *         max-merged ranking across all executed steps
    */
  def retrieveIrcot(store: GraphStore, queries: Seq[(Long, String)], maxSteps: Int,
                    reason: (String, Seq[String], Seq[String]) => String = reasonStub,
                    topDocsForReason: Int = 5,
                    cfg: RetrieveConfig = RetrieveConfig()): DataFrame = {
    require(maxSteps >= 1, s"IRCoT needs at least one step (got $maxSteps)")
    val queryText = queries.toMap
    var merged = retrieve(store, queries, cfg)
      .select("qid", "chunk_id", "content", "score")
      .localCheckpoint(true)
    var active = queries.map(_._1)
    val thoughts = scala.collection.mutable.Map.empty[Long, List[String]]
      .withDefaultValue(Nil)
    var step = 1
    while (step < maxSteps && active.nonEmpty) {
      // Current top docs per active query, rank order (ties → chunk_id asc
      // like every readout here; the reference's dict order is undefined).
      val w = Window.partitionBy("qid").orderBy(col("score").desc, col("chunk_id").asc)
      val top = merged.where(col("qid").isin(active: _*))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= topDocsForReason)
        .select("qid", "rn", "content").collect()
        .groupBy(_.getAs[Long]("qid"))
        .map { case (q, rows) =>
          q -> rows.sortBy(_.getAs[Int]("rn")).map(_.getAs[String]("content")).toSeq
        }
      val stepThoughts = active.map { q =>
        val t = reason(queryText(q), top.getOrElse(q, Seq.empty), thoughts(q))
        thoughts(q) = thoughts(q) :+ t
        q -> t
      }
      // Reference: a thought carrying the answer marker stops BEFORE the
      // extra retrieval (HippoRAG.py:536-538).
      val (_, continue) = stepThoughts.partition(_._2.contains("So the answer is:"))
      active = continue.map(_._1)
      if (continue.nonEmpty) {
        val stepResult = retrieve(store, continue, cfg)
          .select("qid", "chunk_id", "content", "score")
        merged = merged.unionByName(stepResult)
          .groupBy("qid", "chunk_id")
          .agg(max("score").as("score"), first("content").as("content"))
          .select("qid", "chunk_id", "content", "score")
          .localCheckpoint(true)
      }
      step += 1
    }
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("chunk_id").asc)
    merged.withColumn("rank", row_number().over(w))
      .where(col("rank") <= cfg.retrievalTopK)
  }

  /** J7 — fuzzy rerank match-back (reference rerank.py: the LLM filter
    * returns fact STRINGS, and difflib maps each back onto the candidate
    * it came from). Per returned row: the candidate with the highest
    * difflib ratio (ties → smaller cid; the reference's first-max order
    * over a python list is insertion-dependent). The candidate set is the
    * per-query link_top_k facts — tiny — so it broadcasts.
    * @param returned   (rid, rtext)  @param candidates (cid, ctext)
    * @return (rid, cid, ratio) — one row per rid with ratio ≥ minRatio
    */
  def fuzzyMatchBack(returned: DataFrame, candidates: DataFrame,
                     minRatio: Double = 0.0): DataFrame = {
    val scored = returned.crossJoin(broadcast(candidates))
      .withColumn("ratio",
        graft.core.TextOps.sequenceRatio(col("rtext"), col("ctext")))
      .where(col("ratio") >= minRatio)
    val w = Window.partitionBy("rid").orderBy(col("ratio").desc, col("cid").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("rid", "cid", "ratio")
  }

  /** StandardRAG / DPR-only ranking (reference StandardRAG.py:422-429, W1):
    * full ordering of passages by normalized dense score.
    */
  def denseRetrieve(store: GraphStore, queries: Seq[(Long, String)], topK: Int,
                    cfg: RetrieveConfig = RetrieveConfig()): DataFrame = {
    val qdf = queryFrame(store.spark, queries, cfg.embedQuery)
    val dpr = dprScores(qdf, store.chunkEmb.read())
    val w = Window.partitionBy("qid").orderBy(col("dpr").desc, col("chunk_id").asc)
    dpr.withColumn("rank", row_number().over(w)).where(col("rank") <= topK)
  }
}
