package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.entry.{DocQueries => Q, Oracles}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query names map 1:1 to SURVEY.md §2 operators; oracle SQL lives in
  * [[graft.entry.Oracles]] (validated against DuckDB 1.0).
  */
object SparkEntry {

  /** Flagship: the full HippoRAG loop on sf0.001 — index the documents
    * corpus into a throwaway store (extraction → edges → synonymy), run a
    * batch of graph retrievals (seed vectors → multi-query PPR → ranked
    * passages). Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("graft_entry").toString
    val store = new graft.retrieve.GraphStore(spark, tmp)
    val docs = Q.documents(spark, dir).select(col("text").as("content"))
    graft.retrieve.Indexer.index(store, docs,
      extractor = graft.extract.Extract.adjacentTriples)
    graft.retrieve.Retriever.retrieve(store,
      Seq(0L -> "table scan fast query", 1L -> "customer order line"),
      graft.retrieve.Retriever.RetrieveConfig(retrievalTopK = 20))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // projections / scalar functions (P1, F1, F2, F3)
    "q01_text_processing" -> (Q.qTextProcessing _),
    "q02_chunk_ids" -> (Q.qChunkIds _),
    "q03_normalize_answer" -> (Q.qNormalizeAnswer _),
    // extraction / set ops (U1/U2, SO1, SO2, P2)
    "q04_entities" -> (Q.qEntities _),
    "q05_triples" -> (Q.qTriples _),
    // graph construction (A1, A2, A4)
    "q06_fact_edges" -> (Q.qFactEdges _),
    "q07_passage_edges" -> (Q.qPassageEdges _),
    "q08_entity_df" -> (Q.qEntityDf _),
    // aggregation / window (F4, W2, A7)
    "q09_minmax" -> (Q.qMinMax _),
    "q10_topk_docs" -> (Q.qTopKDocs _),
    "q11_graph_stats" -> (Q.qGraphStats _),
    // incremental semantics (SO5/I1, SO4/I3)
    "q12_upsert_antijoin" -> (Q.qUpsertAntiJoin _),
    "q13_delete_refcount" -> (Q.qDeleteRefcount _),
    // dedup family
    "q14_dedup_exact" -> (Q.qDedupExact _),
    "q15_minhash_lsh" -> (Q.qMinHashLsh _),
    "q16_simhash" -> (Q.qSimHash _),
    "q16b_simhash_pairs" -> (Q.qSimHashPairs _),
    "q17_ngram_jaccard" -> (Q.qNgramJaccard _),
    // similarity search (J6/W5)
    "q18_cosine_topk" -> (Q.qCosineTopK _),
    "q19_ann_lsh" -> (Q.qAnnLsh _),
    "q31_embed_dedup" -> (Q.qEmbedDedup _),
    "q32_ann_ivf" -> (Q.qAnnIvf _),
    // text analysis
    "q20_lang_id" -> (Q.qLangId _),
    "q21_quality" -> (Q.qQuality _),
    "q22_token_counts" -> (Q.qTokenCounts _),
    "q23_fingerprint" -> (Q.qFingerprint _),
    // graph algorithms (G1, G4, G5, G6)
    "q24_connected_components" -> (Q.qConnectedComponents _),
    "q25_triangles" -> (Q.qTriangles _),
    "q26_degrees" -> (Q.qDegrees _),
    "q27_ppr" -> (Q.qPpr _),
    "q27b_lpa" -> (Q.qLpa _),
    "q27c_ppr_fixed" -> (Q.qPprFixed _),
    "q33_pagerank_global" -> (Q.qPagerankGlobal _),
    "q35_hits" -> (Q.qHits _),
    "q36_host_graph" -> (Q.qHostGraph _),
    "q37_bfs_hops" -> (Q.qBfsHops _),
    "q38_scc" -> (Q.qScc _),
    "q39_bowtie" -> (Q.qBowtie _),
    "q40_neighborhood" -> (Q.qNeighborhood _),
    "q41_kcore" -> (Q.qKCore _),
    "q42_harmonic" -> (Q.qHarmonic _),
    "q43_clustering" -> (Q.qClustering _),
    "q44_reciprocity" -> (Q.qReciprocity _),
    "q45_assortativity" -> (Q.qAssortativity _),
    "q46_hyperball" -> (Q.qHyperball _),
    "q47_walks" -> (Q.qWalks _),
    "q48_bm25" -> (Q.qBm25 _),
    "q49_sessionize" -> (Q.qSessionize _),
    "q50_ngram_stats" -> (Q.qNgramStats _),
    "q51_skipgrams" -> (Q.qSkipGrams _),
    "q52_distinct_sketch" -> (Q.qDistinctSketch _),
    // events: json + windowed agg (F8)
    "q28_json_extract" -> (Q.qJsonExtract _),
    "q29_window_agg" -> (Q.qWindowAgg _),
    // OpenIE stats (S5, A8)
    "q30_openie_stats" -> (Q.qOpenieStats _),
    // html→text extraction kernel (pages input_hint html column)
    "q34_html_strip" -> (Q.qHtmlStrip _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Every query carries a value oracle now:
    * the tol-CONVERGED fixpoint (q27_ppr) is hash-compared against a
    * committed golden parquet (itself independently validated vs a
    * DuckDB+networkx recomputation — scripts/check_q27_golden.py, and
    * pinned to the live query in PprSpec), and the PPR update rule is
    * additionally value-checked by the q27c fixed-sweep recursive CTE.
    */
  def oracleSql: Map[String, String] = Oracles.sql
}
