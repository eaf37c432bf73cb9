package graft.retrieve

import graft.SparkSpec
import graft.core.Ids
import graft.extract.Embeddings

/** The reference's SIGNATURE behavior (HippoRAG paper §1, README:9-14):
  * multi-hop retrieval — a bridge passage that shares NO lexical/vector
  * similarity with the query is still retrieved, because the query's
  * entities link to it through the entity graph (fact edge alice→paris,
  * passage edge paris→bridge-doc) and PPR carries seed mass across.
  * Dense retrieval over the same embeddings cannot rank it.
  *
  * Runs on all-trigram embedders (store + query) so vector similarity is
  * MEANINGFUL (character overlap), unlike the hash mocks — this is the
  * one spec where retrieval quality semantics, not just plumbing, are
  * asserted. Everything is deterministic.
  */
class MultiHopSpec extends SparkSpec {
  import spark.implicits._

  test("PPR graph retrieval surfaces the 2-hop bridge passage; dense retrieval cannot") {
    val dir = java.nio.file.Files.createTempDirectory("graft_multihop").toString
    // 1024-dim trigram embedder: at the default Dim=64 the trigram
    // buckets collide so heavily that the shared fact-format punctuation
    // ("('", "', '") washes out the letter trigrams and fact ranking is
    // noise; 1024 buckets make character overlap the dominant signal.
    val tri: org.apache.spark.sql.Column => org.apache.spark.sql.Column = {
      val f = org.apache.spark.sql.functions.udf(
        (t: String) => Embeddings.trigramUnit(t, 1024))
      c => f(c)
    }
    val store = new GraphStore(spark, dir,
      embedChunk = tri, embedEntity = tri, embedFact = tri)
    val bridge = "Paris hosts Louvre."
    val docs = Seq(
      "Alice visited Paris.",   // hop 1: query entity → paris
      bridge,                   // hop 2: no query-token overlap at all
      "Zebra chases Quokka.",   // unrelated distractors
      "Xylophone meets Wombat.",
      "Violin joins Trumpet.")
    Indexer.index(store, docs.toDF("content"))

    // Query names alice only — zero character overlap with the bridge doc.
    val queries = Seq(0L -> "alice trip")
    // linkTopK=1: with only five facts in the toy graph, the default
    // link_top_k=5 would keep EVERY fact as a seed (min-max floors the
    // worst at 0, the rest carry mass) and the walk would start from the
    // distractor entities too. One linked fact — the reference's
    // filter-to-relevant-facts step — isolates the multi-hop effect.
    val cfg = Retriever.RetrieveConfig(retrievalTopK = 5, linkTopK = 1,
      embedQuery = tri)
    def ranks(df: org.apache.spark.sql.DataFrame): Map[String, Int] =
      df.collect().map(r =>
        r.getAs[String]("chunk_id") -> r.getAs[Int]("rank")).toMap
    val graph = ranks(Retriever.retrieve(store, queries, cfg))
    val dense = ranks(Retriever.denseRetrieve(store, queries, topK = 5, cfg))

    val bridgeId = Ids.mdhashStr(Ids.ChunkNs, bridge)
    val distractorIds = docs.drop(2).map(Ids.mdhashStr(Ids.ChunkNs, _))

    // Graph retrieval: the bridge beats every distractor (alice's seed
    // mass reaches it through paris in two hops).
    assert(graph.contains(bridgeId), s"bridge not retrieved at all: $graph")
    distractorIds.foreach { d =>
      assert(!graph.contains(d) || graph(bridgeId) < graph(d),
        s"graph retrieval must rank the bridge above distractor $d: $graph")
    }
    assert(graph(bridgeId) <= 2, s"bridge should be near the top: $graph")

    // Dense retrieval: the same embeddings give the bridge no edge over
    // the distractors — no distractor-beating rank without the graph.
    val denseBridge = dense.getOrElse(bridgeId, Int.MaxValue)
    val denseBestDistractor = distractorIds
      .map(d => dense.getOrElse(d, Int.MaxValue)).min
    assert(denseBridge > denseBestDistractor,
      s"dense retrieval should NOT beat the distractors to the bridge " +
      s"(bridge=$denseBridge, best distractor=$denseBestDistractor): $dense")
  }
}
