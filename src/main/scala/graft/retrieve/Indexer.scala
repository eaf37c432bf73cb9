package graft.retrieve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.extract.Extract
import graft.graph.GraphBuild

/** Index / delete lifecycle (reference HippoRAG.index/delete,
  * src/hipporag/HippoRAG.py:262-335 and 337-411).
  *
  * Incremental contract (I1/I3, SURVEY.md §2.8): extraction and embedding
  * run ONLY for chunks not yet in the store (left-anti by content hash);
  * the derived graph (edge weights, vertices) is re-derived from the full
  * triple set — algebraically identical to the reference's incremental
  * `node_to_node_stats` accumulation, since fact weights are plain counts
  * over chunk-distinct triples. Delete removes chunks and re-derives:
  * entities/facts referenced by no surviving chunk disappear, shared ones
  * survive — the reference's refcount semantics (HippoRAG.py:372-396) as a
  * consequence of derivation instead of bookkeeping.
  */
object Indexer {

  case class SynonymyConfig(
      topK: Int = 2047,          // config_utils.py:160-163
      threshold: Double = 0.8,   // config_utils.py:172-175
      cap: Int = 101)            // HippoRAG.py:1007: breaks when num_nns > 100

  case class IndexStats(totalChunks: Long, entities: Long, edges: Long, vertices: Long)

  /** @param docs one row per document with a `content` string column.
    * @param extractor chunks → (chunk_id, subj, pred, obj); defaults to the
    *                  sentence extractor (pages corpus).
    */
  def index(
      store: GraphStore,
      docs: DataFrame,
      extractor: DataFrame => DataFrame = Extract.sentenceTriples,
      syn: SynonymyConfig = SynonymyConfig()): IndexStats = {

    val incoming = Extract.chunks(docs, "content", Seq.empty).dropDuplicates("chunk_id")
    val existing = store.currentChunks
    val newChunks = incoming.join(existing.select("chunk_id"), Seq("chunk_id"), "left_anti")
    val allChunks = existing.unionByName(newChunks)
    store.chunks.commit(allChunks, "index")

    // I1: extract only for new chunks; keep prior triples verbatim.
    val newTriples = extractor(newChunks)
    val allTriples = store.currentTriples.unionByName(newTriples)
    store.triples.commit(allTriples, "index")
    rebuild(store, syn)
  }

  /** Delete by document content (reference delete, HippoRAG.py:337-411). */
  def delete(store: GraphStore, docs: DataFrame, syn: SynonymyConfig = SynonymyConfig()): IndexStats = {
    val victims = Extract.chunks(docs, "content", Seq.empty).select("chunk_id")
    val remaining = store.currentChunks.join(victims, Seq("chunk_id"), "left_anti")
    store.chunks.commit(remaining, "delete")
    val keptTriples = store.currentTriples
      .join(store.chunks.read().select("chunk_id"), Seq("chunk_id"), "left_semi")
    store.triples.commit(keptTriples, "delete")
    rebuild(store, syn)
  }

  /** Re-derive graph + embedding stores from the current chunk/triple set. */
  private def rebuild(store: GraphStore, syn: SynonymyConfig): IndexStats = {
    val chunksNow = store.chunks.read()
    val triplesNow = store.triples.read()
    val chunkEnts = Extract.chunkEntities(triplesNow)
    val ents = Extract.entities(chunkEnts)
    val facts = Extract.facts(triplesNow)

    // Embedding stores: upsert missing, drop dead ids (refcount result).
    val chunkRows = chunksNow.select(col("chunk_id").as("hash_id"), col("content"))
    val entRows = ents.select(col("entity_id").as("hash_id"), col("entity").as("content"))
    val factRows = facts.select(col("fact_id").as("hash_id"),
      Extract.factContent(col("subj"), col("pred"), col("obj")).as("content"))
    store.retainEmbeddings(store.chunkEmb, chunkRows.select("hash_id"))
    store.retainEmbeddings(store.entityEmb, entRows.select("hash_id"))
    store.retainEmbeddings(store.factEmb, factRows.select("hash_id"))
    val chunkE = store.upsertEmbeddings(store.chunkEmb, chunkRows, store.embedChunk)
    val entityE = store.upsertEmbeddings(store.entityEmb, entRows, store.embedEntity)
    store.upsertEmbeddings(store.factEmb, factRows, store.embedFact)

    val synEdges = synonymyEdges(entityE, syn)
    val allEdges = GraphBuild.edges(
      GraphBuild.factEdges(triplesNow),
      GraphBuild.passageEdges(chunkEnts),
      synEdges)
    store.edges.commit(allEdges, "rebuild")

    val verts = GraphBuild.vertices(ents, chunksNow)
    store.vertices.commit(verts, "rebuild")

    IndexStats(
      totalChunks = chunksNow.count(),
      entities = ents.count(),
      edges = store.edges.read().count(),
      vertices = store.vertices.read().count())
  }

  /** G3 — synonymy expansion (reference add_synonymy_edges,
    * HippoRAG.py:959-1020): cosine KNN over entity embeddings; queries
    * restricted to phrases with >2 alphanumeric chars (P3); neighbors kept
    * while score ≥ τ, skipping self and empty phrases, stopping after
    * `cap` accepted; weight = cosine score; ONE direction per (query, nn)
    * (dict assignment — symmetrization happens at algorithm time).
    */
  def synonymyEdges(entityEmb: DataFrame, syn: SynonymyConfig): DataFrame = {
    val valid = entityEmb
      .where(length(regexp_replace(col("content"), "[^A-Za-z0-9]", "")) > 2)
    val queries = valid.select(col("hash_id").as("qid"), col("embedding").as("qvec"))
    val keys = entityEmb.where(col("content") =!= "")
      .select(col("hash_id").as("kid"), col("embedding").as("kvec"))
    val knn = Knn.topK(queries, keys, syn.topK, excludeSelf = true)
    val accepted = knn.where(col("score") >= syn.threshold)
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("kid").asc)
    accepted.withColumn("nn_rank", row_number().over(w))
      .where(col("nn_rank") <= syn.cap)
      .select(col("qid").as("src"), col("kid").as("dst"),
        col("score").as("weight"), lit(GraphBuild.Synonym).as("etype"))
  }
}
