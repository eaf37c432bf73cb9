package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Ids

/** Edge-table construction with the reference's exact weighting rules.
  *
  * The reference accumulates a dict `node_to_node_stats` keyed by DIRECTED
  * (src,dst) string pairs and then adds every entry as one undirected igraph
  * edge (reference HippoRAG.py:867-1020, 1189-1223). Our edge table keeps
  * those directed rows verbatim; the undirected multigraph semantics are
  * reproduced at algorithm time by [[Adjacency.symmetrize]].
  *
  * Edge types, in reference insertion order (later overwrites earlier for
  * the same directed key — plain dict assignment at HippoRAG.py:1013):
  * FACT(0) → PASSAGE(1) → SYNONYM(2).
  */
object GraphBuild {
  val Fact: Int = 0
  val Passage: Int = 1
  val Synonym: Int = 2

  /** A1 — fact edges: per chunk-distinct triple, +1 on BOTH directed entity
    * pairs (HippoRAG.py:894-910). Keys are entity hash ids. Self-loops
    * (subj == obj) are dropped as in `add_new_edges` (HippoRAG.py:1201).
    */
  def factEdges(triples: DataFrame): DataFrame = {
    val pairs = triples
      .where(col("subj") =!= col("obj"))
      .select(
        Ids.mdhash(Ids.EntityNs, col("subj")).as("src"),
        Ids.mdhash(Ids.EntityNs, col("obj")).as("dst"))
    pairs.unionAll(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .groupBy("src", "dst")
      .agg(count(lit(1)).cast("double").as("weight"))
      .withColumn("etype", lit(Fact))
  }

  /** A2 — passage edges: (chunk → entity) weight 1.0 for every entity in
    * the chunk's entity set (HippoRAG.py:915-957). Single direction, as in
    * the reference dict.
    */
  def passageEdges(chunkEntities: DataFrame): DataFrame =
    chunkEntities.select(
        col("chunk_id").as("src"),
        Ids.mdhash(Ids.EntityNs, col("entity")).as("dst"))
      .distinct()
      .withColumn("weight", lit(1.0))
      .withColumn("etype", lit(Passage))

  /** A3 union with last-writer-wins per directed key: synonymy(2) >
    * passage(1) > fact(0), mirroring dict-assignment order. Ties within a
    * type cannot occur (each builder already aggregates per key).
    */
  def edges(parts: DataFrame*): DataFrame = {
    val all = parts.reduce(_ unionByName _)
    all.groupBy("src", "dst")
      .agg(max(struct(col("etype"), col("weight"))).as("m"))
      .select(col("src"), col("dst"), col("m.weight").as("weight"), col("m.etype").as("etype"))
  }

  /** Vertex table: entity phrases ∪ passage chunks, kind by id namespace
    * (HippoRAG.py:1159-1187 add_new_nodes; two node classes by prefix).
    */
  def vertices(entities: DataFrame, chunks: DataFrame): DataFrame = {
    val ents = entities.select(
      col("entity_id").as("key"), lit(0).as("kind"), col("entity").as("content"))
    val chks = chunks.select(
      col("chunk_id").as("key"), lit(1).as("kind"), col("content"))
    ents.unionByName(chks).dropDuplicates("key")
  }
  val EntityKind = 0
  val PassageKind = 1
}
