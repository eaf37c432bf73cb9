package graft.retrieve

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.extract.Embeddings
import graft.lake.SnapshotTable

/** Persistent engine state: one snapshot table per store, mirroring the
  * reference's on-disk layout (three parquet embedding stores + graph +
  * OpenIE cache — src/hipporag/embedding_store.py:97,
  * HippoRAG.py:154-174, 225-241) as committed, time-travelable snapshots.
  *
  * `embedChunk`/`embedFact` default to the hash-seeded unit vectors the
  * reference's own tests use; `embedEntity` defaults to trigram vectors so
  * the synonymy-KNN path has non-degenerate neighbors (FIXTURES.md §2).
  */
class GraphStore(
    val spark: SparkSession,
    val root: String,
    val embedChunk: Column => Column = Embeddings.hashUnitUdf,
    val embedEntity: Column => Column = Embeddings.trigramUnitUdf,
    val embedFact: Column => Column = Embeddings.hashUnitUdf) {

  val chunks   = new SnapshotTable(spark, s"$root/chunks")    // chunk_id, content
  val triples  = new SnapshotTable(spark, s"$root/triples")   // chunk_id, subj, pred, obj
  val edges    = new SnapshotTable(spark, s"$root/edges")     // src, dst, weight, etype (string keys)
  // Per-family edge tables (I2): the merged `edges` view applies the
  // last-writer-wins type precedence, which destroys the information
  // delta maintenance needs (a fact weight hidden under a synonym edge).
  val factEdges    = new SnapshotTable(spark, s"$root/edges_fact")
  val passageEdges = new SnapshotTable(spark, s"$root/edges_passage")
  val synEdges     = new SnapshotTable(spark, s"$root/edges_syn")
  val vertices = new SnapshotTable(spark, s"$root/vertices")  // key, kind, content
  val chunkEmb  = new SnapshotTable(spark, s"$root/vdb_chunk")  // hash_id, content, embedding
  val entityEmb = new SnapshotTable(spark, s"$root/vdb_entity")
  val factEmb   = new SnapshotTable(spark, s"$root/vdb_fact")

  val chunkSchema: StructType = StructType(Seq(
    StructField("chunk_id", StringType), StructField("content", StringType),
    StructField("metadata", MapType(StringType, StringType)))) // S7, HippoRAG.py:193-201
  val tripleSchema: StructType = StructType(Seq(
    StructField("chunk_id", StringType), StructField("subj", StringType),
    StructField("pred", StringType), StructField("obj", StringType)))
  val embSchema: StructType = StructType(Seq(
    StructField("hash_id", StringType), StructField("content", StringType),
    StructField("embedding", ArrayType(FloatType, containsNull = false))))

  /** Current chunk snapshot, upgraded in place to [[chunkSchema]]: stores
    * committed before the S7 metadata column existed hold only
    * (chunk_id, content) — pad those with an empty map so incremental
    * indexing over an upgraded store unions cleanly instead of throwing.
    */
  def currentChunks: DataFrame = {
    val df = chunks.readOrEmpty(chunkSchema)
    if (df.columns.contains("metadata")) df
    else df.withColumn("metadata",
      map().cast(MapType(StringType, StringType)))
  }
  def currentTriples: DataFrame = triples.readOrEmpty(tripleSchema)

  /** Idempotent embedding upsert (reference embedding_store.py:100-134:
    * anti-join by content hash, embed only the missing rows — I1).
    */
  def upsertEmbeddings(table: SnapshotTable, rows: DataFrame, embed: Column => Column): DataFrame = {
    val existing = table.readOrEmpty(embSchema)
    val missing = rows.join(existing.select("hash_id"), Seq("hash_id"), "left_anti")
      .select(col("hash_id"), col("content"), embed(col("content")).as("embedding"))
    val merged = existing.unionByName(missing)
    table.commit(merged, op = "upsert")
    table.read()
  }

  /** Keep only rows whose hash_id appears in `liveIds` (delete path —
    * reference embedding_store.py:183-191 + HippoRAG.py:398-405).
    */
  def retainEmbeddings(table: SnapshotTable, liveIds: DataFrame): DataFrame = {
    val existing = table.readOrEmpty(embSchema)
    val kept = existing.join(liveIds, Seq("hash_id"), "left_semi")
    table.commit(kept, op = "retain")
    table.read()
  }
}
