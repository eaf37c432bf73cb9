package graft.retrieve

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.extract.Embeddings
import graft.graph.Adjacency
import graft.lake.SnapshotTable

/** Snapshot-pinned serving graph: the dictionary + encoded symmetrized
  * arc table (persisted), with the driver-collected CSR and its broadcast
  * [[graft.algo.PprShard.Runner]] built LAZILY (only the query-sharded
  * strategy pays the O(E) collect, and only once per graph version).
  *
  * Round-3 verdict #2: every `Retriever.retrieve` call re-derived the
  * dictionary (a global sort), re-symmetrized/encoded the edge table and
  * re-collected the CSR — minutes of graph prep per batch at corpus scale
  * for a graph that changed in nothing. [[GraphStore.servingGraph]] holds
  * ONE of these per (edges, vertices) snapshot pair and releases it when
  * a commit moves the snapshot ids.
  */
final class ServingGraph private[retrieve] (
    val dict: DataFrame, val nVertices: Long,
    val arcs: DataFrame, val nArcs: Long,
    spark: SparkSession, onCsrBuild: () => Unit) {
  import graft.algo.PprShard
  private var csrV: Option[PprShard.LocalCsr] = None
  private var runnerV: Option[PprShard.Runner] = None

  /** Driver-local CSR (collected once per graph version). */
  def csr: PprShard.LocalCsr = synchronized {
    csrV.getOrElse {
      onCsrBuild()
      val c = PprShard.buildLocal(arcs, nVertices.toInt)
      csrV = Some(c); c
    }
  }

  /** Broadcast-once runner over [[csr]] — reused across query batches. */
  def runner: PprShard.Runner = synchronized {
    runnerV.getOrElse {
      val r = new PprShard.Runner(spark, csr)
      runnerV = Some(r); r
    }
  }

  /** Snapshot-constant passage readout frame (vid, chunk_id, content) —
    * built from the verts snapshot on first use, persisted, reused by
    * every batch on this graph version (round 7: each warm retrieve
    * re-ran the lake read + dictionary join).
    */
  private var passagesV: Option[DataFrame] = None
  def passages(verts: DataFrame): DataFrame = synchronized {
    passagesV.getOrElse {
      val p = verts.where(col("kind") === graft.graph.GraphBuild.PassageKind)
        .join(dict, "key")
        .select(col("vid"), col("key").as("chunk_id"), col("content"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      passagesV = Some(p); p
    }
  }

  private[retrieve] def release(): Unit = synchronized {
    runnerV.foreach(_.close()); runnerV = None
    csrV = None
    passagesV.foreach(_.unpersist(false)); passagesV = None
    arcs.unpersist(false)
    dict.unpersist(false)
  }
}

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

  // ---- serving-graph cache (keyed by snapshot ids, invalidated by commit)
  private var servingCache: Option[((Option[Int], Option[Int]), ServingGraph)] = None
  /** Test-visible build counters: dict/arc builds and CSR collects. */
  private[retrieve] val servingBuilds = new java.util.concurrent.atomic.AtomicLong
  private[retrieve] val servingCsrBuilds = new java.util.concurrent.atomic.AtomicLong

  /** The cached serving graph for the CURRENT (edges, vertices) snapshot
    * pair. Two consecutive retrieve batches over an unchanged store reuse
    * the same persisted dictionary/arcs and the same broadcast CSR; any
    * index/delete commit moves a snapshot id and the next call rebuilds
    * (releasing the old persists + broadcast).
    *
    * Concurrency contract: release() destroys the PREVIOUS graph's
    * broadcast eagerly, so maintenance (index/delete) and the first
    * retrieve after it must not race a still-running batch on the old
    * version — one writer, serve-or-maintain, like the reference's
    * single-process store. A serve-while-maintain deployment would swap
    * release() for ref-counted / deferred destruction.
    */
  def servingGraph(): ServingGraph = synchronized {
    val key = (edges.currentSnapshot, vertices.currentSnapshot)
    servingCache match {
      case Some((k, g)) if k == key => g
      case prev =>
        prev.foreach(_._2.release())
        // persistIfUncached: a reopened store over the same root derives
        // plan-identical frames; re-persisting them would only log
        // CacheManager warnings (round-3 ask #8).
        val dict = graft.core.Ids.persistIfUncached(
          graft.core.Ids.dictionary(vertices.read().select("key"), "key"))
        val nV = dict.count()
        val arcs = graft.core.Ids.persistIfUncached(
          Adjacency.encode(Adjacency.symmetrize(edges.read()), dict))
        val nA = arcs.count()
        servingBuilds.incrementAndGet()
        val g = new ServingGraph(dict, nV, arcs, nA, spark,
          () => servingCsrBuilds.incrementAndGet())
        servingCache = Some((key, g))
        g
    }
  }

  /** All snapshot tables of this store, in commit order. */
  def tables: Seq[SnapshotTable] = Seq(chunks, triples, factEdges,
    passageEdges, synEdges, edges, vertices, chunkEmb, entityEmb, factEmb)

  /** Lake maintenance: fold every table's delta history into one segment
    * (read-plan reset) and GC snapshots/segments past `keepSnapshots`.
    * Run it off the serving path — the O(Δ) commit design trades write
    * bytes for read-plan depth, and this is where the depth is reclaimed.
    * Time travel remains for the kept snapshots; current state unchanged.
    *
    * Isolation contract (round-5 ask #8): `keepSnapshots` counts
    * PRE-MAINTENANCE snapshots — the compaction snapshot this pass itself
    * mints does not consume a retention slot, so a reader pinned at any
    * of the newest `keepSnapshots` snapshots that existed when maintain()
    * started still reads its exact rows afterwards (its manifest marker
    * survives, and segment GC never deletes a segment a surviving
    * manifest references — LakeSpec pins this). Readers pinned OLDER than
    * the retention window fail loudly at the next manifest load (marker
    * gone); a DataFrame handle obtained before expiry fails at action
    * time when its segments are gone — the documented lease-free trade.
    */
  def maintain(keepSnapshots: Int = 2): Unit = synchronized {
    // The cached serving graph's persisted frames would otherwise try to
    // recompute through segments this pass is about to GC.
    servingCache.foreach(_._2.release())
    servingCache = None
    tables.foreach { t =>
      if (!t.isEmpty) {
        val compacted =
          if (t.manifest(t.currentSnapshot.get).entries.size > 1) { t.compact(); true }
          else false
        t.expireSnapshots(keepSnapshots + (if (compacted) 1 else 0))
      }
    }
  }

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
    * O(Δ) in I/O: ONLY the missing rows are written (append segment);
    * the old full-rewrite copied the whole store per upsert.
    */
  def upsertEmbeddings(table: SnapshotTable, rows: DataFrame, embed: Column => Column): DataFrame = {
    val existing = table.readOrEmpty(embSchema)
    val missing = rows.join(existing.select("hash_id"), Seq("hash_id"), "left_anti")
      .select(col("hash_id"), col("content"), embed(col("content")).as("embedding"))
    if (table.isEmpty) table.commit(missing, op = "upsert")
    else table.commitAppend(missing, op = "upsert")
    table.read()
  }

  /** Keep only rows whose hash_id appears in `liveIds` (delete path —
    * reference embedding_store.py:183-191 + HippoRAG.py:398-405).
    * O(Δ): the DEAD ids become a tombstone segment; live rows are never
    * rewritten.
    */
  def retainEmbeddings(table: SnapshotTable, liveIds: DataFrame): DataFrame = {
    val existing = table.readOrEmpty(embSchema)
    // Empty table: nothing to retain — the old path committed an EMPTY
    // data segment (one wasted write job per table per fresh index; the
    // following upsert mints the first real snapshot either way).
    if (table.isEmpty) return existing
    val dead = existing.select("hash_id")
      .join(liveIds, Seq("hash_id"), "left_anti")
    table.commitDelta(None, Some(dead), Seq("hash_id"), op = "retain")
    table.read()
  }
}
