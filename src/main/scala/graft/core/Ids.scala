package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-hash ids and deterministic dictionary encoding.
  *
  * Id rule mirrors `compute_mdhash_id` (reference
  * src/hipporag/utils/misc_utils.py:141-152 and embedding_store.py:11-13):
  * `"<ns>-" + md5(utf8(content))`, lowercase hex. Spark's built-in `md5`
  * produces identical output.
  */
object Ids {
  val ChunkNs  = "chunk-"
  val EntityNs = "entity-"
  val FactNs   = "fact-"

  /** persist() that skips plans the CacheManager already holds (lookup is
    * BY PLAN, so a twin frame — e.g. a reopened store re-deriving the
    * same dictionary — hits the existing entry): a re-persist is a no-op
    * that still logs "Asked to cache already cached data" on every call.
    */
  def persistIfUncached[T](ds: org.apache.spark.sql.Dataset[T],
      level: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): org.apache.spark.sql.Dataset[T] =
    if (ds.storageLevel != org.apache.spark.storage.StorageLevel.NONE) ds
    else ds.persist(level)

  def mdhash(ns: String, content: Column): Column = concat(lit(ns), md5(content))

  /** Driver-side twin of [[mdhash]] for tests / literals. */
  def mdhashStr(ns: String, content: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ns + d.map("%02x".format(_)).mkString
  }

  /** Deterministic dictionary encoding of string keys → dense Longs [0, n).
    *
    * id(key) = rank of key in the globally sorted distinct key set. NOT
    * `monotonically_increasing_id` (partition-layout-dependent) and NOT a
    * global single-partition window (driver bottleneck at web scale):
    * range-partition the distinct keys, sort within partitions, then assign
    * `partitionOffset + localIndex`. Because range partitioning keeps
    * partitions globally ordered, the result equals the global sorted rank
    * for ANY partition-boundary placement — deterministic across
    * parallelism levels, and each partition only touches its own slice.
    */
  def dictionary(keys: DataFrame, keyCol: String, idCol: String = "vid"): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    val distinctKeys = keys.select(col(keyCol).cast("string")).na.drop().distinct()
    val parts = math.max(1, spark.sparkContext.defaultParallelism)
    // Persisted: counted once for offsets, then re-read for id assignment —
    // without the cache the range-partitioned sort would run twice.
    val sorted = persistIfUncached(distinctKeys
      .repartitionByRange(parts, col(keyCol))
      .sortWithinPartitions(col(keyCol))
      .as[String])
    val counts = sorted.mapPartitions(it => Iterator.single(it.size)).collect()
    val offsets = counts.scanLeft(0L)(_ + _)
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    val result = sorted.rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        val base = bcOffsets.value(pid)
        it.zipWithIndex.map { case (k, i) => (k, base + i) }
      }
      .toDF(keyCol, idCol)
    // Pin the dictionary and RELEASE the internal sorted cache: callers
    // can't reach it (one O(V) cache entry would otherwise leak per
    // dictionary build — per serving-graph rebuild in a long process).
    // The eager checkpoint is one extra pass over V small rows.
    val pinned = result.localCheckpoint(true)
    sorted.unpersist(false)
    pinned
  }
}
