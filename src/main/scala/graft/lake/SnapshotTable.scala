package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Minimal Iceberg-STYLE snapshot table: partitioned Parquet + a commit
  * marker per snapshot. No Iceberg runtime jar exists in this image
  * (SURVEY.md §7.1), so this layer provides the three properties the
  * engine needs and nothing more:
  *
  *   - atomic commit: `snap=<k>/_COMMITTED` is written after the data; a
  *     reader never sees a half-written snapshot;
  *   - time travel: `readAt(k)` pins any committed snapshot; `read()` is
  *     the latest one;
  *   - lineage: the marker records the producing operation and row count.
  *
  * It is deliberately NOT Iceberg-compatible (documented honesty —
  * SURVEY.md §7.6): full snapshot per commit, no manifests-of-manifests.
  * The reference's analogous layer is a pandas full-rewrite Parquet store
  * (src/hipporag/embedding_store.py:160-174) plus a pickled graph.
  */
class SnapshotTable(val spark: SparkSession, val root: String) {
  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def snapPath(k: Int) = s"$root/snap=$k"
  private def marker(k: Int) = new Path(s"${snapPath(k)}/_COMMITTED")

  def snapshots: Seq[Int] = {
    val p = new Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("snap=") => s.stripPrefix("snap=").toInt }
      .filter(k => fs.exists(marker(k)))
      .sorted
  }

  def currentSnapshot: Option[Int] = snapshots.lastOption

  def isEmpty: Boolean = currentSnapshot.isEmpty

  /** Write `df` as the next snapshot; returns its id. Marker written last. */
  def commit(df: DataFrame, op: String): Int = {
    val next = currentSnapshot.getOrElse(0) + 1
    val dataDir = s"${snapPath(next)}/data"
    df.write.mode(SaveMode.Overwrite).parquet(dataDir)
    val rows = spark.read.parquet(dataDir).count()
    val out = fs.create(marker(next), true)
    out.write(s"""{"snapshot":$next,"op":"$op","rows":$rows}""".getBytes("UTF-8"))
    out.close()
    next
  }

  def read(): DataFrame = readAt(currentSnapshot.getOrElse(
    throw new IllegalStateException(s"no committed snapshot under $root")))

  def readAt(k: Int): DataFrame = {
    require(fs.exists(marker(k)), s"snapshot $k not committed under $root")
    spark.read.parquet(s"${snapPath(k)}/data")
  }

  /** Read latest snapshot, or an empty frame with the given schema. */
  def readOrEmpty(schema: org.apache.spark.sql.types.StructType): DataFrame =
    currentSnapshot.map(readAt).getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
}
