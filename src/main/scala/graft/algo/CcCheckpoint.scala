package graft.algo

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable connected-components iteration state — the CC half of the
  * north rule's "checkpoints per-partition rank/component state with
  * lineage and iteration metrics so any run resumes mid-convergence"
  * (PPR's half is [[PprCheckpoint]]). The star loop's entire state is its
  * contracted pair set, so a checkpoint is that set plus the round
  * counter; a resumed run replays the identical deterministic rounds and
  * lands on the identical labels (spec-pinned, CcResumeSpec).
  *
  * Layout under `dir`:
  *   iter=<k>/pairs/       (a, b) parquet — the contracted pair set after round k
  *   iter=<k>/partstats/   per-partition lineage: (pid, rows)
  *   iter=<k>/meta/        one row: iter, n_pairs, checksum, elapsed_sec
  *
  * The `meta` write is last — its presence is the commit marker, so a
  * driver killed mid-write never exposes a half-checkpoint.
  */
object CcCheckpoint {

  case class State(pairs: DataFrame, iter: Int, nPairs: Long)

  def write(spark: SparkSession, dir: String, pairs: DataFrame, iter: Int,
            nPairs: Long, checksum: Long, elapsedSec: Double): Unit = {
    import spark.implicits._
    val base = s"$dir/iter=$iter"
    pairs.write.mode("overwrite").parquet(s"$base/pairs")
    pairs.groupBy(spark_partition_id().as("pid"))
      .agg(count(lit(1)).as("rows"))
      .write.mode("overwrite").parquet(s"$base/partstats")
    Seq((iter, nPairs, checksum, elapsedSec))
      .toDF("iter", "n_pairs", "checksum", "elapsed_sec")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/meta")
  }

  /** Latest committed checkpoint (max iter whose meta exists), or None. */
  def readLatest(spark: SparkSession, dir: String): Option[State] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return None
    val iters = fs.listStatus(path).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("iter=") => s.stripPrefix("iter=").toInt }
      .filter(k => fs.exists(new Path(s"$dir/iter=$k/meta/_SUCCESS")))
    if (iters.isEmpty) return None
    val k = iters.max
    val meta = spark.read.parquet(s"$dir/iter=$k/meta").collect().head
    Some(State(spark.read.parquet(s"$dir/iter=$k/pairs"), k,
      meta.getAs[Long]("n_pairs")))
  }
}
