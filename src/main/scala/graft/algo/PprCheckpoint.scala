package graft.algo

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable PPR iteration state (north rule: "checkpoints per-partition
  * rank/component state with lineage and iteration metrics so any run
  * resumes mid-convergence").
  *
  * Layout under `dir`:
  *   iter=<k>/ranks/       (qid, vid, x) parquet
  *   iter=<k>/meta/        one row per query: iter, errs, danglesum, |V|, |E|, wall
  *   iter=<k>/partstats/   per-partition lineage: (pid, rows, l1_mass)
  *
  * The `meta` write is last — its presence is the commit marker, so a
  * driver killed mid-write never exposes a half-checkpoint.
  */
object PprCheckpoint {

  case class State(ranks: DataFrame, iter: Int, errs: Map[Long, Double],
                   dangle: Map[Long, Double], nVertices: Long)

  case class MetaRow(iter: Int, qid: Long, err: Double, ds: Double,
                     nVertices: Long, nEdges: Long, elapsedSec: Double)

  def write(
      spark: SparkSession,
      dir: String,
      ranks: DataFrame,
      iter: Int,
      errs: Map[Long, Double],
      dangle: Map[Long, Double],
      nVertices: Long,
      nEdges: Long,
      elapsedSec: Double): Unit = {
    import spark.implicits._
    val base = s"$dir/iter=$iter"
    ranks.write.mode("overwrite").parquet(s"$base/ranks")
    ranks.groupBy(spark_partition_id().as("pid"))
      .agg(count(lit(1)).as("rows"), sum(abs(col("x"))).as("l1_mass"))
      .write.mode("overwrite").parquet(s"$base/partstats")
    val qids = (errs.keySet ++ dangle.keySet).toSeq.sorted
    qids.map(q => MetaRow(iter, q, errs.getOrElse(q, Double.NaN),
        dangle.getOrElse(q, 0.0), nVertices, nEdges, elapsedSec))
      .toDF().coalesce(1)
      .write.mode("overwrite").parquet(s"$base/meta")
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
    val meta = spark.read.parquet(s"$dir/iter=$k/meta").collect()
    val errs = meta.map(r => r.getAs[Long]("qid") -> r.getAs[Double]("err")).toMap
    val dangle = meta.map(r => r.getAs[Long]("qid") -> r.getAs[Double]("ds")).toMap
    val nV = meta.head.getAs[Long]("nVertices")
    Some(State(spark.read.parquet(s"$dir/iter=$k/ranks"), k, errs, dangle, nV))
  }
}
