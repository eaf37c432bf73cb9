package org.apache.spark.sql.graftx

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.LogicalRDD

/** Plan surgery for long iterative DataFrame loops. */
object PlanUtils {

  /** Re-leaf a `localCheckpoint`-ed frame, KEEPING its materialized RDD,
    * outputPartitioning and ordering but DROPPING the origin statistics
    * the checkpoint carries.
    *
    * Why: `Dataset.localCheckpoint` builds its LogicalRDD with
    * `originStats = Some(plan.stats)` — the stats OBJECT of the plan it
    * replaced. In an iterative loop where round N's plan joins round
    * N−1's checkpoint k times, the propagated sizeInBytes grows as
    * (previous size)^k per round: the BigInt's BIT COUNT multiplies by k
    * every round, and after ~20 rounds the driver sits in million-digit
    * BigInteger.multiply inside SizeInBytesOnlyStatsPlanVisitor
    * (observed: the k-core probe pinned one core doing Toom-Cook
    * multiplication, ~0 task activity). A bare LogicalRDD falls back to
    * `defaultSizeInBytes`, which is bounded, while the preserved
    * partitioning keeps the loop's joins exchange-free — the reason
    * localCheckpoint was chosen over the createDataFrame(df.rdd, schema)
    * re-root in the first place.
    */
  def dropOriginStats(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    df.queryExecution.logical match {
      case lr: LogicalRDD =>
        val bare = LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
          lr.outputOrdering, lr.isStreaming, lr.stream)(spark)
        classic.Dataset.ofRows(spark, bare)
      case _ => df
    }
  }
}
