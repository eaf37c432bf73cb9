package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit hot-key handling (north rule: "explicit skew handling — salted
  * high-degree hubs").
  *
  * The engine's aggregations (sum/min/count) already absorb Zipf hubs via
  * map-side partial aggregation, and the CSR layer splits hub adjacency
  * across blocks by construction ([[Adjacency.csrBlocks]]). This utility
  * covers the remaining case: a SHUFFLE-side hot key in an aggregation
  * whose per-key state is too wide to combine map-side efficiently (e.g.
  * collect-style or high-cardinality intermediate rows). Two-stage salted
  * aggregation: stage 1 groups by (key, salt) — the hub's rows spread over
  * `salts` reducers — stage 2 merges the per-salt partials.
  */
object Skew {

  /** Salted distributed sum: exactly `df.groupBy(keys).sum(valueCol)`, but
    * the heaviest key costs 1/salts per reducer.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String, salts: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val stage1 = salted.groupBy((keys :+ "_salt").map(col): _*)
      .agg(sum(valueCol).as("_partial"))
    stage1.groupBy(keys.map(col): _*)
      .agg(sum("_partial").as(s"sum($valueCol)"))
  }

  /** Degree histogram — the skew diagnostic used to pick `salts` and to
    * verify the synthetic corpus actually exercises the hub path.
    */
  def degreeHistogram(arcs: DataFrame, buckets: Int = 10): DataFrame = {
    val deg = arcs.groupBy("src").agg(count(lit(1)).as("deg"))
    deg.withColumn("bucket", floor(log2(col("deg"))))
      .groupBy("bucket")
      .agg(count(lit(1)).as("vertices"), max("deg").as("max_deg"))
      .orderBy("bucket")
  }
}
