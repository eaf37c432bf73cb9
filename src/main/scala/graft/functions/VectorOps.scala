package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx

/** Vector math over `Array[Float]` columns. The hot path is the native
  * codegen'd [[org.apache.spark.sql.graftx.DotProduct]] expression; see
  * that file for rationale.
  */
object VectorOps {

  /** Column wrapper over the codegen'd DotProduct expression. */
  def dot(a: Column, b: Column): Column =
    graftx.column(graftx.DotProduct(graftx.expression(a), graftx.expression(b)))

  /** Pure-builtin composition (zip_with + aggregate) — the portable
    * fallback; kept for plan-comparison tests against [[dot]].
    */
  def dotBuiltin(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine for unit vectors == dot; general cosine divides by norms. */
  def cosine(a: Column, b: Column): Column =
    cosineWithNorms(a, b, sqrt(dot(a, a)), sqrt(dot(b, b)))

  /** [[cosine]] with the norms PRECOMPUTED as per-vector columns: the
    * pair-heavy operators (KNN, ANN, near-dup) otherwise re-scan each
    * array twice per CANDIDATE PAIR for its own norm — hoisting them to
    * the per-vector side cuts pair scoring to one dot. Numerically
    * identical to [[cosine]] (same IEEE ops, just evaluated earlier).
    */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column =
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot(a, b) / (na * nb))

  /** L2 norm column for [[cosineWithNorms]] hoisting. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** min-max normalize a column over the whole frame, reproducing the
    * reference edge case: zero range → all ones
    * (reference src/hipporag/utils/misc_utils.py:130-139).
    *
    * Scale shape: aggregate once (map-side partial min/max), broadcast the
    * one-row bounds, project. A partition-less window would funnel the
    * ENTIRE table through one task — the classic global-window trap.
    */
  def minMaxNormalized(df: DataFrame, c: Column, outName: String): DataFrame = {
    val bounds = df.agg(min(c).as("__mn"), max(c).as("__mx"))
    df.crossJoin(broadcast(bounds))
      .withColumn(outName,
        when(col("__mx") === col("__mn"), lit(1.0))
          .otherwise((c - col("__mn")) / (col("__mx") - col("__mn"))))
      .drop("__mn", "__mx")
  }
}
