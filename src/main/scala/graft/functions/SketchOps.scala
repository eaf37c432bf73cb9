package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftx

/** Column wrappers over the register-array HLL kernel
  * ([[org.apache.spark.sql.graftx.RegHll]]) — the allocation-free
  * replacement for the Datasketches hll_* builtins on HyperBall's
  * E-merges-per-round hot path.
  */
object SketchOps {

  /** Aggregate: sketch of the group's distinct LONG values. */
  def regHllAgg(vid: Column, lgK: Int): Column =
    graftx.column(
      graftx.RegHllInitAgg(graftx.expression(vid), lgK).toAggregateExpression())

  /** Aggregate: register-max union of the group's sketches. */
  def regHllUnionAgg(sketch: Column, lgK: Int): Column =
    graftx.column(
      graftx.RegHllUnionAgg(graftx.expression(sketch), lgK).toAggregateExpression())

  /** Scalar: distinct-count estimate of a sketch (double). */
  def regHllEstimate(sketch: Column): Column =
    graftx.column(graftx.RegHllEstimate(graftx.expression(sketch)))

  /** Scalar: register-max union of two sketches. */
  def regHllUnion(a: Column, b: Column): Column =
    graftx.column(graftx.RegHllUnion(graftx.expression(a), graftx.expression(b)))
}
