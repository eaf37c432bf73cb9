package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.RegHll

import graft.SparkSpec

/** Register-array HLL kernel: estimate accuracy against exact distinct
  * counts across regimes (linear-counting and raw-HLL), union semantics,
  * and agreement between the frame aggregates and the driver-side kernel.
  */
class RegHllSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side sketch of a set of longs via the same kernel. */
  private def sketchOf(xs: Seq[Long], lgK: Int): Array[Byte] = {
    val regs = new Array[Byte](RegHll.numRegisters(lgK))
    xs.foreach { x =>
      RegHll.updateRegisters(regs,
        org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(x, RegHll.Seed), lgK)
    }
    regs
  }

  test("estimate tracks exact distinct counts in both regimes") {
    // lgK=12 (m=4096): n=300 is linear counting, n=100000 is raw HLL.
    for ((n, tol) <- Seq(300 -> 0.02, 5000 -> 0.05, 100000 -> 0.05)) {
      val est = RegHll.estimate(sketchOf((1L to n.toLong).map(_ * 7919L), 12))
      assert(math.abs(est - n) / n < tol, s"n=$n est=$est")
    }
    // Small sketch, big set: raw-HLL regime error ~1.04/sqrt(1024)=3.3%.
    val est10 = RegHll.estimate(sketchOf((1L to 50000L).map(_ * 104729L), 10))
    assert(math.abs(est10 - 50000) / 50000 < 0.1, s"est=$est10")
  }

  test("empty and singleton sketches") {
    assert(RegHll.estimate(new Array[Byte](1 << 12)) == 0.0)
    val one = RegHll.estimate(sketchOf(Seq(42L), 12))
    assert(math.abs(one - 1.0) < 0.01, s"singleton est=$one")
  }

  test("union is register-max: |A ∪ B| from merged sketch, idempotent") {
    val a = sketchOf((1L to 400L), 12)
    val b = sketchOf((201L to 600L), 12)
    val u = java.util.Arrays.copyOf(a, a.length)
    RegHll.maxInPlace(u, b)
    val est = RegHll.estimate(u)
    assert(math.abs(est - 600.0) / 600.0 < 0.03, s"union est=$est")
    // Union with itself changes nothing (the dirty-flag invariant).
    val u2 = java.util.Arrays.copyOf(u, u.length)
    RegHll.maxInPlace(u2, u)
    assert(java.util.Arrays.equals(u, u2))
  }

  test("frame aggregates agree with the driver-side kernel") {
    val n = 2000
    val df = (1L to n.toLong).toDF("vid")
      .withColumn("g", col("vid") % 4)
    // reg_hll_agg per group, then reg_hll_union_agg across groups ==
    // one sketch of everything; estimates must agree bitwise with the
    // driver-side kernel over the same values.
    val grouped = df.groupBy("g").agg(SketchOps.regHllAgg(col("vid"), 12).as("sk"))
    val total = grouped.agg(SketchOps.regHllUnionAgg(col("sk"), 12).as("sk"))
      .select(SketchOps.regHllEstimate(col("sk"))).first().getDouble(0)
    val want = RegHll.estimate(sketchOf((1L to n.toLong), 12))
    assert(total == want, s"frame=$total driver=$want")
    // Scalar union path gives the same sketch as the aggregate union.
    val sks = grouped.orderBy("g").collect().map(_.getAs[Array[Byte]]("sk"))
    val scalarUnion = sks.reduce { (x, y) =>
      val out = java.util.Arrays.copyOf(x, x.length); RegHll.maxInPlace(out, y); out
    }
    val viaScalar = grouped.agg(collect_list(col("sk")).as("l"))
      .select(explode(col("l")).as("sk"))
      .agg(SketchOps.regHllUnionAgg(col("sk"), 12).as("sk"))
      .select(col("sk")).first().getAs[Array[Byte]]("sk")
    assert(java.util.Arrays.equals(scalarUnion, viaScalar))
  }
}
