package org.apache.spark.sql.graftx

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, DoubleType, LongType}

/** Register-array HyperLogLog: the lean sketch kernel behind
  * [[graft.algo.Neighborhood.hyperball]].
  *
  * A sketch is a bare `Array[Byte]` of 2^lgK rho-registers — no header,
  * no mode machinery. Spark's builtin `hll_union_agg` (Datasketches)
  * heap-allocates a sketch object graph PER INPUT ROW on the merge path;
  * at HyperBall's E-sketch-merges-per-round that allocation churn was
  * measured to anti-scale 8→32 cores on a 24 GiB heap (HyperBallProbe:
  * engine 0.22 vs 0.69 for the same register-max loop on raw arrays).
  * These aggregates merge IN PLACE into the aggregation buffer —
  * serialize/deserialize are identity/clone on the raw registers, update
  * allocates nothing — so the hot loop is the byte-max the silicon was
  * measured to scale on.
  *
  * Estimation is classic HLL (Flajolet et al.): harmonic-mean raw
  * estimate with alpha_m bias constant, linear counting below 2.5·m when
  * empty registers remain; no large-range correction needed (64-bit
  * hash). Standard error ≈ 1.04/√(2^lgK) — same order as Datasketches
  * HLL_8 at equal lgK.
  */
object RegHll {
  val Seed = 0x48797042L // "HypB"

  def numRegisters(lgK: Int): Int = 1 << lgK

  /** rho-register update for one hashed item. */
  @inline def updateRegisters(regs: Array[Byte], h: Long, lgK: Int): Unit = {
    val idx = (h >>> (64 - lgK)).toInt
    val w = h << lgK
    // Leading-zeros count over the remaining 64-lgK bits, + 1; w == 0
    // degenerates to the max rho.
    val rho =
      if (w == 0L) (64 - lgK + 1).toByte
      else math.min(java.lang.Long.numberOfLeadingZeros(w) + 1, 64 - lgK + 1).toByte
    if (rho > regs(idx)) regs(idx) = rho
  }

  @inline def maxInPlace(into: Array[Byte], from: Array[Byte]): Unit = {
    val n = math.min(into.length, from.length)
    var i = 0
    while (i < n) { val v = from(i); if (v > into(i)) into(i) = v; i += 1 }
  }

  private val invPow2: Array[Double] = Array.tabulate(64)(i => math.pow(2.0, -i))

  def estimate(regs: Array[Byte]): Double = {
    val m = regs.length
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = regs(i) & 0xff
      sum += invPow2(r)
      if (r == 0) zeros += 1
      i += 1
    }
    val alpha =
      if (m >= 128) 0.7213 / (1.0 + 1.079 / m)
      else if (m == 64) 0.709
      else if (m == 32) 0.697
      else 0.673
    val raw = alpha * m * m / sum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }
}

/** Common shell: byte-array buffer, identity serialization. */
trait RegHllAggBase extends TypedImperativeAggregate[Array[Byte]] {
  def lgK: Int
  require(lgK >= 4 && lgK <= 20, s"lgK out of range: $lgK")
  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](RegHll.numRegisters(lgK))
  override def merge(buffer: Array[Byte], input: Array[Byte]): Array[Byte] = {
    RegHll.maxInPlace(buffer, input); buffer
  }
  override def eval(buffer: Array[Byte]): Any = buffer
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storageFormat: Array[Byte]): Array[Byte] = storageFormat
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** reg_hll_agg(vid, lgK): build a sketch of the distinct longs in the
  * group. Update path: one xxhash64 + one register max, zero allocation.
  */
case class RegHllInitAgg(child: Expression, lgK: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends RegHllAggBase with ExpectsInputTypes with UnaryLike[Expression] {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def prettyName: String = "reg_hll_agg"
  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null)
      RegHll.updateRegisters(buffer,
        XXH64.hashLong(v.asInstanceOf[Long], RegHll.Seed), lgK)
    buffer
  }
  override def withNewMutableAggBufferOffset(newOffset: Int): RegHllInitAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RegHllInitAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): RegHllInitAgg =
    copy(child = newChild)
}

/** reg_hll_union_agg(sketch, lgK): union sketches in the group by
  * register max, in place on the aggregation buffer.
  */
case class RegHllUnionAgg(child: Expression, lgK: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends RegHllAggBase with ExpectsInputTypes with UnaryLike[Expression] {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def prettyName: String = "reg_hll_union_agg"
  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) RegHll.maxInPlace(buffer, v.asInstanceOf[Array[Byte]])
    buffer
  }
  override def withNewMutableAggBufferOffset(newOffset: Int): RegHllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RegHllUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): RegHllUnionAgg =
    copy(child = newChild)
}

/** reg_hll_estimate(sketch): distinct-count estimate (double). */
case class RegHllEstimate(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "reg_hll_estimate"
  override def nullSafeEval(input: Any): Any =
    RegHll.estimate(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): RegHllEstimate =
    copy(child = newChild)
}

/** reg_hll_union(a, b): register-max of two sketches (fresh array). */
case class RegHllUnion(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "reg_hll_union"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val out = java.util.Arrays.copyOf(x, x.length)
    RegHll.maxInPlace(out, y)
    out
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): RegHllUnion =
    copy(left = newLeft, right = newRight)
}
