package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k heap as a typed Aggregator (SURVEY.md §2.10: the custom
  * aggregate the engine actually needs — reference two-level topk-of-topks,
  * src/hipporag/utils/embed_utils.py:55-75).
  *
  * Used through `groupBy(qid).agg(topK(...))`, Spark's partial aggregation
  * runs `reduce` map-side inside each scan partition and only ships k
  * candidates per (partition, group) to the exchange — the shuffled volume
  * is O(groups · k · partitions), never O(rows).
  *
  * Ordering: score desc, then key asc (deterministic tie-break; the
  * reference's torch topk tie order is unspecified).
  */
case class ScoredKey(kid: String, score: Double)

class TopKAgg(k: Int) extends Aggregator[ScoredKey, Seq[ScoredKey], Seq[ScoredKey]] {
  private val pruneAt = math.max(2 * k, 64)

  private def prune(b: Seq[ScoredKey], limit: Int): Seq[ScoredKey] =
    b.sortBy(s => (-s.score, s.kid)).take(limit)

  override def zero: Seq[ScoredKey] = Vector.empty

  override def reduce(b: Seq[ScoredKey], a: ScoredKey): Seq[ScoredKey] = {
    val nb = b :+ a
    if (nb.size > pruneAt) prune(nb, k) else nb
  }

  override def merge(b1: Seq[ScoredKey], b2: Seq[ScoredKey]): Seq[ScoredKey] = {
    val nb = b1 ++ b2
    if (nb.size > pruneAt) prune(nb, k) else nb
  }

  override def finish(r: Seq[ScoredKey]): Seq[ScoredKey] = prune(r, k)

  override def bufferEncoder: Encoder[Seq[ScoredKey]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredKey]] = ExpressionEncoder()
}

object TopKAgg {
  /** Column aggregate: (kid string, score double) → array of the k
    * highest-scored entries, sorted (score desc, kid asc).
    */
  def topK(k: Int)(kid: Column, score: Column): Column =
    udaf(new TopKAgg(k), Encoders.product[ScoredKey]).apply(kid, score)
}
