package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.TextOps

/** Retrieval / QA evaluation, replicating the reference arithmetic.
  *
  * Recall@k (reference src/hipporag/evaluation/retrieval_eval.py:24-74):
  * per example, |retrieved[:k] ∩ gold| / |gold|, pooled by mean over
  * examples. EM / F1 (qa_eval.py:19-95 + eval_utils.py:4-31): answers are
  * `normalize_answer`-ed; per example the MAX over gold answers is taken
  * (np.max pooling), then mean over examples.
  */
object Eval {

  /** @param retrieved (qid, doc_id, rank) — rank 1-based
    * @param gold (qid, doc_id)
    * @return (k, recall) mean recall@k for each k
    */
  def recallAtK(retrieved: DataFrame, gold: DataFrame, ks: Seq[Int]): DataFrame = {
    val goldSizes = gold.groupBy("qid").agg(count(lit(1)).as("n_gold"))
    val hits = retrieved.join(gold, Seq("qid", "doc_id"))
    val perK = ks.map { k =>
      hits.where(col("rank") <= k)
        .groupBy("qid").agg(count(lit(1)).as("n_hit"))
        .join(goldSizes, Seq("qid"), "right")
        .select(col("qid"),
          (coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_gold")).as("recall"))
        .agg(avg("recall").as("recall"))
        .select(lit(k).as("k"), col("recall"))
    }
    perK.reduce(_ unionAll _)
  }

  /** Exact match: normalized prediction equals any normalized gold.
    * @param answers (qid, prediction); golds (qid, gold) possibly many
    * @return (qid, em, f1) per question
    */
  def emF1(answers: DataFrame, golds: DataFrame): DataFrame = {
    val pred = answers.select(col("qid"),
      TextOps.normalizeAnswer(col("prediction")).as("p"))
    val gold = golds.select(col("qid"),
      TextOps.normalizeAnswer(col("gold")).as("g"))
    val joined = pred.join(gold, "qid")
      .withColumn("ptoks", TextOps.tokens(col("p")))
      .withColumn("gtoks", TextOps.tokens(col("g")))
    // token-overlap F1 with multiplicity (Counter-intersection semantics):
    // for each distinct token, min(count_pred, count_gold), summed.
    val overlap = joined
      .select(col("qid"), col("p"), col("g"), col("ptoks"), col("gtoks"),
        explode_outer(array_distinct(col("ptoks"))).as("t"))
      .withColumn("cp", size(filter(col("ptoks"), x => x === col("t"))))
      .withColumn("cg", size(filter(col("gtoks"), x => x === col("t"))))
      .groupBy("qid", "p", "g", "ptoks", "gtoks")
      .agg(sum(least(col("cp"), col("cg"))).as("num_same"))
    val scored = overlap.select(col("qid"),
      when(col("p") === col("g"), 1.0).otherwise(0.0).as("em"),
      when(col("num_same") <= 0 || size(col("ptoks")) === 0 || size(col("gtoks")) === 0, 0.0)
        .otherwise {
          val prec = col("num_same").cast("double") / size(col("ptoks"))
          val rec = col("num_same").cast("double") / size(col("gtoks"))
          lit(2.0) * prec * rec / (prec + rec)
        }.as("f1"))
    // np.max pooling over multiple golds per question
    scored.groupBy("qid").agg(max("em").as("em"), max("f1").as("f1"))
  }

  /** Corpus means (the reference's pooled report). */
  def pooled(perQuestion: DataFrame): DataFrame =
    perQuestion.agg(avg("em").as("em"), avg("f1").as("f1"))
}
