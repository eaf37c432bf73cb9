package graft.eval

import graft.SparkSpec

/** Hand-computed cases replicating reference arithmetic
  * (retrieval_eval.py:49-58, qa_eval.py:38-95, eval_utils.py:4-31).
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("recall@k: set-intersection over top-k, mean-pooled") {
    // q0: gold {d1,d2}; retrieved d1@1, d9@2, d2@3 → R@1=0.5, R@2=0.5, R@5=1.0
    // q1: gold {d5};     retrieved d5@1            → R@k=1.0 for all k
    val retrieved = Seq(
      (0L, "d1", 1), (0L, "d9", 2), (0L, "d2", 3),
      (1L, "d5", 1)).toDF("qid", "doc_id", "rank")
    val gold = Seq((0L, "d1"), (0L, "d2"), (1L, "d5")).toDF("qid", "doc_id")
    val r = Eval.recallAtK(retrieved, gold, Seq(1, 2, 5)).collect()
      .map(x => x.getAs[Int]("k") -> x.getAs[Double]("recall")).toMap
    assert(math.abs(r(1) - 0.75) < 1e-12)
    assert(math.abs(r(2) - 0.75) < 1e-12)
    assert(math.abs(r(5) - 1.0) < 1e-12)
  }

  test("EM/F1: normalization, token F1, max over golds") {
    val answers = Seq(
      (0L, "The Eiffel Tower!"),
      (1L, "paris france"),
      (2L, "no overlap here")).toDF("qid", "prediction")
    val golds = Seq(
      (0L, "eiffel tower"), (0L, "the tower"),
      (1L, "paris"),
      (2L, "totally different")).toDF("qid", "gold")
    val out = Eval.emF1(answers, golds).collect()
      .map(r => r.getAs[Long]("qid") -> (r.getAs[Double]("em"), r.getAs[Double]("f1"))).toMap
    assert(out(0L)._1 == 1.0 && out(0L)._2 == 1.0) // exact after normalize; max over golds
    assert(out(1L)._1 == 0.0)
    // pred "paris france" vs gold "paris": overlap 1, prec 1/2, rec 1 → F1 = 2/3
    assert(math.abs(out(1L)._2 - 2.0 / 3.0) < 1e-12)
    assert(out(2L) == (0.0, 0.0))
  }
}
