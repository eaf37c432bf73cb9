package graft.algo

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Dedup

/** Determinism under TASK RETRY (round-5 verdict ask #5). At 100 TB task
  * retries and speculative execution are routine; the engine's
  * determinism claims (walks q47, MinHash q15) were previously tested
  * only on clean runs. Here a test-only mapPartitions throws on the FIRST
  * attempt of one partition per stage (TaskContext.attemptNumber-gated),
  * the scheduler retries it (TestSpark runs `local[4,2]` = maxFailures 2),
  * and the pipeline output must be identical to the clean run — which
  * holds exactly because every "random" choice is a pure hash of row
  * content, never of partition iteration order, attempt number, or JVM
  * randomness (the reproducibility rationale in Walks.scala:8-14,
  * Dedup's portable-md5 MinHash).
  */
class RetrySpec extends SparkSpec {
  import spark.implicits._

  /** Pass-through that fails the first attempt of partition 0 of every
    * stage that evaluates it (each retry sees attemptNumber >= 1 and
    * succeeds). Row-identical on the surviving attempt.
    */
  private def failFirstAttempt(df: DataFrame): DataFrame = {
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.Encoders.row(df.schema)
    df.mapPartitions { it =>
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0)
        throw new RuntimeException(
          "injected first-attempt failure (RetrySpec) — the scheduler must retry this task")
      it
    }
  }

  /** Run `body` while counting failed-task events; returns (result, n). */
  private def countingFailures[A](body: => A): (A, Int) = {
    val failures = new java.util.concurrent.atomic.AtomicInteger
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.reason != org.apache.spark.Success) failures.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = body
      // The listener bus is async; give it a moment to drain.
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (failures.get() == 0 && System.nanoTime() < deadline) Thread.sleep(50)
      (r, failures.get())
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("q15 MinHash/LSH pipeline is bit-identical under injected task retry") {
    val docs = (0 until 60).map { i =>
      val words = (0 until 30).map(j => s"w${(i * 7 + j * j) % 40}").mkString(" ")
      (s"d$i", words)
    }.toDF("doc_id", "text")
    def pipeline(d: DataFrame): (Seq[String], Seq[String]) = {
      val sh = Dedup.shingleRows(d, "text", "doc_id", 3)
      val sigs = Dedup.minHashSignaturesFrom(sh, numHashes = 16)
      val cands = Dedup.minHashCandidates(sigs, bands = 4, rowsPerBand = 4)
      (sigs.collect().map(_.toString).sorted.toSeq,
        cands.collect().map(_.toString).sorted.toSeq)
    }
    val clean = pipeline(docs)
    val (got, nFailed) = countingFailures(pipeline(failFirstAttempt(docs)))
    assert(nFailed >= 1, "the injected failure must actually have failed a task")
    assert(got._1 == clean._1, "MinHash signatures must survive task retry bit-identically")
    assert(got._2 == clean._2, "LSH candidate pairs must survive task retry bit-identically")
  }

  test("q47 random-walk corpus is bit-identical under injected task retry") {
    val arcs = (0 until 200).map { i =>
      ((i * 13 % 50).toLong, (i * 29 % 50).toLong)
    }.filter { case (s, d) => s != d }.toDF("src", "dst")
    val verts = (0L until 50L).toDF("vid")
    def corpus(a: DataFrame): Seq[String] =
      Walks.randomWalks(a, verts, walkLen = 8, walksPerVertex = 2)
        .collect().map(_.toString).sorted.toSeq
    val clean = corpus(arcs)
    val (got, nFailed) = countingFailures(corpus(failFirstAttempt(arcs)))
    assert(nFailed >= 1, "the injected failure must actually have failed a task")
    assert(got == clean, "the walk corpus must survive task retry bit-identically")
  }
}
