package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test run. */
object TestSpark {
  lazy val spark: SparkSession = {
    // local[4,2]: maxFailures = 2, so an injected first-attempt task
    // failure RETRIES instead of killing the job — RetrySpec pins that
    // the deterministic pipelines (walks, MinHash) survive task retry
    // bit-identically, the way speculative execution / lost executors
    // exercise them at 100 TB. Genuine test failures still fail (one
    // extra attempt), and every other suite is retry-oblivious.
    val s = SparkSession.builder()
      .master("local[4,2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}
