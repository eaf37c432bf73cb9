package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The spark-submit CLI surface ([[Jobs]]): parquet in, parquet out,
  * session injected (what spark-submit does minus the fork).
  */
class JobsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("cc job: arcs+vertices parquet -> component labels parquet") {
    val arcs = tmp("jobs_arcs"); val verts = tmp("jobs_verts"); val out = tmp("jobs_out")
    Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (3L, 4L, 1.0))
      .toDF("src", "dst", "weight").write.mode("overwrite").parquet(arcs)
    (0L to 5L).toDF("vid").write.mode("overwrite").parquet(verts)
    Jobs.run(spark, Seq("cc", arcs, verts, out))
    val got = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L, 5L -> 5L))
  }

  test("ppr job: encoded arcs + seeds -> scores; rerun with checkpoint dir resumes") {
    val arcs = tmp("jobs_parcs"); val seeds = tmp("jobs_seeds"); val out = tmp("jobs_pout")
    // symmetrized triangle 0-1-2
    Seq((0L, 1L, 1.0), (1L, 0L, 1.0), (1L, 2L, 1.0), (2L, 1L, 1.0),
        (0L, 2L, 1.0), (2L, 0L, 1.0))
      .toDF("src", "dst", "weight").write.mode("overwrite").parquet(arcs)
    Seq((0L, 0L, 1.0)).toDF("qid", "vid", "weight")
      .write.mode("overwrite").parquet(seeds)
    Jobs.run(spark, Seq("ppr", arcs, seeds, out))
    val scores = spark.read.parquet(out)
    assert(scores.count() == 3)
    val mass = scores.agg(sum("score")).first().getDouble(0)
    assert(math.abs(mass - 1.0) < 1e-9, s"PPR mass must be ~1 (got $mass)")
    // checkpointed variant lands on the same scores
    val out2 = tmp("jobs_pout2"); val ckpt = tmp("jobs_ckpt")
    Jobs.run(spark, Seq("ppr", arcs, seeds, out2, ckpt))
    val a = spark.read.parquet(out).orderBy("qid", "vid").collect().map(_.toString)
    val b = spark.read.parquet(out2).orderBy("qid", "vid").collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("index + retrieve jobs: docs parquet -> store -> ranked chunks parquet") {
    val docs = tmp("jobs_docs"); val store = tmp("jobs_store")
    val queries = tmp("jobs_q"); val out = tmp("jobs_rout")
    Seq("Alice visited Paris. Paris hosts Louvre.",
        "Bob founded Acme. Acme acquired Paris Office.")
      .toDF("text").write.mode("overwrite").parquet(docs)
    Jobs.run(spark, Seq("index", docs, store))
    Seq((0L, "where is the Louvre")).toDF("qid", "query")
      .write.mode("overwrite").parquet(queries)
    Jobs.run(spark, Seq("retrieve", store, queries, out))
    val got = spark.read.parquet(out)
    assert(got.count() > 0, "retrieval over the CLI-indexed store must serve")
    assert(got.columns.contains("rank") && got.columns.contains("chunk_id"))
  }

  test("walks job honors length/perVertex args; usage error on bad subcommand") {
    val arcs = tmp("jobs_warcs"); val verts = tmp("jobs_wverts"); val out = tmp("jobs_wout")
    Seq((0L, 1L), (1L, 0L)).toDF("src", "dst").write.mode("overwrite").parquet(arcs)
    (0L to 1L).toDF("vid").write.mode("overwrite").parquet(verts)
    Jobs.run(spark, Seq("walks", arcs, verts, out, "3", "1"))
    val got = spark.read.parquet(out)
    // 2 starts × 1 walk × 4 positions (steps 0..3; the 0<->1 cycle never dead-ends)
    assert(got.count() == 8)
    assert(got.agg(max("step")).first().getLong(0) == 3L)
    intercept[IllegalArgumentException](Jobs.run(spark, Seq("frobnicate")))
  }
}
