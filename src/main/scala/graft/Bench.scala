package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.algo.{Ppr, PprConfig, PprCsr}
import graft.graph.Adjacency

/** Round benchmark. Two parts:
  *
  * 1. Headline queries on SPARK_GRAFT_SF_DIR (graph build, dedup, KNN,
  *    CC/triangles, shuffle-path PPR) — wall-clock each, one JSON line.
  * 2. The north-rule scaling protocol (BASELINE.md): the SAME PPR job on
  *    the SAME synthetic Zipf-skewed pages graph at local[8] and local[32]
  *    (shuffle partitions scaled 4×) — throughput in traversed edges/sec
  *    and iterations/sec at both levels, efficiency = (thr32/thr8)/4.
  *    No real cluster exists in this sandbox; two parallelism levels on
  *    fixed input are the documented proxy (task brief).
  *
  * Results also land in BENCH.md.
  */
object Bench {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def session(cores: Int, shufflePartitions: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Build the synthetic pages graph once and persist arcs as parquet so
    * both parallelism levels read IDENTICAL input (same files, same
    * stats).
    */
  private def buildScalingInput(spark: SparkSession, nPages: Long, dir: String): (Long, Long) = {
    import graft.extract.Extract
    import graft.graph.GraphBuild
    val pages = graft.ingest.PageSynth.pagesDF(spark, nPages, nEntities = 2000)
    val chunks = Extract.chunks(pages, "text", Seq("url"))
    val triples = Extract.sentenceTriples(chunks)
    val edges = GraphBuild.edges(
      GraphBuild.factEdges(triples),
      GraphBuild.passageEdges(Extract.chunkEntities(triples)))
    val verts = GraphBuild.vertices(
      Extract.entities(Extract.chunkEntities(triples)),
      chunks.dropDuplicates("chunk_id"))
    val dict = graft.core.Ids.dictionary(verts.select("key"), "key")
    val arcs = Adjacency.encode(Adjacency.symmetrize(edges), dict)
    arcs.write.mode("overwrite").parquet(s"$dir/arcs")
    val nV = dict.count()
    val nE = spark.read.parquet(s"$dir/arcs").count()
    (nV, nE)
  }

  /** One scaling-level measurement: multi-query PPR (CSR broadcast path,
    * the throughput kernel) to 1e-6 L1 convergence; median of `reps`.
    */
  private def pprThroughput(spark: SparkSession, dir: String, nV: Long,
                            reps: Int): (Double, Double, Int, Double) = {
    val arcs = spark.read.parquet(s"$dir/arcs")
    val blocks = Adjacency.csrBlocks(spark, arcs,
      edgesPerBlock = math.max(1024, (arcs.count() /
        math.max(1, spark.sparkContext.defaultParallelism * 4)).toInt))
    blocks.persist().count()
    val outW = {
      val a = new Array[Double](nV.toInt)
      Adjacency.outWeights(arcs).collect()
        .foreach(r => a(r.getAs[Long]("src").toInt) = r.getAs[Double]("out_w"))
      a
    }
    val seeds = (0L until 4L).map(q => q -> Seq((q * 7 % nV, 1.0)))
    val runs = (1 to reps).map { _ =>
      val ((_, stats), wall) = timed(
        PprCsr.run(blocks, outW, seeds, PprConfig(damping = 0.5, tol = 1e-6 / nV)))
      (stats, wall)
    }
    val med = runs.sortBy(_._2).apply(runs.length / 2)
    val edgesPerSec = med._1.traversedEdges / med._2
    val itersPerSec = med._1.iterations.toDouble / med._2
    blocks.unpersist()
    (edgesPerSec, itersPerSec, med._1.iterations, med._2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val scalePages = sys.env.getOrElse("GRAFT_BENCH_PAGES", "60000").toLong

    // ---- Part 1: headline queries at the driver-given parallelism.
    val headline = Seq(
      "q05_triples", "q06_fact_edges", "q14_dedup_exact", "q15_minhash_lsh",
      "q16_simhash", "q17_ngram_jaccard", "q18_cosine_topk", "q20_lang_id",
      "q24_connected_components", "q25_triangles", "q27_ppr")
    val spark1 = session(cpus, cpus)
    val qTimes: Seq[(String, Double)] = headline.map { name =>
      val (_, t) = timed {
        try SparkEntry.queries(name)(spark1, sfDir).write.mode("overwrite")
          .format("noop").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); ()
        }
      }
      name -> t
    }

    // ---- Part 2: scaling protocol on the synthetic pages graph.
    val scaleDir = Files.createTempDirectory("graft_scale").toString
    val (nV, nE) = buildScalingInput(spark1, scalePages, scaleDir)
    spark1.stop()

    val results = Seq(8, 32).map { cores =>
      val s = session(cores, cores)
      val r = pprThroughput(s, scaleDir, nV, reps = 3)
      s.stop()
      cores -> r
    }.toMap
    val (e8, i8, it8, w8) = results(8)
    val (e32, i32, it32, w32) = results(32)
    val efficiency = (e32 / e8) / 4.0

    val qJson = qTimes.map { case (k, v) => s""""$k":${"%.3f".format(v)}""" }
      .mkString("{", ",", "}")
    val total = qTimes.map(_._2).sum
    val json =
      s"""{"metric":"total","value":${"%.3f".format(total)},"unit":"sec","queries":$qJson,"sf":"$sfDir",""" +
      s""""scaling":{"input":{"pages":$scalePages,"vertices":$nV,"arcs":$nE,"queries":4},""" +
      s""""local8":{"edges_per_sec":${"%.0f".format(e8)},"iters_per_sec":${"%.2f".format(i8)},"iters":$it8,"wall_sec":${"%.2f".format(w8)}},""" +
      s""""local32":{"edges_per_sec":${"%.0f".format(e32)},"iters_per_sec":${"%.2f".format(i32)},"iters":$it32,"wall_sec":${"%.2f".format(w32)}},""" +
      s""""efficiency":${"%.3f".format(efficiency)}}}"""
    println(json)

    val md =
      s"""# BENCH — measured (this round)
         |
         |## Headline queries (local[$cpus], $sfDir)
         |
         || query | seconds |
         ||---|---|
         |${qTimes.map { case (k, v) => s"| $k | ${"%.3f".format(v)} |" }.mkString("\n")}
         |
         |## PPR scaling protocol (north rule: efficiency ≥ 0.8 at N→4N)
         |
         |Fixed input: synthetic Zipf pages graph, $scalePages pages,
         |$nV vertices, $nE directed arcs, 4 simultaneous PPR queries
         |(damping 0.5, L1 tol 1e-6, CSR broadcast gather-scatter).
         |Median of 3 runs per level; shuffle partitions scaled with cores.
         |
         || level | wall sec | iterations | iters/sec | traversed edges/sec |
         ||---|---|---|---|---|
         || local[8]  | ${"%.2f".format(w8)} | $it8 | ${"%.2f".format(i8)} | ${"%.0f".format(e8)} |
         || local[32] | ${"%.2f".format(w32)} | $it32 | ${"%.2f".format(i32)} | ${"%.0f".format(e32)} |
         |
         |**Scaling efficiency (8→32 cores): ${"%.3f".format(efficiency)}**
         |""".stripMargin
    Files.writeString(Paths.get("BENCH.md"), md)
  }
}
