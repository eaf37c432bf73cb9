package graft.algo

import org.apache.spark.sql.DataFrame

import graft.{Goldens, SparkSpec}
import graft.graph.Adjacency

class PprSpec extends SparkSpec {
  import spark.implicits._

  private def arcsOf(g: Goldens.Golden): DataFrame =
    Adjacency.symmetrize(g.edges.toDF("src", "dst", "weight"))

  private def seedsOf(cases: Seq[Goldens.PprCase]): DataFrame =
    cases.flatMap(c => c.seeds.map { case (v, w) => (c.qid, v, w) })
      .toDF("qid", "vid", "weight")

  private def denseScores(df: DataFrame, qid: Long, n: Int): Array[Double] = {
    val a = new Array[Double](n)
    df.where($"qid" === qid).collect()
      .foreach(r => a(r.getAs[Long]("vid").toInt) = r.getAs[Double]("score"))
    a
  }

  for (name <- Goldens.all) {
    val g = Goldens.load(name)
    val byDamping = g.ppr.groupBy(_.damping)

    for ((damping, cases) <- byDamping.toSeq.sortBy(_._1)) {
      // The shuffle path pays per-iteration job overhead in tests; run it
      // on d=0.5 everywhere (the reference default) and d=0.85 only on the
      // small fixture. tol=1e-8 keeps the fixpoint distance well under the
      // 1e-6 assertion while halving iterations. The CSR path is cheap and
      // stays exhaustive at 1e-12.
      if (damping == 0.5 || name == "smoke") {
        test(s"DF PPR matches networkx golden [$name, d=$damping] to 1e-6") {
          val (scores, stats) = Ppr.run(
            spark, arcsOf(g), g.nVertices, seedsOf(cases),
            PprConfig(damping = damping, tol = 1e-8))
          assert(stats.converged, s"did not converge in ${stats.iterations} iters")
          for (c <- cases) {
            val got = denseScores(scores, c.qid, g.nVertices)
            val maxDiff = got.zip(c.scores).map { case (a, b) => math.abs(a - b) }.max
            assert(maxDiff < 1e-6, s"qid=${c.qid} maxDiff=$maxDiff")
          }
        }
      }

      if (name == "smoke" && damping == 0.5) {
        test("runFrame: 64 dense-seeded queries, multiple shards, == driver-seed path") {
          // The serving shape the distributed path exists for: every query
          // seeds EVERY vertex (the Retriever's dense passage weights) —
          // the seed frame is Q×V rows and must never be driver-collected.
          val csr = graft.bench.KernelProbe.synthCsr(512, 24, seed = 9L)
          val runner = new PprShard.Runner(spark, csr, batchSize = 64)
          val cfg = PprConfig(damping = 0.5, tol = 1e-10)
          val nQ = 64
          val seedSeq = (0L until nQ.toLong).map(q =>
            q -> (0 until csr.nV).map(v => (v.toLong, 1.0 + ((v * 31 + q * 7) % 13))))
          val seedRows = seedSeq.flatMap { case (q, vw) => vw.map { case (v, w) => (q, v, w) } }
          val (a, _) = runner.run(seedSeq, cfg, numShards = 1)
          val (b, statsB) = runner.runFrame(seedRows.toDF("qid", "vid", "weight"),
            cfg, numShards = 1)
          assert(statsB.converged)
          for (q <- 0L until nQ.toLong) {
            val ga = denseScores(a, q, csr.nV)
            val gb = denseScores(b, q, csr.nV)
            assert(ga.sameElements(gb), s"qid=$q dense-seed runFrame != run")
          }
          a.unpersist(); b.unpersist()
          // and with several shards the fixpoint is the same to ~machine eps
          val (c, _) = runner.runFrame(seedRows.toDF("qid", "vid", "weight"),
            cfg, numShards = 8)
          for (q <- 0L until nQ.toLong) {
            val ga = denseScores(a, q, csr.nV)
            val gc = denseScores(c, q, csr.nV)
            val maxDiff = ga.zip(gc).map { case (x, y) => math.abs(x - y) }.max
            assert(maxDiff < 1e-9, s"qid=$q sharded maxDiff=$maxDiff")
          }
          c.unpersist()
          runner.close()
        }

        test("query-sharded runFrame (distributed seed frame) == run (driver seeds)") {
          // Single shard + one batch covering all queries: identical batch
          // membership on both paths, so scores must be BITWISE equal —
          // each query's column in the vertex-major state is fp-independent
          // of its batch peers.
          val csr = PprShard.buildLocal(arcsOf(g), g.nVertices)
          val runner = new PprShard.Runner(spark, csr, batchSize = 64)
          val cfg = PprConfig(damping = damping, tol = 1e-12)
          val seedSeq = cases.map(c => c.qid -> c.seeds.map { case (v, w) => (v, w) })
          val (a, _) = runner.run(seedSeq, cfg, numShards = 1)
          val (b, _) = runner.runFrame(seedsOf(cases), cfg, numShards = 1)
          for (c <- cases) {
            val ga = denseScores(a, c.qid, g.nVertices)
            val gb = denseScores(b, c.qid, g.nVertices)
            assert(ga.sameElements(gb), s"qid=${c.qid} runFrame != run")
          }
          a.unpersist(); b.unpersist()
          runner.close()
        }

        test("bounded-heap topK emission == full sort") {
          val csr = PprShard.buildLocal(arcsOf(g), g.nVertices)
          val seedSeq = cases.map(c => c.qid -> c.seeds.map { case (v, w) => (v, w) })
          val cfg = PprConfig(damping = damping, tol = 1e-12)
          val (full, _) = PprShard.run(spark, csr, seedSeq, cfg, numShards = 1)
          val (top, _) = PprShard.run(spark, csr, seedSeq, cfg, numShards = 1, topK = 5)
          for (c <- cases) {
            val expect = full.where($"qid" === c.qid).collect()
              .map(r => (r.getAs[Long]("vid"), r.getAs[Double]("score")))
              .sortBy { case (v, s) => (-s, v) }.take(5).toSeq
            val got = top.where($"qid" === c.qid).collect()
              .map(r => (r.getAs[Long]("vid"), r.getAs[Double]("score")))
              .sortBy { case (v, s) => (-s, v) }.toSeq
            assert(got == expect, s"qid=${c.qid} heap top-k mismatch")
          }
          full.unpersist(); top.unpersist()
        }
      }

      test(s"query-sharded PPR matches golden [$name, d=$damping]") {
        val csr = PprShard.buildLocal(arcsOf(g), g.nVertices)
        val seeds = cases.map(c => c.qid -> c.seeds.map { case (v, w) => (v, w) })
        val (scores, stats) = PprShard.run(spark, csr, seeds,
          PprConfig(damping = damping, tol = 1e-12))
        assert(stats.converged)
        for (c <- cases) {
          val got = denseScores(scores, c.qid, g.nVertices)
          val maxDiff = got.zip(c.scores).map { case (a, b) => math.abs(a - b) }.max
          assert(maxDiff < 1e-6, s"qid=${c.qid} maxDiff=$maxDiff")
        }
        scores.unpersist()
      }

      test(s"CSR PPR matches golden and DF path [$name, d=$damping]") {
        val arcs = arcsOf(g)
        val outW = {
          val a = new Array[Double](g.nVertices)
          Adjacency.outWeights(arcs).collect()
            .foreach(r => a(r.getAs[Long]("src").toInt) = r.getAs[Double]("out_w"))
          a
        }
        val blocks = Adjacency.csrBlocks(spark, arcs, edgesPerBlock = 64)
        val seeds = cases.map(c => c.qid -> c.seeds.map { case (v, w) => (v, w) })
        val (scores, stats) = PprCsr.run(blocks, outW, seeds,
          PprConfig(damping = damping, tol = 1e-12))
        assert(stats.converged)
        val byQ = scores.toMap
        for (c <- cases) {
          val got = byQ(c.qid)
          val maxDiff = got.zip(c.scores).map { case (a, b) => math.abs(a - b) }.max
          assert(maxDiff < 1e-6, s"qid=${c.qid} maxDiff=$maxDiff")
        }
      }
    }
  }

  test("PPR is invariant to partitioning (local[4]: 2 vs 16 shuffle partitions)") {
    val g = Goldens.load("zipf")
    val cases = g.ppr.filter(_.damping == 0.5)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def runWith(parts: String): Map[(Long, Long), Double] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val (scores, _) = Ppr.run(spark, arcsOf(g), g.nVertices, seedsOf(cases),
          PprConfig(damping = 0.5, tol = 1e-8))
        scores.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val a = runWith("2")
    val b = runWith("16")
    assert(a.keySet == b.keySet)
    // Same double-precision algorithm; only float reorder noise may differ.
    val maxDiff = a.map { case (k, v) => math.abs(v - b(k)) }.max
    assert(maxDiff < 1e-12, s"partitioning changed scores by $maxDiff")
  }

  test("q27 output matches the committed golden exactly (driver value-oracle pin)") {
    // The q27 driver oracle reads this committed parquet (Oracles.scala);
    // this pin makes `sbt test` fail BEFORE the driver would, whenever
    // extraction/graph/PPR changes move the converged scores. Provenance:
    // scripts/check_q27_golden.py validates the golden against an
    // independent DuckDB+networkx recomputation (max diff 5e-10 = the
    // round-9 granularity). Regenerate: sbt "Test/runMain graft.GenQ27Golden".
    val live = graft.entry.DocQueries.qPpr(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val gold = spark.read.parquet(
        "src/test/resources/goldens/q27_sf0.001.parquet")
      .collect().map(r => r.getAs[String]("key") -> r.getAs[Double]("score")).toMap
    assert(live.keySet == gold.keySet,
      s"nonzero vertex sets differ by ${(live.keySet diff gold.keySet).size} + " +
      s"${(gold.keySet diff live.keySet).size}")
    assert(live.forall { case (k, v) => v == gold(k) },
      "round-9 scores must match the committed golden bitwise")
  }

  test("PPR resumes mid-convergence from checkpoint with identical scores") {
    val g = Goldens.load("smoke")
    val cases = g.ppr.filter(_.damping == 0.5)
    val dir = java.nio.file.Files.createTempDirectory("ppr_ckpt").toString

    // Full run, checkpointing every 3 iterations.
    val (full, fullStats) = Ppr.run(spark, arcsOf(g), g.nVertices, seedsOf(cases),
      PprConfig(damping = 0.5, tol = 1e-12, checkpointEvery = 3, checkpointDir = Some(dir)))
    val fullMap = full.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // Simulate a kill at iteration k: drop checkpoints after the first one,
    // then resume from what's left.
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val kept = 3
    fs.listStatus(new org.apache.hadoop.fs.Path(dir)).foreach { st =>
      val it = st.getPath.getName.stripPrefix("iter=").toInt
      if (it > kept) fs.delete(st.getPath, true)
    }
    val (resumed, resStats) = Ppr.resume(spark, arcsOf(g), g.nVertices, seedsOf(cases),
      PprConfig(damping = 0.5, tol = 1e-12, checkpointEvery = 3, checkpointDir = Some(dir)))
    val resMap = resumed.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    assert(resStats.iterations == fullStats.iterations, "resume must replay the same schedule")
    assert(fullMap.keySet == resMap.keySet)
    val maxDiff = fullMap.map { case (k, v) => math.abs(v - resMap(k)) }.max
    assert(maxDiff == 0.0, s"resumed scores differ by $maxDiff")
  }
}
