package graft.bench

import org.apache.spark.sql.SparkSession

import graft.algo.{PprConfig, PprShard}

/** Spark-harness counterpart of [[KernelProbe]]: same synthetic CSR, same
  * query stream, but through PprShard.run (broadcast + mapPartitions +
  * Dataset encoding) at local[8] vs local[32] — isolates scheduler /
  * encoder / GC overhead from the kernel itself.
  */
object SparkScaleProbe {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"scale-probe-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.broadcast.compress", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val nV = if (args.length > 0) args(0).toInt else 4096
    val avgDeg = if (args.length > 1) args(1).toInt else 220
    val nQ = if (args.length > 2) args(2).toInt else 8192
    val batch = if (args.length > 3) args(3).toInt else 16
    val topK = if (args.length > 4) args(4).toInt else 50
    val csr = KernelProbe.synthCsr(nV, avgDeg)
    val cfg = PprConfig(damping = 0.5, tol = 1e-6 / nV)
    val seeds = (0L until nQ.toLong).map(q => q -> Seq((q * 31 % nV, 1.0)))
    println(s"csr: nV=$nV arcs=${csr.nEdges} queries=$nQ batch=$batch topK=$topK")
    for (cores <- Seq(8, 32, 8, 32)) {
      val s = session(cores)
      val shards = math.max(1, (nQ + batch - 1) / batch)
      val runner = new PprShard.Runner(s, csr, batchSize = batch)
      runner.run(seeds.take(256), cfg, numShards = 8, topK = topK)._1.unpersist()
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val (scores, stats) = runner.run(seeds, cfg,
          numShards = shards, topK = topK)
        scores.unpersist()
        val w = (System.nanoTime() - t0) / 1e9
        (w, stats.iterations)
      }
      runner.close()
      val med = walls.map(_._1).sorted.apply(1)
      println(f"cores=$cores%2d walls=${walls.map(w => f"${w._1}%.2f").mkString(",")} " +
        f"median=$med%.2fs q/s=${nQ / med}%.1f iters=${walls.head._2}")
      s.stop()
    }
  }
}
