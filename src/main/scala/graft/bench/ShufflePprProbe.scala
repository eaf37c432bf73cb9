package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.algo.{Ppr, PprConfig, PprShard}
import graft.graph.Adjacency

/** Cross-strategy equivalence AT SCALE for the beyond-memory PPR path:
  * the fully distributed shuffle gather-scatter ([[Ppr]], the strategy a
  * graph ≫ executor memory falls back to) against the query-sharded
  * broadcast kernel on the SAME 12.8M-arc Zipf graph the scaling bench
  * uses. The unit fixtures pin both to networkx on small graphs; this
  * probe pins them to EACH OTHER where the broadcast path is known-good
  * and the shuffle path is the one that must be trusted at 100 TB.
  *
  *   sbt "runMain graft.bench.ShufflePprProbe [nV] [nSamples] [nQ]"
  */
object ShufflePprProbe {
  def main(args: Array[String]): Unit = {
    val nV = if (args.length > 0) args(0).toInt else 65536
    val nSamples = if (args.length > 1) args(1).toLong else 6500000L
    val nQ = if (args.length > 2) args(2).toInt else 4
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-shuffle-ppr-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Same deterministic Zipf arc construction as Bench.writeScalingArcs.
    val u1 = pmod(xxhash64(col("id"), lit(1)), lit(1000000000L)).cast("double") / 1e9
    val u2 = pmod(xxhash64(col("id"), lit(2)), lit(1000000000L)).cast("double") / 1e9
    val raw = spark.range(0L, nSamples, 1L, 192)
      .select(floor(u1 * u1 * nV).cast("long").as("src"),
              floor(u2 * u2 * nV).cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).cast("double").as("weight"))
    val arcs = Adjacency.symmetrize(raw)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nArcs = arcs.count()
    println(s"[probe] graph: $nV vertices, $nArcs symmetrized arcs")

    val seeds = (0 until nQ).map(q => (q.toLong, (q * 977L + 13L) % nV, 1.0))
      .toDF("qid", "vid", "weight")
    val cfg = PprConfig(damping = 0.5, tol = 1e-8)

    val t1 = System.nanoTime()
    val (dfScores, dfStats) = Ppr.run(spark, arcs, nV.toLong, seeds, cfg)
    val dfMap = dfScores.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val wallShuffle = (System.nanoTime() - t1) / 1e9

    val t2 = System.nanoTime()
    val csr = PprShard.buildLocal(arcs, nV)
    val (shardScores, _) = PprShard.run(spark,
      csr, (0 until nQ).map(q => q.toLong -> Seq(((q * 977L + 13L) % nV, 1.0))), cfg)
    val shardMap = shardScores.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val wallShard = (System.nanoTime() - t2) / 1e9

    val keys = dfMap.keySet ++ shardMap.keySet
    val maxDiff = keys.iterator
      .map(k => math.abs(dfMap.getOrElse(k, 0.0) - shardMap.getOrElse(k, 0.0))).max
    println(f"[probe] shuffle path: ${wallShuffle}%.1fs (${dfStats.iterations} iters, " +
      f"converged=${dfStats.converged}); broadcast kernel: ${wallShard}%.1fs")
    println(f"[probe] ${dfMap.size} vs ${shardMap.size} nonzero scores, " +
      f"max |shuffle - kernel| = $maxDiff%.2e")
    require(maxDiff < 1e-6, s"strategies diverged: $maxDiff")
    println("[probe] STRATEGIES AGREE at scale")
    spark.stop()
  }
}
