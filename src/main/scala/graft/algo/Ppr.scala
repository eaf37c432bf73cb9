package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Personalized PageRank, multi-query, matching igraph/networkx semantics.
  *
  * Reference call (src/hipporag/HippoRAG.py:1709-1749):
  * `personalized_pagerank(vertices=all, damping=0.5, directed=False,
  * weights='weight', reset=seed, implementation='prpack')` with reset
  * NaN/negative → 0 (L1735). The equivalent fixpoint (networkx
  * `_pagerank_python`, the committed-golden oracle):
  *
  *   p        = reset / Σreset                      (normalized per query)
  *   x₀       = p
  *   x'(v)    = α·( Σ_{u→v} x(u)·w(u,v)/outW(u) + danglesum·p(v) ) + (1−α)·p(v)
  *   danglesum = Σ_{u: outW(u)=0} x(u)
  *   stop when Σ_v |x'−x| < N·tol                   (per query)
  *
  * `arcs` must be the SYMMETRIZED simple digraph (both directions, parallel
  * weights summed — [[graft.graph.Adjacency.symmetrize]]), which reproduces
  * the reference's undirected weighted multigraph exactly (SURVEY.md §1.2).
  *
  * State is a sparse (qid, vid, x) frame — many queries converge inside ONE
  * iterative job (SURVEY.md §3.2(b)). Per iteration: one join (ranks⋈arcs —
  * broadcast when ranks are small, else sort-merge with AQE skew split),
  * one groupBy(dst) (map-side partial aggregation absorbs Zipf-hub in-degree
  * skew), one Q-row driver collect. Lineage is truncated every
  * `checkpointEvery` iterations; `checkpointDir` additionally persists
  * rank/manifest state so a new driver resumes mid-convergence.
  */
case class PprConfig(
    damping: Double = 0.5,
    tol: Double = 1e-12,
    maxIter: Int = 500,
    checkpointEvery: Int = 8,
    checkpointDir: Option[String] = None)

case class PprStats(iterations: Int, converged: Boolean, traversedEdges: Long, wallSec: Double)

object Ppr {

  /** Sanitize + per-query normalize a seed frame (qid, vid, weight).
    * NaN / negative → 0 (reference HippoRAG.py:1735); Σ must be > 0
    * (reference asserts, HippoRAG.py:1643) — zero-mass queries are dropped.
    */
  def normalizeSeeds(seeds: DataFrame): DataFrame = {
    val clean = seeds.withColumn("weight",
      when(isnan(col("weight")) || col("weight") < 0, 0.0).otherwise(col("weight")))
    val sums = clean.groupBy("qid").agg(sum("weight").as("s"))
    clean.join(sums, "qid")
      .where(col("s") > 0)
      .select(col("qid"), col("vid"), (col("weight") / col("s")).as("p"))
  }

  /** Fresh run. `nVertices` is |V| of the full graph (the convergence
    * threshold is N·tol, networkx semantics).
    */
  def run(
      spark: SparkSession,
      arcs: DataFrame, // (src: Long, dst: Long, weight: Double) symmetrized
      nVertices: Long,
      seeds: DataFrame, // (qid: Long, vid: Long, weight: Double)
      cfg: PprConfig = PprConfig()): (DataFrame, PprStats) =
    iterate(spark, arcs, nVertices, seeds, cfg, prior = None)

  /** Resume from `cfg.checkpointDir` if a manifest exists, else fresh run.
    * The loop body is shared with [[run]], so resumed and uninterrupted
    * runs produce identical final scores (tested).
    */
  def resume(
      spark: SparkSession,
      arcs: DataFrame,
      nVertices: Long,
      seeds: DataFrame,
      cfg: PprConfig): (DataFrame, PprStats) = {
    val dir = cfg.checkpointDir.getOrElse(
      throw new IllegalArgumentException("resume needs checkpointDir"))
    iterate(spark, arcs, nVertices, seeds, cfg,
      prior = PprCheckpoint.readLatest(spark, dir))
  }

  private def iterate(
      spark: SparkSession,
      arcs: DataFrame,
      nVertices: Long,
      seeds: DataFrame,
      cfg: PprConfig,
      prior: Option[PprCheckpoint.State]): (DataFrame, PprStats) = {

    val t0 = System.nanoTime()
    val outW = arcs.groupBy("src").agg(sum("weight").as("out_w"))
    // Pre-normalize transition weights once: nw = w / outW(src). The arc
    // columns get loop-unique names: after iteration 1 the rank frame
    // derives from arcsN, and a same-name join would be an ambiguous
    // self-join.
    val arcsN = arcs.join(outW, "src")
      .select(col("src").as("a_src"), col("dst").as("a_dst"),
        (col("weight") / col("out_w")).as("nw"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = arcsN.count()

    // In a symmetrized graph only isolated vertices are dangling; only
    // seed-carrying ones can ever hold rank mass, so tracking those suffices.
    val nonDangling = outW.select(col("src").as("vid"))
    val p = normalizeSeeds(seeds).persist(StorageLevel.MEMORY_AND_DISK)
    val nQueries = p.select("qid").distinct().count()
    val danglingSeeds = p.join(nonDangling, Seq("vid"), "left_anti")
      .select("qid", "vid").persist(StorageLevel.MEMORY_AND_DISK)

    val alpha = cfg.damping
    val threshold = nVertices.toDouble * cfg.tol

    // x₀ is a pure RENAME of p — CacheManager matches canonicalized plans
    // (aliases stripped), so persisting the projection re-registers p's
    // cache entry and the loop's first unpersist would DROP p. Re-root it
    // as a LogicalRDD leaf (reads p's cache through .rdd) instead.
    val x0proj = prior.map(_.ranks).getOrElse(
      p.select(col("qid"), col("vid"), col("p").as("x")))
    var x = spark.createDataFrame(x0proj.rdd, x0proj.schema)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // the PERSISTED handle behind x (x itself may be a projection of it —
    // unpersisting the projection would silently no-op and leak the cache)
    var xCache = x
    var dangle: Map[Long, Double] = prior.map(_.dangle).getOrElse {
      x.join(danglingSeeds, Seq("qid", "vid"))
        .groupBy("qid").agg(sum("x").as("ds"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    var iter = prior.map(_.iter).getOrElse(0)
    var converged = prior.exists(s => s.errs.nonEmpty && s.errs.values.forall(_ < threshold))
    val iter0 = iter

    while (iter < cfg.maxIter && !converged) {
      val dangleDf = toDangleDf(spark, dangle)
      val contrib = x.join(arcsN, col("vid") === col("a_src"))
        .groupBy(col("qid"), col("a_dst").as("v"))
        .agg(sum(col("x") * col("nw")).as("c"))
      // ONE pass over the (qid, vid) state per iteration: the old rank is
      // carried through the update join (same (qid, v) keys — Catalyst
      // reuses the partitioning, no extra shuffle), so the per-row L1
      // delta and the next danglesum come out of the SAME projection the
      // update writes, instead of a second full_outer self-join over the
      // state (which doubled the per-iteration shuffle volume).
      //
      // Support monotonicity makes the 3-way full_outer complete: x(v)>0
      // requires p(v)>0 or an in-neighbor with mass, so support(x) ⊆
      // support(p) ∪ support(contrib) — no old-rank row can vanish
      // without a matching update row.
      val joined0 = contrib
        .join(p.withColumnRenamed("vid", "v"), Seq("qid", "v"), "full_outer")
        .join(x.withColumnRenamed("x", "xo").withColumnRenamed("vid", "v"),
          Seq("qid", "v"), "full_outer")
        .join(dangleDf, Seq("qid"), "left")
        .join(danglingSeeds.withColumn("isd", lit(true)).withColumnRenamed("vid", "v"),
          Seq("qid", "v"), "left")
        .select(col("qid"), col("v").as("vid"),
          (lit(alpha) * (coalesce(col("c"), lit(0.0)) +
             coalesce(col("ds"), lit(0.0)) * coalesce(col("p"), lit(0.0))) +
           lit(1.0 - alpha) * coalesce(col("p"), lit(0.0))).as("x"),
          coalesce(col("xo"), lit(0.0)).as("xo"),
          coalesce(col("isd"), lit(false)).as("isd"))
        .persist(StorageLevel.MEMORY_AND_DISK) // joined0 (unique per iter)
      val joined =
        if ((iter + 1) % cfg.checkpointEvery == 0) {
          val chk = joined0.localCheckpoint(true) // truncate lineage
          joined0.unpersist(false)
          chk
        } else joined0

      // One action per iteration: per-query L1 delta + next danglesum.
      val stats = joined
        .groupBy("qid")
        .agg(
          sum(abs(col("x") - col("xo"))).as("err"),
          sum(when(col("isd"), col("x")).otherwise(0.0)).as("ds"))
        .collect()
      val errs = stats.map(r => r.getLong(0) -> r.getDouble(1)).toMap
      dangle = stats.map(r => r.getLong(0) -> r.getDouble(2)).toMap
      xCache.unpersist(false)
      xCache = joined
      // Re-root the next rank state as a LogicalRDD leaf over the PERSISTED
      // joined frame: the fused update references x twice (contrib + xo),
      // so keeping the raw logical plan would DOUBLE the tree per iteration
      // (2^checkpointEvery nodes before each truncation — OOM in the
      // listener's explainString long before execution). The leaf keeps
      // every iteration's plan constant-size; RDD lineage stays linear and
      // is truncated by the localCheckpoint every `checkpointEvery` iters.
      val proj = joined.select("qid", "vid", "x")
      x = spark.createDataFrame(proj.rdd, proj.schema)
      iter += 1
      converged = errs.nonEmpty && errs.values.forall(_ < threshold)
      cfg.checkpointDir.foreach { dir =>
        if (iter % cfg.checkpointEvery == 0 || converged)
          PprCheckpoint.write(spark, dir, x, iter, errs, dangle, nVertices, nEdges,
            (System.nanoTime() - t0) / 1e9)
      }
    }
    arcsN.unpersist(false)
    // p / danglingSeeds are loop-only inputs; the final state is pinned by
    // the (materialized) joined cache, so dropping these never recomputes
    // an iteration — leaking them made the NEXT run over plan-identical
    // inputs re-register their cache entries (CacheManager warning spam).
    p.unpersist(false)
    danglingSeeds.unpersist(false)
    // Pin the final state OUTSIDE the SQL cache and release the last
    // iteration's cached frame: the returned frame is a projection over a
    // leaf, so a caller's unpersist() could never reach xCache (the exact
    // per-batch leak the Retriever's serving path would otherwise
    // accumulate on the shuffle strategy). The localCheckpoint RDD backs
    // the returned frame and is GC'd with it by the ContextCleaner.
    val result = x.select(col("qid"), col("vid"), col("x").as("score"))
      .localCheckpoint(true)
    xCache.unpersist(false)
    val wall = (System.nanoTime() - t0) / 1e9
    (result, PprStats(iter, converged, nEdges * (iter - iter0).toLong * nQueries, wall))
  }

  private def toDangleDf(spark: SparkSession, m: Map[Long, Double]): DataFrame = {
    import spark.implicits._
    val rows = if (m.isEmpty) Seq((-1L, 0.0)) else m.toSeq
    rows.toDF("qid", "ds")
  }
}
