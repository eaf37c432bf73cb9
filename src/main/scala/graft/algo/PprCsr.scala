package graft.algo

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.graph.AdjBlock

/** Broadcast/CSR PPR: the fast path when the rank state fits in memory.
  *
  * Memory layout is VERTEX-MAJOR (`x[v*Q+q]`): each edge is streamed once
  * per iteration and its Q multiply-adds hit two CONTIGUOUS Q-rows (the
  * src rate row and the dst accumulator row). With V·Q·8B sized to cache
  * (the whole rank state for a 10⁴-vertex × 128-query batch is ~8 MB),
  * the kernel is compute-bound, not bandwidth-bound — that is what makes
  * the N→4N core-scaling protocol meaningful. A query-major layout would
  * re-stream the edge list Q times.
  *
  * Each iteration: broadcast the rank state, every CSR block scatters
  * partial contributions into a dense V×Q accumulator, treeAggregate sums
  * them — no shuffle, one job per iteration. Hubs are pre-split across
  * blocks by [[graft.graph.Adjacency.csrBlocks]] (edge-count slicing), so
  * task times stay balanced under Zipf skew.
  *
  * Semantics are identical to [[Ppr.run]] (same fixpoint, same networkx
  * convergence test) — the paths are cross-checked in tests. Use the
  * shuffle path when V·(Q+2) doubles stop fitting comfortably in memory.
  */
object PprCsr {

  /** Dense per-query score arrays → a sparse (qid, vid, score) frame.
    * The nonzero explode runs on EXECUTORS (one partition per query): the
    * driver holds only the Q dense double arrays it already owns from
    * [[run]], never a Q×V tuple collection.
    */
  def toFrame(spark: SparkSession, scores: Seq[(Long, Array[Double])]): DataFrame = {
    import spark.implicits._
    spark.sparkContext.parallelize(scores, math.max(1, scores.length))
      .flatMap { case (q, xs) =>
        xs.iterator.zipWithIndex.collect { case (x, v) if x != 0.0 => (q, v.toLong, x) }
      }
      .toDF("qid", "vid", "score")
  }

  /** @param seeds per query: (qid, sparse seed pairs (vid, weight)).
    * @return (per-query dense score arrays indexed by vid, stats)
    */
  def run(
      blocks: Dataset[AdjBlock],
      outW: Array[Double],
      seeds: Seq[(Long, Seq[(Long, Double)])],
      cfg: PprConfig = PprConfig()): (Seq[(Long, Array[Double])], PprStats) = {

    val t0 = System.nanoTime()
    val sc = blocks.sparkSession.sparkContext
    val nV = outW.length
    val nQ = seeds.length
    val alpha = cfg.damping
    val threshold = nV.toDouble * cfg.tol

    val bcOutW = sc.broadcast(outW)
    // guarded: repeated runs over the same block table (tests, retries)
    // would re-register an identical plan and spam CacheManager warnings
    val cached = graft.core.Ids.persistIfUncached(blocks)
    val nEdges = cached.rdd.map(_.dsts.length.toLong).reduce(_ + _)

    // p[v*Q+q]: normalized, sanitized reset vectors (HippoRAG.py:1735).
    val p = new Array[Double](nV * nQ)
    seeds.zipWithIndex.foreach { case ((_, sv), q) =>
      var s = 0.0
      sv.foreach { case (v, w) => if (!w.isNaN && w > 0) { p(v.toInt * nQ + q) += w; s += w } }
      require(s > 0, "PPR reset vector must have positive mass (HippoRAG.py:1643)")
      var v = 0
      while (v < nV) { p(v * nQ + q) /= s; v += 1 }
    }

    var x = p.clone()
    var iter = 0
    var converged = false

    while (iter < cfg.maxIter && !converged) {
      val bcX = sc.broadcast(x)
      val contrib = cached.rdd.treeAggregate(null.asInstanceOf[Array[Double]])(
        seqOp = (accIn, b) => {
          val acc = if (accIn == null) new Array[Double](nV * nQ) else accIn
          val xs = bcX.value
          val ow = bcOutW.value
          val rate = new Array[Double](nQ)
          var si = 0
          while (si < b.srcIds.length) {
            val s = b.srcIds(si).toInt
            val sOff = s * nQ
            var any = false
            var q = 0
            while (q < nQ) {
              val xv = xs(sOff + q)
              rate(q) = if (xv != 0.0) { any = true; xv / ow(s) } else 0.0
              q += 1
            }
            if (any) {
              var e = b.offsets(si)
              val end = b.offsets(si + 1)
              while (e < end) {
                val dOff = b.dsts(e).toInt * nQ
                val w = b.weights(e)
                q = 0
                while (q < nQ) { acc(dOff + q) += w * rate(q); q += 1 }
                e += 1
              }
            }
            si += 1
          }
          acc
        },
        combOp = (a, b) => {
          if (a == null) b
          else if (b == null) a
          else {
            var i = 0
            while (i < a.length) { a(i) += b(i); i += 1 }
            a
          }
        },
        depth = 2)
      val agg = if (contrib == null) new Array[Double](nV * nQ) else contrib
      bcX.destroy()

      // danglesum per query, then the fixpoint update + L1 errors.
      val dangle = new Array[Double](nQ)
      var v = 0
      while (v < nV) {
        if (bcOutW.value(v) == 0.0) {
          val off = v * nQ
          var q = 0
          while (q < nQ) { dangle(q) += x(off + q); q += 1 }
        }
        v += 1
      }
      val next = new Array[Double](nV * nQ)
      val errs = new Array[Double](nQ)
      v = 0
      while (v < nV) {
        val off = v * nQ
        var q = 0
        while (q < nQ) {
          val nx = alpha * (agg(off + q) + dangle(q) * p(off + q)) + (1.0 - alpha) * p(off + q)
          errs(q) += math.abs(nx - x(off + q))
          next(off + q) = nx
          q += 1
        }
        v += 1
      }
      x = next
      iter += 1
      converged = errs.forall(_ < threshold)
    }
    cached.unpersist(false)
    val wall = (System.nanoTime() - t0) / 1e9

    // Unpack vertex-major state into per-query arrays.
    val out = seeds.map(_._1).zipWithIndex.map { case (qid, q) =>
      val a = new Array[Double](nV)
      var v = 0
      while (v < nV) { a(v) = x(v * nQ + q); v += 1 }
      qid -> a
    }
    (out, PprStats(iter, converged, nEdges * iter.toLong * nQ, wall))
  }
}
