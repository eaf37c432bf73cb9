package graft.algo

import org.apache.spark.sql.Dataset

import graft.graph.AdjBlock

/** Broadcast/CSR PPR: the fast path when the rank vector fits in memory.
  *
  * Each iteration broadcasts the dense Q×V rank matrix, every CSR block
  * computes partial contributions into a dense accumulator, and a
  * treeAggregate sums them — no shuffle at all, one job per iteration.
  * Hubs are pre-split across blocks by [[graft.graph.Adjacency.csrBlocks]]
  * (edge-count slicing), so task times stay balanced under Zipf skew.
  *
  * Semantics are identical to [[Ppr.run]] (same fixpoint, same networkx
  * convergence test) — the two paths are cross-checked in tests. Use this
  * one when Q·V doubles fit comfortably on the driver (≈10^8 cells); use
  * the shuffle path beyond that.
  */
object PprCsr {

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
    val cached = blocks.persist()
    val nEdges = cached.rdd.map(_.dsts.length.toLong).reduce(_ + _)

    // p: normalized, sanitized reset vectors (reference HippoRAG.py:1735).
    val p: Array[Array[Double]] = seeds.map { case (_, sv) =>
      val a = new Array[Double](nV)
      sv.foreach { case (v, w) =>
        if (!w.isNaN && w > 0) a(v.toInt) += w
      }
      val s = a.sum
      require(s > 0, "PPR reset vector must have positive mass (HippoRAG.py:1643)")
      var i = 0
      while (i < nV) { a(i) /= s; i += 1 }
      a
    }.toArray

    var x: Array[Array[Double]] = p.map(_.clone())
    var iter = 0
    var converged = false

    while (iter < cfg.maxIter && !converged) {
      val bcX = sc.broadcast(x)
      val contrib = cached.rdd.treeAggregate(null.asInstanceOf[Array[Array[Double]]])(
        seqOp = (accIn, b) => {
          val acc = if (accIn == null) Array.fill(nQ)(new Array[Double](nV)) else accIn
          val xs = bcX.value
          val ow = bcOutW.value
          var q = 0
          while (q < nQ) {
            val xq = xs(q)
            val aq = acc(q)
            var si = 0
            while (si < b.srcIds.length) {
              val s = b.srcIds(si).toInt
              val xv = xq(s)
              if (xv != 0.0) {
                val rate = xv / ow(s)
                var e = b.offsets(si)
                val end = b.offsets(si + 1)
                while (e < end) {
                  aq(b.dsts(e).toInt) += rate * b.weights(e)
                  e += 1
                }
              }
              si += 1
            }
            q += 1
          }
          acc
        },
        combOp = (a, b) => {
          if (a == null) b
          else if (b == null) a
          else {
            var q = 0
            while (q < nQ) {
              val aq = a(q); val bq = b(q)
              var i = 0
              while (i < nV) { aq(i) += bq(i); i += 1 }
              q += 1
            }
            a
          }
        },
        depth = 2)
      val agg = if (contrib == null) Array.fill(nQ)(new Array[Double](nV)) else contrib
      bcX.destroy()

      var maxRelErr = 0.0
      val next = new Array[Array[Double]](nQ)
      var q = 0
      while (q < nQ) {
        val xq = x(q); val pq = p(q); val aq = agg(q)
        var ds = 0.0
        var i = 0
        while (i < nV) { if (bcOutW.value(i) == 0.0) ds += xq(i); i += 1 }
        val nx = new Array[Double](nV)
        var err = 0.0
        i = 0
        while (i < nV) {
          nx(i) = alpha * (aq(i) + ds * pq(i)) + (1.0 - alpha) * pq(i)
          err += math.abs(nx(i) - xq(i))
          i += 1
        }
        if (err > maxRelErr) maxRelErr = err
        next(q) = nx
        q += 1
      }
      x = next
      iter += 1
      converged = maxRelErr < threshold
    }
    cached.unpersist(false)
    val wall = (System.nanoTime() - t0) / 1e9
    (seeds.map(_._1).zip(x.toSeq),
      PprStats(iter, converged, nEdges * iter.toLong * nQ, wall))
  }
}
