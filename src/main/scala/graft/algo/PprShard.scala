package graft.algo

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Query-sharded PPR: the third execution strategy, for the reference's
  * actual serving workload — MANY per-query reset vectors over a graph
  * that fits per-executor memory (HippoRAG runs one igraph PPR per query,
  * HippoRAG.py:1736; a retrieval service runs thousands).
  *
  * The whole CSR (offsets/dsts/weights/outW — ~20 B/edge) is broadcast
  * ONCE; queries are sharded across tasks; every task runs its queries'
  * power iterations locally with zero cross-task synchronization. Scaling
  * in cores is embarrassingly parallel — this is the strategy that
  * delivers the N→4N ≥ 0.8 efficiency target for query throughput, while
  * [[PprCsr]] (few queries, big graph) and [[Ppr]] (graph ≫ memory)
  * cover the other regimes.
  *
  * Fixpoint semantics identical to [[Ppr]]/[[PprCsr]] (networkx
  * `_pagerank_python`), cross-checked in tests.
  */
object PprShard {

  /** Immutable local CSR over dense vids [0, nV). */
  case class LocalCsr(nV: Int, offsets: Array[Int], dsts: Array[Int],
                      weights: Array[Double], outW: Array[Double]) {
    def nEdges: Long = dsts.length.toLong
  }

  /** Collect symmetrized arcs into a driver-side CSR (use only when
    * E·20B fits comfortably — the same regime this strategy targets).
    */
  def buildLocal(arcs: DataFrame, nV: Int): LocalCsr = {
    val rows = arcs.select(col("src").cast("long"), col("dst").cast("long"),
        col("weight").cast("double")).collect()
    val deg = new Array[Int](nV)
    rows.foreach(r => deg(r.getLong(0).toInt) += 1)
    val offsets = new Array[Int](nV + 1)
    var i = 0
    while (i < nV) { offsets(i + 1) = offsets(i) + deg(i); i += 1 }
    val cursor = offsets.clone()
    val dsts = new Array[Int](rows.length)
    val ws = new Array[Double](rows.length)
    rows.foreach { r =>
      val s = r.getLong(0).toInt
      dsts(cursor(s)) = r.getLong(1).toInt
      ws(cursor(s)) = r.getDouble(2)
      cursor(s) += 1
    }
    val outW = new Array[Double](nV)
    i = 0
    while (i < nV) {
      var e = offsets(i)
      while (e < offsets(i + 1)) { outW(i) += ws(e); e += 1 }
      i += 1
    }
    LocalCsr(nV, offsets, dsts, ws, outW)
  }

  /** A BATCH of queries' power iterations in one CSR sweep per iteration
    * (vertex-major `x[v*B+b]`): the edge list is streamed once per
    * iteration for all B queries instead of once per query — B× less
    * memory traffic per logical query-iteration, which is what keeps 32
    * concurrent shards under the DRAM bandwidth roof (measured: per-query
    * sweeps saturate ~130 GB/s at 32 cores and stop scaling).
    *
    * The batch iterates until EVERY query's L1 delta is under n·tol;
    * already-converged queries keep refining toward the same fixpoint
    * (harmless — power iteration is a contraction). Per-query convergence
    * iterations are recorded when first crossed.
    *
    * @return (vertex-major scores x[v*B+b], per-query convergence iters,
    *          sweeps performed)
    */
  private[algo] def solveBatch(csr: LocalCsr, batch: Array[Seq[(Long, Double)]],
                               damping: Double, tol: Double, maxIter: Int)
      : (Array[Double], Array[Int], Int) = {
    val n = csr.nV
    val nB = batch.length
    val p = new Array[Double](n * nB)
    var b = 0
    while (b < nB) {
      var s = 0.0
      batch(b).foreach { case (v, w) =>
        if (!w.isNaN && w > 0) { p(v.toInt * nB + b) += w; s += w }
      }
      require(s > 0, "PPR reset vector must have positive mass")
      var v = 0
      while (v < n) { p(v * nB + b) /= s; v += 1 }
      b += 1
    }
    var x = p.clone()
    var buf = new Array[Double](n * nB)
    val itersAt = Array.fill(nB)(-1)
    val errs = new Array[Double](nB)
    val dangle = new Array[Double](nB)
    val rate = new Array[Double](nB)
    val threshold = n * tol
    var iter = 0
    var remaining = nB
    while (iter < maxIter && remaining > 0) {
      val nx = buf
      java.util.Arrays.fill(nx, 0.0)
      java.util.Arrays.fill(dangle, 0.0)
      var u = 0
      while (u < n) {
        val uOff = u * nB
        var any = false
        b = 0
        while (b < nB) {
          val xv = x(uOff + b)
          if (xv != 0.0) any = true
          rate(b) = xv
          b += 1
        }
        if (any) {
          if (csr.outW(u) == 0.0) {
            b = 0
            while (b < nB) { dangle(b) += rate(b); b += 1 }
          } else {
            val inv = 1.0 / csr.outW(u)
            b = 0
            while (b < nB) { rate(b) *= inv; b += 1 }
            var e = csr.offsets(u)
            val end = csr.offsets(u + 1)
            while (e < end) {
              val dOff = csr.dsts(e) * nB
              val w = csr.weights(e)
              b = 0
              while (b < nB) { nx(dOff + b) += w * rate(b); b += 1 }
              e += 1
            }
          }
        }
        u += 1
      }
      java.util.Arrays.fill(errs, 0.0)
      var v = 0
      while (v < n) {
        val off = v * nB
        b = 0
        while (b < nB) {
          val nv = damping * (nx(off + b) + dangle(b) * p(off + b)) +
            (1.0 - damping) * p(off + b)
          errs(b) += math.abs(nv - x(off + b))
          nx(off + b) = nv
          b += 1
        }
        v += 1
      }
      buf = x
      x = nx
      iter += 1
      b = 0
      while (b < nB) {
        if (itersAt(b) < 0 && errs(b) < threshold) { itersAt(b) = iter; remaining -= 1 }
        b += 1
      }
    }
    b = 0
    while (b < nB) { if (itersAt(b) < 0) itersAt(b) = maxIter; b += 1 }
    (x, itersAt, iter)
  }

  /** Single-query convenience wrapper over [[solveBatch]]. */
  private[algo] def solveOne(csr: LocalCsr, seeds: Seq[(Long, Double)],
                             damping: Double, tol: Double, maxIter: Int): (Array[Double], Int) = {
    val (x, iters, _) = solveBatch(csr, Array(seeds), damping, tol, maxIter)
    (x, iters(0))
  }

  /** @param topK when > 0, each query emits only its top-k vertices
    *              (score desc, vid asc) — the retrieval serving shape,
    *              which also keeps the result exchange tiny.
    * @return ((qid, vid, score) rows — nonzero scores only, stats)
    */
  def run(
      spark: SparkSession,
      csr: LocalCsr,
      seeds: Seq[(Long, Seq[(Long, Double)])],
      cfg: PprConfig = PprConfig(),
      numShards: Int = 0,
      topK: Int = 0,
      batchSize: Int = 16): (DataFrame, PprStats) = {
    import spark.implicits._
    val t0 = System.nanoTime()
    val shards = if (numShards > 0) numShards else spark.sparkContext.defaultParallelism
    val bcCsr = spark.sparkContext.broadcast(csr)
    val iterAcc = spark.sparkContext.longAccumulator("ppr_iterations")
    val capped = spark.sparkContext.longAccumulator("ppr_maxiter_hits")
    val seedDs = spark.createDataset(seeds).repartition(shards)
    val scores = seedDs.mapPartitions { it =>
      val local = bcCsr.value
      it.grouped(math.max(1, batchSize)).flatMap { group =>
        val qids = group.map(_._1)
        val (x, iters, _) = solveBatch(local, group.map(_._2).toArray,
          cfg.damping, cfg.tol, cfg.maxIter)
        val nB = group.length
        qids.iterator.zipWithIndex.flatMap { case (qid, b) =>
          iterAcc.add(iters(b))
          if (iters(b) >= cfg.maxIter) capped.add(1)
          val rows = (0 until local.nV).iterator
            .map(v => (qid, v.toLong, x(v * nB + b)))
            .filter(_._3 != 0.0)
          if (topK > 0) rows.toSeq.sortBy { case (_, i, v) => (-v, i) }.take(topK)
          else rows
        }
      }
    }.toDF("qid", "vid", "score")
    val out = scores.persist()
    out.count() // materialize so stats are final
    val wall = (System.nanoTime() - t0) / 1e9
    val iters = iterAcc.value.toInt
    (out, PprStats(iters, converged = capped.value == 0L, csr.nEdges * iters, wall))
  }
}
