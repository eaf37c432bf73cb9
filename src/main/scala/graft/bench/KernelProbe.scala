package graft.bench

import graft.algo.PprShard
import graft.algo.PprShard.LocalCsr

/** No-Spark probe of the query-sharded PPR kernel's thread scaling.
  *
  * The north-rule scaling protocol runs this kernel inside Spark tasks;
  * this probe isolates the kernel (and the hardware) from scheduler and
  * GC noise so the binding wall — compute, DRAM bandwidth, allocation —
  * is measurable directly. Usage:
  *
  *   java -cp classes:/opt/spark/jars/'*' graft.bench.KernelProbe \
  *     [nV] [avgDeg] [nQueries] [batch] [mode]
  */
object KernelProbe {

  /** Deterministic Zipf-ish multigraph CSR (skewed out-degrees and hub
    * destinations — the entity-graph shape), built directly in CSR form.
    */
  def synthCsr(nV: Int, avgDeg: Int, seed: Long = 42L): LocalCsr = {
    val rnd = new java.util.Random(seed)
    val nE = nV.toLong * avgDeg
    require(nE < Int.MaxValue, "probe CSR must be int-indexed")
    // Out-degree ∝ 1/rank^0.5 (normalized to avgDeg), destination Zipf-ish
    // via rank = floor(nV * u^2) — hubs get both high degree and high
    // in-degree, like the fact-edge graph.
    val degs = new Array[Int](nV)
    var tot = 0L
    var i = 0
    while (i < nV) {
      val d = math.max(1, (avgDeg / math.sqrt((i + 1).toDouble / nV)).toInt / 2)
      degs(i) = d; tot += d; i += 1
    }
    // pad round-robin to reach nE
    i = 0
    while (tot < nE) { degs(rnd.nextInt(nV)) += 1; tot += 1 }
    val offsets = new Array[Int](nV + 1)
    i = 0
    while (i < nV) { offsets(i + 1) = offsets(i) + degs(i); i += 1 }
    val m = offsets(nV)
    val dsts = new Array[Int](m)
    val ws = new Array[Double](m)
    var e = 0
    while (e < m) {
      val u = rnd.nextDouble()
      dsts(e) = math.min(nV - 1, (nV * u * u).toInt)
      ws(e) = 1.0 + rnd.nextInt(3)
      e += 1
    }
    val outW = new Array[Double](nV)
    i = 0
    while (i < nV) {
      var k = offsets(i)
      while (k < offsets(i + 1)) { outW(i) += ws(k); k += 1 }
      i += 1
    }
    LocalCsr(nV, offsets, dsts, ws, outW)
  }

  /** Run nQueries through solveBatch on `threads` workers; returns
    * (wallSec, totalSweeps, totalQueryIters).
    */
  def run(bcsr: PprShard.BlockedCsr, nQueries: Int, batch: Int, threads: Int,
          damping: Double, tol: Double, emitTopK: Int): (Double, Long, Long) = {
    val queue = new java.util.concurrent.atomic.AtomicInteger(0)
    val sweeps = new java.util.concurrent.atomic.AtomicLong(0)
    val qiters = new java.util.concurrent.atomic.AtomicLong(0)
    val sink = new java.util.concurrent.atomic.AtomicLong(0)
    val nBatches = (nQueries + batch - 1) / batch
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { _ =>
      new Thread(() => {
        var b = queue.getAndIncrement()
        while (b < nBatches) {
          val q0 = b * batch
          val nB = math.min(batch, nQueries - q0)
          val seeds = Array.tabulate(nB)(j => Seq(((q0 + j) * 31L % bcsr.nV, 1.0)))
          val (x, iters, sw) = PprShard.solveBatch(bcsr, seeds, damping, tol, 1000)
          sweeps.addAndGet(sw.toLong)
          var j = 0; var acc = 0L
          while (j < nB) {
            qiters.addAndGet(iters(j).toLong)
            if (emitTopK > 0) {
              val (vs, _) = PprShard.topKStrided(x, nB, j, bcsr.nV, emitTopK)
              acc += vs.length
            }
            j += 1
          }
          sink.addAndGet(acc + x.length)
          b = queue.getAndIncrement()
        }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    ((System.nanoTime() - t0) / 1e9, sweeps.get(), qiters.get())
  }

  def main(args: Array[String]): Unit = {
    val nV = if (args.length > 0) args(0).toInt else 4096
    val avgDeg = if (args.length > 1) args(1).toInt else 220
    val nQ = if (args.length > 2) args(2).toInt else 8192
    val batch = if (args.length > 3) args(3).toInt else 16
    val emit = if (args.length > 4) args(4).toInt else 50
    val damping = if (args.length > 5) args(5).toDouble else 0.5
    val blockVerts = if (args.length > 6) args(6).toInt
      else math.max(1024, 524288 / (8 * batch))
    val csr = synthCsr(nV, avgDeg)
    val bcsr = PprShard.block(csr, blockVerts)
    val tol = 1e-6 / nV
    println(s"csr: nV=$nV arcs=${csr.nEdges} batch=$batch emit=$emit " +
      s"damping=$damping blockVerts=$blockVerts blocks=${bcsr.nBlocks}")
    // warmup
    run(bcsr, math.min(nQ, 512), batch, 32, damping, tol, emit)
    for (threads <- Seq(8, 32, 8, 32)) {
      val (wall, sweeps, qi) = run(bcsr, nQ, batch, threads, damping, tol, emit)
      val edges = sweeps * csr.nEdges * batch // physical FMA edge-visits
      val logical = qi * csr.nEdges           // logical query-edge traversals
      println(f"threads=$threads%2d wall=$wall%7.2fs sweeps=$sweeps qIters=$qi " +
        f"physEdges/s=${edges / wall}%.3g logicalEdges/s=${logical / wall}%.3g q/s=${nQ / wall}%.1f")
    }
  }
}
