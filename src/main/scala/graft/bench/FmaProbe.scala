package graft.bench

/** Pure-JVM floating-point strong-scaling probe: per-thread FMA loops on
  * private L1-resident arrays — no shared cache, no DRAM, no allocation.
  * If 32 threads do not deliver 4× the throughput of 8 threads HERE, the
  * gap is hardware (all-core frequency / hypervisor steal), not the
  * engine. This is the FP counterpart of the md5 (integer-ALU) ceiling.
  */
object FmaProbe {

  /** @return seconds to run `perThread` fused-multiply-add passes of a
    *          512-double private array on each of `threads` threads.
    */
  def burn(threads: Int, perThread: Int): Double = {
    val t0 = System.nanoTime()
    val sink = new java.util.concurrent.atomic.AtomicLong(0)
    val ts = (0 until threads).map { t =>
      new Thread(() => {
        val a = Array.tabulate(512)(i => 1.0 + (i + t) * 1e-9)
        val w = 0.9999999
        var pass = 0
        while (pass < perThread) {
          var i = 0
          while (i < 512) { a(i) = a(i) * w + 1e-12; i += 1 }
          pass += 1
        }
        sink.addAndGet(java.lang.Double.doubleToLongBits(a(0)))
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** (efficiency, t8, t32): t8 = 8 threads × perThread passes, t32 = 32
    * threads × perThread passes (4× total work) — eff = t8/t32.
    */
  def ceiling(perThread: Int = 8000000): (Double, Double, Double) = {
    burn(4, perThread / 4) // JIT warmup
    val t8 = burn(8, perThread)
    val t32 = burn(32, perThread)
    (t8 / t32, t8, t32)
  }

  def main(args: Array[String]): Unit = {
    val lo = if (args.length > 0) args(0).toInt else 8
    val hi = if (args.length > 1) args(1).toInt else 32
    val per = if (args.length > 2) args(2).toInt else 8000000
    burn(4, per / 4) // JIT warmup
    for (_ <- 1 to 5) {
      val tLo = burn(lo, per)
      val tHi = burn(hi, per)
      println(f"fma: eff=${tLo / tHi}%.3f t$lo=$tLo%.2fs t$hi=$tHi%.2fs " +
        f"(gflops$lo=${lo * per.toLong * 512 * 2 / tLo / 1e9}%.1f gflops$hi=${hi * per.toLong * 512 * 2 / tHi / 1e9}%.1f)")
    }
  }
}
