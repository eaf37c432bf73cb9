package graft.bench

/** DRAM-bandwidth probe (STREAM-triad-like): per-thread disjoint slices of
  * arrays far larger than L3, a[i] = b[i] + s·c[i]. Reports achieved
  * aggregate GB/s at a given thread count — the memory roof that a
  * bandwidth-bound kernel would be limited by.
  */
object StreamProbe {

  /** @return achieved GB/s (3 streams × 8 B per element per pass). */
  def triad(threads: Int, elemsPerThread: Int = 8 << 20, passes: Int = 8): Double = {
    val sink = new java.util.concurrent.atomic.AtomicLong(0)
    val arrs = Array.fill(threads)(
      (new Array[Double](elemsPerThread), new Array[Double](elemsPerThread),
       new Array[Double](elemsPerThread)))
    // init (also faults the pages in)
    arrs.foreach { case (a, bq, c) =>
      java.util.Arrays.fill(a, 1.0); java.util.Arrays.fill(bq, 2.0)
      java.util.Arrays.fill(c, 3.0)
    }
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      new Thread(() => {
        val (a, b, c) = arrs(t)
        var p = 0
        while (p < passes) {
          var i = 0
          while (i < a.length) { a(i) = b(i) + 0.42 * c(i); i += 1 }
          p += 1
        }
        sink.addAndGet(java.lang.Double.doubleToLongBits(a(0)))
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    threads.toLong * elemsPerThread * passes * 3L * 8L / sec / 1e9
  }

  def main(args: Array[String]): Unit = {
    triad(4, 4 << 20, 2) // warmup/JIT
    for (_ <- 1 to 3; t <- Seq(1, 8, 32))
      println(f"stream triad: threads=$t%2d ${triad(t)}%.1f GB/s")
  }
}
