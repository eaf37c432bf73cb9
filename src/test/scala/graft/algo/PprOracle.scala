package graft.algo

/** Dense single-threaded double-precision PPR oracle (SURVEY.md §5.2):
  * the same networkx `_pagerank_python` fixpoint the goldens pin, written
  * independently of the engine so ScalaCheck can compare distributed vs
  * dense on arbitrary random graphs.
  */
object PprOracle {

  /** @param rows directed (src, dst, weight) — node_to_node_stats replay */
  def run(n: Int, rows: Seq[(Int, Int, Double)], seeds: Seq[(Int, Double)],
          damping: Double, tol: Double = 1e-14, maxIter: Int = 10000): Array[Double] = {
    // symmetrize: W(u,v) = sum over all rows between u,v in both orders
    val w = Array.ofDim[Double](n, n)
    rows.foreach { case (s, d, x) =>
      if (s != d) { w(s)(d) += x; w(d)(s) += x }
    }
    val outW = Array.tabulate(n)(i => w(i).sum)
    val p = new Array[Double](n)
    seeds.foreach { case (v, x) => if (x > 0) p(v) += x }
    val ps = p.sum
    require(ps > 0)
    var i = 0
    while (i < n) { p(i) /= ps; i += 1 }

    var x = p.clone()
    var iter = 0
    while (iter < maxIter) {
      val nx = new Array[Double](n)
      var dangle = 0.0
      var u = 0
      while (u < n) {
        if (outW(u) == 0.0) dangle += x(u)
        else {
          val rate = x(u) / outW(u)
          var v = 0
          while (v < n) { if (w(u)(v) != 0.0) nx(v) += rate * w(u)(v); v += 1 }
        }
        u += 1
      }
      var err = 0.0
      var v = 0
      while (v < n) {
        nx(v) = damping * (nx(v) + dangle * p(v)) + (1 - damping) * p(v)
        err += math.abs(nx(v) - x(v))
        v += 1
      }
      x = nx
      iter += 1
      if (err < n * tol) return x
    }
    x
  }
}
