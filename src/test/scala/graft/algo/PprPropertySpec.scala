package graft.algo

import graft.SparkSpec
import graft.graph.Adjacency

/** Property-style checks (plain seeded generation; scalatestplus is not in
  * the offline cache): on random multigraphs the CSR PPR path agrees with
  * an independent dense oracle, and results are invariant to CSR block
  * size — i.e. splitting a hub's adjacency across blocks (the salting
  * mechanism) never changes scores.
  */
class PprPropertySpec extends SparkSpec {
  import spark.implicits._

  test("CSR PPR == dense oracle on random graphs; block size irrelevant") {
    val rnd = new scala.util.Random(4242)
    for (trial <- 0 until 8) {
      val n = 3 + rnd.nextInt(14)
      val nEdges = n + rnd.nextInt(3 * n)
      val edges = (0 until nEdges).map { _ =>
        (rnd.nextInt(n), rnd.nextInt(n), (1 + rnd.nextInt(5)).toDouble)
      }.filter(e => e._1 != e._2).toList
      val seeds = (0 to rnd.nextInt(2)).map(_ => (rnd.nextInt(n), (1 + rnd.nextInt(10)).toDouble)).toList
      if (edges.nonEmpty) {
        val oracle = PprOracle.run(n, edges, seeds, damping = 0.5)
        val arcs = Adjacency.symmetrize(
          edges.map(e => (e._1.toLong, e._2.toLong, e._3)).toDF("src", "dst", "weight"))
        val outW = {
          val a = new Array[Double](n)
          Adjacency.outWeights(arcs).collect()
            .foreach(r => a(r.getAs[Long]("src").toInt) = r.getAs[Double]("out_w"))
          a
        }
        val seedSeq = Seq(0L -> seeds.map { case (v, w) => (v.toLong, w) })
        for (blockSize <- Seq(4, 1024)) {
          val blocks = Adjacency.csrBlocks(spark, arcs, edgesPerBlock = blockSize)
          val (scores, stats) = PprCsr.run(blocks, outW, seedSeq,
            PprConfig(damping = 0.5, tol = 1e-12))
          assert(stats.converged)
          val got = scores.head._2
          val maxDiff = got.zip(oracle).map { case (a, b) => math.abs(a - b) }.max
          assert(maxDiff < 1e-8, s"trial=$trial blockSize=$blockSize n=$n maxDiff=$maxDiff")
        }
      }
    }
  }
}
