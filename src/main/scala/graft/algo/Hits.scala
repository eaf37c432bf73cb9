package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Weighted HITS (Kleinberg hubs & authorities) over a DIRECTED arc
  * table — the classic link-graph companion to PageRank for a
  * Common-Crawl-style web graph (north-rule tier `link_graph`). The
  * reference's graph memory is undirected, but its triples ARE directed
  * (subject → object, src/hipporag/information_extraction — the
  * undirection happens at graph-build, HippoRAG.py:1004-1012); HITS is
  * the analysis that direction pays for.
  *
  * Fixed `sweeps` double power iteration with L2 normalization after
  * each half-step (the networkx `hits` update shape), so every sweep is
  * closed-form and the whole run is expressible as a recursive-CTE SQL
  * oracle (same design as the q27c/q33 fixed-sweep PPR oracles):
  *
  *   a₁(v)  = Σ_{(u,v)∈arcs} w(u,v) · h(u);    aₙ = a₁ / ‖a₁‖₂
  *   h₁(u)  = Σ_{(u,v)∈arcs} w(u,v) · aₙ(v);   hₙ = h₁ / ‖h₁‖₂
  *
  * Scale shape: each half-step is one shuffle join on the arc table plus
  * a map-side-combinable groupBy; the norm is a broadcast one-row
  * crossJoin, NOT a driver action — the whole run executes as one Spark
  * job per `checkpointEvery` sweeps (2·sweeps driver round-trips made a
  * tiny-graph run take 24 s of pure scheduling; same action-count
  * discipline as the PPR kernels). State is O(V); Zipf hubs cost partial
  * aggregation, not a hot reducer.
  */
object Hits {

  /** @param arcs     directed (src, dst, weight ≥ 0), no self-loops needed
    * @param vertices (vid) — every vertex, incl. ones without arcs
    * @param localKernelMax if |arcs| + |vertices| is at most this, run the
    *        whole double power iteration as ONE driver kernel over
    *        collected arrays instead of 2·sweeps distributed half-steps
    *        (same bounded-small-side gate as ConnectedComponents'
    *        localFinishMax and PprShard's CSR: 20 sweeps over a tiny graph
    *        are ~160 scheduled stages of pure barrier floor, measured 17 s
    *        at bench sf0.1 on a 31-vertex graph vs <1 s gated; at web
    *        scale the count stays above any gate and the shuffle loop
    *        runs). Driver == distributed to 1e-12 (spec-pinned) — both
    *        paths compute the same closed-form fixed-sweep update. 0
    *        disables the gate.
    * @param sizeHint known |arcs| + |vertices|, if the caller already has
    *        it — skips the gate's probe job entirely (round-5 advice: the
    *        probe is an O(E) scan that buys nothing at web scale, where
    *        the gate can never trigger). Negative = unknown, probe runs
    *        (as ONE union-aggregate action, not two counts).
    * @return (vid, hub, authority), both L2-normalized at the last sweep
    */
  def run(arcs: DataFrame, vertices: DataFrame, sweeps: Int = 20,
          checkpointEvery: Int = 5, localKernelMax: Long = 1L << 20,
          sizeHint: Long = -1L): DataFrame = {
    // sweeps = 0 would leave `auth` unbound (NPE at the final join) and has
    // no meaning anyway: HITS without a power step is just the init vector.
    require(sweeps >= 1, s"HITS needs at least one sweep (got $sweeps)")
    val spark = arcs.sparkSession
    if (localKernelMax > 0) {
      val sizes =
        if (sizeHint >= 0L) sizeHint
        else arcs.select(count(lit(1)).as("c"))
          .unionAll(vertices.select(count(lit(1)).as("c")))
          .agg(sum(col("c"))).first().getLong(0)
      if (sizes <= localKernelMax) return runLocal(arcs, vertices, sweeps)
    }
    // LAZY re-root: normalized() references its input twice (norm branch
    // + value branch) — without collapsing each half-step to a LogicalRDD
    // leaf the logical plan would grow 4^sweeps. The leaf's RDD lineage
    // is a DAG (shared node), its shuffle dependencies materialize once,
    // and no action runs here.
    def reRoot(df: DataFrame): DataFrame = spark.createDataFrame(df.rdd, df.schema)
    val a0 = arcs.select(col("src"), col("dst"), col("weight").cast("double").as("weight"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // distinct: the gated kernel deduplicates vids, and WITHOUT it here a
    // duplicate vid row would double-count through every half-step's left
    // join (inflated L2 norms) — the 1e-12 path-equality claim must hold
    // for all inputs, not just pre-deduplicated ones (round-5 advice).
    val verts = vertices.select("vid").distinct().persist(StorageLevel.MEMORY_AND_DISK)
    verts.count() // materialize once; every half-step left-joins it

    // One shuffle half-step: scores (vid, c) gathered along arcs joined on
    // `side`, summed per opposite endpoint, zero-filled over all vertices.
    def gather(scores: DataFrame, side: String, out: String): DataFrame = {
      val other = if (side == "src") "dst" else "src"
      val contrib = a0.join(scores.withColumnRenamed("vid", side), side)
        .groupBy(col(other).as("vid"))
        .agg(sum(col("weight") * col(scores.columns(1))).as(out))
      verts.join(contrib, Seq("vid"), "left")
        .select(col("vid"), coalesce(col(out), lit(0.0)).as(out))
    }

    // LAZY L2 normalization: the norm is a one-row aggregate broadcast
    // back via crossJoin, so no per-half-step driver action exists. The
    // all-zero guard keeps zeros instead of NaN (empty arc side).
    def normalized(scores: DataFrame, c: String): DataFrame = {
      val n = scores.agg(sqrt(sum(col(c) * col(c))).as("_n"))
      scores.crossJoin(broadcast(n))
        .select(col("vid"),
          (col(c) / when(col("_n") === 0.0, lit(1.0)).otherwise(col("_n"))).as(c))
    }

    var hub = verts.select(col("vid"), lit(1.0).as("h")).localCheckpoint(true)
    var auth: DataFrame = null
    var authPinned = false
    var it = 0
    while (it < sweeps) {
      val aN = reRoot(normalized(reRoot(gather(hub, "src", "a")), "a"))
      val hN = normalized(reRoot(gather(aN, "dst", "h")), "h")
      // Evaluation happens only at checkpoints: each checkpoint runs the
      // (up to `checkpointEvery`) sweeps since the previous one as ONE
      // job — the inter-sweep DAG is a linear join chain, no fan-out, so
      // nothing recomputes exponentially. auth is pinned WITH its hub
      // (same underlying sweep) only at the end.
      if ((it + 1) % checkpointEvery == 0 || it + 1 == sweeps) {
        hub = hN.localCheckpoint(true)
        if (it + 1 == sweeps) { auth = aN.localCheckpoint(true); authPinned = true }
      } else hub = hN
      if (!authPinned) auth = aN
      it += 1
    }
    val out = hub.join(auth, "vid")
      .select(col("vid"), col("h").as("hub"), col("a").as("authority"))
      .localCheckpoint(true)
    a0.unpersist(false); verts.unpersist(false)
    out
  }

  /** The gated driver kernel: identical fixed-sweep update over collected
    * arrays. Summation runs in collected-arc order — deterministic, and
    * within fp ulp of the distributed partial-agg order (the q35 oracle
    * rounds to 9 dp; the equality spec pins 1e-12).
    */
  private def runLocal(arcs: DataFrame, vertices: DataFrame, sweeps: Int): DataFrame = {
    val spark = arcs.sparkSession
    val vidRows = vertices.select("vid").distinct().collect().map(_.get(0))
    val idx = new java.util.HashMap[Any, java.lang.Integer]()
    vidRows.zipWithIndex.foreach { case (v, i) => idx.put(v, i) }
    val arcRows = arcs.select(col("src"), col("dst"),
      col("weight").cast("double")).collect()
    val n = vidRows.length
    val src = new Array[Int](arcRows.length)
    val dst = new Array[Int](arcRows.length)
    val w = new Array[Double](arcRows.length)
    var k = 0
    arcRows.foreach { r =>
      val s = idx.get(r.get(0)); val d = idx.get(r.get(1))
      // Dangling arcs (endpoint outside `vertices`) contribute nothing,
      // mirroring the distributed path's zero-fill over the vertex frame.
      if (s != null && d != null) {
        src(k) = s; dst(k) = d; w(k) = r.getDouble(2); k += 1
      }
    }
    var hub = Array.fill(n)(1.0)
    var auth = new Array[Double](n)
    def l2normalize(x: Array[Double]): Unit = {
      var s = 0.0; var i = 0
      while (i < n) { s += x(i) * x(i); i += 1 }
      val nr = math.sqrt(s)
      if (nr != 0.0) { i = 0; while (i < n) { x(i) /= nr; i += 1 } }
    }
    var it = 0
    while (it < sweeps) {
      java.util.Arrays.fill(auth, 0.0)
      var e = 0
      while (e < k) { auth(dst(e)) += w(e) * hub(src(e)); e += 1 }
      l2normalize(auth)
      java.util.Arrays.fill(hub, 0.0)
      e = 0
      while (e < k) { hub(src(e)) += w(e) * auth(dst(e)); e += 1 }
      l2normalize(hub)
      it += 1
    }
    val vidType = vertices.schema("vid").dataType
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row](n)
    vidRows.zipWithIndex.foreach { case (v, i) =>
      rows.add(org.apache.spark.sql.Row(v, hub(i), auth(i)))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vid", vidType),
      org.apache.spark.sql.types.StructField("hub", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("authority", org.apache.spark.sql.types.DoubleType)))
    spark.createDataFrame(rows, schema)
  }
}
