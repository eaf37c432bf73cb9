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
    * @return (vid, hub, authority), both L2-normalized at the last sweep
    */
  def run(arcs: DataFrame, vertices: DataFrame, sweeps: Int = 20,
          checkpointEvery: Int = 5): DataFrame = {
    // sweeps = 0 would leave `auth` unbound (NPE at the final join) and has
    // no meaning anyway: HITS without a power step is just the init vector.
    require(sweeps >= 1, s"HITS needs at least one sweep (got $sweeps)")
    val spark = arcs.sparkSession
    // LAZY re-root: normalized() references its input twice (norm branch
    // + value branch) — without collapsing each half-step to a LogicalRDD
    // leaf the logical plan would grow 4^sweeps. The leaf's RDD lineage
    // is a DAG (shared node), its shuffle dependencies materialize once,
    // and no action runs here.
    def reRoot(df: DataFrame): DataFrame = spark.createDataFrame(df.rdd, df.schema)
    val a0 = arcs.select(col("src"), col("dst"), col("weight").cast("double").as("weight"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val verts = vertices.select("vid").persist(StorageLevel.MEMORY_AND_DISK)
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
}
