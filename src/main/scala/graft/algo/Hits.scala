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
  * a map-side-combinable groupBy — nothing driver-side beyond the two
  * one-row norm aggregates, state is O(V), lineage truncated every
  * `checkpointEvery` sweeps. Zipf hubs cost partial aggregation, not a
  * hot reducer.
  */
object Hits {

  /** @param arcs     directed (src, dst, weight ≥ 0), no self-loops needed
    * @param vertices (vid) — every vertex, incl. ones without arcs
    * @return (vid, hub, authority), both L2-normalized at the last sweep
    */
  def run(arcs: DataFrame, vertices: DataFrame, sweeps: Int = 20,
          checkpointEvery: Int = 5): DataFrame = {
    val spark = arcs.sparkSession
    // Same lineage discipline as Ppr/CC: re-root persisted state as a
    // LogicalRDD leaf so per-sweep plans don't nest.
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

    // The norm aggregate is the half-step's one action (it materializes
    // the persisted frame it runs on); the division is then a literal —
    // no crossJoin broadcast plan, and the L2 norm is exact over the
    // zero-filled full vertex set.
    def norm(scores: DataFrame, c: String): Double = {
      val n = scores.agg(sqrt(sum(col(c) * col(c)))).first().getDouble(0)
      if (n == 0.0) 1.0 else n // all-zero side: keep zeros, don't NaN
    }

    var hub = verts.select(col("vid"), lit(1.0).as("h")).localCheckpoint(true)
    var prevA: Option[DataFrame] = None // previous sweep's persisted a-state
    var prevH: Option[DataFrame] = None
    var auth: DataFrame = null
    var it = 0
    while (it < sweeps) {
      val aFull = gather(hub, "src", "a").persist(StorageLevel.MEMORY_AND_DISK)
      val aN = aFull.select(col("vid"), (col("a") / lit(norm(aFull, "a"))).as("a"))
      val hFull = gather(aN, "dst", "h").persist(StorageLevel.MEMORY_AND_DISK)
      val hN = hFull.select(col("vid"), (col("h") / lit(norm(hFull, "h"))).as("h"))
      // Both states of this sweep are materialized (norm actions above) —
      // the previous sweep's caches are now unreachable.
      prevA.foreach(_.unpersist(false)); prevH.foreach(_.unpersist(false))
      hub = if ((it + 1) % checkpointEvery == 0 || it + 1 == sweeps)
        hN.localCheckpoint(true) // truncate the cross-sweep RDD lineage
      else reRoot(hN)
      auth = aN
      prevA = Some(aFull); prevH = Some(hFull)
      it += 1
    }
    val out = hub.join(auth, "vid")
      .select(col("vid"), col("h").as("hub"), col("a").as("authority"))
      .localCheckpoint(true)
    prevA.foreach(_.unpersist(false)); prevH.foreach(_.unpersist(false))
    a0.unpersist(false); verts.unpersist(false)
    out
  }
}
