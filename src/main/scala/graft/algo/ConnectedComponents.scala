package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components: synchronous min-label propagation to fixpoint.
  *
  * label₀(v) = v;  label'(v) = min(label(v), min_{(u,v)∈arcs} label(u)).
  * Exact at convergence (north rule); canonical component id = min vid in
  * the component, matching the committed networkx goldens (FIXTURES.md §4).
  *
  * Each iteration is one join + one groupBy(min) — both map-side
  * combinable, so Zipf hubs cost partial-aggregation, not a hot reducer.
  * Lineage is truncated every `checkpointEvery` iterations. Iteration count
  * is bounded by the graph diameter (small for web-ish graphs); for
  * pathological chains switch to the alternating-star variant — the
  * convergence test and output contract stay the same.
  */
object ConnectedComponents {

  /** @param arcs symmetrized (src, dst, weight) — weights ignored
    * @param vertices (vid) every vertex incl. isolated ones
    * @return (vid, component) with component = min vid reachable
    */
  def run(arcs: DataFrame, vertices: DataFrame, checkpointEvery: Int = 5,
          maxIter: Int = 200): (DataFrame, Int) = {
    val edges = arcs.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    var labels = vertices.select(col("vid"), col("vid").as("component"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val incoming = labels.join(edges, labels("vid") === edges("src"))
        .groupBy(col("dst").as("vid"))
        .agg(min("component").as("nbr_min"))
      val next0 = labels.join(incoming, Seq("vid"), "left")
        .select(col("vid"),
          least(col("component"), coalesce(col("nbr_min"), col("component"))).as("component"),
          (col("nbr_min") < col("component")).as("chg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val next =
        if ((iter + 1) % checkpointEvery == 0) {
          val c = next0.localCheckpoint(true); next0.unpersist(false); c
        } else next0
      changed = next.where(col("chg")).count()
      labels.unpersist(false)
      labels = next
      iter += 1
    }
    edges.unpersist(false)
    (labels.select("vid", "component"), iter)
  }
}
