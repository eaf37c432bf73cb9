package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Synchronous weighted label propagation, deterministic by construction.
  *
  * label₀(v) = v. Each round, v adopts the label with the largest incident
  * weight sum among its neighbors' labels; ties break to the SMALLEST label
  * id; vertices with no neighbors keep their label. Stops when no label
  * changes or after `maxIter` (synchronous LPA can 2-cycle on bipartite
  * structures — the cap is part of the contract, SURVEY.md §7.3.6).
  *
  * The reference ships igraph whose async LPA is seed-dependent and
  * untestable; this synchronous min-tie-break variant is the documented,
  * oracle-able replacement (FIXTURES.md §4 lpa_smoke).
  */
object LabelProp {

  def run(arcs: DataFrame, vertices: DataFrame, maxIter: Int = 20,
          checkpointEvery: Int = 5): (DataFrame, Int) = {
    // A caller may hand an already-cached arc table whose plan equals the
    // projection (entityArcs is exactly (src,dst,weight)) — re-persisting
    // the identical plan only logs CacheManager warnings, and unpersisting
    // at the end would evict the CALLER's cache. Persist only when this
    // call owns the cache entry.
    val proj = arcs.select("src", "dst", "weight")
    val ownsCache = proj.storageLevel == StorageLevel.NONE
    val edges = if (ownsCache) proj.persist(StorageLevel.MEMORY_AND_DISK) else proj
    var labels = vertices.select(col("vid"), col("vid").as("label"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val votes = labels.join(edges, labels("vid") === edges("src"))
        .groupBy(col("dst").as("vid"), col("label"))
        .agg(sum("weight").as("w"))
      val w = Window.partitionBy("vid").orderBy(col("w").desc, col("label").asc)
      val winners = votes.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("vid"), col("label").as("new_label"))
      val next0 = labels.join(winners, Seq("vid"), "left")
        .select(col("vid"),
          coalesce(col("new_label"), col("label")).as("label"),
          (coalesce(col("new_label"), col("label")) =!= col("label")).as("chg"))
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
    if (ownsCache) edges.unpersist(false)
    (labels.select("vid", "label"), iter)
  }
}
