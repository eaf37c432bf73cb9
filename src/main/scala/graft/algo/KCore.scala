package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** k-core decomposition: coreness(v) = the largest k such that v belongs
  * to a subgraph where every vertex has degree ≥ k. The standard
  * web-graph density/spam signal (dense cores ≈ link farms / hot
  * communities; the reference's entity graph concentrates its synonymy
  * edges exactly there).
  *
  * Distributed h-index iteration (Montresor, De Pellegrini & Miorandi,
  * "Distributed k-core decomposition", IEEE TPDS 2013 — public
  * algorithm): start c(v) = deg(v), repeat
  *
  *   c(v) ← H({ c(u) : u ∈ N(v) })
  *
  * where H is the h-index (largest h with ≥ h neighbors of value ≥ h).
  * Every c(v) is non-increasing and lower-bounded by coreness(v); the
  * fixpoint IS the coreness (Lübeck/Montresor convergence proof). Each
  * round is closed-form, so a fixed-round unrolled SQL oracle
  * value-checks the whole run (q41, same design as q27c/q33/q35).
  *
  * Scale shape: one arc join + one per-vertex h-index per round. The
  * h-index uses a row_number window keyed by vertex — partial values
  * can't combine map-side, but the window state is one vertex's
  * neighbor list at a time (sort-based, spillable), and values are
  * capped by the current c(v) ≤ deg(v), so Zipf hubs cost a sort of
  * their adjacency, not a hot reducer. Rounds needed in practice:
  * O(few) on web-ish graphs (bounded here by `maxRounds`).
  */
object KCore {

  /** @param arcs     UNDIRECTED arc table (src, dst) — both directions
    *                  present (symmetrized), self-loops excluded;
    *                  deduplicated here.
    * @param vertices (vid) full vertex set; isolated vertices → 0
    * @return (vid, coreness: Long) at the fixpoint
    */
  def run(arcs: DataFrame, vertices: DataFrame,
          maxRounds: Int = 64, checkpointEvery: Int = 5): DataFrame = {
    val spark = arcs.sparkSession
    def reRoot(df: DataFrame): DataFrame = spark.createDataFrame(df.rdd, df.schema)
    val a0 = arcs.select("src", "dst").where(col("src") =!= col("dst"))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val verts = vertices.select("vid").distinct().persist(StorageLevel.MEMORY_AND_DISK)

    def zeroFill(partial: DataFrame, c: String): DataFrame =
      verts.join(partial, Seq("vid"), "left")
        .select(col("vid"), coalesce(col(c), lit(0L)).as(c))

    // One h-index round: gather neighbor values along arcs, rank them
    // descending per vertex, H = max(min(rank, value)).
    def hIndexRound(state: DataFrame): DataFrame = {
      val nb = a0.join(state.withColumnRenamed("vid", "dst").withColumnRenamed("c", "nc"), "dst")
        .select(col("src").as("vid"), col("nc"))
      val w = Window.partitionBy("vid").orderBy(col("nc").desc)
      val h = nb.withColumn("rn", row_number().over(w))
        .groupBy("vid").agg(max(least(col("rn"), col("nc"))).as("c"))
      zeroFill(h, "c")
    }

    var state = zeroFill(
      a0.groupBy(col("src").as("vid")).agg(count(lit(1)).as("c")), "c")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var stateLeaf = reRoot(state)
    var round = 0
    var changed = true
    while (changed && round < maxRounds) {
      val next0 = hIndexRound(stateLeaf)
      val next =
        if ((round + 1) % checkpointEvery == 0) next0.localCheckpoint(true)
        else next0.persist(StorageLevel.MEMORY_AND_DISK)
      val nextLeaf = reRoot(next)
      // Convergence probe = the one action that materializes the round.
      changed = nextLeaf.join(stateLeaf.withColumnRenamed("c", "pc"), "vid")
        .where(col("c") =!= col("pc")).limit(1).count() > 0L
      state.unpersist(false)
      state = next
      stateLeaf = nextLeaf
      round += 1
    }
    val out = stateLeaf.select(col("vid"), col("c").as("coreness"))
      .localCheckpoint(true)
    state.unpersist(false)
    a0.unpersist(false); verts.unpersist(false)
    out
  }
}
