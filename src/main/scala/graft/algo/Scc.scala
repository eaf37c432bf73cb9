package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Strongly connected components of a DIRECTED arc table — the bow-tie
  * decomposition primitive for Common-Crawl-style web graphs (Broder et
  * al.'s giant-SCC structure), complementing the undirected CC the
  * reference's graph memory uses.
  *
  * Distributed FW-coloring with trimming (the MapReduce SCC scheme —
  * same family as Salihoglu & Widom, "Optimizing Graph Algorithms on
  * Pregel-like Systems", VLDB'14):
  *
  *  1. TRIM: a vertex with no in-arcs or no out-arcs within the active
  *     subgraph is its own singleton SCC — peel to fixpoint (map-side
  *     degree aggregates, one join per peel).
  *  2. COLOR: propagate color(v) = max active vid that reaches v along
  *     forward arcs (max-label fixpoint — O(diameter) rounds of one
  *     join + one map-side-combinable groupBy(max)).
  *  3. PIVOT BFS: within each color class, the pivot IS the color c
  *     (c reaches every member). All classes run ONE simultaneous
  *     backward BFS from their pivots restricted to same-color members;
  *     vertices reached both ways (colored c ∧ backward-reached from c)
  *     form SCC c and are assigned scc = min member id at read-out.
  *  4. Remove assigned vertices, repeat.
  *
  * Each outer round assigns one SCC per color class IN PARALLEL, so
  * DAG-like regions drain in a few rounds; the giant-SCC + shallow
  * tendril shape of real web graphs typically needs 2-4 outer rounds
  * (trim absorbs the tendrils, one coloring grabs the core). The
  * adversarial worst case (a descending chain: one class per round) is
  * bounded by `maxOuter` and documented — batch pivoting per class is
  * the known extension if a workload ever hits it.
  *
  * Output scc ids are canonical (min vid of the component), so results
  * are partitioning- and schedule-invariant.
  */
object Scc {

  /** @param arcs     directed (src, dst) — extra columns ignored
    * @param vertices (vid) full vertex set
    * @return (vid, scc) with scc = min vid of the strongly connected
    *         component (every vertex assigned; singletons map to
    *         themselves)
    */
  def run(arcs: DataFrame, vertices: DataFrame, maxOuter: Int = 50,
          maxInner: Int = 100, checkpointEvery: Int = 5): DataFrame = {
    val spark = arcs.sparkSession
    def reRoot(df: DataFrame): DataFrame = spark.createDataFrame(df.rdd, df.schema)
    def pin(df: DataFrame): DataFrame = { // materialized, lineage-free
      df.localCheckpoint(true)
    }

    var active = pin(vertices.select("vid").distinct())
    // Arcs restricted to the active set; re-filtered as vertices retire.
    var arcsActive = pin(arcs.select("src", "dst").distinct()
      .join(active.select(col("vid").as("src")), "src")
      .join(active.select(col("vid").as("dst")), "dst"))
    val assigned = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var outer = 0
    var nActive = active.count()
    while (nActive > 0 && outer < maxOuter) {
      // ---- 1. TRIM to fixpoint: no in-arcs or no out-arcs → singleton.
      var trimmed = true
      var inner = 0
      while (trimmed && inner < maxInner) {
        val srcs = arcsActive.select(col("src").as("vid")).distinct()
        val dsts = arcsActive.select(col("dst").as("vid")).distinct()
        val keep = srcs.join(dsts, "vid") // has BOTH in- and out-arcs
        val peeled = active.join(keep, Seq("vid"), "left_anti")
          .select(col("vid"), col("vid").as("scc"))
        val nPeeled = peeled.count()
        if (nPeeled == 0L) trimmed = false
        else {
          assigned += pin(peeled)
          active = pin(active.join(keep, Seq("vid"), "semi")
            .select("vid"))
          arcsActive = pin(arcsActive
            .join(active.select(col("vid").as("src")), "src")
            .join(active.select(col("vid").as("dst")), "dst"))
          nActive -= nPeeled
        }
        inner += 1
      }
      if (nActive == 0) { outer += 1 }
      else {
        // ---- 2. COLOR: max-vid forward reachability fixpoint.
        var colors = pin(active.select(col("vid"), col("vid").as("color")))
        var changed = 1L
        var rounds = 0
        while (changed > 0 && rounds < maxInner) {
          val incoming = colors.join(arcsActive,
              colors("vid") === arcsActive("src"))
            .groupBy(col("dst").as("vid"))
            .agg(max("color").as("nbr_max"))
          val next = colors.join(incoming, Seq("vid"), "left")
            .select(col("vid"),
              greatest(col("color"), coalesce(col("nbr_max"), col("color"))).as("color"),
              (col("nbr_max") > col("color")).as("chg"))
            .persist(StorageLevel.MEMORY_AND_DISK)
          changed = next.where(col("chg")).count()
          colors =
            if ((rounds + 1) % checkpointEvery == 0 || changed == 0L) {
              val c = pin(next.select("vid", "color")); next.unpersist(false); c
            } else reRoot(next.select("vid", "color"))
          rounds += 1
        }
        // ---- 3. Simultaneous backward BFS from each class pivot,
        // restricted to same-color vertices. Reversed arcs labeled with
        // the COLOR of both endpoints must match.
        val colArcs = pin(arcsActive
          .join(colors.withColumnRenamed("vid", "src"), "src")
          .withColumnRenamed("color", "c_src")
          .join(colors.withColumnRenamed("vid", "dst")
            .withColumnRenamed("color", "c_dst"), "dst")
          .where(col("c_src") === col("c_dst"))
          .select(col("dst").as("bsrc"), col("src").as("bdst"), col("c_src").as("color")))
        var reached = pin(colors.where(col("vid") === col("color"))
          .select(col("vid"), col("color")))
        var frontier = reached
        var grew = true
        var brounds = 0
        while (grew && brounds < maxInner) {
          val cand = colArcs
            .join(frontier.select(col("vid").as("bsrc"), col("color")),
              Seq("bsrc", "color"))
            .select(col("bdst").as("vid"), col("color")).distinct()
          val fresh = pin(cand.join(reached.select("vid"), Seq("vid"), "left_anti"))
          grew = fresh.count() > 0L
          if (grew) {
            reached = pin(reached.unionByName(fresh))
            frontier = fresh
          }
          brounds += 1
        }
        // `reached` = vertices in SCC(color-pivot). Assign with the
        // PIVOT as the provisional id; canonicalize to min member below.
        assigned += reached.select(col("vid"), col("color").as("scc"))
        active = pin(active.join(reached.select("vid"), Seq("vid"), "left_anti"))
        arcsActive = pin(arcsActive
          .join(active.select(col("vid").as("src")), "src")
          .join(active.select(col("vid").as("dst")), "dst"))
        nActive = active.count()
        outer += 1
      }
    }
    require(nActive == 0L,
      s"SCC did not converge within $maxOuter outer rounds ($nActive active)")
    if (assigned.isEmpty) // empty vertex set
      return vertices.select(col("vid"), col("vid").as("scc")).limit(0)
    val all = assigned.reduce(_.unionByName(_))
    // Canonicalize: scc id = min member vid (provisional ids are pivots).
    val canon = all.groupBy("scc").agg(min("vid").as("scc_min"))
    pin(all.join(canon, "scc").select(col("vid"), col("scc_min").as("scc")))
  }
}
