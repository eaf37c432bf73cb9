package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Strongly connected components of a DIRECTED arc table — the bow-tie
  * decomposition primitive for Common-Crawl-style web graphs (Broder et
  * al.'s giant-SCC structure), complementing the undirected CC the
  * reference's graph memory uses.
  *
  * Distributed FW-coloring with trimming and MULTI-PIVOT class draining
  * (the MapReduce SCC scheme — same family as Salihoglu & Widom,
  * "Optimizing Graph Algorithms on Pregel-like Systems", VLDB'14):
  *
  *  1. TRIM: a vertex with no in-arcs or no out-arcs within the active
  *     subgraph is its own singleton SCC — peel to fixpoint. The arc set
  *     is filtered LAZILY against the latest active set (active shrinks
  *     monotonically, so only the newest set matters and the filter plan
  *     stays one join layer deep); the O(E) arc table is re-materialized
  *     once per OUTER round, never per peel.
  *  2. COLOR: propagate color(v) = max active vid that reaches v along
  *     forward arcs, run to the EXACT fixpoint (max-label rounds of one
  *     join + one map-side-combinable groupBy(max)). At the fixpoint an
  *     SCC's members share one reaching set, hence one color — the class
  *     invariant the pivot BFS below relies on, which is why this loop
  *     has no round cap (a truncated coloring can split an SCC across
  *     classes and silently fragment it).
  *  3. PIVOT BFS: each color class takes up to `pivotsPerClass` pivots
  *     (its largest vids — the class max, which always reaches the whole
  *     class, is pivot #1 by construction). ALL pivots of ALL classes run
  *     one simultaneous forward BFS and one simultaneous backward BFS,
  *     both restricted to same-color arcs and run to frontier exhaustion
  *     (never truncated: a cut-short BFS would assign a partial SCC).
  *     SCC(p) = fwd(p) ∩ bwd(p); two pivots of the same SCC find the
  *     same set, so a member takes min(pivot) as its provisional id.
  *     Restriction to same-color arcs is lossless: any p→v→p cycle lies
  *     entirely inside SCC(p), whose members all share p's fixpoint
  *     color, so every arc of the cycle is same-color.
  *  4. Remove assigned vertices, repeat.
  *
  * Each outer round assigns up to `pivotsPerClass` SCCs per color class
  * IN PARALLEL, so DAG-like regions drain in a few rounds; the giant-SCC
  * + shallow tendril shape of real web graphs typically needs 2-4 outer
  * rounds (trim absorbs the tendrils, one coloring grabs the core). The
  * adversarial worst case — a descending chain of small SCCs, one color
  * class per round — retires at least min(pivotsPerClass, |class|)
  * VERTICES per class per round (every pivot is a top-|class| vid and
  * sits inside its own SCC's output), bounding the chain case at
  * ceil(V / pivotsPerClass) outer rounds instead of one SCC per round
  * (spec-pinned on a 100-×-2-cycle chain).
  *
  * Output scc ids are canonical (min vid of the component), so results
  * are partitioning- and schedule-invariant.
  */
object Scc {

  /** @param arcs     directed (src, dst) — extra columns ignored
    * @param vertices (vid) full vertex set
    * @param pivotsPerClass SCCs retired per color class per outer round
    * @param localFinishMax if |arcs| + |vertices| is at most this, solve
    *        with ONE driver-side iterative Tarjan pass over collected
    *        arrays instead of the trim/color/pivot fixpoint (the same
    *        bounded-small-side gate as ConnectedComponents.localFinishMax
    *        and Hits.localKernelMax: the distributed scheme is O(rounds)
    *        driver barriers × O(E) exchanges — pure scheduling floor when
    *        the graph fits in one task; at web scale the count stays
    *        above any gate and the fixpoint loop runs). Identical output
    *        (canonical min-member ids) — spec-pinned against the
    *        distributed path. 0 disables the gate.
    * @return (vid, scc) with scc = min vid of the strongly connected
    *         component (every vertex assigned; singletons map to
    *         themselves)
    */
  def run(arcs: DataFrame, vertices: DataFrame, maxOuter: Int = 50,
          pivotsPerClass: Int = 16, localFinishMax: Long = 1L << 20): DataFrame = {
    val spark = arcs.sparkSession
    // pin = materialize + truncate lineage + BOUNDED stats (the raw
    // localCheckpoint carries originStats whose sizeInBytes compounds
    // through round-over-round joins — see PlanUtils.dropOriginStats).
    def pin(df: DataFrame): DataFrame =
      org.apache.spark.sql.graftx.PlanUtils.dropOriginStats(df.localCheckpoint(true))

    var active = pin(vertices.select("vid").distinct())
    var nActive = active.count()
    // The arc table restricted to a RECENT active set; trim filters it
    // lazily against the CURRENT one (strictly fewer rows, same closure).
    var arcsBase = pin(arcs.select("src", "dst").distinct()
      .join(active.select(col("vid").as("src")), "src")
      .join(active.select(col("vid").as("dst")), "dst"))
    // Gated driver Tarjan (vid types whose natural JVM order matches SQL
    // least/min, so the canonical min-member id agrees with the
    // distributed read-out — same restriction as CC's gate).
    val vidType = active.schema("vid").dataType
    val naturallyOrdered = vidType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.StringType => true
      case _ => false
    }
    if (localFinishMax > 0 && naturallyOrdered &&
        nActive + arcsBase.count() <= localFinishMax) {
      return runLocalTarjan(spark, arcsBase, active, vidType)
    }
    val assigned = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var outer = 0
    while (nActive > 0 && outer < maxOuter) {
      // ---- 1. TRIM to fixpoint: no in-arcs or no out-arcs → singleton.
      var trimmed = true
      while (trimmed && nActive > 0) {
        val arcsView = arcsBase
          .join(active.select(col("vid").as("src")), "src")
          .join(active.select(col("vid").as("dst")), "dst")
        val srcs = arcsView.select(col("src").as("vid")).distinct()
        val dsts = arcsView.select(col("dst").as("vid")).distinct()
        val keep = srcs.join(dsts, "vid") // has BOTH in- and out-arcs
        val peeled = pin(active.join(keep, Seq("vid"), "left_anti")
          .select(col("vid"), col("vid").as("scc")))
        val nPeeled = peeled.count()
        if (nPeeled == 0L) trimmed = false
        else {
          assigned += peeled
          active = pin(active.join(peeled.select("vid"), Seq("vid"), "left_anti"))
          nActive -= nPeeled
        }
      }
      if (nActive > 0) {
        // One O(E) materialization per outer round: the color loop and
        // both BFS sweeps iterate over this same restricted arc set.
        val arcsActive = pin(arcsBase
          .join(active.select(col("vid").as("src")), "src")
          .join(active.select(col("vid").as("dst")), "dst"))

        // ---- 2. COLOR: max-vid forward reachability, run to fixpoint.
        // `batchRounds` propagation hops run LAZILY between driver actions
        // (LogicalRDD re-roots keep the plan flat, the Hits idiom): one
        // pin+count per block instead of per hop — on a high-diameter
        // region (a long cycle) this cuts driver round-trips 4×. The
        // fixpoint test stays exact: values are monotone, so "no change
        // in the block's LAST hop" == fixpoint.
        def reRoot(df: DataFrame): DataFrame =
          spark.createDataFrame(df.rdd, df.schema)
        val batchRounds = 4
        def colorStep(cur: DataFrame): DataFrame = {
          val incoming = cur.join(arcsActive, cur("vid") === arcsActive("src"))
            .groupBy(col("dst").as("vid"))
            .agg(max("color").as("nbr_max"))
          cur.join(incoming, Seq("vid"), "left")
            .select(col("vid"),
              greatest(col("color"), coalesce(col("nbr_max"), col("color"))).as("color"),
              (col("nbr_max") > col("color")).as("chg"))
        }
        var colors = pin(active.select(col("vid"), col("vid").as("color")))
        var changed = 1L
        while (changed > 0) {
          var cur = colors
          var b = 1
          while (b < batchRounds) {
            cur = reRoot(colorStep(cur).select("vid", "color")); b += 1
          }
          val next = pin(colorStep(cur))
          changed = next.where(col("chg")).count()
          colors = next.select("vid", "color")
        }

        // ---- 3. Pivots: the top `pivotsPerClass` vids of each class.
        // The class max c (the one vertex with color(c) = c) is rank 1.
        val wp = Window.partitionBy("color").orderBy(col("vid").desc)
        val pivots = pin(colors.withColumn("rn", row_number().over(wp))
          .where(col("rn") <= pivotsPerClass)
          .select(col("vid").as("pivot"), col("color")))

        // Same-color arcs, labeled with the shared color.
        val colArcs = pin(arcsActive
          .join(colors.withColumnRenamed("vid", "src"), "src")
          .withColumnRenamed("color", "c_src")
          .join(colors.withColumnRenamed("vid", "dst")
            .withColumnRenamed("color", "c_dst"), "dst")
          .where(col("c_src") === col("c_dst"))
          .select(col("src"), col("dst"), col("c_src").as("color")))

        // Simultaneous multi-pivot BFS to frontier EXHAUSTION (state rows
        // are (vid, pivot, color) pairs, ≤ pivotsPerClass × class size).
        // Like the color loop, `batchRounds` frontier expansions run
        // lazily per driver action; exhaustion = the reached set stopped
        // growing across a whole block (monotone, so exact).
        def bfs(dir: DataFrame /* (from, to, color) */): DataFrame = {
          var reached = pin(pivots.select(
            col("pivot").as("vid"), col("pivot"), col("color")))
          var nReached = reached.count()
          var frontier: DataFrame = reached
          var grew = true
          while (grew) {
            var r = reached
            var f = frontier
            var b = 0
            while (b < batchRounds) {
              val cand = dir.join(f.select(col("vid").as("from"),
                  col("pivot"), col("color")), Seq("from", "color"))
                .select(col("to").as("vid"), col("pivot"), col("color")).distinct()
              f = reRoot(cand.join(r.select("vid", "pivot"),
                Seq("vid", "pivot"), "left_anti"))
              r = reRoot(r.unionByName(f))
              b += 1
            }
            val nr = pin(r)
            val n2 = nr.count()
            grew = n2 > nReached
            if (grew) {
              // Flat re-derivation over two PINNED frames — carrying the
              // lazy `f` across blocks would chain its RDD lineage.
              frontier = nr.join(reached.select("vid", "pivot"),
                Seq("vid", "pivot"), "left_anti")
              reached = nr
              nReached = n2
            }
          }
          reached
        }
        val fwd = bfs(colArcs.select(col("src").as("from"), col("dst").as("to"),
          col("color")))
        val bwd = bfs(colArcs.select(col("dst").as("from"), col("src").as("to"),
          col("color")))

        // SCC(p) = fwd(p) ∩ bwd(p); pivots of one SCC find identical sets,
        // min(pivot) dedups them into one provisional id per vertex.
        val reached = pin(fwd.select("vid", "pivot")
          .join(bwd.select("vid", "pivot"), Seq("vid", "pivot"))
          .groupBy("vid").agg(min("pivot").as("scc")))
        assigned += reached
        active = pin(active.join(reached.select("vid"), Seq("vid"), "left_anti"))
        nActive = active.count()
        arcsBase = arcsActive
      }
      outer += 1
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

  /** The gated driver path: one iterative (explicit-stack) Tarjan pass
    * over collected arrays — O(V+E), no recursion, no cluster barriers.
    * Output ids are canonical min-member vids, identical to the
    * distributed read-out.
    */
  private def runLocalTarjan(spark: org.apache.spark.sql.SparkSession,
                             arcs: DataFrame, vertices: DataFrame,
                             vidType: org.apache.spark.sql.types.DataType): DataFrame = {
    val vids = vertices.select("vid").collect().map(_.get(0))
    val n = vids.length
    val idx = new java.util.HashMap[Any, java.lang.Integer]()
    vids.zipWithIndex.foreach { case (v, i) => idx.put(v, i) }
    // CSR-ish adjacency from the collected arc rows (vertex-filtered
    // upstream, so endpoints always resolve).
    val arcRows = arcs.select("src", "dst").collect()
    val deg = new Array[Int](n + 1)
    arcRows.foreach(r => deg(idx.get(r.get(0)) + 1) += 1)
    var i = 1
    while (i <= n) { deg(i) += deg(i - 1); i += 1 }
    val fill = deg.clone()
    val adj = new Array[Int](arcRows.length)
    arcRows.foreach { r =>
      val s: Int = idx.get(r.get(0)); adj(fill(s)) = idx.get(r.get(1)); fill(s) += 1
    }
    // Iterative Tarjan.
    val index = Array.fill(n)(-1)
    val low = new Array[Int](n)
    val onStack = new Array[Boolean](n)
    val comp = Array.fill(n)(-1)
    val stack = new java.util.ArrayDeque[Integer]() // Tarjan vertex stack
    var counter = 0
    var nComp = 0
    val callV = new Array[Int](n) // explicit DFS frames: vertex + arc cursor
    val callE = new Array[Int](n)
    var root = 0
    while (root < n) {
      if (index(root) == -1) {
        var top = 0
        callV(0) = root; callE(0) = deg(root)
        index(root) = counter; low(root) = counter; counter += 1
        stack.push(root); onStack(root) = true
        while (top >= 0) {
          val v = callV(top)
          if (callE(top) < deg(v + 1)) {
            val wv = adj(callE(top)); callE(top) += 1
            if (index(wv) == -1) {
              index(wv) = counter; low(wv) = counter; counter += 1
              stack.push(wv); onStack(wv) = true
              top += 1; callV(top) = wv; callE(top) = deg(wv)
            } else if (onStack(wv) && index(wv) < low(v)) low(v) = index(wv)
          } else {
            if (low(v) == index(v)) { // v roots an SCC: pop it
              var w = -1
              while (w != v) {
                w = stack.pop(); onStack(w) = false; comp(w) = nComp
              }
              nComp += 1
            }
            top -= 1
            if (top >= 0 && low(v) < low(callV(top))) low(callV(top)) = low(v)
          }
        }
      }
      root += 1
    }
    // Canonical id = min member vid per component (natural order — the
    // gate admitted only long/int/string).
    def less(x: Any, y: Any): Boolean = (x, y) match {
      case (p: Long, q: Long)     => p < q
      case (p: Int, q: Int)       => p < q
      case (p: String, q: String) => p < q
      case _ => throw new IllegalStateException("unreachable: gated above")
    }
    val minOf = new Array[Any](nComp)
    var v = 0
    while (v < n) {
      val c = comp(v)
      if (minOf(c) == null || less(vids(v), minOf(c))) minOf(c) = vids(v)
      v += 1
    }
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row](n)
    v = 0
    while (v < n) { rows.add(org.apache.spark.sql.Row(vids(v), minOf(comp(v)))); v += 1 }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vid", vidType),
      org.apache.spark.sql.types.StructField("scc", vidType)))
    spark.createDataFrame(rows, schema)
  }
}
