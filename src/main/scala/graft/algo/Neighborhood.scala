package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.SketchOps

/** Neighborhood function N(t) — the distance distribution of a directed
  * graph: for each hop count t, how many ordered pairs (u, v) have
  * shortest-path distance exactly t. The canonical web-graph statistic
  * behind "effective diameter" and "spid" (Broder et al. WWW'00 measured
  * it on the crawl graph the reference's corpus derives from).
  *
  * Two implementations, one contract:
  *
  *  - [[exactDistribution]]: all-roots synchronous BFS — state is the
  *    reached (root, vid) pair set, O(V·reach) rows. Exact, value-SQL-
  *    oracle-able (bounded recursive CTE); the small/medium-graph path
  *    and the correctness anchor for the sketch path.
  *
  *  - [[hyperball]]: HyperBall (Boldi & Vigna, "In-core computation of
  *    geometric centralities with HyperBall", 2013 — public algorithm):
  *    per-vertex HyperLogLog sketches of the out-ball, one
  *    join + register-max union aggregate per round, O(V · 2^lgK bytes)
  *    state TOTAL
  *    regardless of reach — the only way to get a distance distribution
  *    at 10^12-page scale. Sketches are the in-house register-array HLL
  *    kernel ([[org.apache.spark.sql.graftx.RegHll]] — TypedImperative
  *    aggregates with in-place merges and map-side partials; chosen over
  *    Spark's Datasketches hll_* builtins whose per-row sketch-object
  *    allocation was measured to anti-scale on the merge-heavy path),
  *    no UDFs.
  *
  * Both follow the repo's iterative-loop discipline: LogicalRDD re-root
  * per round (chained plans grow exponentially in Catalyst), persist +
  * explicit unpersist of the previous round, localCheckpoint lineage
  * truncation.
  */
object Neighborhood {

  /** Exact distance distribution of the directed graph `arcs` restricted
    * to roots in `vertices`. Returns (hops: Long, pairs: Long), hops = 0
    * counted (one per vertex), unreachable pairs absent — ordered by
    * hops.
    */
  def exactDistribution(arcs: DataFrame, vertices: DataFrame,
                        maxRounds: Int = 64, checkpointEvery: Int = 5,
                        localKernelMax: Long = 1L << 20, sizeHint: Long = -1L): DataFrame =
    exactDistances(arcs, vertices, maxRounds, checkpointEvery, localKernelMax, sizeHint)
      .groupBy("hops").agg(count(lit(1)).as("pairs"))
      .orderBy("hops")

  /** Exact all-pairs shortest-path frame (root, vid, hops) of the
    * directed graph — every ordered pair (root → vid) with its hop
    * distance; unreachable pairs absent, (v, v, 0) present. O(V·reach)
    * rows: the exact anchor for the sketch paths, not the 10^12-scale
    * route (that is [[hyperball]]).
    */
  def exactDistances(arcs: DataFrame, vertices: DataFrame,
                     maxRounds: Int = 64, checkpointEvery: Int = 5,
                     localKernelMax: Long = 1L << 20, sizeHint: Long = -1L): DataFrame = {
    val spark = arcs.sparkSession
    // Bounded driver kernel (the CC/HITS/Triangles/Bfs gate pattern):
    // all-roots BFS over collected arrays when the graph is small. The
    // gate bounds the OUTPUT too — the result is O(roots·reach) pairs,
    // so the product roots × (2·arcs + 1) (reach ⊆ arc endpoints ∪ root)
    // must fit a driver-safe row count, not just the inputs. Hop counts
    // are integers: paths spec-pinned exactly equal. 0 disables. A
    // sizeHint (|arcs| + |vertices|) above the gate skips the probe scan
    // entirely — pure overhead at web scale (round-6 advice, the
    // Hits.run sizeHint pattern).
    if (localKernelMax > 0 && (sizeHint < 0L || sizeHint <= localKernelMax)) {
      val pa = DriverGate.pairProbe(arcs.select("src", "dst"), "src", "dst")
      if (pa.rows <= localKernelMax && pa.estBytes <= DriverGate.defaultMaxBytes) {
        val pv = DriverGate.colProbe(vertices.select("vid"), "vid")
        // Output cap in ROWS and BYTES: the result is O(roots·reach)
        // (root, vid, hops) rows, each carrying two vid payloads like an
        // arc row — scale the row cap by the probed per-arc-row byte
        // estimate so string-vid graphs fall through to the distributed
        // loop before ~2M boxed Rows of 40-char ids sit on the driver
        // (round-6 advice: the byte cap protected inputs, not output).
        val outRows = pv.rows * (2L * pa.rows + 1L)
        val perRowB = pa.estBytes / math.max(1L, pa.rows) + 8L
        if (pv.estBytes <= DriverGate.defaultMaxBytes &&
            outRows <= (1L << 21) &&
            outRows * perRowB <= 2L * DriverGate.defaultMaxBytes)
          return exactDistancesLocal(arcs, vertices, maxRounds)
      }
    }
    def reRoot(df: DataFrame): DataFrame = spark.createDataFrame(df.rdd, df.schema)
    val a0 = arcs.select("src", "dst").distinct().persist(StorageLevel.MEMORY_AND_DISK)

    // state: settled (root, vid, hops); frontier: rows new this round.
    var state = vertices.select(col("vid").as("root"), col("vid"), lit(0L).as("hops"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var stateLeaf = reRoot(state)
    var frontier = state
    var frontierLeaf = stateLeaf
    var round = 0
    var grew = true
    while (grew && round < maxRounds) {
      // Frontier-only relaxation (same argument as Bfs.hops: an
      // unweighted distance never improves once settled), keyed by root.
      val cand = a0.join(frontierLeaf.withColumnRenamed("vid", "src"), "src")
        .groupBy(col("root"), col("dst").as("vid"))
        .agg(min(col("hops") + 1L).as("hops"))
      val fresh = cand.join(stateLeaf.select("root", "vid"), Seq("root", "vid"), "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
      grew = fresh.count() > 0L
      if (grew) {
        val merged = stateLeaf.unionByName(reRoot(fresh))
        val next =
          if ((round + 1) % checkpointEvery == 0) merged.localCheckpoint(true)
          else merged.persist(StorageLevel.MEMORY_AND_DISK)
        next.count()
        state.unpersist(false)
        if (frontier ne state) frontier.unpersist(false)
        state = next
        stateLeaf = reRoot(state)
        frontier = fresh
        frontierLeaf = reRoot(fresh)
      } else {
        fresh.unpersist(false)
      }
      round += 1
    }
    val out = stateLeaf.localCheckpoint(true)
    state.unpersist(false)
    if (frontier ne state) frontier.unpersist(false)
    a0.unpersist(false)
    out
  }

  /** The gated driver kernel: per-root BFS over one collected int-indexed
    * CSR (arcs deduplicated like the distributed path), levels capped at
    * `maxRounds`. Emits the identical (root, vid, hops) pair set.
    */
  private def exactDistancesLocal(arcs: DataFrame, vertices: DataFrame,
                                  maxRounds: Int): DataFrame = {
    val spark = arcs.sparkSession
    val idx = new java.util.HashMap[Any, Integer]()
    val vids = new java.util.ArrayList[Any]()
    def id(v: Any): Int = {
      val got = idx.get(v)
      if (got != null) got.intValue()
      else { val i = vids.size(); idx.put(v, i); vids.add(v); i }
    }
    val arcRows = arcs.select("src", "dst").distinct().collect()
    val ea = new Array[Int](arcRows.length)
    val eb = new Array[Int](arcRows.length)
    var i = 0
    while (i < arcRows.length) {
      ea(i) = id(arcRows(i).get(0)); eb(i) = id(arcRows(i).get(1)); i += 1
    }
    // Parity with the distributed path on duplicate `vertices` rows: the
    // state init there emits one (v, v, 0) row PER INPUT ROW, while the
    // groupBy relaxation dedups everything past hop 0 — mirror exactly.
    val rootRows = vertices.select("vid").collect().map(r => id(r.get(0)))
    val rootIds = rootRows.distinct
    val n = vids.size()
    val outDeg = new Array[Int](n)
    i = 0; while (i < arcRows.length) { outDeg(ea(i)) += 1; i += 1 }
    val start = new Array[Int](n + 1)
    i = 0; while (i < n) { start(i + 1) = start(i) + outDeg(i); i += 1 }
    val adj = new Array[Int](arcRows.length)
    val fill = new Array[Int](n)
    i = 0
    while (i < arcRows.length) {
      adj(start(ea(i)) + fill(ea(i))) = eb(i); fill(ea(i)) += 1; i += 1
    }
    val vidType = vertices.schema("vid").dataType
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    val dist = new Array[Long](n)
    rootRows.foreach(r => // one hop-0 row per INPUT row (dup-parity above)
      rows.add(org.apache.spark.sql.Row(vids.get(r), vids.get(r), 0L)))
    rootIds.foreach { r =>
      java.util.Arrays.fill(dist, -1L)
      dist(r) = 0L
      var frontier = Array(r)
      var d = 0L
      while (frontier.nonEmpty && d < maxRounds) {
        d += 1
        val next = scala.collection.mutable.ArrayBuffer.empty[Int]
        frontier.foreach { u =>
          var p = start(u)
          while (p < start(u + 1)) {
            val v = adj(p)
            if (dist(v) < 0L) {
              dist(v) = d; next += v
              rows.add(org.apache.spark.sql.Row(vids.get(r), vids.get(v), d))
            }
            p += 1
          }
        }
        frontier = next.toArray
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("root", vidType),
      org.apache.spark.sql.types.StructField("vid", vidType),
      org.apache.spark.sql.types.StructField("hops", org.apache.spark.sql.types.LongType)))
    spark.createDataFrame(rows, schema).localCheckpoint(true)
  }

  /** Exact INBOUND harmonic centrality H(v) = Σ_{u ≠ v, d(u,v) < ∞}
    * 1 / d(u,v) — the Boldi-Vigna "axioms for centrality" pick for web
    * graphs (handles disconnectedness where closeness degenerates).
    * Unreached vertices score 0. Exact anchor for the [[hyperball]]
    * `harm` column (which computes the same sum from sketch ball-size
    * deltas — pass REVERSED arcs there to match this direction).
    */
  def harmonicExact(arcs: DataFrame, vertices: DataFrame,
                    maxRounds: Int = 64): DataFrame = {
    val d = exactDistances(arcs, vertices, maxRounds)
    val h = d.where(col("hops") > 0L)
      .groupBy(col("vid"))
      .agg(sum(lit(1.0) / col("hops")).as("h"))
    vertices.select(col("vid")).distinct()
      .join(h, Seq("vid"), "left")
      .select(col("vid"), coalesce(col("h"), lit(0.0)).as("harmonic"))
  }

  /** HyperBall: per-round estimates of the CUMULATIVE neighborhood
    * function N(t) = #pairs within distance ≤ t (t = 0 first), plus the
    * final per-vertex frame (vid, ball_size: Double, harm: Double).
    *
    * ball_{t+1}(v) = ball_t(v) ∪ ⋃_{(v,w)∈arcs} ball_t(w), with
    * Boldi-Vigna's "modified" tracking: a vertex is DIRTY while its
    * sketch bytes still change, and each round gathers only along arcs
    * whose head is dirty — so round cost is O(arcs-into-dirty + V),
    * not O(E), and the loop terminates at the exact sketch fixpoint
    * (zero dirty) rather than on a growth tolerance. On web-ish graphs
    * the dirty set collapses after ~effective-diameter rounds, which is
    * what makes the tail rounds near-free.
    *
    * Per round: one arc⋈dirty join + a register-max union aggregate
    * (declarative, so partial unions combine MAP-SIDE: shuffled bytes
    * are bounded by distinct-dirty-heads × sketch size, not gathered
    * rows), then one vid-equi-join merging the delta into the carried
    * state via the scalar union. ONE exchange per round: arcs are pre-hashed by
    * dst and the state stays hashed by vid across rounds — this loop
    * checkpoints EVERY round (not every K) because `localCheckpoint`
    * preserves outputPartitioning where the LogicalRDD re-root idiom
    * drops it, so the gather join and the state-merge join both reuse
    * the standing partitioning and only the transpose (groupBy src)
    * shuffles. The convergence probe (sum of sizes + dirty count) rides
    * the single action that materializes the round.
    *
    * `harm` accumulates Boldi-Vigna harmonic centrality from ball-size
    * deltas: harm(v) += (|B_t(v)| − |B_{t−1}(v)|) / t, clamped at ≥ 0
    * (the raw HLL estimator can jitter down by an ulp around its
    * switch-over). With `arcs` as given this is the OUTBOUND sum
    * Σ 1/d(v,u); pass reversed arcs for the standard inbound centrality
    * ([[harmonicExact]]'s direction).
    *
    * lgK=12 → 4 KiB per vertex, ~1.6% per-ball standard error; at 10^12
    * pages the state is sharded by vid and never collected.
    */
  def hyperball(arcs: DataFrame, vertices: DataFrame, lgK: Int = 12,
                maxRounds: Int = 64, localKernelMax: Long = 1L << 20,
                sizeHint: Long = -1L): (Seq[(Int, Double)], DataFrame) = {
    val spark = arcs.sparkSession
    // Bounded driver kernel (the r7 Walks/KCore/LPA gate family): each
    // distributed round is a join + two aggregates + a checkpoint — pure
    // scheduling floor on a tiny graph. The kernel calls the SAME RegHll
    // statics (hash, register update, max-merge, estimate), so the
    // per-vertex (ball_size, harm) frame is bit-identical; only the
    // curve's Σ-size differs in summation ORDER (few ulps — every
    // consumer applies a ±5% sketch gate). The vertex bound additionally
    // caps register memory (V × 2^lgK bytes ≤ 256 MB). `sizeHint` above
    // the gate skips the probe scans.
    if (localKernelMax > 0 && (sizeHint < 0L || sizeHint <= localKernelMax) &&
        vertices.schema("vid").dataType ==
          org.apache.spark.sql.types.LongType) {
      val pa = DriverGate.pairProbe(arcs.select("src", "dst"), "src", "dst")
      if (pa.rows <= localKernelMax && pa.estBytes <= DriverGate.defaultMaxBytes) {
        val pv = DriverGate.colProbe(vertices.select("vid"), "vid")
        if (pv.rows <= localKernelMax && pv.estBytes <= DriverGate.defaultMaxBytes &&
            pv.rows * org.apache.spark.sql.graftx.RegHll.numRegisters(lgK).toLong <= (1L << 28))
          return hyperballLocal(arcs, vertices, lgK, maxRounds)
      }
    }
    val nPart = spark.sessionState.conf.numShufflePartitions
    // ckpt = materialize + keep partitioning + BOUNDED stats (raw
    // localCheckpoint carries originStats whose sizeInBytes compounds
    // through round-over-round joins; see PlanUtils.dropOriginStats).
    def ckpt(df: DataFrame): DataFrame =
      org.apache.spark.sql.graftx.PlanUtils.dropOriginStats(df.localCheckpoint(true))
    // Pre-hash arcs by dst: every round's gather join then lines up with
    // the vid-hashed state without a new exchange.
    val a0 = arcs.select("src", "dst").distinct()
      .repartition(nPart, col("dst")).persist(StorageLevel.MEMORY_AND_DISK)

    // groupBy(vid) leaves the state hash(vid, nPart); localCheckpoint
    // materializes it WITH that partitioning.
    var state = ckpt(vertices.select("vid").distinct()
      .groupBy("vid").agg(SketchOps.regHllAgg(col("vid"), lgK).as("ball"))
      .select(col("vid"), col("ball"),
        SketchOps.regHllEstimate(col("ball")).as("size"),
        lit(0.0).as("harm"), lit(true).as("dirty"))
      // Explicit repartition: AQE may coalesce the groupBy's shuffle, and
      // a coalesced count would put the state out of line with a0's.
      .repartition(nPart, col("vid")))
    // One action per round: (Σ size, #dirty).
    def probe(st: DataFrame): (Double, Long) = {
      val r = st.agg(sum(col("size")), sum(col("dirty").cast("long"))).first()
      (r.getDouble(0), r.getLong(1))
    }
    var (n0, nDirty) = probe(state)
    var curve = List(0 -> n0)
    var round = 0
    while (nDirty > 0 && round < maxRounds) {
      val dirtyHeads = state.where(col("dirty"))
        .select(col("vid").as("dst"), col("ball"))
      val gathered = a0.join(dirtyHeads, "dst")
        .select(col("src").as("vid"), col("ball"))
      val delta = gathered.groupBy("vid")
        .agg(SketchOps.regHllUnionAgg(col("ball"), lgK).as("gball"))
      val merged = state.join(delta, Seq("vid"), "left")
        .withColumn("nball", when(col("gball").isNotNull,
          SketchOps.regHllUnion(col("ball"), col("gball"))).otherwise(col("ball")))
        // BinaryType equality is by content in Spark; register arrays
        // are byte-equal iff no register grew (no representation modes).
        .withColumn("ndirty", col("gball").isNotNull && !(col("nball") === col("ball")))
        .withColumn("nsize", when(col("ndirty"),
          SketchOps.regHllEstimate(col("nball"))).otherwise(col("size")))
        .select(col("vid"), col("nball").as("ball"), col("nsize").as("size"),
          (col("harm") + greatest(col("nsize") - col("size"), lit(0.0))
            / lit((round + 1).toDouble)).as("harm"),
          col("ndirty").as("dirty"))
      val next = ckpt(merged) // keeps hash(vid, nPart)
      val (nf, nd) = probe(next)
      state.unpersist(false)
      state = next
      nDirty = nd
      round += 1
      curve ::= (round -> nf)
    }
    val balls = state
      .select(col("vid"), col("size").as("ball_size"), col("harm"))
      .localCheckpoint(true)
    state.unpersist(false)
    a0.unpersist(false)
    (curve.reverse, balls)
  }

  /** The gated driver kernel: identical HyperBall rounds over collected
    * arrays, on the SAME [[org.apache.spark.sql.graftx.RegHll]] register
    * operations the distributed aggregates run — register-max union is
    * order-insensitive, the estimator scans registers in index order,
    * and the per-round harm accumulation is per-vertex sequential, so
    * the (vid, ball_size, harm) frame is exactly the distributed answer.
    */
  private def hyperballLocal(arcs: DataFrame, vertices: DataFrame,
                             lgK: Int, maxRounds: Int): (Seq[(Int, Double)], DataFrame) = {
    import org.apache.spark.sql.graftx.RegHll
    val spark = arcs.sparkSession
    val vertIds = vertices.select("vid").distinct().collect().map(_.getLong(0))
    val idx = new java.util.HashMap[java.lang.Long, Integer]()
    vertIds.zipWithIndex.foreach { case (v, i) => idx.put(v, i) }
    val n = vertIds.length
    // arcs restricted to state vertices on BOTH ends (the distributed
    // gather inner-joins dirty heads on dst and the merge left-joins
    // from the state on src)
    val arcRows = arcs.select("src", "dst").distinct().collect()
    val ea = new scala.collection.mutable.ArrayBuffer[Int]()
    val eb = new scala.collection.mutable.ArrayBuffer[Int]()
    arcRows.foreach { r =>
      val s = idx.get(java.lang.Long.valueOf(r.getLong(0)))
      val d = idx.get(java.lang.Long.valueOf(r.getLong(1)))
      if (s != null && d != null) { ea += s.intValue(); eb += d.intValue() }
    }
    val m = RegHll.numRegisters(lgK)
    val balls = Array.tabulate(n) { i =>
      val regs = new Array[Byte](m)
      RegHll.updateRegisters(regs,
        org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(vertIds(i), RegHll.Seed), lgK)
      regs
    }
    val size = Array.tabulate(n)(i => RegHll.estimate(balls(i)))
    val harm = new Array[Double](n)
    val dirty = Array.fill(n)(true)
    var nDirty = n.toLong
    var curve = List(0 -> size.sum)
    var round = 0
    while (nDirty > 0 && round < maxRounds) {
      // delta(v) = register-max over balls of DIRTY out-neighbors w
      val delta = new Array[Array[Byte]](n)
      var e = 0
      while (e < ea.length) {
        if (dirty(eb(e))) {
          val v = ea(e)
          if (delta(v) == null) delta(v) = new Array[Byte](m)
          RegHll.maxInPlace(delta(v), balls(eb(e)))
        }
        e += 1
      }
      nDirty = 0
      var v = 0
      while (v < n) {
        if (delta(v) != null) {
          val nball = java.util.Arrays.copyOf(balls(v), m)
          RegHll.maxInPlace(nball, delta(v))
          val nd = !java.util.Arrays.equals(nball, balls(v))
          val nsize = if (nd) RegHll.estimate(nball) else size(v)
          harm(v) += math.max(nsize - size(v), 0.0) / (round + 1).toDouble
          balls(v) = nball
          size(v) = nsize
          dirty(v) = nd
          if (nd) nDirty += 1
        } else dirty(v) = false
        v += 1
      }
      round += 1
      curve ::= (round -> size.sum)
    }
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row](n)
    var i = 0
    while (i < n) {
      rows.add(org.apache.spark.sql.Row(vertIds(i), size(i), harm(i))); i += 1
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vid", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ball_size", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("harm", org.apache.spark.sql.types.DoubleType)))
    (curve.reverse, spark.createDataFrame(rows, schema).localCheckpoint(true))
  }

  /** Effective diameter at quantile q (default 0.9, Broder et al.'s
    * convention) from a [[hyperball]] / cumulative-N(t) curve: the
    * smallest t whose N(t) reaches q of the final mass.
    */
  def effectiveDiameter(curve: Seq[(Int, Double)], q: Double = 0.9): Int = {
    require(curve.nonEmpty, "empty neighborhood curve")
    val target = q * curve.last._2
    curve.find(_._2 >= target).map(_._1).getOrElse(curve.last._1)
  }
}
