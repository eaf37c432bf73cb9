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
  * fixpoint IS the coreness (Montresor et al.'s convergence proof).
  * Each round is closed-form, so a fixed-round unrolled SQL oracle
  * value-checks the whole run (q41, same design as q27c/q33/q35).
  *
  * Event-driven rounds (the paper's actual schedule): a vertex is DIRTY
  * while its value still falls, and a round recomputes H only for
  * vertices with ≥ 1 dirty neighbor — skipped vertices keep their value
  * (their inputs did not change, so their output could not). Round cost
  * is O(frontier arcs), not O(E); termination (zero dirty) is the exact
  * fixpoint, with no separate change-detector join. Loop mechanics
  * follow the HyperBall discipline: arcs persisted pre-hashed on BOTH
  * keys, state kept hash(vid) via partitioning-preserving
  * localCheckpoint, three frontier-sized exchanges per round (affected
  * ids, value gather by dst, h-index window by src), one action per
  * round carrying the dirty count.
  *
  * The h-index itself is a row_number window keyed by vertex — partial
  * values can't combine map-side, but the window state is one vertex's
  * neighbor list at a time (sort-based, spillable), and values are
  * capped by c(v) ≤ deg(v), so Zipf hubs cost a sort of their
  * adjacency, not a hot reducer. Rounds needed in practice: O(few) on
  * web-ish graphs; a long induced path degrades to O(path length)
  * (bounded by `maxRounds`, same caveat as min-label CC).
  */
object KCore {

  /** @param arcs     UNDIRECTED arc table (src, dst) — both directions
    *                  present (symmetrized), self-loops excluded;
    *                  deduplicated here.
    * @param vertices (vid) full vertex set; isolated vertices → 0
    * @return (vid, coreness: Long) at the fixpoint. THROWS if `maxRounds`
    *         is exhausted with dirty vertices left: the values would be
    *         upper bounds, not coreness, and returning them silently is
    *         how a chain-heavy graph ships wrong analytics (a sparse Zipf
    *         graph was measured to need a few hundred rounds —
    *         bench.KCoreProbe). Callers that explicitly tolerate bounds
    *         use [[runWithStats]] and check `converged` themselves.
    */
  def run(arcs: DataFrame, vertices: DataFrame, maxRounds: Int = 512,
          verbose: Boolean = false, localKernelMax: Long = 1L << 20,
          sizeHint: Long = -1L): DataFrame = {
    // Bounded driver kernel (the CC/HITS/Bfs/Walks gate pattern): the
    // h-index fixpoint is integer-exact, so the collected-array kernel is
    // spec-pinned EXACTLY equal to the distributed event-driven loop; on
    // a tiny graph the distributed rounds are pure scheduling floor
    // (measured 2.2 s / 22 jobs at bench sf0.1 on 31 vertices). At web
    // scale the arc count stays above any gate and the loop runs.
    // `sizeHint` (|arcs| + |vertices| if known) skips the probe scan.
    if (localKernelMax > 0 && (sizeHint < 0L || sizeHint <= localKernelMax)) {
      val pa = DriverGate.pairProbe(arcs.select("src", "dst"), "src", "dst")
      if (pa.rows <= localKernelMax && pa.estBytes <= DriverGate.defaultMaxBytes) {
        val pv = DriverGate.colProbe(vertices.select("vid"), "vid")
        if (pv.rows <= localKernelMax && pv.estBytes <= DriverGate.defaultMaxBytes)
          return runLocal(arcs, vertices, maxRounds)
      }
    }
    val (out, rounds, converged) = runWithStats(arcs, vertices, maxRounds, verbose)
    require(converged,
      s"k-core h-index iteration did not converge within $rounds rounds " +
        s"(cap $maxRounds); values are still upper bounds — raise maxRounds " +
        "or call runWithStats to accept bounds explicitly")
    out
  }

  /** The gated driver kernel: synchronous h-index iteration to the same
    * fixpoint over collected arrays (the event-driven distributed rounds
    * skip only provably-unchanged vertices, so both converge to the
    * unique coreness fixpoint — integer-exact equality).
    */
  private def runLocal(arcs: DataFrame, vertices: DataFrame, maxRounds: Int): DataFrame = {
    val spark = arcs.sparkSession
    val idx = new java.util.HashMap[Any, Integer]()
    val vids = new java.util.ArrayList[Any]()
    def id(v: Any): Int = {
      val got = idx.get(v)
      if (got != null) got.intValue()
      else { val i = vids.size(); idx.put(v, i); vids.add(v); i }
    }
    // vertex universe = the distinct vertex frame (arcs endpoints outside
    // it carry no output row, mirroring the distributed left join)
    val vertRows = vertices.select("vid").distinct().collect().map(r => id(r.get(0)))
    val nVerts = vids.size()
    val arcRows = arcs.select("src", "dst").distinct().collect()
      .filter(r => r.get(0) != r.get(1))
    // CSR over src→dst restricted to known vertices on the src side; dst
    // endpoints outside `vertices` still contribute degree (mirroring the
    // distributed degree init, which counts ALL out-arcs of a vertex).
    val ea = new scala.collection.mutable.ArrayBuffer[Int]()
    val eb = new scala.collection.mutable.ArrayBuffer[Int]()
    arcRows.foreach { r =>
      val s = idx.get(r.get(0))
      if (s != null && s.intValue() < nVerts) { ea += s.intValue(); eb += id(r.get(1)) }
    }
    val n = vids.size() // may exceed nVerts (dangling dst endpoints)
    val deg = new Array[Int](n)
    var i = 0
    while (i < ea.length) { deg(ea(i)) += 1; i += 1 }
    val start = new Array[Int](n + 1)
    i = 0; while (i < n) { start(i + 1) = start(i) + deg(i); i += 1 }
    val adj = new Array[Int](ea.length)
    val fill = new Array[Int](n)
    i = 0
    while (i < ea.length) { adj(start(ea(i)) + fill(ea(i))) = eb(i); fill(ea(i)) += 1; i += 1 }
    var c = new Array[Long](n)
    i = 0; while (i < n) { c(i) = deg(i).toLong; i += 1 }
    var next = new Array[Long](n)
    var round = 0
    var changed = true
    val buf = new scala.collection.mutable.ArrayBuffer[Long]()
    while (changed && round < maxRounds) {
      changed = false
      var v = 0
      while (v < n) {
        var e = start(v)
        buf.clear()
        while (e < start(v + 1)) { buf += c(adj(e)); e += 1 }
        val sorted = buf.sortInPlace()(Ordering.Long.reverse)
        var h = 0L
        var k = 0
        while (k < sorted.length) {
          val m = math.min(k + 1L, sorted(k))
          if (m > h) h = m
          k += 1
        }
        next(v) = math.min(c(v), h)
        if (next(v) != c(v)) changed = true
        v += 1
      }
      val t = c; c = next; next = t
      round += 1
    }
    require(!changed || round < maxRounds,
      s"k-core h-index iteration did not converge within $maxRounds rounds")
    val vidType = vertices.schema("vid").dataType
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row](nVerts)
    vertRows.foreach(v => rows.add(org.apache.spark.sql.Row(vids.get(v), c(v))))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vid", vidType),
      org.apache.spark.sql.types.StructField("coreness", org.apache.spark.sql.types.LongType)))
    spark.createDataFrame(rows, schema).localCheckpoint(true)
  }

  /** [[run]] plus (rounds executed, converged) — converged=false means
    * the maxRounds cap hit with dirty vertices left, i.e. some values
    * are still upper bounds, not final coreness. Long induced paths are
    * the degenerate case (value propagation is one hop per round).
    */
  def runWithStats(arcs: DataFrame, vertices: DataFrame, maxRounds: Int = 64,
                   verbose: Boolean = false): (DataFrame, Int, Boolean) = {
    val spark = arcs.sparkSession
    val nPart = spark.sessionState.conf.numShufflePartitions
    val dedup = arcs.select("src", "dst").where(col("src") =!= col("dst")).distinct()
    // Two hash-partitioned copies: bySrc feeds the affected→out-arcs join
    // and the degree init, byDst feeds the dirty→affected probe and the
    // neighbor-value gather. 2×E storage for exchange-free joins on both
    // keys — the space/time trade a 10^12-arc deployment makes per key.
    val bySrc = dedup.repartition(nPart, col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    val byDst = dedup.repartition(nPart, col("dst")).persist(StorageLevel.MEMORY_AND_DISK)

    // c₀ = degree (bySrc is already hash(src): groupBy reuses it), zero
    // for isolated vertices; everyone starts dirty.
    val degrees = bySrc.groupBy(col("src").as("vid")).agg(count(lit(1)).as("c"))
    // ckpt = materialize + keep partitioning + BOUNDED stats: the raw
    // localCheckpoint carries originStats whose sizeInBytes COMPOUNDS
    // through round-over-round joins (see PlanUtils.dropOriginStats —
    // a ~20-round loop drove the driver into million-digit BigInt math).
    def ckpt(df: DataFrame): DataFrame =
      org.apache.spark.sql.graftx.PlanUtils.dropOriginStats(df.localCheckpoint(true))
    var state = ckpt(vertices.select("vid").distinct()
      .join(degrees, Seq("vid"), "left")
      .select(col("vid"), coalesce(col("c"), lit(0L)).as("c"), lit(true).as("dirty"))
      .repartition(nPart, col("vid")))

    def dirtyCount(st: DataFrame): Long =
      st.agg(sum(col("dirty").cast("long"))).first().getLong(0)

    var nDirty = dirtyCount(state)
    var round = 0
    while (nDirty > 0 && round < maxRounds) {
      // Vertices with ≥1 dirty neighbor — the only ones whose H can move.
      // The distinct's exchange lands on hash(vid)=hash(src), exactly the
      // partitioning the out-arcs join needs.
      val affected = byDst
        .join(state.where(col("dirty")).select(col("vid").as("dst")), "dst")
        .select(col("src")).distinct()
      // Gather all neighbor values of affected vertices (h needs the FULL
      // neighborhood, dirty or not), then the per-vertex h-index.
      val nb = bySrc.join(affected, "src")
        .join(state.select(col("vid").as("dst"), col("c").as("nc")), "dst")
        .select(col("src").as("vid"), col("nc"))
      val w = Window.partitionBy("vid").orderBy(col("nc").desc)
      val delta = nb.withColumn("rn", row_number().over(w))
        .groupBy("vid").agg(max(least(col("rn"), col("nc"))).as("nc"))
      // Merge: recomputed vertices take min(old, new) — monotone by
      // theory, min guards float-free exactness anyway — others carry.
      val merged = state.join(delta, Seq("vid"), "left")
        .select(col("vid"),
          when(col("nc").isNotNull, least(col("c"), col("nc")))
            .otherwise(col("c")).as("c"),
          (col("nc").isNotNull && col("nc") < col("c")).as("dirty"))
      val next = ckpt(merged) // keeps hash(vid, nPart)
      nDirty = dirtyCount(next)
      state.unpersist(false)
      state = next
      round += 1
      if (verbose) System.err.println(s"[kcore] round $round dirty=$nDirty")
    }
    val out = state.select(col("vid"), col("c").as("coreness")).localCheckpoint(true)
    state.unpersist(false)
    bySrc.unpersist(false); byDst.unpersist(false)
    (out, round, nDirty == 0L)
  }
}
