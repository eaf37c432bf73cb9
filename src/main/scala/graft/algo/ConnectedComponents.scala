package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components. Two implementations behind one contract
  * (canonical component id = min vid in the component, exact at
  * convergence — north rule; matches the committed networkx goldens,
  * FIXTURES.md §4):
  *
  *  - [[run]] (default): ALTERNATING LARGE-STAR / SMALL-STAR contraction
  *    (Kiveris et al., "Connected Components in MapReduce and Beyond",
  *    SoCC'14 — SURVEY.md §2.9). Round count is O(log² V) regardless of
  *    graph DIAMETER: a 10⁴-vertex path converges in ~15 rounds where
  *    label propagation needs ~10⁴ (spec-pinned). Each round is two
  *    groupBy(min) + joins — map-side combinable, so Zipf hubs cost
  *    partial aggregation, not a hot reducer.
  *  - [[runMinLabel]]: synchronous min-label propagation — one join +
  *    one groupBy(min) per round, O(diameter) rounds. Cheaper per round;
  *    fine for small-diameter web graphs, kept for cross-checks.
  *
  * Lineage is truncated every `checkpointEvery` rounds in both.
  */
object ConnectedComponents {

  /** Per-partition union-find contraction: replaces each partition's edge
    * subset with its local spanning star (root = partition-local min).
    * Connectivity-preserving for ANY partitioning — each partition's star
    * connects exactly the vertex sets its own edges connect, and the
    * union over partitions therefore has the same transitive closure as
    * the input. Output is ≤ one pair per distinct vertex per partition,
    * so a pair set whose average local degree is d shrinks ~d× BEFORE
    * the first shuffle — the star loop (5-6 full exchanges of the pair
    * set per round) then runs on the contracted set. This is the narrow
    * (zero-shuffle) half of the two-phase CC scheme; the star loop is
    * the log-round global half.
    *
    * The local root is the partition-local min (same orderable types the
    * star loop's least/greatest handle); orientation/canonicalization is
    * NOT assumed downstream — run() re-applies least/greatest + distinct.
    */
  private[algo] def localContract(pairs: DataFrame): DataFrame = {
    val schema = pairs.schema
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.Encoders.row(schema)
    def less(x: Any, y: Any): Boolean = (x, y) match {
      case (a: Long, b: Long)     => a < b
      case (a: Int, b: Int)       => a < b
      case (a: String, b: String) => a < b
      // Root choice is arbitrary for connectivity — any deterministic
      // tie-break works for types without a natural order here.
      case _ => x.hashCode < y.hashCode
    }
    pairs.mapPartitions { it =>
      val parent = new java.util.HashMap[Any, Any]()
      val seen = new java.util.LinkedHashSet[Any]()
      def find(x: Any): Any = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.get(r)
        var c = x // path compression
        while (parent.getOrDefault(c, c) != c) {
          val n = parent.get(c); parent.put(c, r); c = n
        }
        r
      }
      it.foreach { row =>
        val a = row.get(0); val b = row.get(1)
        seen.add(a); seen.add(b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) {
          if (less(rb, ra)) parent.put(ra, rb) else parent.put(rb, ra)
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
      seen.forEach { v =>
        val r = find(v)
        if (r != v) out += org.apache.spark.sql.Row(r, v)
      }
      out.iterator
    }
  }

  /** @param arcs symmetrized (src, dst, weight) — weights ignored
    * @param vertices (vid) every vertex incl. isolated ones
    * @param preContract run [[localContract]] before the star loop
    *        (identical result — spec-pinned; off only for cross-checks)
    * @param localFinishMax if the DISTINCT contracted pair set has at most
    *        this many pairs, finish with ONE driver-side union-find
    *        instead of the star loop (the standard small-remainder phase
    *        of two-phase CC). The collect is hard-bounded (default 2²⁰
    *        pairs — the same gated-small-side pattern as
    *        PprShard.csrMaxVertices and the dedup exact-vs-LSH gates) and
    *        the count that gates it is the probe the loop needs anyway.
    *        The gate ALSO bounds the ESTIMATED COLLECTED BYTES at
    *        [[DriverGate.defaultMaxBytes]] (128 MB): a pair count that is
    *        fine for longs (~64 MB of boxed Rows) is hundreds of MB for
    *        ~40-char string entity ids, so string-vid graphs fall through
    *        to the star loop earlier (round-5 advice; same single probe
    *        action either way).
    *        Rationale: the star loop costs 5-6 full exchanges of the pair
    *        set PER ROUND times O(log V) rounds — pure driver-barrier
    *        floor when the remainder would fit in one task. At 100 TB the
    *        contracted remainder stays above any such gate and the star
    *        loop runs; 0 disables the gate (spec cross-checks).
    * @param checkpointDir durable-resume directory ([[CcCheckpoint]]):
    *        when set, the contracted pair set is persisted to disk every
    *        `diskCheckpointEvery` rounds, and a run over a dir holding a
    *        committed checkpoint RESUMES from it (skipping input rebuild
    *        and pre-contraction — the stored pair set IS the loop state).
    *        Resumed == uninterrupted exactly (deterministic rounds over an
    *        identical pair set; spec-pinned). None = in-memory only.
    * @param diskCheckpointEvery rounds between durable checkpoints
    * @return (vid, component) with component = min vid reachable, and the
    *         number of star rounds (one round = large-star + small-star;
    *         0 when the gate finished the job; includes rounds replayed
    *         from a restored checkpoint's counter)
    */
  def run(arcs: DataFrame, vertices: DataFrame, checkpointEvery: Int = 5,
          maxIter: Int = 200, preContract: Boolean = true,
          localFinishMax: Long = 1L << 20,
          checkpointDir: Option[String] = None,
          diskCheckpointEvery: Int = 10): (DataFrame, Int) = {
    val spark = arcs.sparkSession
    val t0 = System.nanoTime()
    // Re-root a persisted frame as a LogicalRDD leaf: each star round
    // references the previous edge set FOUR times (sym union ×2, then
    // join + min ×2), so chaining plans would grow the logical tree 4^k
    // across rounds — analysis time alone hangs the loop long before
    // compute does (measured round-2 pitfall; same fix as Ppr's DF path).
    // The leaf's RDD is the persisted one, so the cache still serves it.
    def reRoot(df: DataFrame): DataFrame = spark.createDataFrame(df.rdd, df.schema)

    // Unordered simple pairs (a < b) — the star edge set. `cur` is the
    // persisted handle (for unpersist); `edges` its leaf view. A committed
    // durable checkpoint replaces the whole construction: the stored pair
    // set is already contracted/canonicalized.
    val restored = checkpointDir.flatMap(d => CcCheckpoint.readLatest(spark, d))
    var cur = restored match {
      case Some(st) => st.pairs.persist(StorageLevel.MEMORY_AND_DISK)
      case None =>
        val raw0 = arcs.select(col("src").as("u"), col("dst").as("v"))
          .where(col("u") =!= col("v"))
        val raw = if (preContract) localContract(raw0) else raw0
        raw.select(least(col("u"), col("v")).as("a"),
            greatest(col("u"), col("v")).as("b"))
          .distinct()
          .persist(StorageLevel.MEMORY_AND_DISK)
    }
    // bit_xor, not sum: ANSI mode overflow-checks long sums; xor is
    // order-insensitive and exact over the DISTINCT pair set. The same
    // single action also estimates collected bytes for the driver gate.
    val p0 = DriverGate.pairProbe(cur, "a", "b")
    var nEdges = p0.rows
    // Driver union-find finish on a small contracted remainder. Only for
    // vid types whose natural JVM order matches SQL least/greatest (the
    // root choice IS the published component id here, unlike
    // localContract's arbitrary-root star): long/int/string cover every
    // graph in the engine; anything else falls through to the star loop.
    val vidType = cur.schema("a").dataType
    if (nEdges > 0L && nEdges <= localFinishMax &&
        p0.estBytes <= DriverGate.defaultMaxBytes &&
        DriverGate.naturallyOrdered(vidType)) {
      def less(x: Any, y: Any): Boolean = (x, y) match {
        case (p: Long, q: Long)     => p < q
        case (p: Int, q: Int)       => p < q
        case (p: String, q: String) => p < q
        case _ => throw new IllegalStateException("unreachable: gated above")
      }
      val parent = new java.util.HashMap[Any, Any]()
      def find(x: Any): Any = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.get(r)
        var c = x
        while (parent.getOrDefault(c, c) != c) {
          val n = parent.get(c); parent.put(c, r); c = n
        }
        r
      }
      val seen = new java.util.LinkedHashSet[Any]()
      cur.collect().foreach { row =>
        val a = row.get(0); val b = row.get(1)
        seen.add(a); seen.add(b)
        val ra = find(a); val rb = find(b)
        // Union by MIN root: the surviving root is the component minimum,
        // the same canonical id the star fixpoint converges to.
        if (ra != rb) {
          if (less(rb, ra)) parent.put(ra, rb) else parent.put(rb, ra)
        }
      }
      val lblRows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      seen.forEach(v => lblRows.add(org.apache.spark.sql.Row(v, find(v))))
      val lblSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vid", vidType),
        org.apache.spark.sql.types.StructField("root", vidType)))
      val lbl = spark.createDataFrame(lblRows, lblSchema)
      val labels = vertices.select("vid")
        .join(broadcast(lbl), Seq("vid"), "left")
        .select(col("vid"), coalesce(col("root"), col("vid")).as("component"))
      val pinned = labels.localCheckpoint(true)
      cur.unpersist(false)
      return (pinned, 0)
    }
    var lastChecksum = p0.checksum
    var edges = reRoot(cur)
    var iter = restored.map(_.iter).getOrElse(0)
    var converged = nEdges == 0L
    while (!converged && iter < maxIter) {
      // LARGE-STAR: every node u links its STRICTLY LARGER neighbors to
      // m(u) = min(N(u) ∪ {u}). Each unordered pair (a < b) appears once
      // from its smaller endpoint's perspective (b > a), so one pass over
      // the symmetric view emits exactly one pair per edge.
      val sym = edges.select(col("a").as("u"), col("b").as("v"))
        .unionAll(edges.select(col("b").as("u"), col("a").as("v")))
      val mLarge = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val afterLarge = sym.join(mLarge, "u")
        .where(col("v") > col("u"))
        // m ≤ u < v, so the pair is already ordered (m, v)
        .select(col("m").as("a"), col("v").as("b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)

      // SMALL-STAR: orient pairs toward the larger endpoint b; its
      // smaller neighbors (plus b itself) all link to m(b) = min
      // neighbor (every neighbor is < b, so the min neighbor is m).
      val mSmall = afterLarge.groupBy("b").agg(min("a").as("m"))
      val next0 = afterLarge.join(mSmall, "b")
        .select(col("a").as("x"), col("m").as("y"))
        .unionAll(mSmall.select(col("b").as("x"), col("m").as("y")))
        .where(col("x") =!= col("y"))
        .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      // Fixpoint iff the edge sets are equal. The cheap probe — size +
      // order-insensitive content checksum, ONE aggregate on the frame
      // being materialized anyway — almost never matches before the
      // fixpoint, so the EXACT set comparison (an except, a full extra
      // shuffle + barrier per round) runs only when the probe says
      // "likely converged": exactness is preserved, the per-round cost is
      // one action.
      val probe = next0.agg(count(lit(1)), expr("bit_xor(xxhash64(a, b))")).first()
      val nNext = probe.getLong(0)
      val ckNext = if (probe.isNullAt(1)) 0L else probe.getLong(1)
      val ckPrev = lastChecksum
      lastChecksum = ckNext
      converged = nNext == nEdges && ckNext == ckPrev &&
        next0.except(edges).isEmpty
      afterLarge.unpersist(false)
      cur.unpersist(false)
      // Truncate the cached RDD's own lineage periodically (a lost cache
      // partition would otherwise recompute through every prior round).
      cur = if ((iter + 1) % checkpointEvery == 0) {
        val c = next0.localCheckpoint(true); next0.unpersist(false); c
      } else next0
      edges = reRoot(cur)
      nEdges = nNext
      iter += 1
      // Durable checkpoint (CcCheckpoint): written AFTER the round's state
      // is pinned, so a kill mid-round resumes from the previous commit.
      if (!converged && checkpointDir.isDefined && iter % diskCheckpointEvery == 0)
        CcCheckpoint.write(spark, checkpointDir.get, cur, iter, nEdges,
          lastChecksum, (System.nanoTime() - t0) / 1e9)
    }
    // At the fixpoint every pair is (root = component min, member). The
    // read-out still groupBy-mins per vertex: mid-contraction (maxIter
    // exhausted before the fixpoint) a vertex can carry SEVERAL pairs,
    // and a bare left join would emit duplicate, contradictory label
    // rows — the min keeps the output well-formed (one row per vertex,
    // partial labels like the min-label variant's).
    val roots = edges.groupBy(col("b").as("vid")).agg(min(col("a")).as("root"))
    val labels = vertices
      .join(roots, Seq("vid"), "left")
      .select(col("vid"), coalesce(col("root"), col("vid")).as("component"))
    // Pin the O(V) labels and release the O(E) pair-set cache — callers
    // can't reach `cur`, so returning a frame that depends on it would
    // leak one cached edge set per CC invocation.
    val pinned = labels.localCheckpoint(true)
    cur.unpersist(false)
    (pinned, iter)
  }

  /** Synchronous min-label propagation to fixpoint:
    * label₀(v) = v;  label'(v) = min(label(v), min_{(u,v)∈arcs} label(u)).
    * O(diameter) rounds — kept as the cross-check implementation.
    */
  def runMinLabel(arcs: DataFrame, vertices: DataFrame, checkpointEvery: Int = 5,
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
    val pinned = labels.select("vid", "component").localCheckpoint(true)
    labels.unpersist(false)
    (pinned, iter)
  }
}
