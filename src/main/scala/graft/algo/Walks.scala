package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deterministic "random"-walk corpus generation — the DeepWalk /
  * node2vec data-prep primitive (Perozzi et al. KDD'14): `walksPerVertex`
  * walks of length `walkLen` from every vertex, emitted as one row per
  * visited position. At 100 TB this is the job that turns a web link
  * graph into embedding-training sequences, so determinism matters twice:
  * reruns must produce identical corpora (resumable pipelines), and the
  * step rule must be engine-portable for oracle checking.
  *
  * Step rule: at position t the walk at vertex v moves to the neighbor
  * with index  h(seed, start, walk, t) mod outdeg(v)  in v's dst-sorted
  * adjacency, where h = the first 8 md5 hex digits as a long — the same
  * portable md5 arithmetic as the MinHash kernel (`conv(hex,16,10)` in
  * Spark == `CAST('0x'||hex AS BIGINT)` in DuckDB, Dedup.scala:137).
  * Hashing (start, walk, t) — not the current vertex — keeps successive
  * picks independent; dead ends (outdeg 0) stop the walk.
  *
  * Scale shape: walk state is (start, walk, cur) — W·V rows, never the
  * history; each step is one 1:1 join against the degree table plus one
  * equi-join on (src, idx) against the indexed adjacency (no candidate
  * blowup: the choice index is computed BEFORE the adjacency join).
  * `batchRounds` steps run lazily per action (the Hits idiom), and the
  * indexed adjacency is built once — two window functions over one
  * shuffle by src — and reused by every step.
  */
object Walks {

  /** @param arcs     directed (src, dst) — extra columns ignored, parallel
    *                  arcs collapse (distinct)
    * @param vertices (vid) walk starts — every vertex, walksPerVertex each
    * @return (start, walk, step, vid): position `step` ∈ [0, walkLen] of
    *         walk `walk` ∈ [0, walksPerVertex) started at `start`; walks
    *         from dead-end vertices end early
    */
  def randomWalks(arcs: DataFrame, vertices: DataFrame, walkLen: Int,
                  walksPerVertex: Int, seed: String = "w",
                  batchRounds: Int = 4, localKernelMax: Long = 1L << 20,
                  sizeHint: Long = -1L): DataFrame = {
    require(walkLen >= 0 && walksPerVertex >= 1)
    val spark = arcs.sparkSession
    // Bounded driver kernel (the CC/HITS/Bfs gate pattern): the walkLen
    // distributed steps are 2 joins + a checkpoint each — pure scheduling
    // floor when the graph fits one task (measured 4.3 s / 46 jobs on a
    // 31-vertex entity graph). The md5 step rule is integer-exact and the
    // adjacency index order is replicated byte-for-byte (SQL UTF8 binary
    // sort), so the paths are spec-pinned EXACTLY equal. At web scale the
    // arc count stays above any gate and the distributed loop runs.
    // `sizeHint` (|arcs| + |vertices| if the caller knows it) skips the
    // probe scan, which is pure overhead where the gate can never fire.
    if (localKernelMax > 0 &&
        DriverGate.naturallyOrdered(vertices.schema("vid").dataType)) {
      val outRowsCap = 1L << 21
      if (sizeHint >= 0L) {
        if (sizeHint <= localKernelMax) {
          val pv = DriverGate.colProbe(vertices.select("vid"), "vid")
          val pa = DriverGate.pairProbe(arcs.select("src", "dst"), "src", "dst")
          if (boundedForLocal(pa, pv, localKernelMax, walkLen, walksPerVertex, outRowsCap))
            return randomWalksLocal(arcs, vertices, walkLen, walksPerVertex, seed)
        }
      } else {
        val pa = DriverGate.pairProbe(arcs.select("src", "dst"), "src", "dst")
        if (pa.rows <= localKernelMax && pa.estBytes <= DriverGate.defaultMaxBytes) {
          val pv = DriverGate.colProbe(vertices.select("vid"), "vid")
          if (boundedForLocal(pa, pv, localKernelMax, walkLen, walksPerVertex, outRowsCap))
            return randomWalksLocal(arcs, vertices, walkLen, walksPerVertex, seed)
        }
      }
    }
    def reRoot(df: DataFrame): DataFrame = spark.createDataFrame(df.rdd, df.schema)

    val adj0 = arcs.select("src", "dst").distinct()
    val wIdx = Window.partitionBy("src").orderBy("dst")
    val indexed = adj0
      .select(col("src"), col("dst"), (row_number().over(wIdx) - 1L).as("idx"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val degs = indexed.groupBy("src").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    degs.count() // materialize both (indexed feeds degs' plan)

    import spark.implicits._
    val walkIds = (0L until walksPerVertex.toLong).toDF("walk")
    var state = vertices.select(col("vid").as("start"))
      .crossJoin(broadcast(walkIds))
      .select(col("start"), col("walk"), col("start").as("cur"))
      .localCheckpoint(true)
    val out = scala.collection.mutable.ArrayBuffer[DataFrame](
      state.select(col("start"), col("walk"), lit(0L).as("step"),
        col("cur").as("vid")))

    var t = 1
    while (t <= walkLen) {
      var cur = state
      val tEnd = math.min(t + batchRounds - 1, walkLen)
      while (t <= tEnd) {
        // Portable pick: first 8 md5 hex digits of "seed|start|walk|t".
        val pick = conv(substring(md5(concat_ws("|",
          lit(seed), col("start"), col("walk"), lit(t))), 1, 8), 16, 10)
          .cast("long")
        val chosen = cur
          .join(degs.withColumnRenamed("src", "cur"), Seq("cur")) // dead ends drop
          .withColumn("idx", pmod(pick, col("deg")))
          .withColumnRenamed("cur", "src")
          .join(indexed, Seq("src", "idx"))
          .select(col("start"), col("walk"), col("dst").as("cur"))
        out += chosen.select(col("start"), col("walk"), lit(t.toLong).as("step"),
          col("cur").as("vid"))
        cur = reRoot(chosen)
        t += 1
      }
      state = cur.localCheckpoint(true)
      // Rebase this batch's emitted slices onto the SAME materialization
      // lineage: slices before the checkpoint would otherwise recompute
      // their join chains per consumer. Cheap: each slice is state-shaped.
      out(out.length - 1) = state.select(col("start"), col("walk"),
        lit((t - 1).toLong).as("step"), col("cur").as("vid"))
    }
    val res = out.reduce(_ unionByName _).localCheckpoint(true)
    indexed.unpersist(false)
    degs.unpersist(false)
    res
  }

  private def boundedForLocal(pa: DriverGate.Probe, pv: DriverGate.Probe,
                              localKernelMax: Long, walkLen: Int,
                              walksPerVertex: Int, outRowsCap: Long): Boolean =
    pa.rows <= localKernelMax && pa.estBytes <= DriverGate.defaultMaxBytes &&
      pv.estBytes <= DriverGate.defaultMaxBytes &&
      pv.rows * walksPerVertex.toLong * (walkLen + 1L) <= outRowsCap

  /** The gated driver kernel: identical walks over a collected adjacency.
    * Replicates the SQL step rule bit-for-bit — neighbor lists sorted in
    * Spark's binary order ([[DriverGate.sqlOrdering]]), the pick index is
    * the first 8 md5 hex digits of "seed|start|walk|t" (concat_ws renders
    * long/int vids in decimal, exactly like String.valueOf) mod outdeg.
    */
  private def randomWalksLocal(arcs: DataFrame, vertices: DataFrame,
                               walkLen: Int, walksPerVertex: Int,
                               seed: String): DataFrame = {
    val spark = arcs.sparkSession
    val ord = DriverGate.sqlOrdering(vertices.schema("vid").dataType)
    // distinct like the distributed adj0; group dsts per src, sort by ord
    val arcRows = arcs.select("src", "dst").distinct().collect()
    val adj = new java.util.HashMap[Any, scala.collection.mutable.ArrayBuffer[Any]]()
    arcRows.foreach { r =>
      adj.computeIfAbsent(r.get(0), _ => scala.collection.mutable.ArrayBuffer.empty[Any])
        .append(r.get(1))
    }
    adj.values().forEach(buf => { val s = buf.sortInPlace()(ord); () })
    // one walk set per INPUT vertex row (the distributed crossJoin does
    // not dedup starts — duplicate rows yield duplicate walks)
    val starts = vertices.select("vid").collect().map(_.get(0))
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = "0123456789abcdef".toCharArray
    def pick(start: Any, walk: Long, t: Int, deg: Int): Int = {
      md.reset()
      val s = seed + "|" + start.toString + "|" + walk + "|" + t
      val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 8 hex digits == first 4 bytes, as an unsigned 32-bit value
      var h = 0L
      var i = 0
      while (i < 4) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
      (h % deg).toInt
    }
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    starts.foreach { start =>
      var w = 0L
      while (w < walksPerVertex) {
        var cur = start
        rows.add(org.apache.spark.sql.Row(start, w, 0L, cur))
        var t = 1
        var dead = false
        while (t <= walkLen && !dead) {
          val nbrs = adj.get(cur)
          if (nbrs == null) dead = true
          else {
            cur = nbrs(pick(start, w, t, nbrs.length))
            rows.add(org.apache.spark.sql.Row(start, w, t.toLong, cur))
          }
          t += 1
        }
        w += 1
      }
    }
    val vidType = vertices.schema("vid").dataType
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("start", vidType),
      org.apache.spark.sql.types.StructField("walk", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("step", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("vid", vidType)))
    spark.createDataFrame(rows, schema).localCheckpoint(true)
  }

  /** Skip-gram (center, context) pair counts over a walk corpus — the
    * word2vec/DeepWalk training-pair generator that consumes
    * [[randomWalks]] (Perozzi et al. KDD'14 §4.2: each position pairs
    * with every other position within `window` steps, both directions).
    *
    * Scale shape: `lead(vid, k)` over Window.partitionBy(start, walk).
    * orderBy(step) for k ≤ window — 2·window projected pair streams, NO
    * join — followed by one map-side-combinable count per (center,
    * context). The earlier self-equi-join on (start, walk) materialized
    * O(L²) intermediate rows per walk before the |Δstep| ≤ window filter
    * — fine at walkLen 8, a 25–100× blowup at the walkLen 40–80 a real
    * node2vec corpus uses (round-6 verdict #6); the window form is
    * O(L·window) with one sort per walk. At 100 TB this is one shuffle
    * on walk ids (uniform by construction) then one on vertex pairs
    * (Zipf, but partial-agg absorbs the hubs).
    *
    * @param walks (start, walk, step, vid) — [[randomWalks]] output.
    *              (start, walk, step) must be unique, which randomWalks
    *              guarantees for a duplicate-free vertex frame — steps
    *              within a walk are consecutive, so `lead` by k rows IS
    *              the pair at step distance k.
    * @return (center, context, pairs), pairs = co-occurrence count
    */
  def skipGramPairs(walks: DataFrame, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1 (got $window)")
    val w = Window.partitionBy("start", "walk").orderBy("step")
    val leads = walks.select(
      (col("vid") +: (1 to window).map(k => lead(col("vid"), k).over(w).as(s"l$k"))): _*)
    val pairs = (1 to window).map { k =>
      val present = leads.where(col(s"l$k").isNotNull)
      // both directions: (v, v+k) and (v+k, v) — the join form counted
      // each ordered pair once per sign of Δstep
      present.select(col("vid").as("center"), col(s"l$k").as("context"))
        .unionAll(present.select(col(s"l$k").as("center"), col("vid").as("context")))
    }.reduce(_ unionAll _)
    pairs.groupBy("center", "context").agg(count(lit(1)).as("pairs"))
  }
}
