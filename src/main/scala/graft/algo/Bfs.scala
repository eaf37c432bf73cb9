package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Multi-source BFS hop distance over an arc table — "how far is every
  * page/entity from the seed set", the link-graph primitive behind crawl
  * frontier depth, seed-expansion neighborhoods and HippoRAG-style
  * "k-hop from the query entities" analyses (the reference's dense PPR
  * damping plays this role probabilistically; hops are its hard-edged
  * counterpart).
  *
  * Synchronous min-plus relaxation (Bellman-Ford specialization): each
  * round one join + one map-side-combinable groupBy(min); state is the
  * frontier-reached vertex set only (not all V), so early rounds shuffle
  * O(|reached|), not O(V). Converges in `diameter(reached region)`
  * rounds — web graphs are small-diameter, and the round bound is
  * explicit (`maxRounds`). Lineage truncated every `checkpointEvery`
  * rounds like the other iterative jobs.
  */
object Bfs {

  /** @param arcs     directed (src, dst, ...) — symmetrize first for
    *                  undirected semantics
    * @param vertices (vid) full vertex set
    * @param seeds    (vid) distance-0 set (deduplicated here)
    * @param localKernelMax if BOTH the arc set and the seed set are at
    *        most this many rows (and their estimated collected bytes fit
    *        [[DriverGate.defaultMaxBytes]]), run ONE driver-side
    *        multi-source BFS over collected arrays instead of
    *        O(diameter) distributed rounds — the same bounded small-side
    *        gate as CC/HITS/Triangles (each distributed round is ~3
    *        scheduled stages of pure barrier floor on a tiny graph; hop
    *        counts are integers, so the paths are spec-pinned EXACTLY
    *        equal). At web scale the arc count stays above any gate and
    *        the frontier loop runs. 0 disables the gate.
    * @return (vid, hops) for EVERY vertex; unreachable → null hops
    */
  /** @param sizeHint |arcs| + |seeds| if the caller already knows it —
    *        a hint ABOVE `localKernelMax` skips the gate's O(E) probe
    *        scan entirely (pure overhead at web scale, where the gate
    *        can never fire; the Hits.run sizeHint pattern, round-6
    *        advice). Negative = unknown, probe runs.
    */
  def hops(arcs: DataFrame, vertices: DataFrame, seeds: DataFrame,
           maxRounds: Int = 64, checkpointEvery: Int = 5,
           localKernelMax: Long = 1L << 20, sizeHint: Long = -1L): DataFrame = {
    val spark = arcs.sparkSession
    if (localKernelMax > 0 && (sizeHint < 0L || sizeHint <= localKernelMax)) {
      val pa = DriverGate.pairProbe(arcs.select("src", "dst"), "src", "dst")
      if (pa.rows <= localKernelMax && pa.estBytes <= DriverGate.defaultMaxBytes) {
        val ps = DriverGate.colProbe(seeds.select("vid"), "vid")
        if (ps.rows <= localKernelMax && ps.estBytes <= DriverGate.defaultMaxBytes)
          return hopsLocal(arcs, vertices, seeds, maxRounds)
      }
    }
    def reRoot(df: DataFrame): DataFrame = spark.createDataFrame(df.rdd, df.schema)
    val a0 = arcs.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)

    var reached = seeds.select(col("vid")).distinct()
      .select(col("vid"), lit(0L).as("hops"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var reachedLeaf = reRoot(reached)
    var frontier = reached // rows whose hops value is new this round
    var frontierLeaf = reachedLeaf
    var round = 0
    var grew = true
    while (grew && round < maxRounds) {
      // Only the FRONTIER gathers: a settled vertex relaxes nothing new
      // (unweighted hops never improve once assigned), so each round's
      // join is O(frontier arcs), not O(reached arcs).
      val cand = a0.join(frontierLeaf.withColumnRenamed("vid", "src"), "src")
        .groupBy(col("dst").as("vid")).agg(min(col("hops") + 1L).as("hops"))
      val fresh = cand.join(reachedLeaf.select("vid"), Seq("vid"), "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
      grew = fresh.count() > 0L
      if (grew) {
        val merged = reachedLeaf.unionByName(reRoot(fresh))
        val next =
          if ((round + 1) % checkpointEvery == 0) merged.localCheckpoint(true)
          else merged.persist(StorageLevel.MEMORY_AND_DISK)
        next.count() // materialize before releasing parents
        reached.unpersist(false)
        if (frontier ne reached) frontier.unpersist(false)
        reached = next
        reachedLeaf = reRoot(reached)
        frontier = fresh
        frontierLeaf = reRoot(fresh)
      } else {
        fresh.unpersist(false)
      }
      round += 1
    }
    val out = vertices.select("vid")
      .join(reachedLeaf, Seq("vid"), "left")
      .select(col("vid"), col("hops"))
      .localCheckpoint(true)
    reached.unpersist(false)
    if (frontier ne reached) frontier.unpersist(false)
    a0.unpersist(false)
    out
  }

  /** The gated driver kernel: identical multi-source BFS over collected
    * int-indexed adjacency arrays, levels capped at `maxRounds` like the
    * distributed loop.
    */
  private def hopsLocal(arcs: DataFrame, vertices: DataFrame, seeds: DataFrame,
                        maxRounds: Int): DataFrame = {
    val spark = arcs.sparkSession
    val idx = new java.util.HashMap[Any, Integer]()
    val vids = new java.util.ArrayList[Any]()
    def id(v: Any): Int = {
      val got = idx.get(v)
      if (got != null) got.intValue()
      else { val i = vids.size(); idx.put(v, i); vids.add(v); i }
    }
    val arcRows = arcs.select("src", "dst").collect()
    val ea = new Array[Int](arcRows.length)
    val eb = new Array[Int](arcRows.length)
    var i = 0
    while (i < arcRows.length) {
      ea(i) = id(arcRows(i).get(0)); eb(i) = id(arcRows(i).get(1)); i += 1
    }
    val seedIds = seeds.select("vid").distinct().collect().map(r => id(r.get(0)))
    val n = vids.size()
    // CSR out-adjacency
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
    val dist = Array.fill(n)(-1L)
    var frontier = seedIds.distinct.toArray
    frontier.foreach(s => dist(s) = 0L)
    var d = 0L
    while (frontier.nonEmpty && d < maxRounds) {
      d += 1
      val next = scala.collection.mutable.ArrayBuffer.empty[Int]
      frontier.foreach { u =>
        var p = start(u)
        while (p < start(u + 1)) {
          val v = adj(p)
          if (dist(v) < 0L) { dist(v) = d; next += v }
          p += 1
        }
      }
      frontier = next.toArray
    }
    val vidType = vertices.schema("vid").dataType
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    i = 0
    while (i < n) {
      if (dist(i) >= 0L) rows.add(org.apache.spark.sql.Row(vids.get(i), dist(i)))
      i += 1
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vid", vidType),
      org.apache.spark.sql.types.StructField("hops", org.apache.spark.sql.types.LongType)))
    val lbl = spark.createDataFrame(rows, schema)
    vertices.select("vid")
      .join(broadcast(lbl), Seq("vid"), "left")
      .select(col("vid"), col("hops"))
      .localCheckpoint(true)
  }
}
