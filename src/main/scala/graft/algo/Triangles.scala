package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting by degree orientation (the standard two-join scheme).
  *
  * Every undirected edge is oriented from the endpoint with the smaller
  * (degree, vid) to the larger, which caps each vertex's oriented
  * out-degree at O(√E) — the classic mitigation that keeps the wedge join
  * from exploding on Zipf hubs. Wedges (a→b, a→c) close iff oriented edge
  * (b→c) exists; each triangle is found exactly once.
  *
  * Oracle: `networkx.triangles` (FIXTURES.md §4 tri_smoke).
  */
object Triangles {

  /** @param arcs symmetrized (src, dst, weight)
    * @param localKernelMax if the DISTINCT undirected edge set has at most
    *        this many pairs (and its estimated collected bytes fit
    *        [[DriverGate.defaultMaxBytes]]), count triangles in ONE driver
    *        kernel over collected arrays instead of the two-join wedge
    *        pipeline — the same bounded small-side gate as CC's
    *        localFinishMax / HITS' localKernelMax. Rationale: the wedge
    *        pipeline is ~5 scheduled stages riding the per-job floor on a
    *        tiny graph (q25 swung 3.6→5.8 s at bench sf0.1 on a 31-vertex
    *        graph — round-5 "what's wrong" #3); the probe that gates it is
    *        the eager count the pipeline took anyway. The kernel is the
    *        identical degree-oriented merge-intersection, O(E^1.5) like
    *        the distributed plan, exact (spec-pinned equal; counts are
    *        integers so there is no fp-order question). At web scale the
    *        edge count stays above any gate and the wedge join runs. 0
    *        disables the gate.
    * @return (perVertex: (vid, triangles), total count)
    */
  def run(arcs: DataFrame, vertices: DataFrame,
          localKernelMax: Long = 1L << 20): (DataFrame, Long) = {
    // Undirected edge set, one row per unordered pair.
    val und = arcs.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .persist() // feeds degrees, orientation, and the closing probe
    // Eager probe (avoids branch-stage recompute races within one action);
    // doubles as the driver-kernel gate, row- AND byte-bounded.
    val probe = DriverGate.pairProbe(und, "a", "b")
    if (localKernelMax > 0 && probe.rows <= localKernelMax &&
        probe.estBytes <= DriverGate.defaultMaxBytes) {
      val out = runLocal(und.collect(), vertices)
      und.unpersist(false)
      return out
    }
    val deg = und.select(col("a").as("v")).unionAll(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))

    val withDeg = und
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), "b")
    val oriented = withDeg.select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("lo"), col("b").as("hi")))
          .otherwise(struct(col("b").as("lo"), col("a").as("hi"))).as("e"))
      .select(col("e.lo").as("u"), col("e.hi").as("v"))

    val e1 = oriented.select(col("u").as("a"), col("v").as("b"))
    val e2 = oriented.select(col("u").as("a2"), col("v").as("c"))
    // b<c alone enumerates each unordered wedge exactly once (e1/e2 range
    // over the same oriented edge set).
    val wedges = e1.join(e2, e1("a") === e2("a2") && e1("b") < e2("c"))
      .select(col("a"), col("b"), col("c"))
    // Wedge endpoints are normalized b<c, so the undirected (a<b) edge set
    // is directly the closing-edge probe table.
    val closing = und.select(col("a").as("b"), col("b").as("c"))
    val tris = wedges.join(closing, Seq("b", "c")).persist()
    val total = tris.count()
    val perVertex = tris.select(explode(array(col("a"), col("b"), col("c"))).as("vid"))
      .groupBy("vid").agg(count(lit(1)).as("triangles"))
    val all = vertices.select("vid")
      .join(perVertex, Seq("vid"), "left")
      .select(col("vid"), coalesce(col("triangles"), lit(0L)).as("triangles"))
    // Pin the O(V) result and release the O(E)/O(wedges) working caches —
    // callers can't reach `und`/`tris`, so returning a frame that depends
    // on them would leak two cached frames per invocation in a long-lived
    // serving JVM (same localCheckpoint-then-unpersist discipline as
    // ConnectedComponents.run).
    val pinned = all.localCheckpoint(true)
    tris.unpersist(false)
    und.unpersist(false)
    (pinned, total)
  }

  /** The gated driver kernel: the same degree-oriented scheme over int-
    * indexed sorted adjacency arrays — orient lo→hi by (degree, index),
    * merge-intersect out-neighborhoods per oriented edge; each common
    * out-neighbor w of (u, v) is triangle {u, v, w}, found exactly once.
    */
  private def runLocal(pairs: Array[org.apache.spark.sql.Row],
                       vertices: DataFrame): (DataFrame, Long) = {
    val spark = vertices.sparkSession
    val idx = new java.util.HashMap[Any, Integer]()
    val vids = new java.util.ArrayList[Any]()
    def id(v: Any): Int = {
      val got = idx.get(v)
      if (got != null) got.intValue()
      else { val i = vids.size(); idx.put(v, i); vids.add(v); i }
    }
    val ea = new Array[Int](pairs.length)
    val eb = new Array[Int](pairs.length)
    var i = 0
    while (i < pairs.length) {
      ea(i) = id(pairs(i).get(0)); eb(i) = id(pairs(i).get(1)); i += 1
    }
    val n = vids.size()
    val deg = new Array[Int](n)
    i = 0
    while (i < pairs.length) { deg(ea(i)) += 1; deg(eb(i)) += 1; i += 1 }
    // Orient each (distinct) edge from the (deg, idx)-smaller endpoint.
    def before(x: Int, y: Int): Boolean = deg(x) < deg(y) || (deg(x) == deg(y) && x < y)
    val outDeg = new Array[Int](n)
    i = 0
    while (i < pairs.length) {
      if (before(ea(i), eb(i))) outDeg(ea(i)) += 1 else outDeg(eb(i)) += 1
      i += 1
    }
    val start = new Array[Int](n + 1)
    i = 0
    while (i < n) { start(i + 1) = start(i) + outDeg(i); i += 1 }
    val adj = new Array[Int](pairs.length)
    val fill = new Array[Int](n)
    i = 0
    while (i < pairs.length) {
      val (u, v) = if (before(ea(i), eb(i))) (ea(i), eb(i)) else (eb(i), ea(i))
      adj(start(u) + fill(u)) = v; fill(u) += 1
      i += 1
    }
    i = 0
    while (i < n) { java.util.Arrays.sort(adj, start(i), start(i + 1)); i += 1 }
    val tri = new Array[Long](n)
    var total = 0L
    var u = 0
    while (u < n) {
      var p = start(u)
      while (p < start(u + 1)) {
        val v = adj(p)
        // merge-intersect out(u) and out(v)
        var x = start(u); var y = start(v)
        while (x < start(u + 1) && y < start(v + 1)) {
          val wu = adj(x); val wv = adj(y)
          if (wu == wv) { tri(u) += 1; tri(v) += 1; tri(wu) += 1; total += 1; x += 1; y += 1 }
          else if (wu < wv) x += 1
          else y += 1
        }
        p += 1
      }
      u += 1
    }
    val vidType = vertices.schema("vid").dataType
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row](n)
    i = 0
    while (i < n) { rows.add(org.apache.spark.sql.Row(vids.get(i), tri(i))); i += 1 }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vid", vidType),
      org.apache.spark.sql.types.StructField("tri_local", org.apache.spark.sql.types.LongType)))
    val lbl = spark.createDataFrame(rows, schema)
    val all = vertices.select("vid")
      .join(broadcast(lbl), Seq("vid"), "left")
      .select(col("vid"), coalesce(col("tri_local"), lit(0L)).as("triangles"))
    (all.localCheckpoint(true), total)
  }
}
