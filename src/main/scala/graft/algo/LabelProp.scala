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
          checkpointEvery: Int = 5, localKernelMax: Long = 1L << 20,
          sizeHint: Long = -1L): (DataFrame, Int) = {
    // Bounded driver kernel (the CC/HITS/Bfs/Walks/KCore gate pattern):
    // per distributed round one join + groupBy + window — pure scheduling
    // floor on a tiny graph. Vote sums are sums of edge weights (integer-
    // valued counts on every graph this engine builds), so the driver
    // summation is exact and the paths are spec-pinned equal; label ids
    // compare in SQL order via DriverGate.sqlOrdering. At web scale the
    // arc count stays above any gate. `sizeHint` skips the probe scan.
    if (localKernelMax > 0 && (sizeHint < 0L || sizeHint <= localKernelMax) &&
        DriverGate.naturallyOrdered(vertices.schema("vid").dataType)) {
      val pa = DriverGate.pairProbe(arcs.select("src", "dst"), "src", "dst")
      if (pa.rows <= localKernelMax && pa.estBytes <= DriverGate.defaultMaxBytes) {
        val pv = DriverGate.colProbe(vertices.select("vid"), "vid")
        if (pv.rows <= localKernelMax && pv.estBytes <= DriverGate.defaultMaxBytes)
          return runLocal(arcs, vertices, maxIter)
      }
    }
    runDistributed(arcs, vertices, maxIter, checkpointEvery)
  }

  /** The gated driver kernel: identical synchronous min-tie-break update
    * over collected arrays.
    */
  private def runLocal(arcs: DataFrame, vertices: DataFrame,
                       maxIter: Int): (DataFrame, Int) = {
    val spark = arcs.sparkSession
    val ord = DriverGate.sqlOrdering(vertices.schema("vid").dataType)
    val idx = new java.util.HashMap[Any, Integer]()
    val vids = new java.util.ArrayList[Any]()
    def id(v: Any): Int = {
      val got = idx.get(v)
      if (got != null) got.intValue()
      else { val i = vids.size(); idx.put(v, i); vids.add(v); i }
    }
    val vertRows = vertices.select("vid").collect().map(r => id(r.get(0)))
    val nVerts = vids.size()
    val arcRows = arcs.select("src", "dst", "weight").collect()
    // votes flow src→dst; only rows whose BOTH endpoints are state
    // vertices matter (the distributed join keys labels on src and
    // aggregates into dst rows that exist in the state)
    val ea = new scala.collection.mutable.ArrayBuffer[Int]()
    val eb = new scala.collection.mutable.ArrayBuffer[Int]()
    val ew = new scala.collection.mutable.ArrayBuffer[Double]()
    arcRows.foreach { r =>
      val s = idx.get(r.get(0)); val d = idx.get(r.get(1))
      if (s != null && s < nVerts && d != null && d < nVerts) {
        ea += s.intValue(); eb += d.intValue()
        ew += r.getAs[Number]("weight").doubleValue()
      }
    }
    var labels = Array.tabulate(nVerts)(i => i) // label = own index initially
    var iter = 0
    var changed = 1
    while (changed > 0 && iter < maxIter) {
      changed = 0
      val next = new Array[Int](nVerts)
      // per-vertex vote map label -> weight sum
      val votes = Array.fill(nVerts)(
        null.asInstanceOf[java.util.HashMap[Integer, java.lang.Double]])
      var e = 0
      while (e < ea.length) {
        val d = eb(e)
        var m = votes(d)
        if (m == null) { m = new java.util.HashMap[Integer, java.lang.Double](); votes(d) = m }
        val l = labels(ea(e))
        val prev = m.get(Integer.valueOf(l))
        m.put(l, if (prev == null) ew(e) else prev.doubleValue() + ew(e))
        e += 1
      }
      var v = 0
      while (v < nVerts) {
        val m = votes(v)
        if (m == null) next(v) = labels(v)
        else {
          var bestLabel = -1
          var bestW = Double.NegativeInfinity
          val it = m.entrySet().iterator()
          while (it.hasNext) {
            val en = it.next()
            val l = en.getKey.intValue()
            val w = en.getValue.doubleValue()
            if (w > bestW ||
                (w == bestW && ord.compare(vids.get(l), vids.get(bestLabel)) < 0)) {
              bestLabel = l; bestW = w
            }
          }
          next(v) = bestLabel
          if (next(v) != labels(v)) changed += 1
        }
        v += 1
      }
      labels = next
      iter += 1
    }
    val vidType = vertices.schema("vid").dataType
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row](vertRows.length)
    // one output row per input vertex ROW (distributed keeps duplicates)
    vertRows.foreach(v => rows.add(org.apache.spark.sql.Row(vids.get(v), vids.get(labels(v)))))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vid", vidType),
      org.apache.spark.sql.types.StructField("label", vidType)))
    (spark.createDataFrame(rows, schema).localCheckpoint(true), iter)
  }

  private def runDistributed(arcs: DataFrame, vertices: DataFrame, maxIter: Int,
                             checkpointEvery: Int): (DataFrame, Int) = {
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
