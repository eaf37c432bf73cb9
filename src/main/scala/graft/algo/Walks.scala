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
                  batchRounds: Int = 4): DataFrame = {
    require(walkLen >= 0 && walksPerVertex >= 1)
    val spark = arcs.sparkSession
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

  /** Skip-gram (center, context) pair counts over a walk corpus — the
    * word2vec/DeepWalk training-pair generator that consumes
    * [[randomWalks]] (Perozzi et al. KDD'14 §4.2: each position pairs
    * with every other position within `window` steps, both directions).
    *
    * Scale shape: a self-equi-join on the walk id (start, walk) — each
    * group is at most walkLen+1 rows, so the join fans out O(L·window)
    * per walk with NO quadratic blowup in corpus size — followed by one
    * map-side-combinable count per (center, context). At 100 TB this is
    * a shuffle on walk ids (uniform by construction) then on vertex
    * pairs (Zipf, but partial-agg absorbs the hubs).
    *
    * @param walks (start, walk, step, vid) — [[randomWalks]] output
    * @return (center, context, pairs), pairs = co-occurrence count
    */
  def skipGramPairs(walks: DataFrame, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1 (got $window)")
    val a = walks.select(col("start").as("s"), col("walk").as("w"),
      col("step").as("step_a"), col("vid").as("center"))
    val b = walks.select(col("start").as("s"), col("walk").as("w"),
      col("step").as("step_b"), col("vid").as("context"))
    a.join(b, Seq("s", "w"))
      .where(col("step_a") =!= col("step_b") &&
        abs(col("step_a") - col("step_b")) <= window)
      .groupBy("center", "context").agg(count(lit(1)).as("pairs"))
  }
}
