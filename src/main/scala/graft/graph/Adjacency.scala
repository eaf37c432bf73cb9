package graft.graph

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One CSR adjacency block: a contiguous run of out-edges, sorted by
  * (src, dst). `srcIds(i)` owns edges [offsets(i), offsets(i+1)). A single
  * high-degree hub's adjacency MAY be split across blocks (each block then
  * emits partial contributions — sums are associative, so this is the
  * hub-salting mechanism: no single task ever owns a whole hub).
  */
case class AdjBlock(
    blockId: Int,
    srcIds: Array[Long],
    offsets: Array[Int],
    dsts: Array[Long],
    weights: Array[Double])

/** Dictionary-encoded, symmetrized adjacency — the shared substrate for
  * PPR / CC / LPA / triangles (SURVEY.md §1.2, §2.9).
  */
object Adjacency {

  /** Undirected multigraph → effective simple arcs: emit both directions of
    * every directed edge row, then SUM parallel weights per (src,dst).
    * Reproduces igraph's weighted-undirected transition mass exactly —
    * fact pairs appear in the edge table in both directions, so they end up
    * with 2× weight, as in the reference multigraph (SURVEY.md §1.2).
    */
  def symmetrize(edges: DataFrame): DataFrame = {
    val fwd = edges.select(col("src"), col("dst"), col("weight"))
    val rev = edges.select(col("dst").as("src"), col("src").as("dst"), col("weight"))
    fwd.unionAll(rev)
      .groupBy("src", "dst")
      .agg(sum("weight").as("weight"))
  }

  /** Encode string-keyed arcs to dense Long vids via a key dictionary.
    * `dict` must cover every endpoint (build it from the vertex table).
    */
  def encode(arcs: DataFrame, dict: DataFrame): DataFrame = {
    val d1 = dict.select(col("key").as("src"), col("vid").as("srcv"))
    val d2 = dict.select(col("key").as("dst"), col("vid").as("dstv"))
    arcs.join(d1, "src").join(d2, "dst")
      .select(col("srcv").as("src"), col("dstv").as("dst"), col("weight"))
  }

  /** Per-vertex out-weight (the PPR transition normalizer). */
  def outWeights(arcs: DataFrame): DataFrame =
    arcs.groupBy("src").agg(sum("weight").as("out_w"))

  /** Build CSR blocks of ~`edgesPerBlock` edges each. Edges are globally
    * sorted by (src,dst) and sliced by cumulative edge count, NOT by vertex
    * ranges — so a Zipf hub with 10^6 out-edges is split across many blocks
    * and no task is degree-bound (explicit skew handling, SURVEY.md §7.6).
    * Deterministic at any parallelism (same sort, same slicing).
    */
  def csrBlocks(spark: SparkSession, arcs: DataFrame, edgesPerBlock: Int): Dataset[AdjBlock] = {
    import spark.implicits._
    val sorted = arcs.select(
        col("src").cast("long"), col("dst").cast("long"), col("weight").cast("double"))
      .as[(Long, Long, Double)]
      .rdd
      .sortBy(e => (e._1, e._2))
      .zipWithIndex()
      .map { case ((s, d, w), i) => ((i / edgesPerBlock).toInt, (s, d, w)) }
    sorted
      .groupByKey()
      .map { case (blockId, it) =>
        // groupByKey does not preserve arrival order — re-sort the slice.
        // (src,dst) is unique post-symmetrize, so this restores slice order.
        val es = it.toArray.sortBy(e => (e._1, e._2))
        val srcIds = scala.collection.mutable.ArrayBuffer.empty[Long]
        val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
        val dsts = new Array[Long](es.length)
        val ws = new Array[Double](es.length)
        var i = 0
        var cur = Long.MinValue
        while (i < es.length) {
          val (s, d, w) = es(i)
          if (s != cur) { srcIds += s; offsets += i; cur = s }
          dsts(i) = d
          ws(i) = w
          i += 1
        }
        offsets += es.length
        AdjBlock(blockId, srcIds.toArray, offsets.toArray, dsts, ws)
      }
      .toDS()
  }
}
