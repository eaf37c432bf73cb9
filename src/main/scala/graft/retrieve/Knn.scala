package graft.retrieve

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TopKAgg, VectorOps}

/** Cosine top-k similarity join (reference src/hipporag/utils/embed_utils.py
  * retrieve_knn: batched GPU matmul with a two-level topk-of-topks).
  *
  * Spark shape of the same two-level scheme: broadcast the query side, scan
  * the key side once, and aggregate with the bounded
  * [[graft.functions.TopKAgg]] — partial aggregation prunes to k inside
  * each scan partition (level 1), the final merge re-top-ks (level 2). The
  * exchange carries O(Q · k · partitions) rows, never the full Q · K score
  * matrix. The dot product is the codegen'd
  * [[org.apache.spark.sql.graftx.DotProduct]] expression.
  */
object Knn {

  /** @param queries (qid, qvec Array[Float])  — broadcast side
    * @param keys    (kid, kvec Array[Float])  — scanned side
    * @return (qid, kid, score, rank) with rank ≤ k per qid,
    *         ordered (score desc, kid asc)
    */
  def topK(queries: DataFrame, keys: DataFrame, k: Int,
           excludeSelf: Boolean = false,
           score: (Column, Column) => Column = VectorOps.dot,
           broadcastKeys: Boolean = false): DataFrame = {
    // broadcastKeys: when the KEY side is the small one (delta-KNN: all
    // old queries against a handful of new keys), broadcast it instead.
    val joined =
      if (broadcastKeys) queries.join(broadcast(keys))
      else keys.join(broadcast(queries))
    val scored = joined
      .where(if (excludeSelf) col("qid") =!= col("kid") else lit(true))
      .select(col("qid"), col("kid"),
        score(col("qvec"), col("kvec")).as("score"))
    scored.groupBy("qid")
      .agg(TopKAgg.topK(k)(col("kid"), col("score")).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "sk")))
      .select(col("qid"), col("sk.kid").as("kid"), col("sk.score").as("score"),
        (col("pos") + 1).as("rank"))
  }
}
