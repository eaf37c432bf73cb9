package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.extract.Embeddings
import graft.functions.VectorOps
import graft.retrieve.Knn

/** Approximate nearest neighbor over an embedding column.
  *
  * Baseline: exact brute-force cosine top-k ([[Knn.topK]]'s two-level
  * scheme). Scale path: random-hyperplane LSH — vectors sharing a sign
  * bucket are candidates, brute force runs only inside buckets. The
  * hyperplanes are hash-seeded ([[Embeddings.hashUnit]]), so buckets are
  * deterministic across runs and parallelism levels.
  */
object Ann {

  /** Exact cosine top-k (general vectors: normalizes by both norms). */
  def bruteForceTopK(queries: DataFrame, keys: DataFrame, k: Int,
                     excludeSelf: Boolean = true): DataFrame =
    Knn.topK(queries, keys, k, excludeSelf, score = VectorOps.cosine)

  /** Sign-bucket signature: bit j = [dot(v, plane_j) > 0]. */
  def lshBuckets(vecs: DataFrame, vecCol: String, nPlanes: Int, dim: Int,
                 seed: String = "lsh"): DataFrame = {
    val planes = (0 until nPlanes).map(j =>
      typedLit(Embeddings.hashUnit(s"$seed:$j", dim)))
    val bucket = (0 until nPlanes).map(j =>
        when(VectorOps.dot(col(vecCol), planes(j)) > 0, shiftleft(lit(1L), j))
          .otherwise(lit(0L)))
      .reduce(_ + _)
    vecs.withColumn("bucket", bucket)
  }

  /** Multi-table LSH ANN top-k: `tables` independent plane sets; vectors
    * sharing ANY table's bucket become candidates (recall compounds as
    * 1−(1−p)^T); exact cosine + top-k within the candidate set. Shuffle
    * volume is Σ|bucket|² per table — the 100-TB path, versus the
    * brute-force O(Q·K) matmul.
    * @return (qid, kid, score, rank)
    */
  def lshTopK(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
              nPlanes: Int, dim: Int, tables: Int = 4): DataFrame = {
    val base = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
    val bucketed = (0 until tables).map { t =>
      lshBuckets(base, "v", nPlanes, dim, seed = s"lsh$t")
        .select(lit(t).as("tbl"), col("bucket"), col("id"), col("v"))
    }.reduce(_ unionAll _)
    val l = bucketed.select(col("tbl"), col("bucket"), col("id").as("qid"), col("v").as("qv"))
    val r = bucketed.select(col("tbl"), col("bucket"), col("id").as("kid"), col("v").as("kv"))
    val cand = l.join(r, Seq("tbl", "bucket"))
      .where(col("qid") =!= col("kid"))
      .select("qid", "kid", "qv", "kv")
      .dropDuplicates("qid", "kid") // union over tables
    val scored = cand.select(col("qid"), col("kid"),
      VectorOps.cosine(col("qv"), col("kv")).as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("kid").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
