package graft.extract

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Deterministic embedding substitutes for the reference's embedding-model
  * boundary (reference src/hipporag/embedding_model/base.py:208-218).
  *
  * The reference's own integration tests use exactly this pattern — a
  * hash-seeded RNG unit vector per string
  * (reference tests/integration/run_vector_stores.py:34-47) — which is what
  * `hashUnit` reproduces. `trigramUnit` additionally makes string-similar
  * phrases vector-similar (bag of char 3-grams, feature-hashed), so the
  * synonymy-KNN path (HippoRAG.py:959-1020) has non-degenerate neighbors.
  *
  * All vectors are L2-normalized float32, dim fixed per store
  * (config_utils.py:144-147: unit-normalized embeddings are the default).
  */
object Embeddings {
  val Dim = 64

  private def md5Bytes(s: String): Array[Byte] =
    MessageDigest.getInstance("MD5").digest(s.getBytes(UTF_8))

  private def seedOf(s: String): Long = {
    val b = md5Bytes(s)
    var x = 0L
    var i = 0
    while (i < 8) { x = (x << 8) | (b(i) & 0xffL); i += 1 }
    x
  }

  private def l2norm(v: Array[Float]): Array[Float] = {
    var ss = 0.0
    var i = 0
    while (i < v.length) { ss += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(ss)
    if (n == 0.0) v
    else {
      val out = new Array[Float](v.length)
      i = 0
      while (i < v.length) { out(i) = (v(i) / n).toFloat; i += 1 }
      out
    }
  }

  /** Hash-seeded gaussian unit vector (the reference-mock analog). */
  def hashUnit(content: String, dim: Int = Dim): Array[Float] = {
    val rnd = new java.util.Random(seedOf(content))
    l2norm(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  /** Feature-hashed bag of character 3-grams, unit-normalized. Similar
    * surface forms share 3-grams → high cosine; unrelated strings ≈ 0.
    */
  def trigramUnit(content: String, dim: Int = Dim): Array[Float] = {
    val v = new Array[Float](dim)
    val s = content
    if (s.length >= 3) {
      var i = 0
      while (i + 3 <= s.length) {
        val g = s.substring(i, i + 3)
        val b = md5Bytes(g)
        val bucket = ((b(0) & 0xff) << 8 | (b(1) & 0xff)) % dim
        val sign = if ((b(2) & 1) == 0) 1f else -1f
        v(bucket) += sign
        i += 1
      }
    } else {
      val b = md5Bytes(s)
      v((b(0) & 0xff) % dim) = 1f
    }
    l2norm(v)
  }

  val hashUnitUdf: Column => Column = {
    val f = udf((s: String, d: Int) => hashUnit(s, d))
    c => f(c, org.apache.spark.sql.functions.lit(Dim))
  }

  val trigramUnitUdf: Column => Column = {
    val f = udf((s: String, d: Int) => trigramUnit(s, d))
    c => f(c, org.apache.spark.sql.functions.lit(Dim))
  }
}
