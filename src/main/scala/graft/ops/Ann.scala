package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.extract.Embeddings
import graft.functions.{TopKAgg, VectorOps}
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

  /** Plane count that keeps EXPECTED bucket size near `targetBucket` as
    * the table grows: 2^planes buckets over n vectors → planes =
    * ⌈log₂(n / targetBucket)⌉, floored at `minPlanes` and capped at 24
    * (beyond that the per-vector hashing cost grows with no candidate-set
    * payoff at any realistic bucket target). Callers pass the CURRENT
    * table size so a 100× bigger corpus gets ~log₂(100) more planes
    * instead of 100× hotter buckets.
    */
  def planesFor(n: Long, minPlanes: Int, targetBucket: Int = 64): Int = {
    val needed = math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket))
      / math.log(2.0)).toInt
    math.min(24, math.max(minPlanes, needed))
  }

  /** Exact cosine top-k (general vectors: normalizes by both norms).
    * Norms are hoisted to per-vector columns BEFORE the join so each
    * candidate pair costs one dot, not three array passes.
    */
  def bruteForceTopK(queries: DataFrame, keys: DataFrame, k: Int,
                     excludeSelf: Boolean = true): DataFrame = {
    val q = queries.withColumn("__qn", VectorOps.norm(col("qvec")))
    val kk = keys.withColumn("__kn", VectorOps.norm(col("kvec")))
    Knn.topK(q, kk, k, excludeSelf,
      score = (a, b) => VectorOps.cosineWithNorms(a, b, col("__qn"), col("__kn")))
  }

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
  /** Drop (tbl, bucket) groups larger than `maxBucket` BEFORE the self
    * join: a bucket of size F contributes F² candidate pairs and, past a
    * few hundred members, ~zero discriminative signal — at web scale one
    * hot bucket (all-near-zero vectors, template pages) turns the join
    * quadratic. Trades recall inside dropped buckets for a hard bound of
    * maxBucket·|rows| on the join output.
    */
  private[ops] def capBuckets(bucketed: DataFrame, maxBucket: Int): DataFrame =
    if (maxBucket <= 0) bucketed
    else {
      val sizes = bucketed.groupBy("tbl", "bucket").agg(count(lit(1)).as("bsz"))
      bucketed.join(broadcast(sizes.where(col("bsz") <= maxBucket)
        .select("tbl", "bucket")), Seq("tbl", "bucket"), "left_semi")
    }

  /** Deterministic IVF centroid j (hash-seeded unit vector). */
  def ivfCentroid(seed: String, j: Int, dim: Int): Array[Float] =
    Embeddings.hashUnit(s"$seed:$j", dim)

  /** Distributed Lloyd k-means for TRAINED IVF centroids (round-3
    * verdict ask #6): deterministic hash-seeded init (the untrained
    * [[ivfCentroid]]s), then `iters` rounds of
    * assign (in-row argmax over centroid dots, NO shuffle — the same
    * expression [[ivfTopKWith]] uses) → per-cell mean (one map-side-
    * combinable groupBy over `sampleFraction` of the rows) → L2
    * normalize. Empty cells keep their previous centroid. No RNG
    * anywhere: a rerun over the same data and layout is bit-identical,
    * and the hash-bucket sample is layout-invariant; across DIFFERENT
    * partitionings the per-cell mean is a floating-point sum whose
    * combine order Spark does not fix, so centroids agree only up to
    * summation-order ulps (assert with a tolerance, not bitwise).
    *
    * Scale shape: each round is one narrow projection + one aggregation
    * of nCells×dim floats to the driver; at 100 TB sample ~10⁶ rows
    * (`sampleFraction`) — centroid quality needs samples, not the corpus.
    * The deterministic "sample" is a hash-bucket filter on the id column
    * (portable, partition-invariant), not `DataFrame.sample` (seeded RNG
    * per partition → layout-dependent).
    */
  def trainCentroids(vecs: DataFrame, idCol: String, vecCol: String,
                     nCells: Int, dim: Int, iters: Int = 5,
                     sampleFraction: Double = 1.0,
                     seed: String = "ivf"): Seq[Array[Float]] = {
    val base0 = vecs.select(col(idCol).cast("string").as("id"), col(vecCol).as("v"))
    val base =
      if (sampleFraction >= 1.0) base0
      else base0.where(
        pmod(xxhash64(col("id"), lit(seed)), lit(1000000L)) < lit((sampleFraction * 1e6).toLong))
    var cents: IndexedSeq[Array[Float]] =
      (0 until nCells).map(j => ivfCentroid(seed, j, dim))
    for (_ <- 0 until iters) {
      val cscores = array(cents.map(c => VectorOps.dot(col("v"), typedLit(c))): _*)
      val assigned = base
        .withColumn("cscores", cscores)
        .withColumn("cell",
          (expr("array_position(cscores, array_max(cscores))") - 1).cast("int"))
      val aggCols = (0 until dim).map(i =>
        sum(element_at(col("v"), i + 1).cast("double")).as(s"s$i")) :+
        count(lit(1)).as("n")
      val sums = assigned
        .groupBy("cell")
        .agg(aggCols.head, aggCols.tail: _*)
        .collect()
      val next = cents.toArray
      sums.foreach { r =>
        val cell = r.getAs[Int]("cell")
        val n = r.getAs[Long]("n").toDouble
        val mean = Array.tabulate(dim)(i => r.getAs[Double](s"s$i") / n)
        val norm = math.sqrt(mean.map(x => x * x).sum)
        if (norm > 0) next(cell) = mean.map(x => (x / norm).toFloat)
      }
      cents = next.toIndexedSeq
    }
    cents
  }

  /** IVF (inverted-file) ANN — the coarse-quantizer scale path next to
    * [[lshTopK]]: `nCells` deterministic hash-seeded unit centroids
    * partition the key side into cells (exact nearest-centroid
    * assignment, NO shuffle — an argmax over an in-row score array);
    * each query probes its `nProbe` nearest cells and scores exactly
    * inside them. Candidate volume ≈ nProbe·N/nCells per query instead
    * of N; at web scale grow nCells ~ √N so assignment (O(N·C·d)) and
    * probing (O(Q·nProbe·N/C·d)) stay balanced. Output shape matches
    * [[lshTopK]]: (qid, kid, score, rank), rank ≤ k per qid in
    * (score desc, kid asc) order.
    */
  def ivfTopK(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
              nCells: Int, nProbe: Int, dim: Int,
              seed: String = "ivf"): DataFrame =
    ivfTopKWith(vecs, idCol, vecCol, k,
      (0 until nCells).map(j => ivfCentroid(seed, j, dim)), nProbe)

  /** [[ivfTopK]] with CALLER-SUPPLIED centroids: the hash-seeded defaults
    * are data-independent (deterministic, oracle-portable); a deployment
    * that trains centroids (k-means over a sample) passes them here — the
    * cell/probe machinery is identical, only the partition quality
    * changes.
    */
  def ivfTopKWith(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
                  centroids: Seq[Array[Float]], nProbe: Int): DataFrame = {
    val nCells = centroids.length
    val base = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("n", VectorOps.norm(col("v"))) // hoisted per-vector norm
      .withColumn("cscores", array(centroids.map(c =>
        VectorOps.dot(col("v"), typedLit(c))): _*))
    // argmax cell: first index of the max (ties → smallest j, matching
    // the oracle's row_number ORDER BY d DESC, j ASC)
    val keyed = base
      .withColumn("cell",
        (expr("array_position(cscores, array_max(cscores))") - 1).cast("int"))
      .select(col("cell"), col("id").as("kid"), col("v").as("kvec"), col("n").as("kn"))
    // nProbe nearest cells per query: sort (−score, j) structs ascending
    // == (score desc, j asc), slice, project j
    val pairs = transform(sequence(lit(0), lit(nCells - 1)),
      j => struct((element_at(col("cscores"), j + 1) * -1).as("ns"), j.as("j")))
    val probed = base
      .withColumn("cell", explode(transform(slice(array_sort(pairs), 1, nProbe),
        s => s.getField("j").cast("int"))))
      .select(col("cell"), col("id").as("qid"), col("v").as("qvec"), col("n").as("qn"))
    val cand = probed.join(keyed, Seq("cell"))
      .where(col("qid") =!= col("kid"))
    val scored = cand.select(col("qid"), col("kid"),
      VectorOps.cosineWithNorms(col("qvec"), col("kvec"),
        col("qn"), col("kn")).as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("kid").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  def lshTopK(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
              nPlanes: Int, dim: Int, tables: Int = 4,
              maxBucket: Int = 0): DataFrame = {
    val base = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("n", VectorOps.norm(col("v"))) // hoisted: one norm per vector, not per pair
    val bucketed0 = (0 until tables).map { t =>
      lshBuckets(base, "v", nPlanes, dim, seed = s"lsh$t")
        .select(lit(t).as("tbl"), col("bucket"), col("id"), col("v"), col("n"))
    }.reduce(_ unionAll _)
    val bucketed = capBuckets(bucketed0, maxBucket)
    val l = bucketed.select(col("tbl"), col("bucket"), col("id").as("qid"),
      col("v").as("qv"), col("n").as("qn"))
    val r = bucketed.select(col("tbl"), col("bucket"), col("id").as("kid"),
      col("v").as("kv"), col("n").as("kn"))
    val cand = l.join(r, Seq("tbl", "bucket"))
      .where(col("qid") =!= col("kid"))
      .select("qid", "kid", "qv", "kv", "qn", "kn")
      .dropDuplicates("qid", "kid") // union over tables
    val scored = cand.select(col("qid"), col("kid"),
      VectorOps.cosineWithNorms(col("qv"), col("kv"), col("qn"), col("kn")).as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("kid").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Two-sided LSH ANN top-k — [[Knn.topK]]'s contract (same output shape,
    * same (score desc, kid asc) order) with LSH candidate generation
    * instead of the broadcast nested-loop cross join: queries and keys are
    * bucketed under the SAME plane tables and candidates come from the
    * (table, bucket) equi-join. This is the ≥100-TB path for
    * all-entities-vs-all-entities jobs (synonymy expansion) where
    * broadcasting the query side is O(E·dim) memory and scoring is O(E²).
    * Bounded [[TopKAgg]] keeps the exchange at O(Q·k·partitions).
    *
    * @param queries (qid, qvec)  @param keys (kid, kvec)
    */
  def lshTopKJoin(queries: DataFrame, keys: DataFrame, k: Int,
                  nPlanes: Int, dim: Int, tables: Int = 4,
                  excludeSelf: Boolean = true,
                  score: (Column, Column) => Column = VectorOps.dot,
                  maxBucket: Int = 0): DataFrame = {
    val qb = (0 until tables).map { t =>
      lshBuckets(queries.select(col("qid"), col("qvec").as("v")), "v",
          nPlanes, dim, seed = s"lsh$t")
        .select(lit(t).as("tbl"), col("bucket"), col("qid"), col("v").as("qvec"))
    }.reduce(_ unionAll _)
    val kb0 = (0 until tables).map { t =>
      lshBuckets(keys.select(col("kid"), col("kvec").as("v")), "v",
          nPlanes, dim, seed = s"lsh$t")
        .select(lit(t).as("tbl"), col("bucket"), col("kid").as("id"), col("v"))
    }.reduce(_ unionAll _)
    val kb = capBuckets(kb0, maxBucket)
      .select(col("tbl"), col("bucket"), col("id").as("kid"), col("v").as("kvec"))
    val cand = qb.join(kb, Seq("tbl", "bucket"))
      .where(if (excludeSelf) col("qid") =!= col("kid") else lit(true))
      .select("qid", "kid", "qvec", "kvec")
      .dropDuplicates("qid", "kid") // union over tables
    val scored = cand.select(col("qid"), col("kid"),
      score(col("qvec"), col("kvec")).as("score"))
    scored.groupBy("qid")
      .agg(TopKAgg.topK(k)(col("kid"), col("score")).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "sk")))
      .select(col("qid"), col("sk.kid").as("kid"), col("sk.score").as("score"),
        (col("pos") + 1).as("rank"))
  }
}
