package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.TextOps

/** Large-scale corpus deduplication operators. All hashing goes through
  * `md5` so every operator is reproducible in ANSI SQL (the DuckDB oracle)
  * and stable across engines/parallelism — no engine-private hash functions
  * in result-affecting positions.
  *
  * Reference analog: the content-hash dedup that drives HippoRAG's
  * idempotent upserts (src/hipporag/embedding_store.py:100-134); the
  * near-dup family (MinHash/SimHash/Jaccard/cosine) is the standard
  * web-corpus extension of the same id rule.
  */
object Dedup {

  /** Eager persist that SKIPS frames whose plan is already cached (e.g. a
    * caller-memoized shingle table fed straight in): re-persisting an
    * equivalent plan is a no-op that still walks the cache manager and
    * logs "Asked to cache already cached data" on every call.
    * @return (frame, owned) — owned=true iff THIS call persisted it, i.e.
    *         the operator must release it before returning (a long-lived
    *         serving JVM otherwise accumulates one cached frame per call;
    *         OpsSpec pins the flat-cache-count invariant).
    */
  private def eagerPersist(df: DataFrame): (DataFrame, Boolean) =
    if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE) (df, false)
    else {
      val d = df.persist()
      d.count() // eager: parallel branch stages must hit the cache, not the DAG
      (d, true)
    }

  /** Exact dedup by content hash: one keeper (min key) per text group.
    * @return (text_hash, keeper, dup_count)
    */
  def exact(docs: DataFrame, textCol: String, keyCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(keyCol)).as("keeper"), count(lit(1)).as("dup_count"))

  /** Tokens of the normalized text (shared by the shingle-based ops). */
  private def toks(textCol: String): Column =
    TextOps.tokens(TextOps.textProcessing(col(textCol)))

  /** w-token shingles as strings ("tok1 tok2 tok3"). */
  def shingles(textCol: String, w: Int): Column = {
    val t = toks(textCol)
    val n = size(t)
    val grams = transform(sequence(lit(0), n - w), i =>
      concat_ws(" ", (0 until w).map(j => element_at(t, i + j + 1)): _*))
    array_distinct(when(n >= w, grams).otherwise(array().cast("array<string>")))
  }

  /** Exploded (key, sh) shingle rows — the shared input of the MinHash
    * and Jaccard families; callers that run both should persist ONE copy
    * of this instead of re-deriving the normalization+explode chain.
    */
  def shingleRows(docs: DataFrame, textCol: String, keyCol: String, w: Int): DataFrame =
    docs.select(col(keyCol).as("key"), explode(shingles(textCol, w)).as("sh"))

  /** Modulus for the universal-hash MinHash slots (< 2^30, prime). */
  val MinHashP: Long = 1000000007L

  /** Per-slot mixing constants (aᵢ, bᵢ, cᵢ) — 20-bit values from a fixed
    * LCG, aᵢ/bᵢ forced odd. 20-bit × 32-bit products stay ≤ 2^52, so the
    * same arithmetic runs on DuckDB's overflow-CHECKED BIGINT multiply
    * (the oracle inlines these exact constants as SQL literals).
    */
  def mixConsts(n: Int): Seq[(Long, Long, Long)] = {
    var s = 0x9E3779B97F4A7C15L
    def next(): Long = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 16) & 0xFFFFFL
    }
    Seq.fill(n)((next() | 1L, next() | 1L, next()))
  }

  /** MinHash via ONE md5 per shingle: the two 32-bit halves (h1, h2) of
    * md5(shingle) feed `numHashes` universal hashes (aᵢ·h1 + bᵢ·h2 + cᵢ)
    * mod P, and slot i is the plain MIN of hash i over the doc's shingles.
    * Equally valid MinHash as independent digests — and ~16× cheaper: the
    * md5 was 54% of the round-2 headline suite; the integer mixes are a
    * few multiply-adds each and engine-portable (same literals in the
    * DuckDB oracle). Signature length = `numHashes`.
    * @return (key, sig: array<bigint> of length numHashes)
    */
  def minHashSignatures(docs: DataFrame, textCol: String, keyCol: String,
                        numHashes: Int, shingleWidth: Int): DataFrame =
    minHashSignaturesFrom(shingleRows(docs, textCol, keyCol, shingleWidth), numHashes)

  /** [[minHashSignatures]] over pre-exploded (key, sh) rows. One
    * aggregation pass: numHashes column MIN aggregates with map-side
    * combine, instead of a numHashes-way row explosion + two shuffles.
    */
  def minHashSignaturesFrom(sh: DataFrame, numHashes: Int): DataFrame = {
    val cs = mixConsts(numHashes)
    sh.select(col("key"), md5(col("sh")).as("m"))
      .select(col("key"),
        conv(substring(col("m"), 1, 8), 16, 10).cast("long").as("h1"),
        conv(substring(col("m"), 9, 8), 16, 10).cast("long").as("h2"))
      .groupBy("key")
      .agg(array(cs.map { case (a, b, c) =>
        min((col("h1") * a + col("h2") * b + c) % MinHashP) }: _*).as("sig"))
  }

  /** LSH banding: docs sharing any band land in the same bucket; emit
    * candidate pairs (a < b). bands × rowsPerBand must equal numHashes.
    * @return (a, b, shared_bands)
    */
  def minHashCandidates(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    // Persisted: the band table sits on BOTH sides of the bucket self-join;
    // without the cache the signature pipeline runs twice.
    val banded0 = sigs.select(col("key"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            md5(concat_ws("|", (0 until rowsPerBand).map(r =>
              element_at(col("sig"), b * rowsPerBand + r + 1).cast("string")): _*)).as("bh"))): _*)).as("bb"))
      .select(col("key"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val (banded, owned) = eagerPersist(banded0)
    val l = banded.select(col("band"), col("bh"), col("key").as("a"))
    val r = banded.select(col("band"), col("bh"), col("key").as("b"))
    val out = l.join(r, Seq("band", "bh"))
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("shared_bands"))
      // Pin the (small) pair output and release the banded working cache —
      // the localCheckpoint-then-unpersist discipline (CC/Triangles).
      .localCheckpoint(true)
    if (owned) banded.unpersist(false)
    out
  }

  /** 32-bit SimHash from the md5 of each token: token bits = first 8 hex
    * chars as an unsigned 32-bit int; simhash bit j = majority vote.
    * Portable: `conv(hex,16,10)` (Spark) == `CAST('0x'||hex AS BIGINT)`
    * (DuckDB). Token multiplicity counts as weight.
    * @return (key, simhash: long)
    */
  def simHash(docs: DataFrame, textCol: String, keyCol: String): DataFrame = {
    val tok = docs.select(col(keyCol).as("key"), explode(toks(textCol)).as("tok"))
    val h = conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long")
    val withBits = tok.select(col("key"),
      array((0 until 32).map(j =>
        when(shiftright(h, j).bitwiseAND(1) === 1, 1).otherwise(-1)): _*).as("bits"))
    withBits.groupBy("key")
      .agg(array((0 until 32).map(j =>
        sum(element_at(col("bits"), j + 1))): _*).as("votes"))
      .select(col("key"),
        (0 until 32).map(j =>
          when(element_at(col("votes"), j + 1) > 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Near-dup pairs by SimHash hamming distance ≤ maxHamming.
    *
    * Pigeonhole banding: the 32 bits split into maxHamming+1 bands — any
    * pair within distance maxHamming agrees EXACTLY on at least one band,
    * so candidates come from an equi-join on (band, band_bits) instead of
    * an all-pairs theta join (O(N²) at corpus scale). Full hamming is
    * verified on candidates; output is identical to the naive join.
    * Degenerate maxHamming ≥ 32 admits every pair — only there does the
    * theta join remain (nothing can prune a predicate that's always true).
    */
  def simHashPairs(sims: DataFrame, maxHamming: Int): DataFrame = {
    // hamming >= 0 always: a negative bound admits nothing (and would
    // otherwise divide by zero in the band layout below).
    if (maxHamming < 0)
      return sims.select(col("key").as("a"), col("key").as("b"),
        lit(0).cast("integer").as("hamming")).where(lit(false))
    val l0 = sims.select(col("key").as("a"), col("simhash").as("ha"))
    val r0 = sims.select(col("key").as("b"), col("simhash").as("hb"))
    if (maxHamming >= 32)
      return l0.join(r0, col("a") < col("b"))
        .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
        .where(col("hamming") <= maxHamming)
        .select("a", "b", "hamming")
    val nBands = maxHamming + 1
    val base = 32 / nBands
    val extra = 32 % nBands // first `extra` bands get one more bit
    val offsets = (0 until nBands).scanLeft(0)((o, j) => o + base + (if (j < extra) 1 else 0))
    def bandCol(sim: Column, j: Int): Column = {
      val width = base + (if (j < extra) 1 else 0)
      shiftright(sim, offsets(j)).bitwiseAND(lit((1L << width) - 1))
    }
    val banded = sims.select(col("key"), col("simhash"),
      explode(array((0 until nBands).map(j =>
        struct(lit(j).as("band"), bandCol(col("simhash"), j).as("bits"))): _*)).as("bb"))
      .select(col("key"), col("simhash"), col("bb.band").as("band"), col("bb.bits").as("bits"))
    val l = banded.select(col("band"), col("bits"), col("key").as("a"), col("simhash").as("ha"))
    val r = banded.select(col("band"), col("bits"), col("key").as("b"), col("simhash").as("hb"))
    l.join(r, Seq("band", "bits"))
      .where(col("a") < col("b"))
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .where(col("hamming") <= maxHamming)
      .select("a", "b", "hamming")
      .dropDuplicates("a", "b") // a pair may agree on several bands
  }

  /** Embedding-cosine near-dup groups: τ-thresholded cosine pairs →
    * connected components over the pair graph → keeper = min key per
    * component (every key emits a row; singletons keep themselves).
    *
    * Pair generation is GATED like the Indexer's synonymy KNN
    * ([[graft.retrieve.Indexer.SynonymyConfig.exactMaxEntities]]): at or
    * below `exactMaxVectors` rows it is the exact one-broadcast-pass form
    * (the oracle-matched baseline — O(N·dim) broadcast, O(N²) dots);
    * above it, the bucketed-capped [[graft.ops.Ann.lshTopKJoin]] takes
    * over — approximate by design, with recall at τ MEASURED (OpsSpec
    * recall guard ≥ 0.95 at these tables/planes settings) and a hard
    * `maxBucket` bound so one hot bucket can't go quadratic. CC only
    * needs each vector to reach SOME in-cluster neighbor for the group to
    * reassemble transitively, so a per-vector `lshTopK` neighbor cap
    * loses groups only when LSH misses a whole vector's neighborhood.
    * The CC stage is scale-safe in both regimes
    * ([[graft.algo.ConnectedComponents]]).
    * @return (key, keeper)
    */
  def embeddingNearDupGroups(vecs: DataFrame, idCol: String, vecCol: String,
                             tau: Double, exactMaxVectors: Long = 65536L,
                             lshTopK: Int = 64, lshTables: Int = 6,
                             lshMinPlanes: Int = 12,
                             lshMaxBucket: Int = 1024): DataFrame = {
    val pairs = nearDupPairs(vecs, idCol, vecCol, tau, exactMaxVectors,
      lshTopK, lshTables, lshMinPlanes, lshMaxBucket)
    val arcs = pairs.select(col("qid").as("src"), col("kid").as("dst"))
      .unionAll(pairs.select(col("kid").as("src"), col("qid").as("dst")))
    val verts = vecs.select(col(idCol).as("vid"))
    val (labels, _) = graft.algo.ConnectedComponents.run(arcs, verts)
    labels.select(col("vid").as("key"), col("component").as("keeper"))
  }

  /** The gated pair stage of [[embeddingNearDupGroups]], exposed so the
    * LSH-regime plan is auditable (no BroadcastNestedLoopJoin above the
    * gate — PlanSpec-style assert in OpsSpec).
    * @return (qid, kid, score ≥ tau); above the gate a pair may appear in
    *         either or both directions.
    */
  private[graft] def nearDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
                                  tau: Double, exactMaxVectors: Long,
                                  lshTopK: Int = 64, lshTables: Int = 6,
                                  lshMinPlanes: Int = 12,
                                  lshMaxBucket: Int = 1024): DataFrame = {
    import graft.functions.VectorOps
    val n = vecs.count()
      if (n <= exactMaxVectors) {
        val q = vecs.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
          .withColumn("qn", VectorOps.norm(col("qvec")))
        val k = vecs.select(col(idCol).as("kid"), col(vecCol).as("kvec"))
          .withColumn("kn", VectorOps.norm(col("kvec")))
        k.join(broadcast(q))
          .where(col("qid") < col("kid"))
          .select(col("qid"), col("kid"),
            VectorOps.cosineWithNorms(col("qvec"), col("kvec"),
              col("qn"), col("kn")).as("score"))
          .where(col("score") >= tau)
      } else {
        // Normalize once so bucket signs are unchanged (positive scaling)
        // and the pair score is a plain dot == cosine (float-rounded —
        // this regime is approximate by design and recall-guarded). The
        // norm is HOISTED to its own column first: nesting the aggregate
        // inside the transform lambda would re-scan the vector per
        // ELEMENT (O(dim²)/row) on exactly the huge-corpus path.
        val dim = vecs.select(size(col(vecCol))).first().getInt(0)
        val normed = vecs
          .select(col(idCol).as("id"), col(vecCol).as("v0"),
            graft.functions.VectorOps.norm(col(vecCol)).as("n"))
          .select(col("id"),
            transform(col("v0"), x => x / col("n")).cast("array<float>").as("v"))
        val q = normed.select(col("id").as("qid"), col("v").as("qvec"))
        val k = normed.select(col("id").as("kid"), col("v").as("kvec"))
        Ann.lshTopKJoin(q, k, lshTopK,
            nPlanes = Ann.planesFor(n, lshMinPlanes), dim = dim,
            tables = lshTables, excludeSelf = true,
            maxBucket = lshMaxBucket)
          // NO qid<kid canonicalization: a pair surfacing in only ONE
          // direction's top-k list must still survive; the CC union in
          // the caller absorbs the duplicates when both directions appear.
          .where(col("score") >= tau)
          .select("qid", "kid", "score")
      }
  }

  /** Exact n-gram Jaccard similarity for pairs above a threshold.
    * |A∩B| via a shingle-join, |A∪B| = |A|+|B|−|A∩B|.
    *
    * `maxDocFreq` drops shingles occurring in more than that many docs
    * BEFORE the self-join (both from the intersection and the set sizes):
    * a shingle shared by F docs contributes F² join rows and zero
    * discriminative signal — the classic stop-shingle blowup. At web
    * scale this bound is what keeps the join linear-ish.
    * @return (a, b, jaccard)
    */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, keyCol: String,
                        shingleWidth: Int, threshold: Double,
                        maxDocFreq: Long = Long.MaxValue): DataFrame =
    ngramJaccardPairsFrom(shingleRows(docs, textCol, keyCol, shingleWidth),
      threshold, maxDocFreq)

  /** [[ngramJaccardPairs]] over pre-exploded (key, sh) rows. */
  def ngramJaccardPairsFrom(shAll: DataFrame, threshold: Double,
                            maxDocFreq: Long = Long.MaxValue): DataFrame = {
    val shUncached =
      if (maxDocFreq == Long.MaxValue) shAll
      else {
        val keep = shAll.groupBy("sh").agg(count(lit(1)).as("df"))
          .where(col("df") <= maxDocFreq).select("sh")
        shAll.join(keep, "sh")
      }
    // The shingle table feeds the sizes aggregate and BOTH sides of the
    // self-join. Materialized EAGERLY: a lazy cache inside one action lets
    // the parallel branch stages race and recompute the chain 4x.
    val (sh, owned) = eagerPersist(shUncached)
    val sizes = sh.groupBy("key").agg(count(lit(1)).as("n"))
    val l = sh.select(col("sh"), col("key").as("a"))
    val r = sh.select(col("sh"), col("key").as("b"))
    val inter = l.join(r, Seq("sh")).where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("i"))
    val out = inter
      .join(sizes.select(col("key").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("key").as("b"), col("n").as("nb")), "b")
      .withColumn("jaccard", col("i") / (col("na") + col("nb") - col("i")))
      .where(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
      // Pin the thresholded pair output, release the maxDocFreq-path
      // shingle cache (the caller-memoized shAll is NOT ours to release).
      .localCheckpoint(true)
    if (owned) sh.unpersist(false)
    out
  }
}
