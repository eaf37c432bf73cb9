package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 (Okapi, Lucene idf form) lexical scoring over a document table —
  * the standard sparse-retrieval companion to the engine's dense/PPR
  * paths (hybrid retrieval pairs exactly these two signals), and a
  * corpus-statistics workload every training-data pipeline runs anyway
  * (df/idf tables, length normalization).
  *
  *   idf(t)      = ln( (N − df + 0.5) / (df + 0.5) + 1 )
  *   s(t, d)     = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *   score(q, d) = Σ_{t ∈ distinct terms(q)} s(t, d)
  *
  * Determinism across engines: each s(t,d) is a pure function of
  * identical integer statistics, so Spark and an oracle engine produce
  * bitwise-equal doubles — but the per-document SUM is fp-order-
  * dependent. [[search]] therefore sums FIXED-POINT micros
  * (round(s·10⁶) as long): exact integer addition, order-independent,
  * identical ranking everywhere (the documented trade: scores are
  * micro-quantized).
  *
  * PORTABILITY ASSUMPTION (round-5 advice): the cross-engine
  * bitwise-equality of per-term scores additionally rests on JVM
  * `Math.log` and the oracle engine's libm `ln` rounding identically on
  * the idf arguments. Both are faithful to ≤1 ulp but neither is
  * REQUIRED to be correctly rounded, so a platform/libm change could in
  * principle flip a round(score·10⁶) that lands within an ulp of a .5
  * boundary. [[lnSentinelCheck]] pins the JVM side loudly: a handful of
  * idf-shaped arguments with their expected `Math.log` bit patterns
  * (recorded on the platform the committed q48 oracle hashes were
  * produced on) are verified once per JVM at first use — a libm drift
  * fails with a pointer to this paragraph instead of a flaky hash gate.
  *
  * Scale shape: tokenize → two map-side-combinable groupBys (tf, dl) +
  * one on term (df); N/avgdl are one-row aggregates broadcast back.
  * Query scoring touches only the query terms' postings (an equi-join
  * on term), never the whole index.
  */
object Bm25 {

  /** (input bits, expected Math.log(input) bits) — recorded on the
    * platform that produced the committed q48 oracle hashes. Inputs are
    * idf-argument-shaped: (N − df + 0.5)/(df + 0.5) + 1 for small and
    * large N/df.
    */
  private val lnSentinels: Seq[(Long, Long)] = Seq(
    4609434218613702656L -> 4600975829957056588L, // ln(1.5)
    4612436618365282987L -> 4605807000201899674L, // ln(7/3)
    4634462035292891819L -> 4616431229070759139L, // ln(203/3)
    4607182643974369418L -> 4542503153476683664L, // ln(1 + 5e-5…)
    4644589290070521080L -> 4618229908389179895L) // ln(334.33…)

  private lazy val lnSentinelCheck: Unit = lnSentinels.foreach { case (in, exp) =>
    val got = java.lang.Double.doubleToRawLongBits(
      math.log(java.lang.Double.longBitsToDouble(in)))
    if (got != exp) {
      val msg =
        s"Math.log sentinel mismatch (got bits $got, expected $exp for input bits $in): " +
        "this platform's libm rounds ln differently from the one the committed " +
        "BM25 oracle hashes were produced on — re-derive the q48 oracle on this " +
        "platform (see the portability note in graft.ops.Bm25's scaladoc)"
      // A 1-ulp libm drift rarely moves any round(score*1e6) output; only
      // the ORACLE-HASH comparison is at stake, never serving correctness.
      // Production callers can therefore degrade the hard fail to a loud
      // warning (round-6 advice); the default stays fail-fast so an
      // oracle-gated environment cannot silently drift.
      if (sys.env.get("GRAFT_BM25_LN_WARN").contains("1"))
        System.err.println(s"[bm25] WARNING: $msg")
      else throw new IllegalStateException(msg)
    }
  }

  /** Tokenization on the byte-scan kernels (round 7): TextNormalize ≡
    * trim(regexp_replace(lower(c), "[^a-z0-9 ]", " ")) and SpaceTokens ≡
    * filter(split(norm, " +"), _ != "") — both property-tested
    * byte-equal to the regex built-ins (CoreSpec), and java.util.regex
    * thread-scales at ~0.30 on this hardware class (graftx.TextKernels
    * doc) while sitting on BM25's only full-corpus passes.
    */
  private def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc"),
        explode(graft.core.TextOps.tokens(
          graft.core.TextOps.textProcessing(col(textCol)))).as("term"))

  /** Per-(doc, term) BM25 statistics and score. */
  def termScores(docs: DataFrame, idCol: String, textCol: String,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    lnSentinelCheck
    val toks = tokens(docs, idCol, textCol)
    val tf = toks.groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy("doc").agg(count(lit(1)).as("dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val global = docs.agg(count(lit(1)).cast("double").as("n"))
      .crossJoin(dl.agg(avg("dl").as("avgdl")))
    val idf = dfreq.crossJoin(broadcast(global))
      .select(col("term"), col("df"),
        log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0).as("idf"))
    // Parenthesization mirrors the oracle SQL exactly — every fp op on
    // identical operands in the same order is bitwise-equal across
    // engines.
    tf.join(dl, "doc")
      .join(idf, "term")
      .crossJoin(broadcast(global.select("avgdl")))
      .select(col("doc"), col("term"), col("tf"), col("dl"), col("df"), col("idf"),
        (col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("score"))
  }

  /** Top-k documents for `query` by summed fixed-point term scores.
    * @return (doc, score_micro, rank) — rank 1..topK, ties by doc asc
    */
  def search(docs: DataFrame, idCol: String, textCol: String, query: String,
             topK: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    lnSentinelCheck
    val spark = docs.sparkSession
    import spark.implicits._
    val qTerms = query.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
      .split(" +").filter(_.nonEmpty).distinct.toSeq.toDF("term")
    // Round 7 restructure (identical arithmetic, fewer corpus passes):
    // the old path went through termScores — tf/dl/df each re-derived
    // the tokenization, 4 full passes per search — and only then dropped
    // every non-query term. Filter to the query terms BEFORE tf (the
    // broadcast join pushes into the tokenize scan), compute df from the
    // filtered tf (df of a term restricted to query terms == its global
    // df), and keep only dl + N/avgdl as full-corpus passes: 2 passes
    // total, both on the byte-scan kernels. Every statistic reaching the
    // score expression is the same integer as before, so the per-term
    // doubles are bitwise-identical and the micro-sum is unchanged
    // (oracle hash re-verified).
    val toks = tokens(docs, idCol, textCol)
    val tfQ = toks.join(broadcast(qTerms), "term")
      .groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy("doc").agg(count(lit(1)).as("dl"))
    val global = docs.agg(count(lit(1)).cast("double").as("n"))
      .crossJoin(dl.agg(avg("dl").as("avgdl")))
    val idf = tfQ.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(global))
      .select(col("term"), col("df"),
        log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0).as("idf"))
    val scored = tfQ.join(dl, "doc")
      .join(broadcast(idf), "term")
      .crossJoin(broadcast(global.select("avgdl")))
      .select(col("doc"),
        (col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("score"))
      .groupBy("doc")
      .agg(sum(round(col("score") * 1e6).cast("long")).as("score_micro"))
    // orderBy+limit compiles to TakeOrderedAndProject (per-partition
    // heaps) — the rank window then runs over topK rows, not the corpus.
    val top = scored.orderBy(col("score_micro").desc, col("doc").asc).limit(topK)
    val w = Window.orderBy(col("score_micro").desc, col("doc").asc)
    top.withColumn("rank", row_number().over(w))
  }
}
