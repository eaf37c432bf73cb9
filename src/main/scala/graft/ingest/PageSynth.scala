package graft.ingest

import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One Common-Crawl-style web page (BASELINE.json input_hint):
  * `(url string, warc_ts timestamp, html binary, text string, lang string)`.
  * `text` is the byte-identity invariant column — never mutated downstream.
  */
case class Page(url: String, warc_ts: Timestamp, html: Array[Byte], text: String, lang: String)

/** Deterministic synthetic pages table (FIXTURES.md §1).
  *
  * Pure function of (row index, seed): every page is generated independently
  * from `new Random(seed + i)`, so the table is identical at any parallelism
  * level and any partitioning — the scaling benchmark depends on that.
  *
  * The entity vocabulary is Zipf-skewed (s ≈ 1.1): a few hub entities appear
  * in a large fraction of pages, which exercises the skew/salting paths in
  * the graph algorithms (SURVEY.md §7.6). Mirrors the reference's own
  * deterministic mock-data pattern
  * (reference tests/integration/run_vector_stores.py:34-47, hash-seeded) and
  * its 9-doc sample corpus (utils/sample_data.py:1-19).
  */
object PageSynth {
  private val Epoch = 1767225600000L // 2026-01-01T00:00:00Z

  val verbs: Array[String] = Array(
    "visited", "founded", "acquired", "mentions", "links", "cites",
    "reviewed", "hosts", "describes", "criticizes", "endorses", "quotes")

  /** Entity vocabulary: `ent000 … entNNN`. Zipf rank = index. */
  def vocab(nEntities: Int): Array[String] =
    Array.tabulate(nEntities)(i => f"Ent${i}%04d")

  /** Zipf(s) sampler over [0, n): inverse-CDF on a precomputed table. */
  private[ingest] final class Zipf(n: Int, s: Double) extends Serializable {
    private val cdf: Array[Double] = {
      val w = Array.tabulate(n)(i => 1.0 / math.pow(i + 1.0, s))
      val total = w.sum
      val c = new Array[Double](n)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += w(i) / total; c(i) = acc; i += 1 }
      c(n - 1) = 1.0
      c
    }
    def sample(u: Double): Int = {
      val i = java.util.Arrays.binarySearch(cdf, u)
      if (i >= 0) i else math.min(n - 1, -i - 1)
    }
  }

  def page(i: Long, seed: Long, nEntities: Int, nHosts: Int): Page = {
    val rnd = new scala.util.Random(seed + i)
    val zipf = zipfCache(nEntities)
    val vs = vocab(nEntities)
    val nSent = 2 + rnd.nextInt(4)
    val sb = new StringBuilder
    var k = 0
    while (k < nSent) {
      val a = vs(zipf.sample(rnd.nextDouble()))
      val b = vs(zipf.sample(rnd.nextDouble()))
      val v = verbs(rnd.nextInt(verbs.length))
      if (k > 0) sb.append(' ')
      sb.append(a).append(' ').append(v).append(' ').append(b).append('.')
      k += 1
    }
    val text = sb.toString
    val lang = {
      val r = rnd.nextInt(100)
      if (r < 93) "en" else if (r < 97) "de" else "fr"
    }
    Page(
      url = s"https://host-${i % nHosts}.example/p/$i",
      warc_ts = new Timestamp(Epoch + i * 1000L),
      html = ("<html><body>" + text + "</body></html>").getBytes(UTF_8),
      text = text,
      lang = lang)
  }

  // One Zipf table per (nEntities) per JVM — the CDF is O(n) to build.
  @transient private lazy val zipfTables =
    new java.util.concurrent.ConcurrentHashMap[Int, Zipf]()
  private def zipfCache(n: Int): Zipf =
    zipfTables.computeIfAbsent(n, k => new Zipf(k, 1.1))

  /** Distributed generation: `numPartitions` independent index ranges. */
  def pages(spark: SparkSession, n: Long, seed: Long = 42L,
            nEntities: Int = 500, nHosts: Int = 64,
            numPartitions: Int = 0): Dataset[Page] = {
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions else spark.sparkContext.defaultParallelism
    spark.range(0L, n, 1L, parts)
      .map(i => page(i, seed, nEntities, nHosts))
  }

  def pagesDF(spark: SparkSession, n: Long, seed: Long = 42L,
              nEntities: Int = 500, nHosts: Int = 64,
              numPartitions: Int = 0): DataFrame =
    pages(spark, n, seed, nEntities, nHosts, numPartitions).toDF()
}
