package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolate the bench Part-1b serve/delta walls: index, retrieve cold/warm,
  * +1% delta index vs full rebuild — sbt "Test/runMain graft.ServeProbe2 <sfDir>".
  */
object ServeProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Any): Double = {
      val t0 = System.nanoTime()
      f
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[serve2] $label: $w%.2fs")
      w
    }
    import graft.retrieve.{GraphStore, Indexer, Retriever}
    // "pages:N" synthesizes N crawl pages (input_hint shape) instead of
    // reading the sf documents table — for the delta-vs-rebuild crossover.
    val docs = (if (sfDir.startsWith("pages:"))
        graft.ingest.PageSynth.pagesDF(spark, sfDir.stripPrefix("pages:").toLong)
          .select(col("text").as("content"))
      else spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("text").as("content")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.count()
    val head = docs.limit((nDocs * 99 / 100).toInt).localCheckpoint(true)
    val tail = docs.exceptAll(head).localCheckpoint(true)
    println(s"[serve2] docs=$nDocs tail=${tail.count()}")
    val storeDir = Files.createTempDirectory("graft_serve2").toString
    val store = new GraphStore(spark, storeDir)
    t("serve_index")(Indexer.index(store, docs))
    def batch(b: Int): Seq[(Long, String)] = (0 until 64).map(i =>
      (b.toLong * 64 + i) -> s"document ${(b * 131 + i * 7) % 997} mentions topic ${(b * 17 + i) % 97}")
    val cfg = Retriever.RetrieveConfig(retrievalTopK = 20)
    t("retrieve_cold")(Retriever.retrieve(store, batch(0), cfg).count())
    (1 to 3).foreach(b => t(s"retrieve_warm$b")(
      Retriever.retrieve(store, batch(b), cfg).count()))
    val deltaDir = Files.createTempDirectory("graft_serve2_delta").toString
    val deltaStore = new GraphStore(spark, deltaDir)
    t("index 99%")(Indexer.index(deltaStore, head))
    t("index_delta_1pct")(Indexer.index(deltaStore, tail))
    val rebuildDir = Files.createTempDirectory("graft_serve2_rebuild").toString
    t("index_rebuild")(Indexer.index(new GraphStore(spark, rebuildDir), docs))
    spark.stop()
  }
}
