package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.extract.Extract

/** Structured-Streaming front door. The reference has no streaming engine —
  * it does incremental batch (SURVEY.md §2.8); this module gives the same
  * extraction pipeline a streaming shape for continuously-arriving pages:
  * file-source pages → chunk/triple extraction (all stateless, so the plan
  * is trivially streamable) → append sink with exactly-once checkpointing.
  * Triggers are AvailableNow so each run drains the backlog and stops —
  * the streaming analog of the reference's resumable `index()`.
  */
object StreamIngest {

  val pageSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  /** Drain new page files from `inputDir` into a triples parquet sink.
    * Exactly-once across restarts via `checkpointDir`.
    */
  def ingestPages(spark: SparkSession, inputDir: String, sinkDir: String,
                  checkpointDir: String): StreamingQuery = {
    val pages = spark.readStream.schema(pageSchema).parquet(inputDir)
    val chunks = Extract.chunks(pages, "text", Seq("url"))
    val triples = Extract.sentenceTriples(chunks)
    triples.writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Watermarked tumbling-window event counts (the standard streaming agg
    * shape: late data beyond the watermark is dropped, windows finalize).
    */
  def windowedEventCounts(events: DataFrame, watermark: String = "1 hour",
                          window: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))

  case class DedupedPage(url: String, textHash: String, keeper: String, isDup: Boolean)

  /** Stateful streaming dedup — the streaming form of the engine's
    * content-hash idempotency (I1/S8): rows group by md5(text) and a
    * `flatMapGroupsWithState` keeps ONE keeper url per hash in GroupState
    * (first batch's min url wins; deterministic within a batch). Every row
    * is emitted tagged (keeper, isDup), so downstream sinks can either
    * drop dups or keep lineage. State lives in the query checkpoint —
    * exactly-once across restarts, unbounded keys sharded by the state
    * store (the 100-TB shape: state scales out with partitions, no
    * driver-side set).
    */
  def streamingDedup(spark: SparkSession, pages: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    pages.select(col("url"), md5(col("text")).as("text_hash"))
      .as[(String, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[String, DedupedPage](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (hash: String, rows: Iterator[(String, String)], state: GroupState[String]) =>
          val batch = rows.map(_._1).toSeq.sorted
          val keeper = state.getOption.getOrElse(batch.head)
          if (state.getOption.isEmpty) state.update(keeper)
          batch.iterator.map(url =>
            DedupedPage(url, hash, keeper, isDup = url != keeper))
      }
      .toDF()
  }
}
