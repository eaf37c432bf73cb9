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

  case class SessionEvent(user_id: Long, event_id: Long, ts: java.sql.Timestamp)

  /** Per-user session state: ordinal counter + the open session (n = 0 ⇔
    * no open session). Timestamps are epoch SECONDS (the engine-wide
    * truncation, Sessionize.tsec).
    */
  case class SessionState(nextSession: Long, n: Long, firstEvent: Long,
                          minTs: Long, maxTs: Long)

  case class ClosedSession(user_id: Long, session: Long, n_events: Long,
                           first_event: Long, duration_sec: Long)

  /** Streaming twin of the q49 batch sessionization
    * ([[graft.ops.Sessionize.sessions]]): inactivity-gap session windows
    * via `flatMapGroupsWithState` with EVENT-TIME TIMEOUT — a session
    * closes (and its rollup row is emitted, append-mode) when the
    * watermark passes its last event + gap. Spec-pinned equal to the
    * batch rollup on closed sessions (StreamIngestSpec).
    *
    * 100-TB shape: OPEN-session payload is O(active users), but the
    * state-store ENTRY count is O(distinct users ever seen): on event-time
    * timeout the closed session is emitted and the entry is kept (n = 0)
    * so the per-user session ORDINAL stays continuous with the batch twin
    * — the documented price of ordinal parity (round-6 advice). A
    * deployment that cannot afford ever-seen-user state removes the entry
    * on timeout and accepts per-restart ordinal resets (or persists the
    * counters out of band). Entries are sharded by the state store across
    * partitions; each micro-batch shuffles only its own events by user. Late events inside the watermark fold into
    * their session exactly like the batch (ts, event_id) ordering; events
    * later than the watermark are dropped by the stateful operator — the
    * documented streaming trade the watermark declares.
    */
  def sessionizeStream(spark: SparkSession, events: DataFrame,
                       gapSec: Long = 1800L,
                       watermarkDelay: String = "30 minutes"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val typed = events
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[SessionEvent]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
          var st = state.getOption.getOrElse(SessionState(1L, 0L, 0L, 0L, 0L))
          def close(): Unit = if (st.n > 0) {
            out += ClosedSession(uid, st.nextSession, st.n, st.firstEvent,
              st.maxTs - st.minTs)
            st = SessionState(st.nextSession + 1, 0L, 0L, 0L, 0L)
          }
          if (state.hasTimedOut) {
            close()
            state.update(st) // ordinal counter survives; no timer until new events
          } else {
            // The batch twin orders by (ts, event_id); within a micro-batch
            // the same tie-break applies. Epoch-second truncation mirrors
            // Sessionize.tsec.
            val sorted = rows.toIndexedSeq.sortBy(e => (e.ts.getTime / 1000L, e.event_id))
            sorted.foreach { e =>
              val t = e.ts.getTime / 1000L
              if (st.n > 0 && t - st.maxTs > gapSec) close()
              if (st.n == 0L)
                st = st.copy(n = 1L, firstEvent = e.event_id, minTs = t, maxTs = t)
              else
                st = st.copy(n = st.n + 1L,
                  firstEvent = math.min(st.firstEvent, e.event_id),
                  minTs = math.min(st.minTs, t), maxTs = math.max(st.maxTs, t))
            }
            state.update(st)
            if (st.n > 0) {
              // Close when the watermark passes last-event + gap. If the
              // watermark has ALREADY passed it (cross-batch skew), arm the
              // earliest legal timer — the session closes next micro-batch.
              val target = (st.maxTs + gapSec + 1L) * 1000L
              state.setTimeoutTimestamp(math.max(target, state.getCurrentWatermarkMs() + 1L))
            }
          }
          out.iterator
      }.toDF()
  }

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
