package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization (inactivity-gap sessions) — the canonical event-stream
  * rollup, shared by the batch query (q49, DocQueries.qSessionize) and
  * its Structured-Streaming twin (StreamIngest.sessionizeStream, spec-
  * pinned equal on closed sessions).
  *
  * Batch shape: ONE shuffle by user + two window passes — flag gap-starts
  * via lag, running-sum the flags into a per-user session ordinal, then
  * roll up per session. Integer/timestamp arithmetic only — exactly
  * oracle-able (the q49 DuckDB oracle floors epoch() to match Spark's
  * timestamp→long truncation).
  */
object Sessionize {

  /** Epoch-second truncation shared by both engines and both twins:
    * TIMESTAMP_NTZ casts through session-tz timestamp (UTC) to long.
    */
  private def tsec(c: org.apache.spark.sql.Column) = c.cast("timestamp").cast("long")

  /** @param events (user_id, event_id, ts) — extra columns ignored
    * @return (user_id, session, n_events, first_event, duration_sec);
    *         session ordinals are 1-based per user in (ts, event_id) order
    */
  def sessions(events: DataFrame, gapSec: Long = 1800L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val flagged = events.select(
      col("user_id"), col("event_id"), col("ts"),
      when(tsec(col("ts")) - lag(tsec(col("ts")), 1).over(w)
        > gapSec || lag(col("ts"), 1).over(w).isNull, 1L).otherwise(0L)
        .as("new_session"))
    val sess = flagged.withColumn("session",
      sum("new_session").over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
    sess.groupBy("user_id", "session")
      .agg(count(lit(1)).as("n_events"),
        min("event_id").as("first_event"),
        (max(tsec(col("ts"))) - min(tsec(col("ts")))).as("duration_sec"))
  }
}
