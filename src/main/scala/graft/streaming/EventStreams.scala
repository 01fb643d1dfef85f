package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming pipelines (SURVEY.md §2.7 streaming coverage — the
  * reference only "streams" in the transport sense; these add real
  * event-time semantics: watermarks, tumbling and session windows,
  * stateful dedup with bounded state). Each takes a streaming DataFrame
  * with the events schema (`event_id, ts timestamp, user_id, event_type,
  * value, props`) and returns a streaming result; the batch twins live in
  * QueriesRelational (`stream_hourly`, `sessionize`) and are
  * oracle-checked, so the streaming paths are asserted against the same
  * expected values in the test suite.
  *
  * Scale: all state (window aggs, dedup keys, sessions) is bounded by the
  * watermark — late data beyond `watermark` is dropped, state is evicted,
  * so a 100 TB/day stream holds only the watermark horizon in memory. */
object EventStreams {

  /** Tumbling 1-hour event-time aggregation with late-data handling. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"),
        col("total"))

  /** Stateful exact dedup on event_id with watermark-bounded state. */
  def dedup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Session windows with a 30-minute inactivity gap per user — the
    * streaming twin of operators.Sessionize. */
  def sessions(events: DataFrame, gap: String = "30 minutes",
               watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
}
