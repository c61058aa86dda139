package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Structured-Streaming forms of the events queries (SURVEY §2F).
  * The batch twins live in queries.Relational; these run on any
  * streaming DataFrame with (ts: timestamp, event_type, value, user_id)
  * and are exercised in StreamingSpec via MemoryStream.
  *
  * Scale notes: watermark bounds state; tumbling-window aggregation is
  * the canonical shuffle-once streaming agg; sessionization uses
  * session_window (state per active session, closed by watermark).
  */
object Events {

  /** Tumbling 1h window counts/sums per event_type, 2h watermark. */
  def windowedAgg(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  /** Gap-based sessions (30 min inactivity) per user. */
  def sessions(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("start"),
        col("session_window.end").as("end"), col("user_id"), col("n_events"))
}
