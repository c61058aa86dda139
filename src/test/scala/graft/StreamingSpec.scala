package graft

import graft.streaming.Events
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class StreamingSpec extends AnyFunSuite with SharedSpark {

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("windowed streaming agg matches expected buckets end-to-end") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double, Long)]
    val df = input.toDF().toDF("ts", "event_type", "value", "user_id")
    val q = Events.windowedAgg(df).writeStream
      .format("memory").queryName("win_out").outputMode("complete").start()
    try {
      input.addData(
        (ts(5), "click", 1.0, 1L), (ts(20), "click", 2.0, 2L),
        (ts(65), "click", 4.0, 1L), (ts(70), "view", 8.0, 3L))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select(date_format(col("hour"), "HH:mm").as("h"), col("event_type"), col("n"), col("sum_value"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(rows == Set(("00:00", "click", 2L, 3.0), ("01:00", "click", 1L, 4.0), ("01:00", "view", 1L, 8.0)))
    } finally q.stop()
  }

  test("trending top-k per window ranks the heaviest event types") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double, Long)]
    val df = input.toDF().toDF("ts", "event_type", "value", "user_id")
    // Append mode emits a window only once the watermark passes its end, so
    // finalized windows arrive in LATER (possibly no-data) micro-batches —
    // accumulate across sink calls instead of keeping only the last batch.
    val out = new java.util.concurrent.atomic.AtomicReference[Seq[(String, String, Long, Int)]](Seq.empty)
    val q = graft.streaming.Events.trendingTopK(df, k = 2) { ranked =>
      val batchRows = ranked.select(col("hour"), col("event_type"), col("n"), col("rnk"))
        .collect().toSeq.map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      out.updateAndGet(prev => prev ++ batchRows)
      ()
    }
    try {
      input.addData(
        (ts(5), "click", 1.0, 1L), (ts(10), "click", 1.0, 2L), (ts(15), "view", 1.0, 1L),
        (ts(20), "view", 1.0, 2L), (ts(25), "view", 1.0, 3L), (ts(30), "error", 1.0, 1L),
        (ts(65), "signup", 1.0, 1L))
      q.processAllAvailable()
      // Watermark after batch 1 = 01:05 − 2h — no window end passed yet. A late
      // sentinel (04:10) pushes it to 02:10, finalizing the 00:00 and 01:00
      // windows; the sentinel's own 04:00 window stays open and never emits.
      input.addData((ts(250), "sentinel", 1.0, 9L))
      q.processAllAvailable()
      val rows = out.get().toSet
      // hour 0: view(3) then click(2); error(1) cut by k=2. hour 1: signup only.
      assert(rows == Set(
        ("2024-01-01 00:00:00", "view", 3L, 1),
        ("2024-01-01 00:00:00", "click", 2L, 2),
        ("2024-01-01 01:00:00", "signup", 1L, 1)))
    } finally q.stop()
  }

  test("session windows close on 30-minute gaps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double, Long)]
    val df = input.toDF().toDF("ts", "event_type", "value", "user_id")
    val q = Events.sessions(df).writeStream
      .format("memory").queryName("sess_out").outputMode("complete").start()
    try {
      // user 1: two events 10 min apart (one session), then a 60-min gap (new session)
      input.addData(
        (ts(0), "click", 1.0, 1L), (ts(10), "click", 1.0, 1L), (ts(70), "click", 1.0, 1L))
      q.processAllAvailable()
      val rows = spark.table("sess_out").select(col("user_id"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(rows.toSeq == Seq((1L, 1L), (1L, 2L)))
    } finally q.stop()
  }
}
