package graft

import graft.streaming.{EventIn, Events}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** mapGroupsWithState custom state: running per-user counters update
  * across micro-batches. */
class MapGroupsStateSpec extends AnyFunSuite with SharedSpark {

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("per-user state accumulates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventIn]
    val q = Events.userStats(input.toDS()).writeStream
      .format("memory").queryName("ustats").outputMode("update").start()
    try {
      input.addData(
        EventIn(ts(1), "click", 1.0, 1L),
        EventIn(ts(2), "purchase", 5.0, 1L),
        EventIn(ts(3), "click", 1.0, 2L))
      q.processAllAvailable()
      input.addData(EventIn(ts(4), "purchase", 9.0, 1L))
      q.processAllAvailable()
      val rows = spark.table("ustats")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // update-mode emits one row per user per touched batch; the
      // latest row for user 1 must show the accumulated state
      val latestU1 = rows.filter(_._1 == 1L).maxBy(_._2)
      assert(latestU1 == ((1L, 3L, 2L)))
      assert(rows.exists(r => r._1 == 2L && r._2 == 1L && r._3 == 0L))
    } finally q.stop()
  }
}
