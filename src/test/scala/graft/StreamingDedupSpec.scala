package graft

import graft.streaming.Events
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class StreamingDedupSpec extends AnyFunSuite with SharedSpark {

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("streaming dedup drops same-content docs across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Long)]
    val df = input.toDF().toDF("ts", "text", "doc_id")
    val q = Events.dedupStream(df).writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      input.addData((ts(1), "hello  world", 1L), (ts(2), "other doc", 2L))
      q.processAllAvailable()
      // same normalized content (whitespace collapsed), later batch
      input.addData((ts(3), "HELLO world", 3L), (ts(4), "third doc", 4L))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select(col("doc_id"))
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 2L, 4L)) // doc 3 deduped against doc 1
    } finally q.stop()
  }
}
