package graft

import graft.streaming.{Docs, VectorIngest}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** The two capped-bucket stateful streams bound their retention with
  * event-time timeouts (VERDICT r6/r7: `NoTimeout` on an unbounded
  * stream never expires state). Contract proven here, for both:
  *   - WITHIN the retention window, a new arrival pairs/drops against
  *    residents (positive control, same machinery the equal-to-batch
  *    specs exercise);
  *   - an idle group is EVICTED once the watermark passes its last
  *    arrival + retention — a later twin arrival restarts the group
  *    empty and does NOT pair with the evicted resident.
  * Watermark mechanics (delay 0): the watermark used by batch N is the
  * max event time through batch N-1, so eviction lands two filler
  * batches after the idle period's end. */
class StreamingStateTimeoutSpec extends AnyFunSuite with SharedSpark {

  private val Retention = 10L * 60 * 1000 // 10 min
  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("minhash bucket state evicts after retention; pairs only within the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // identical text => identical signature => same bucket every band
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    val filler1 = "completely unrelated filler text number one with many words"
    val filler2 = "another unrelated filler document to push the watermark forward"
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = Docs.minhashCandidates(
        input.toDF().toDF("doc_id", "text", "ts"), retentionMs = Retention)
      .writeStream.format("memory").queryName("mh_evict").outputMode("append").start()
    try {
      input.addData((1L, dup, ts(0))); q.processAllAvailable()
      // fillers in other buckets: advance the watermark past doc 1's
      // timeout (00:10) without touching its bucket
      input.addData((100L, filler1, ts(45))); q.processAllAvailable()
      input.addData((101L, filler2, ts(46))); q.processAllAvailable()
      // doc 1's bucket evicted at batch 3 (watermark 00:45 > 00:10):
      // the twin doc 2 must restart the bucket EMPTY
      input.addData((2L, dup, ts(47))); q.processAllAvailable()
      // within-window control: doc 3 pairs with the resident doc 2
      input.addData((3L, dup, ts(48))); q.processAllAvailable()
      val got = spark.table("mh_evict").select(col("a"), col("b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!got.contains((1L, 2L)),
        "evicted resident still paired — state outlived its retention window")
      assert(got.contains((2L, 3L)),
        "within-window twin did not pair — eviction broke normal residency")
      assert(got == Set((2L, 3L)), s"unexpected candidate pairs: $got")
    } finally q.stop()
  }

  test("semantic-dedup cell state evicts after retention; drops only within the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two well-separated cells: dups route to cell 0, fillers to cell 1
    // (a filler arrival in the SAME cell would reset its timeout)
    val cents = Seq(
      (0L, Seq(10.0, 0.0, 0.0, 0.0)),
      (1L, Seq(-10.0, 0.0, 0.0, 0.0))).toDF("cid", "cv")
    val v = Array(10f, 0f, 0f, 0f)
    val w = Array(-10f, 0f, 0f, 0f)
    val input = MemoryStream[(Long, Array[Float], Timestamp)]
    val q = VectorIngest.semanticDedupStream(
        input.toDF().toDF("vec_id", "embedding", "ts"), cents,
        tau = 0.9, retentionMs = Retention)
      .writeStream.format("memory").queryName("sem_evict").outputMode("append").start()
    try {
      input.addData((1L, v, ts(0))); q.processAllAvailable()
      input.addData((100L, w, ts(45))); q.processAllAvailable()
      input.addData((101L, w, ts(46))); q.processAllAvailable()
      // cell 0 evicted (watermark 00:45 > 00:10): the twin vector 2
      // must NOT drop against the evicted resident 1
      input.addData((2L, v, ts(47))); q.processAllAvailable()
      // within-window control: vector 3 drops against resident 2
      input.addData((3L, v, ts(48))); q.processAllAvailable()
      val got = spark.table("sem_evict")
        .select(col("drop_vid"), col("keep_vid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!got.contains((2L, 1L)),
        "evicted resident still witnessed a drop — state outlived retention")
      assert(got.contains((3L, 2L)),
        "within-window twin did not drop — eviction broke normal residency")
      // fillers are mutual duplicates within their own cell
      assert(got == Set((3L, 2L), (101L, 100L)), s"unexpected drops: $got")
    } finally q.stop()
  }
}
