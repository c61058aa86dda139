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

  test("streaming minhash candidates equal the batch LSH candidate set across micro-batches") {
    import graft.functions.TextFns
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // independent batch recompute of the banded candidate set (same
    // formulas, plain joins — no shared code with the streaming op's
    // state logic)
    val wt = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), TextFns.words(col("text")).as("w")).cache()
    val sigs = wt
      .select(col("doc_id"),
        TextFns.shingleHashes(TextFns.wordShingles(col("w"), 3)).as("hs")).cache()
      .select(col("doc_id") +:
        (0 until 9).map(j => TextFns.minhash(col("hs"), j).as(s"s$j")): _*)
    val bands = (0 until 3).map { b =>
      sigs.select(col("doc_id"), lit(b).as("band"),
        col(s"s${3 * b}").as("k0"), col(s"s${3 * b + 1}").as("k1"),
        col(s"s${3 * b + 2}").as("k2"))
    }.reduce(_.union(_))
    val expected = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.k0") === col("y.k0") &&
        col("x.k1") === col("y.k1") && col("x.k2") === col("y.k2") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "corpus has no banded candidates — spec is vacuous")

    val input = MemoryStream[(Long, String, Timestamp)]
    val q = streaming.Docs.minhashCandidates(input.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("mh_cand").outputMode("append").start()
    try {
      // split so candidate pairs straddle the micro-batch boundary;
      // constant event time keeps every bucket inside the retention
      // window (eviction itself is StreamingStateTimeoutSpec's subject)
      val (b1, b2) = docs.partition(_._1 % 2 == 0)
      input.addData(b1.toIndexedSeq.map(d => (d._1, d._2, ts(1))))
      q.processAllAvailable()
      input.addData(b2.toIndexedSeq.map(d => (d._1, d._2, ts(2))))
      q.processAllAvailable()
      val got = spark.table("mh_cand").select(col("a"), col("b"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.distinct.length,
        "a pair was emitted twice (first-match-band suppression failed)")
      assert(got.toSet === expected,
        "streamed candidate set differs from the batch LSH candidate set")
    } finally q.stop()
  }
}
