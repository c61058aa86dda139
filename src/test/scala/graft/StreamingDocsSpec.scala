package graft

import graft.streaming.Docs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming doc filter must agree row-for-row with the same
  * predicates applied in batch — incremental and batch filtering of a
  * corpus give identical results. */
class StreamingDocsSpec extends AnyFunSuite with SharedSpark {

  test("streaming filter == batch filter on the same documents") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .limit(200)
      .as[(Long, String, String)].collect().toSeq

    val input = MemoryStream[(Long, String, String)]
    val q = Docs.filterStream(input.toDF().toDF("doc_id", "lang", "text"), 0.5)
      .writeStream.format("memory").queryName("docs_out").outputMode("append").start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val streamed = spark.table("docs_out").select(col("doc_id"))
        .collect().map(_.getLong(0)).toSet

      val batch = Docs.filterStream(
        docs.toDF("doc_id", "lang", "text"), 0.5)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet

      assert(streamed == batch)
      assert(streamed.nonEmpty && streamed.size < docs.size)
    } finally q.stop()
  }

  test("streaming packer == batch pack_contexts for in-order arrivals") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = queries.CurationQs.packContexts.fn(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toSet
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).orderBy(col("doc_id"))
      .as[(Long, String)].collect()

    val input = MemoryStream[(Long, String)]
    val q = Docs.packStream(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("pack_out").outputMode("append").start()
    try {
      // ascending ids across THREE micro-batches: per-shard offsets
      // must carry across batch boundaries for the totals to line up
      val thirds = docs.grouped((docs.length + 2) / 3).toSeq
      thirds.foreach { part => input.addData(part.toIndexedSeq); q.processAllAvailable() }
      val got = spark.table("pack_out")
        .select(col("shard"), col("doc_id"), col("n_tok"), col("start_tok"), col("ctx_id"), col("crosses"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
        .toSet
      assert(got === batch,
        "streamed packing differs from batch pack_contexts (ids fed in order)")
    } finally q.stop()
  }
}
