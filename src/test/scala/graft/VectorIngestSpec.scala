package graft

import graft.operators.Ivf
import graft.streaming.VectorIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming IVF ingestion must assign arriving vectors to the same
  * cells the batch assigner picks. */
class VectorIngestSpec extends AnyFunSuite with SharedSpark {

  test("streamed vectors land in the batch-equivalent IVF cells") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.t(spark, sf, "embeddings")
    val cents = Ivf.centroids(emb.filter(col("vec_id") < 400), 8, 2).localCheckpoint()

    val arriving = emb.filter(col("vec_id") >= 400 && col("vec_id") < 430)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()

    val input = MemoryStream[(Long, Array[Float])]
    val stream = input.toDF().toDF("vec_id", "embedding")
    val q = VectorIngest.assignCells(stream, cents).writeStream
      .format("memory").queryName("ingest_out").outputMode("append").start()
    try {
      input.addData(arriving.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("ingest_out")
        .select(col("vec_id"), col("cid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val batch = Ivf.assign(
        emb.filter(col("vec_id") >= 400 && col("vec_id") < 430), cents)
        .select(col("vec_id"), col("cid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(streamed.size == 30)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("online SemDeDup equals batch dedup_semantic for in-order arrivals") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // same quantizer the batch operator loads
    val (cents, _) = queries.CurationQs.allIvf(spark, sf)
    val batch = queries.DedupQs2.dedupSemantic.fn(spark, sf)
      .select(col("cid").cast("long"), col("drop_vid"), col("keep_vid"), col("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(batch.nonEmpty, "no semantic dups at spec scale — spec is vacuous")

    val all = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id"))
      .as[(Long, Array[Float])].collect()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:01:00")
    val input = MemoryStream[(Long, Array[Float], java.sql.Timestamp)]
    val q = streaming.VectorIngest.semanticDedupStream(
        input.toDF().toDF("vec_id", "embedding", "ts"), cents, tau = 0.45)
      .writeStream.format("memory").queryName("sem_out").outputMode("append").start()
    try {
      // ascending ids split across micro-batches: arrival order ==
      // id order, so residency == "smaller id" and the streamed drops
      // must match the batch pair semantics exactly. Event time
      // ADVANCES batch to batch (rows at-or-behind the watermark are
      // filtered as late) but stays inside the retention window
      // (eviction is StreamingStateTimeoutSpec's subject).
      val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:02:00")
      val (b1, b2) = all.splitAt(all.length / 2)
      input.addData(b1.toIndexedSeq.map(v => (v._1, v._2, t0)))
      q.processAllAvailable()
      input.addData(b2.toIndexedSeq.map(v => (v._1, v._2, t1)))
      q.processAllAvailable()
      val got = spark.table("sem_out")
        .select(col("cid"), col("drop_vid"), col("keep_vid"), col("cos"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got === batch,
        "online drops differ from the batch SemDeDup output (ids fed in order)")
    } finally q.stop()
  }
}
