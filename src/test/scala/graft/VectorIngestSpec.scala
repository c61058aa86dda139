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
}
