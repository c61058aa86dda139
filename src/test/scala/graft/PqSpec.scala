package graft

import graft.operators.Pq
import graft.queries.{VectorQs, VectorQs3}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization invariants: codes are deterministic and
  * m-wide, the ADC+rerank search substantially agrees with the exact
  * L2 groundtruth, and quantized candidates beat random chance by a
  * wide margin (8 bytes/vector vs 256 — the whole point at 100 TB). */
class PqSpec extends AnyFunSuite with SharedSpark {

  test("encode is deterministic and m-wide") {
    val b = Tables.t(spark, sf, "embeddings").filter(col("vec_id") % 50 =!= 0)
      .select(col("vec_id"), col("embedding"))
    val cents = Pq.train(b, 8, 16, 2).localCheckpoint()
    val c1 = Pq.encode(b, cents, 8).orderBy(col("vec_id")).collect()
    val c2 = Pq.encode(b.repartition(7), cents, 8).orderBy(col("vec_id")).collect()
    assert(c1.sameElements(c2))
    assert(c1.forall(_.getSeq[Int](1).length == 8))
    assert(c1.length == b.count())
  }

  test("pq_search recall@10 vs exact L2 >= 0.5") {
    val gt = VectorQs.gtTopk(spark, sf, "l2").select(col("qid"), col("bid"))
      .localCheckpoint()
    val res = VectorQs3.pqSearch.fn(spark, sf)
    val hits = res.select(col("qid"), col("bid")).join(gt, Seq("qid", "bid")).count()
    val recall = hits.toDouble / gt.count()
    info(s"pq adc+rerank recall@10 = $recall")
    assert(recall >= 0.5, s"pq recall $recall")
  }
}
