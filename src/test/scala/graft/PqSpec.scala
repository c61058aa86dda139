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

  test("fused encode kernel == per-subspace column form at m in {8, 16, 50}") {
    // m=50 needs dim % 50 == 0: tile each 64d embedding to 200d the
    // deterministic way (repeat + trim) so the test exercises the
    // EXACT shape that broke at 200d (open item 36: m=50 fell out of
    // whole-stage codegen in the column form).
    val base = Tables.t(spark, sf, "embeddings")
      .filter(col("vec_id") % 40 === 0)
      .select(col("vec_id"), col("embedding"))
    val tiled = base.select(col("vec_id"),
      slice(concat(col("embedding"), col("embedding"), col("embedding"), col("embedding")),
        1, 200).as("embedding"))
    for ((m, df) <- Seq((8, base), (16, base), (50, tiled))) {
      val cents = Pq.train(df, m, 16, 2).localCheckpoint()
      val fused = Pq.encode(df, cents, m).orderBy(col("vec_id")).collect()
      val cols = Pq.encodePerSubspace(df, cents, m).orderBy(col("vec_id")).collect()
      assert(fused.length == cols.length && fused.nonEmpty, s"m=$m row counts")
      fused.zip(cols).foreach { case (f, c) =>
        assert(f.getLong(0) == c.getLong(0), s"m=$m id order")
        assert(f.getSeq[Int](1) == c.getSeq[Int](1),
          s"m=$m codes diverge at vec_id=${f.getLong(0)}")
      }
    }
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
