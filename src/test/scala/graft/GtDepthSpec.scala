package graft

import graft.queries.VectorQs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Groundtruth at the reference's depth: the reference computes its
  * groundtruth at K=100 (README_RoarGraph.md:13-15 `compute_groundtruth
  * --K 100`); the catalog default is 10 but the depth is configurable
  * (VectorQs.K / SPARK_GRAFT_GT_K). This pins the K=100 path: kernel ==
  * join formulation bit-for-bit, full depth per query, rank-nested
  * prefix (top-10 is exactly the first 10 rows of top-100). */
class GtDepthSpec extends AnyFunSuite with SharedSpark {

  private val sf01 = "/root/testdata/sf0.01"

  for (metric <- Seq("l2", "cosine", "ip")) {
    test(s"gt at K=100: kernel == join formulation bit-for-bit ($metric)") {
      val fast = VectorQs.gtTopk(spark, sf01, metric, k = 100).collect()
      val ref = VectorQs.gtTopkJoin(spark, sf01, metric, k = 100).collect()
      assert(fast.length == ref.length && fast.length > 0)
      fast.zip(ref).foreach { case (a, b) => assert(a == b, s"$a != $b") }
    }
  }

  test("gt at K=100: every query carries exactly 100 ranked rows") {
    val per = VectorQs.gtTopk(spark, sf01, "l2", k = 100)
      .groupBy(col("qid")).agg(count(lit(1)).as("n"), max(col("rnk")).as("mx"))
      .collect()
    assert(per.nonEmpty)
    per.foreach { r =>
      assert(r.getAs[Long]("n") == 100L && r.getAs[Int]("mx") == 100, r.toString)
    }
  }

  test("gt depth is rank-nested: top-10 == first 10 rows of top-100") {
    val k100 = VectorQs.gtTopk(spark, sf01, "l2", k = 100)
      .filter(col("rnk") <= 10).collect()
    val k10 = VectorQs.gtTopk(spark, sf01, "l2", k = 10).collect()
    assert(k10.length == k100.length && k10.length > 0)
    k10.zip(k100).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }
}
