package graft

import graft.operators.BruteForce
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom LogicalPlan/Strategy/SparkPlan operator must plan as
  * VectorTopKJoinExec and agree row-for-row with the mapPartitions
  * kernel (and therefore with the DuckDB oracle). */
class VectorTopKJoinSpec extends AnyFunSuite with SharedSpark {

  private def sides = {
    val emb = Tables.t(spark, sf, "embeddings")
    (emb.filter(col("vec_id") % 50 =!= 0)
       .select(col("vec_id").as("bid"), col("embedding").as("bv")),
     emb.filter(col("vec_id") % 50 === 0)
       .select(col("vec_id").as("qid"), col("embedding").as("qv")))
  }

  for (metric <- Seq("cosine", "l2", "ip")) {
    test(s"plan-integrated topk == kernel topk for $metric") {
      val (base, queries) = sides
      val viaPlan = BruteForce.topkPlan(base, queries, metric, 10)
        .orderBy(col("qid"), col("rnk")).collect()
      val viaKernel = BruteForce.topk(base, queries, metric, 10)
        .orderBy(col("qid"), col("rnk")).collect()
      assert(viaPlan.length == viaKernel.length && viaPlan.nonEmpty)
      viaPlan.zip(viaKernel).foreach { case (a, b) => assert(a == b) }
    }
  }

  test("physical plan contains VectorTopKJoinExec") {
    val (base, queries) = sides
    val df = BruteForce.topkPlan(base, queries, "cosine", 5)
    assert(df.queryExecution.executedPlan.toString().contains("VectorTopKJoin"))
  }
}
