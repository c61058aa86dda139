package graft

import graft.queries.VectorQs
import org.scalatest.funsuite.AnyFunSuite

/** The imperative kernel must agree BIT-FOR-BIT with the join+udaf
  * formulation (which the DuckDB oracle mirrors) — scores, ids, ranks. */
class BruteForceSpec extends AnyFunSuite with SharedSpark {

  for (metric <- Seq("cosine", "l2", "ip")) {
    test(s"BruteForce.topk == join-based top-k for $metric") {
      val fast = VectorQs.gtTopk(spark, sf, metric).collect()
      val ref = VectorQs.gtTopkJoin(spark, sf, metric).collect()
      assert(fast.length == ref.length && fast.length > 0)
      fast.zip(ref).foreach { case (a, b) => assert(a == b, s"$a != $b") }
    }
  }
}
