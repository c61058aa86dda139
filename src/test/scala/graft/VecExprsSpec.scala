package graft

import graft.functions.Vec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd kernels must be BIT-identical to the HOF left-fold
  * forms — the DuckDB oracle mirrors the HOF association, so any drift
  * here silently breaks the correctness gate. */
class VecExprsSpec extends AnyFunSuite with SharedSpark {

  test("fast kernels bit-match HOF folds on real embeddings") {
    val emb = Tables.t(spark, sf, "embeddings").limit(200)
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("av"))
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("bv"))
    val pairs = a.join(b, col("a_id") + 1 === col("b_id"))
    val r = pairs.select(
      Vec.dotFast(col("av"), col("bv")).as("dot_f"),
      Vec.dot(Vec.asD(col("av")), Vec.asD(col("bv"))).as("dot_h"),
      Vec.l2sqFast(col("av"), col("bv")).as("l2_f"),
      Vec.l2sq(Vec.asD(col("av")), Vec.asD(col("bv"))).as("l2_h"),
      Vec.cosineFast(col("av"), col("bv")).as("cos_f"),
      Vec.cosine(Vec.asD(col("av")), Vec.asD(col("bv"))).as("cos_h"))
    val bad = r.filter(
      col("dot_f") =!= col("dot_h") ||
      col("l2_f") =!= col("l2_h") ||
      col("cos_f") =!= col("cos_h")).count()
    assert(bad == 0)
  }

  test("kernels accept mixed float/double arrays") {
    val emb = Tables.t(spark, sf, "embeddings").limit(5)
    val r = emb.select(
      Vec.dotFast(col("embedding"), Vec.asD(col("embedding"))).as("d"),
      Vec.dotFast(col("embedding"), col("embedding")).as("d2"))
    assert(r.filter(col("d") =!= col("d2")).count() == 0)
  }
}
