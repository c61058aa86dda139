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

  test("VecNearestCid bit-matches crossJoin + min(struct(d2, cid))") {
    val emb = Tables.t(spark, sf, "embeddings").limit(500)
      .select(col("vec_id"), col("embedding"))
    // centroid bank with planted exact-tie candidates: centroid 7 is a
    // copy of centroid 3, so every row's (d2,3)==(d2,7) tie must
    // resolve to cid 3 under both forms
    val cents = Tables.t(spark, sf, "embeddings")
      .filter(col("vec_id") % 97 === 0).limit(12)
      .select((col("vec_id") % 100).cast("long").as("cid"),
        Vec.asD(col("embedding")).as("cv"))
      .localCheckpoint()
    val dup = cents.orderBy("cid").limit(4).orderBy(col("cid").desc).limit(1)
      .select(lit(9999L).as("cid"), col("cv"))
    val bankDf = cents.union(dup).localCheckpoint()
    val viaStruct = emb.crossJoin(broadcast(bankDf))
      .select(col("vec_id"),
        struct(Vec.l2sqFast(col("embedding"), col("cv")).as("d2"), col("cid")).as("sc"))
      .groupBy(col("vec_id")).agg(min(col("sc")).as("sc"))
      .select(col("vec_id"), col("sc.cid").as("cid_struct"))
    val viaKernel = operators.Ivf.assign(emb, bankDf)
      .select(col("vec_id"), col("cid").as("cid_kernel"))
    val joined = viaStruct.join(viaKernel, "vec_id")
    assert(joined.count() == 500)
    assert(joined.filter(col("cid_struct") =!= col("cid_kernel")).count() == 0)
  }

  test("kernels accept mixed float/double arrays") {
    val emb = Tables.t(spark, sf, "embeddings").limit(5)
    val r = emb.select(
      Vec.dotFast(col("embedding"), Vec.asD(col("embedding"))).as("d"),
      Vec.dotFast(col("embedding"), col("embedding")).as("d2"))
    assert(r.filter(col("d") =!= col("d2")).count() == 0)
  }
}
