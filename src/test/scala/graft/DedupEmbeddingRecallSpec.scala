package graft

import graft.functions.Vec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** dedup_embedding is LSH-candidate + exact-verify: its output must be
  * a SUBSET of the brute-force threshold pairs (precision 1.0 — every
  * emitted pair is exactly verified), with recall measured here against
  * the all-pairs scan the operator no longer performs. The sf0.01
  * threshold pairs sit right at the 0.45 boundary (cos 0.450–0.513),
  * the hardest case for hyperplane LSH, so the asserted floor is an
  * honest worst-case bound for the 16-band × 4-bit bank. */
class DedupEmbeddingRecallSpec extends AnyFunSuite {

  private lazy val spark = SharedSpark.session
  private val dir = "/root/testdata/sf0.01"

  test("precision 1.0 and recall floor vs brute-force threshold pairs") {
    val e = Tables.t(spark, dir, "embeddings")
    val a = e.select(col("vec_id").as("a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("b"), col("embedding").as("vb"))
    val brute = a.crossJoin(b)
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), Vec.cosineFast(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= 0.45)
      .select(col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val lsh = graft.queries.DedupQs.dedupEmbedding.fn(spark, dir)
      .select(col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(lsh.subsetOf(brute), "LSH output must be exactly-verified (precision 1.0)")
    assert(brute.nonEmpty)
    val recall = lsh.size.toDouble / brute.size
    info(s"recall = ${lsh.size}/${brute.size} = $recall")
    assert(recall >= 0.75, s"recall $recall below floor for boundary-cosine pairs")
  }
}
