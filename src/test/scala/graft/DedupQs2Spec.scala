package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the curation dedups (fingerprint_overlap /
  * dedup_semantic) that the hash-oracle can't express: cross-kernel
  * consistency, brute-force re-verification of every emitted pair,
  * and agreement with the sibling operators on planted duplicates. */
class DedupQs2Spec extends AnyFunSuite with SharedSpark {

  test("WinnowFpSet is the set WinnowFingerprint counts") {
    val bc = org.apache.spark.sql.graftbridge.Bridge
    val docs = Tables.t(spark, sf, "documents")
    val both = docs.select(
      col("doc_id"),
      bc.column(functions.WinnowFpSet(bc.expr(col("text")))).as("fps"),
      bc.column(functions.WinnowFingerprint(bc.expr(col("text")))).getField("n_fp").as("n_fp"))
    assert(both.filter(size(col("fps")) =!= col("n_fp")).count() === 0,
      "set-kernel cardinality disagrees with the counter kernel")
    // sorted-ascending contract (deterministic array value)
    assert(both.filter(col("fps") =!= array_sort(col("fps"))).count() === 0)
  }

  test("fingerprint_overlap: bounds hold and exact duplicates score containment 1.0") {
    val res = queries.DedupQs2.fingerprintOverlap.fn(spark, sf).localCheckpoint()
    assert(res.count() > 0, "no overlap pairs at spec scale")
    assert(res.filter(col("doc_a") >= col("doc_b")).count() === 0)
    assert(res.filter(col("containment") < 0.5 || col("containment") > 1.0).count() === 0)
    // whitespace-normalized exact dups (dedup_exact groups with n>1)
    // share the full fingerprint set when the texts are byte-identical;
    // check the byte-identical subset scores exactly 1.0
    val docs = Tables.t(spark, sf, "documents").select(col("doc_id"), col("text"))
    val exactPairs = docs.as("x").join(docs.as("y"),
        col("x.text") === col("y.text") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val missed = exactPairs.join(res.filter(col("containment") === 1.0),
      Seq("doc_a", "doc_b"), "left_anti")
    assert(missed.count() === 0,
      "a byte-identical duplicate pair is missing or scored below 1.0")
  }

  test("dedup_semantic: every emitted pair re-verifies at cos >= tau, co-located, minimal witness") {
    val res = queries.DedupQs2.dedupSemantic.fn(spark, sf).localCheckpoint()
    assert(res.count() > 0, "no semantic dups at spec scale")
    assert(res.filter(col("keep_vid") >= col("drop_vid")).count() === 0)
    // brute-force recompute of the witness cosine must agree exactly
    val e = Tables.t(spark, sf, "embeddings")
    val check = res
      .join(e.select(col("vec_id").as("keep_vid"), col("embedding").as("va")), Seq("keep_vid"))
      .join(e.select(col("vec_id").as("drop_vid"), col("embedding").as("vb")), Seq("drop_vid"))
      .select(col("cos"), functions.Vec.cosineFast(col("va"), col("vb")).as("cos2"))
    assert(check.filter(col("cos") =!= col("cos2") || col("cos") < 0.45).count() === 0,
      "an emitted witness cosine fails brute-force re-verification")
    // the witness really is the smallest same-cell keeper: no same-cell
    // vector with a smaller id also clears tau
    val cents = operators.Ivf.centroids(e, 16, 3)
    val m = operators.Ivf.assign(e, cents)
      .select(col("vec_id"), col("cid"), col("embedding")).localCheckpoint()
    val better = res.join(m.select(col("cid"), col("vec_id").as("cand"),
        col("embedding").as("vc")), Seq("cid"))
      .filter(col("cand") < col("keep_vid"))
      .join(m.select(col("vec_id").as("drop_vid"), col("embedding").as("vd")),
        Seq("drop_vid"))
      .filter(functions.Vec.cosineFast(col("vc"), col("vd")) >= 0.45)
    assert(better.count() === 0, "a smaller-id same-cell witness exists")
  }
}
