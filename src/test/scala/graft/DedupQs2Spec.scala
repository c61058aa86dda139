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

  test("fingerprint_overlap: the df cap keeps every strong uncapped pair") {
    val bc = org.apache.spark.sql.graftbridge.Bridge
    // uncapped containment >= 0.8 pairs (the planted near-dups) from a
    // full recompute with NO df ceiling — the cap may legitimately
    // drop borderline pairs whose overlap rode on common fingerprints,
    // but a pair that shares 80% of the smaller doc's RAW set must
    // survive the boilerplate filter
    val fps = Tables.t(spark, sf, "documents")
      .select(col("doc_id"),
        bc.column(functions.WinnowFpSet(bc.expr(col("text")))).as("fps"))
      .cache()
      .select(col("doc_id"), explode(col("fps")).as("fp"))
    val n = fps.groupBy(col("doc_id")).agg(count(lit(1)).as("nfp"))
    val strong = fps.as("a").join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .join(n.select(col("doc_id").as("doc_a"), col("nfp").as("na")), Seq("doc_a"))
      .join(n.select(col("doc_id").as("doc_b"), col("nfp").as("nb")), Seq("doc_b"))
      .filter(col("shared").cast("double") / least(col("na"), col("nb")) >= 0.8)
      .select(col("doc_a"), col("doc_b"))
    assert(strong.count() > 0, "no strong pairs at spec scale — spec is vacuous")
    val capped = queries.DedupQs2.fingerprintOverlap.fn(spark, sf)
      .select(col("doc_a"), col("doc_b"))
    assert(strong.join(capped, Seq("doc_a", "doc_b"), "left_anti").count() === 0,
      "the df ceiling dropped a strong (containment >= 0.8) pair")
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
