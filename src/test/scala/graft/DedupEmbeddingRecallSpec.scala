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

  /** The data-sized SCALE branch (centered 2×32-bit bands — what a
    * ≥100k corpus gets) forced onto the test corpus via the cutover
    * override: still exactly-verified (subset of brute force), exact
    * duplicate vectors MUST collide (identical vector → identical key
    * in every band — the property the 1M run's 99.9% planted-dup
    * recall rests on), and output is partitioning-invariant. */
  test("scale branch: precision 1.0, exact-dup capture, determinism") {
    val e = Tables.t(spark, dir, "embeddings")
    val a = e.select(col("vec_id").as("a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("b"), col("embedding").as("vb"))
    val brute = a.crossJoin(b)
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), Vec.cosineFast(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= 0.45)
      .select(col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val scale = graft.queries.DedupQs.embeddingPairs(spark, dir, cutover = 0L)
      .select(col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(scale.subsetOf(brute), "scale-branch output must be exactly-verified")
    info(s"scale-branch pairs at test SF = ${scale.size} (of ${brute.size} brute)")

    // identical vectors share every centered band key, so EXACT
    // duplicates are always candidates — the property the 1M run's
    // 99.9% planted-dup recall rests on. Plant duplicates: copy each
    // vec_id % 7 == 0 embedding onto a fresh id, rerun, assert every
    // planted pair is emitted.
    val tmp = "/tmp/graft_dedup_scale_spec"
    val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
    val planted = e.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + maxId + 1).as("vec_id"), col("embedding"))
    e.select(col("vec_id"), col("embedding")).union(planted)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val foundDf = graft.queries.DedupQs.embeddingPairs(spark, tmp, cutover = 0L)
    // persisted so tools/scale-branch cross-engine checks can diff the
    // exact rows DuckDB derives from the same corpus
    foundDf.write.mode("overwrite").parquet(s"$tmp/found.parquet")
    val found = foundDf
      .select(col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = e.filter(col("vec_id") % 7 === 0).select(col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(0) + maxId + 1)).toSet
    assert(expected.subsetOf(found),
      s"${(expected -- found).size} planted exact-dup pairs missed by the scale branch")
  }

  /** The WIDE tier (4 bands × 48-bit keys from the 192-plane bank —
    * what a ≥2M corpus gets after the 10M run killed the 2×32 layout)
    * forced onto the planted-dup corpus: still exactly-verified, and
    * exact duplicates still collide in every band (identical centered
    * vector → identical 48-bit keys). Persisted for the cross-engine
    * scale-branch tool (tools/check_scale_branch.py --wide). */
  test("wide tier: precision 1.0 and exact-dup capture") {
    val tmp = "/tmp/graft_dedup_scale_spec"
    val e = Tables.t(spark, dir, "embeddings")
    val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
    // same planted corpus as the scale-branch test (rebuilt in case of
    // test-order changes)
    val planted = e.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + maxId + 1).as("vec_id"), col("embedding"))
    e.select(col("vec_id"), col("embedding")).union(planted)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val foundDf = graft.queries.DedupQs.embeddingPairs(
      spark, tmp, cutover = 0L, wideCutover = 0L)
    foundDf.write.mode("overwrite").parquet(s"$tmp/found_wide.parquet")
    val all = Tables.t(spark, tmp, "embeddings")
    val a = all.select(col("vec_id").as("a"), col("embedding").as("va"))
    val b = all.select(col("vec_id").as("b"), col("embedding").as("vb"))
    val brute = a.crossJoin(b).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        graft.functions.Vec.cosineFast(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= 0.45).select(col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = foundDf.select(col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.subsetOf(brute), "wide-tier output must be exactly-verified")
    val expected = e.filter(col("vec_id") % 7 === 0).select(col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(0) + maxId + 1)).toSet
    assert(expected.subsetOf(found),
      s"${(expected -- found).size} planted exact-dup pairs missed by the wide tier")
    info(s"wide tier: ${found.size} pairs, all ${expected.size} planted dups captured")
  }
}
