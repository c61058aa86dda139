package graft

import graft.operators.SeedSelect
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Two-level seed selection (operators.SeedSelect — the measured
  * harness mode of docs/scale_run.md "Two-level seeding MEASURED",
  * and the intended catalog wiring point). Contract that makes the
  * approximation safe: with tl ≥ the coarse cell count every cell is
  * probed, the candidate set is the whole anchor bank, and the picked
  * seeds are BITWISE equal to the exact full-scan form — the knob has
  * an exact endpoint. Also pinned: partitioning invariance, and the
  * probed candidate set is the union of exactly the top-tl cells'
  * anchors (no duplicates from the joins). */
class SeedSelectSpec extends AnyFunSuite {

  private lazy val spark = SharedSpark.session
  private val dir = "/root/testdata/sf0.01"

  private lazy val (anchors, queries) = {
    val emb = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val a = emb.filter(col("vec_id") % 37 === 0).limit(300)
      .select(col("vec_id").as("bid"), col("embedding").as("bv"))
      .localCheckpoint()
    val q = emb.filter(col("vec_id") % 50 === 0).limit(120)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .localCheckpoint()
    (a, q)
  }

  test("tl >= coarse cell count == exact full scan, bit-for-bit") {
    val ents = 4
    val (coarse, aCells, cc) = SeedSelect.coarseBank(anchors)
    assert(cc >= 16 && cc.toLong * cc >= anchors.count())
    val exact = SeedSelect.pick(SeedSelect.exactScored(queries, anchors), ents)
      .orderBy(col("qid"), col("bid")).collect().map(_.toSeq)
    val two = SeedSelect.pick(
      SeedSelect.twoLevelScored(queries, coarse, aCells, cc), ents)
      .orderBy(col("qid"), col("bid")).collect().map(_.toSeq)
    assert(two.length == exact.length && exact.nonEmpty)
    two.zip(exact).foreach { case (g, r) => assert(g == r) }
  }

  test("candidate set = union of the top-tl cells' anchors, no duplicates") {
    val tl = 3
    val (coarse, aCells, _) = SeedSelect.coarseBank(anchors)
    val cand = SeedSelect.twoLevelScored(queries, coarse, aCells, tl)
    // one row per (qid, probed anchor): grouping by the pair never
    // exceeds count 1
    val dups = cand.groupBy(col("qid"), col("bid")).count()
      .filter(col("count") > 1).count()
    assert(dups == 0L)
    // per-query candidate count == the total population of its top-tl
    // cells (derived independently from the assignment table)
    val pops = aCells.groupBy(col("cid")).agg(count(lit(1)).as("pop"))
    val qCells = graft.operators.TopK.perGroup(
      queries.crossJoin(broadcast(coarse))
        .select(col("qid"), col("cid"),
          graft.functions.Vec.l2Fast(col("qv"), col("cvf")).as("d")),
      "qid", "cid", "d", tl, asc = true)
    val want = qCells.join(pops, Seq("cid")).groupBy(col("qid"))
      .agg(sum(col("pop")).as("n")).orderBy(col("qid"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = cand.groupBy(col("qid")).agg(count(lit(1)).as("n"))
      .orderBy(col("qid")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sameElements(want))
  }

  test("two-level pick is partitioning-invariant") {
    val ents = 3
    val tl = 4
    val (coarse, aCells, _) = SeedSelect.coarseBank(anchors)
    def run(q: org.apache.spark.sql.DataFrame) =
      SeedSelect.pick(SeedSelect.twoLevelScored(q, coarse, aCells, tl), ents)
        .orderBy(col("qid"), col("bid")).collect().map(_.toSeq)
    val a = run(queries.repartition(1))
    val b = run(queries.repartition(17))
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }
}
