package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-5 operators (beam_steps_to_target is also
  * oracle'd; hnsw_insert went rows-only with the approx initial index
  * in round 8, so its merge contract is pinned entirely here). */
class Round5Spec extends AnyFunSuite with SharedSpark {

  test("beam_steps_to_target: steps bounded, consistent with the final beam") {
    val trace = queries.HnswQs2.beamStepsToTarget.fn(spark, sf).localCheckpoint()
    val n = trace.count()
    assert(n > 0)
    // one row per query, steps ∈ [-1, 3], visited ≥ 1 (the seed)
    assert(trace.filter(col("steps") < -1 || col("steps") > 3).count() === 0)
    assert(trace.filter(col("visited") < 1).count() === 0)
    // a query whose target is in the FINAL beam must have steps >= 0,
    // and vice versa: steps >= 0 targets appear in graph_beam_search's
    // result (the beam is monotone: entries only leave when beaten by
    // closer ones — the target, being the closest, never leaves)
    val finalBeam = queries.VectorQs3.graphBeamSearch.fn(spark, sf)
      .select(col("qid"), col("bid").as("target"))
    val inFinal = trace.join(finalBeam, Seq("qid", "target"))
    assert(inFinal.filter(col("steps") < 0).count() === 0,
      "target in final beam but steps = -1")
    assert(trace.filter(col("steps") >= 0).count() === inFinal.count(),
      "steps >= 0 rows must equal targets present in the final beam")
    // visited is non-decreasing in steps for found queries (the ledger
    // accumulates: searching longer can only score more nodes)
    val maxVisEarly = trace.filter(col("steps") === 0)
      .agg(coalesce(max(col("visited")), lit(1L))).head().getLong(0)
    assert(maxVisEarly === 1L, "steps=0 means only the seed was scored")
  }

  test("hnsw_insert: approx-initial merge keeps the exact-insert invariants") {
    // with the N² initial build replaced by the approx substrate (r7
    // item 2), three invariants survive and are pinned here:
    //  1. the FRESH half (src >= splitId) is exact by construction —
    //     those rows equal the exact batch build's rows bit-for-bit;
    //  2. no batch arrival is lost: every exact-top-K edge from an
    //     existing src to a batch dst beats at most K-1 others, so it
    //     must appear in the merged list no matter how weak the approx
    //     initial list is;
    //  3. per-level edge recall vs the exact batch build stays above
    //     the Round6 floor for the whole merged graph.
    val ins = queries.HnswQs2.hnswInsert.fn(spark, sf).localCheckpoint()
    val full = queries.HnswQs.hnswLayers.fn(spark, sf).localCheckpoint()
    val maxId = Tables.t(spark, sf, "embeddings")
      .agg(max(col("vec_id"))).head().getLong(0)
    val splitId = maxId * 8 / 10

    val insFresh = ins.filter(col("src") >= splitId)
    val fullFresh = full.filter(col("src") >= splitId)
    assert(insFresh.count() === fullFresh.count())
    assert(insFresh.except(fullFresh).count() === 0 &&
      fullFresh.except(insFresh).count() === 0,
      "fresh nodes' lists must equal the exact batch build")

    val mustKeep = full.filter(col("src") < splitId && col("dst") >= splitId)
      .select(col("level"), col("src"), col("dst"))
    assert(mustKeep.join(ins.select(col("level"), col("src"), col("dst")),
      Seq("level", "src", "dst"), "left_anti").count() === 0,
      "a batch arrival inside the true top-K was lost by the merge")

    val perLevel = full.groupBy(col("level")).agg(count(lit(1)).as("n_exact"))
      .join(full.select(col("level"), col("src"), col("dst"))
        .join(ins.select(col("level"), col("src"), col("dst")), Seq("level", "src", "dst"))
        .groupBy(col("level")).agg(count(lit(1)).as("n_hit")), Seq("level"))
      .select(col("level"), (col("n_hit") / col("n_exact")).as("recall"))
      .collect()
    perLevel.foreach { r =>
      val recall = r.getDouble(1)
      info(f"level ${r.getInt(0)} merged-graph recall $recall%.3f vs exact batch build")
      assert(recall >= 0.8,
        s"level ${r.getInt(0)} merged recall $recall < 0.8 vs the exact batch build")
    }
  }
}
