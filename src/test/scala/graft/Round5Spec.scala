package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-5 operators (both are also oracle'd; these
  * pin the algorithmic claims the oracle can't express). */
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

  test("hnsw_insert: bounded incremental merge reproduces the batch build exactly") {
    // top-K(initial) ∪ top-K(vs batch) ⊇ true top-K(initial ∪ batch),
    // so the per-layer merge must equal hnsw_layers bit-for-bit — the
    // add_item contract: incremental maintenance loses nothing
    val ins = queries.HnswQs2.hnswInsert.fn(spark, sf)
    val full = queries.HnswQs.hnswLayers.fn(spark, sf)
    assert(ins.count() === full.count())
    assert(ins.except(full).count() === 0 && full.except(ins).count() === 0,
      "incremental layered graph differs from the batch build")
  }
}
