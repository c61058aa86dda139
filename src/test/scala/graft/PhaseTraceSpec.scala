package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the phase-split search trace (round 6): the per-phase
  * counters must describe a legal walk over the layered index, and the
  * stats roll-up must agree with the rows it summarizes (the oracle
  * hash proves exact values; these pin the semantics at a glance). */
class PhaseTraceSpec extends AnyFunSuite with SharedSpark {

  private lazy val trace =
    queries.HnswQs3.hnswPhaseTrace.fn(spark, sf).localCheckpoint()

  test("phase trace: one row per query, legal hop/step ranges, positive visited") {
    val nQ = Tables.t(spark, sf, "embeddings")
      .filter(col("vec_id") % 50 === 0).count()
    assert(trace.count() === nQ)
    assert(trace.filter(col("l2_hops") < 0 || col("l2_hops") > 3 ||
      col("l1_hops") < 0 || col("l1_hops") > 3).count() === 0)
    assert(trace.filter(col("l0_steps") < -1 || col("l0_steps") > 3).count() === 0)
    assert(trace.filter(col("l2_visited") < 1 || col("l1_visited") < 1 ||
      col("l0_visited") < 1).count() === 0)
  }

  test("phase trace: descent lands on a layer-1 node and targets are true NNs") {
    // the layer-0 entry must be a member of the layer-1 graph (the
    // carry comes out of the layer-1 walk)
    val l1Nodes = queries.HnswQs3.baseLayers(spark, sf)
      .filter(col("level") === 1).select(col("src")).distinct()
    assert(trace.join(l1Nodes, col("l0_entry") === col("src"), "left_anti")
      .count() === 0, "a layer-0 entry is not a layer-1 graph node")
    // target = exact L2 rank-1 over base
    val gt1 = queries.VectorQs.gtTopk(spark, sf, "l2")
      .filter(col("rnk") === 1).select(col("qid"), col("bid"))
    assert(trace.join(gt1, Seq("qid"))
      .filter(col("target") =!= col("bid")).count() === 0)
  }

  test("phase trace: a found query's l0 entry at steps=0 IS in the seed beam") {
    // steps = 0 means the true NN was already in the beam before any
    // layer-0 expansion — with a single carry node that forces
    // target == l0_entry (the seed beam is exactly that node)
    assert(trace.filter(col("l0_steps") === 0 &&
      col("target") =!= col("l0_entry")).count() === 0)
  }

  test("trace stats agree with the trace rows they summarize") {
    val stats = queries.HnswQs3.hnswTraceStats.fn(spark, sf).head()
    val rows = trace.collect()
    assert(stats.getLong(stats.fieldIndex("n_queries")) === rows.length)
    val found = rows.count(_.getAs[Int]("l0_steps") >= 0)
    assert(stats.getLong(stats.fieldIndex("n_found")) === found)
    val avgUpper = rows.map(r => r.getAs[Int]("l2_hops") + r.getAs[Int]("l1_hops"))
      .sum.toDouble / rows.length
    assert(stats.getDouble(stats.fieldIndex("avg_upper_hops")) === avgUpper)
    assert(stats.getInt(stats.fieldIndex("max_l0_steps")) ===
      rows.map(_.getAs[Int]("l0_steps")).max)
  }
}
