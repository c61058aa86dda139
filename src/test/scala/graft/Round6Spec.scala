package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 invariants: the approximate layered build must be a faithful
  * stand-in for the exact one (rows-only in the catalog, so the recall
  * floor lives here), and the rich projection graph must actually be
  * the high-recall index the sweep claims. */
class Round6Spec extends AnyFunSuite with SharedSpark {

  test("hnsw_layers_approx recovers >= 0.8 of the exact layered graph per level") {
    val exact = queries.HnswQs.hnswLayers.fn(spark, sf)
      .select(col("level"), col("src"), col("dst")).localCheckpoint()
    val approx = queries.HnswQs2.hnswLayersApprox.fn(spark, sf)
      .select(col("level"), col("src"), col("dst")).localCheckpoint()
    // same node set, same out-degree contract (<= K per node)
    assert(approx.count() === exact.count(),
      "approx build emits a different edge count than the exact build")
    val perLevel = exact.groupBy(col("level")).agg(count(lit(1)).as("n_exact"))
      .join(exact.join(approx, Seq("level", "src", "dst"))
        .groupBy(col("level")).agg(count(lit(1)).as("n_hit")), Seq("level"))
      .select(col("level"), (col("n_hit") / col("n_exact")).as("recall"))
      .collect()
    assert(perLevel.length === 3) // MaxLevel + 1
    perLevel.foreach { r =>
      val recall = r.getDouble(1)
      info(f"level ${r.getInt(0)} edge recall $recall%.3f vs the exact build")
      assert(recall >= 0.8,
        s"level ${r.getInt(0)} edge recall $recall < 0.8 vs the exact build")
    }
  }

  test("rich projection graph: bounded degree, symmetric weights, contains the gt targets") {
    val rich = queries.HnswQs.richGraph(spark, sf).localCheckpoint()
    // stored degree respects the cap, erk is a dense 1..deg ranking
    val deg = rich.groupBy(col("src"))
      .agg(count(lit(1)).as("d"), max(col("erk")).as("maxerk"))
    assert(deg.filter(col("d") > 48).count() === 0) // RichDeg
    assert(deg.filter(col("d") =!= col("maxerk")).count() === 0)
    // every exact top-10 L2 target is a node of the graph (k=48 lists
    // cover rank <= 10 by construction — the property that lets wide
    // search reach recall 1.0)
    val gt = queries.VectorQs.gtTopk(spark, sf, "l2")
      .select(col("bid")).distinct()
    val nodes = rich.select(col("src")).distinct()
    assert(gt.join(nodes, col("bid") === col("src"), "left_anti").count() === 0,
      "an exact top-10 target is missing from the rich graph")
  }
}
