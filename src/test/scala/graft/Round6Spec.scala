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

  test("graph_routed_search: recall >= 0.9 vs exact gt, dense ranks, sorted dists") {
    val res = queries.HnswQs3.graphRoutedSearch.fn(spark, sf).localCheckpoint()
    // top-10 contract: ranks dense 1..10 per query, dist ascending with rank
    val perQ = res.groupBy(col("qid"))
      .agg(count(lit(1)).as("n"), max(col("rnk")).as("maxr"), min(col("rnk")).as("minr"))
    assert(perQ.filter(col("n") =!= 10 || col("maxr") =!= 10 || col("minr") =!= 1).count() === 0,
      "ranks are not a dense 1..10 per query")
    val inversions = res.as("a").join(res.as("b"),
      col("a.qid") === col("b.qid") && (col("a.rnk") === col("b.rnk") - 1))
      .filter(col("a.dist") > col("b.dist")).count()
    assert(inversions === 0, "dist is not ascending with rank")
    // the routed entries + wide beam must hold the high-recall band the
    // 1M run measured (docs/scale_run.md: 0.985 at 1M; 1.0 at sf0.01)
    val gt = queries.VectorQs.gtTopk(spark, sf, "l2")
      .select(col("qid"), col("bid"))
    val hits = res.select(col("qid"), col("bid")).join(gt, Seq("qid", "bid")).count()
    val recall = hits.toDouble / gt.count()
    info(f"routed-search recall@10 $recall%.3f")
    assert(recall >= 0.9, s"routed-search recall $recall < 0.9")
  }
}
