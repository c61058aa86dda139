package graft

import graft.operators.{BeamSearch, BruteForce, Ivf, TopK}
import graft.functions.Vec
import org.apache.spark.sql.functions._

/** Held-out validation of the routed-search frontier (round 10).
  *
  * The ScaleRun protocol trains the rich projection graph on the SAME
  * query set it then evaluates (the reference trains on a learn split
  * and benchmarks held-out queries, README_RoarGraph.md:9-23). With
  * k=96 training lists the overlap could flatter recall — an eval
  * query's own top-k list is a densely connected member clique by
  * construction. This probe removes the overlap: build the graph from
  * the EVEN half of the query set only, search the ODD half (never
  * seen at build time) with the identical routed configuration, and
  * report recall@10 vs the persisted exact groundtruth restricted to
  * each half. The in-sample (even) half runs too, so the printed pair
  * IS the generalization gap.
  *
  * Usage: runMain graft.HoldoutProbe <dir> [ef] [rounds] [deg] [entries]
  * Env: SPARK_GRAFT_CPUS (default 8).
  */
object HoldoutProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: HoldoutProbe <dir> [ef] [rounds] [deg] [entries]")
    val dir = args(0)
    val ef = if (args.length > 1) args(1).toInt else 32
    val rounds = if (args.length > 2) args(2).toInt else 9
    val deg = if (args.length > 3) args(3).toInt else 32
    val ents = if (args.length > 4) args(4).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Tables.session("graft-holdout", cpus)

    val emb = Tables.t(spark, dir, "embeddings")
    val base = emb.filter(col("vec_id") % 50 =!= 0)
      .select(col("vec_id").as("bid"), col("embedding").as("bv"))
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val qTrain = q.filter((col("qid") / 50) % 2 === 0)
    val qEval = q.filter((col("qid") / 50) % 2 === 1)
    val n = Tables.baseCount(spark, dir)
    val kk = queries.HnswQs.richKFor(n)

    // graph from the train half ONLY — persisted under its own tag so
    // repeat probes time search, not the build
    val t0 = System.nanoTime()
    val rich = graft.operators.ProjIndex.ensureTable(spark, dir,
      s"rich_proj_holdout_even_k${kk}_m16_d48") {
      queries.HnswQs.richGraphFrom(base, qTrain, "l2", kk)
    }
    println(f"HOLDOUT graph_ensure_sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    // union the cell-kNN substrate exactly like the catalog's routed
    // search (round 10): SPARK_GRAFT_HOLDOUT_RICH_ONLY=1 reproduces
    // the projection-only probe that exposed the overfit
    val richE = rich.filter(col("erk") <= deg).select(col("src"), col("dst"))
    val edges = (if (sys.env.get("SPARK_GRAFT_HOLDOUT_RICH_ONLY").contains("1")) richE
      else {
        val ck = queries.HnswQs3.cellKnn(spark, dir).select(col("src"), col("dst"))
        richE.union(ck).union(ck.select(col("dst").as("src"), col("src").as("dst")))
      }).localCheckpoint()
    val entry = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .orderBy(col("d").desc, col("src")).head().getLong(0)

    // routed entries: nearest base node per cell of the persisted
    // scale quantizer (must exist — built by ScaleRun/prebuild)
    val cells = Ivf.cellsFor(n)
    val (cents, _) = graft.operators.ProjIndex.ensureIvf(spark, dir, "scale", cells, 2)(
      sys.error(s"scale quantizer missing under $dir"))
    val anchorNodes = BruteForce.topk(
      base,
      cents.select(col("cid").as("qid"), col("cv").cast("array<float>").as("qv")),
      "l2", 1).select(col("bid")).distinct()
    val anchorBase = anchorNodes.join(base, Seq("bid")).localCheckpoint()

    val gtAll = graft.operators.ProjIndex.ensureTable(spark, dir, "gt_l2_k10")(
      sys.error(s"gt artifact missing under $dir"))
      .select(col("qid"), col("bid"))

    def run(tag: String, qs: org.apache.spark.sql.DataFrame): Unit = {
      val aRk = TopK.perGroup(
        qs.crossJoin(broadcast(anchorBase))
          .select(col("qid"), col("bid"), Vec.l2Fast(col("qv"), col("bv")).as("d")),
        "qid", "bid", "d", ents, asc = true)
        .select(col("qid"), col("bid")).localCheckpoint()
      val seeds = qs.select(col("qid")).withColumn("bid", lit(entry)).union(aRk)
      val t1 = System.nanoTime()
      val (res, vis) = BeamSearch.runFromSeedsCounted(edges, qs, base, seeds, ef, rounds)
      val top = TopK.perGroup(res, "qid", "bid", "dist", 10, asc = true)
        .select(col("qid"), col("bid")).localCheckpoint()
      val sec = (System.nanoTime() - t1) / 1e9
      val gt = gtAll.join(qs.select(col("qid")), Seq("qid"), "left_semi")
        .localCheckpoint()
      val nGt = gt.count().toDouble
      val nQ = qs.count().toDouble
      val recall = top.join(gt, Seq("qid", "bid")).count() / nGt
      println(f"HOLDOUT $tag%s ef=$ef%d rounds=$rounds%d deg=$deg%d ents=$ents%d " +
        f"nq=${nQ.toLong}%d recall=$recall%.4f visited_per_q=${vis / nQ}%.1f sec=$sec%.1f")
      System.out.flush()
    }

    run("heldout_odd", qEval)
    run("insample_even", qTrain)
    spark.stop()
  }
}
