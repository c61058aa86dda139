package graft

import graft.functions.Vec
import graft.operators.{BeamSearch, TopK}
import org.apache.spark.sql.functions._

/** Operating-point sweep for the CATALOG routed search (round 11 —
  * VERDICT r10 item 3): the data-sized budget (ef 32 × 9 rounds × 8
  * entries) was tuned on the projection-only graph; on the round-10
  * rich ∪ cellKnn UNION graph it visits 22,720/q at 10M for 0.9997
  * in-sample where 3,708 bought 0.997 — the denser edge set needs a
  * smaller beam for the same recall. This probe runs the exact
  * routedSearchCounted shape (same edges, same hub + anchor seeds,
  * same beam) with EXPLICIT (ef, rounds) so the knee can be measured
  * before the integer rules + oracle CASE ladder + replay fixture
  * move together.
  *
  * Usage: runMain graft.RoutedSweep <dir> [confs]
  *   confs = "ef:rounds[:ents],..." (default the down-sweep grid)
  * Env: SPARK_GRAFT_CPUS (default 8).
  */
object RoutedSweep {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RoutedSweep <dir> [confs]")
    val dir = args(0)
    val confs = (if (args.length > 1) args(1) else "8:5,16:5,16:7,16:9,24:7,32:9")
      .split(",").map(_.trim).filter(_.nonEmpty).map { s =>
        val p = s.split(":").map(_.trim.toInt)
        (p(0), p(1), if (p.length > 2) p(2) else 8)
      }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Tables.session("graft-routed-sweep", cpus)

    val edges = queries.HnswQs3.routedEdgesProbe(spark, dir, "l2").localCheckpoint()
    val emb = Tables.t(spark, dir, "embeddings")
    val base = emb.filter(col("vec_id") % 50 =!= 0)
      .select(col("vec_id").as("bid"), col("embedding").as("bv"))
    val qs = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val entry = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .orderBy(col("d").desc, col("src")).head().getLong(0)
    val anchors = queries.HnswQs3.routedAnchors(spark, dir, "l2")
    val anchorBase = anchors.join(base, Seq("bid")).localCheckpoint()
    val gt = graft.operators.ProjIndex.ensureTable(spark, dir, "gt_l2_k10")(
      sys.error(s"gt artifact missing under $dir"))
      .select(col("qid"), col("bid")).localCheckpoint()
    val nGt = gt.count().toDouble
    val nQ = qs.count().toDouble
    val n = Tables.baseCount(spark, dir)

    confs.foreach { case (ef, rounds, ents) =>
      val seeds = qs.select(col("qid")).withColumn("bid", lit(entry))
        .union(TopK.perGroup(
          qs.crossJoin(broadcast(anchorBase))
            .select(col("qid"), col("bid"), Vec.l2Fast(col("qv"), col("bv")).as("d")),
          "qid", "bid", "d", ents, asc = true)
          .select(col("qid"), col("bid")))
        .distinct()
      val t0 = System.nanoTime()
      val (res, visited) = BeamSearch.runFromSeedsCounted(
        edges, qs, base, seeds, ef, rounds, "l2")
      val top = res.filter(col("rnk") <= 10)
        .select(col("qid"), col("bid")).localCheckpoint()
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = top.join(gt, Seq("qid", "bid")).count() / nGt
      println(f"ROUTED_SWEEP ef=$ef%d rounds=$rounds%d ents=$ents%d " +
        f"recall=$recall%.4f visited_per_q=${visited / nQ}%.1f " +
        f"visited_pct=${100.0 * visited / nQ / n}%.4f sec=$sec%.1f")
      System.out.flush()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
