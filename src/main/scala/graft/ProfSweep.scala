package graft

import org.apache.spark.sql.functions._

/** Dev profiler for ann_quality_sweep: runs the sweep once (warm
  * artifacts), prints the result rows (their wall_ms column times the
  * per-point search actions) and the end-to-end wall — the difference
  * is shared setup (gt, candidate scoring, graph loads, seed ranking,
  * recall counts), which is where untimed cost hides. */
object ProfSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Tables.session("graft-profsweep", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    // warm like Bench
    graft.operators.ProjIndex.ensureGraph(s, dir) {
      queries.VectorQs2.roarProjectionGraph.fn(s, dir)
    }
    queries.HnswQs.sweepIvf(s, dir)
    queries.HnswQs.anchorIvf(s, dir)
    queries.HnswQs.richGraph(s, dir).write.format("noop").mode("overwrite").save()
    queries.HnswQs.bridgePairs(s, dir).write.format("noop").mode("overwrite").save()
    queries.HnswQs3.routedAnchors(s, dir, "ip").write.format("noop").mode("overwrite").save()
    s.catalog.clearCache()
    // JVM warm
    queries.VectorQs.qs.find(_.name == "gt_topk_cosine").get
      .fn(s, dir).write.format("noop").mode("overwrite").save()
    s.catalog.clearCache()
    for (rep <- 1 to sys.env.getOrElse("SPARK_GRAFT_PROF_REPS", "2").toInt) {
      val t0 = System.nanoTime()
      val rows = queries.HnswQs.annQualitySweep.fn(s, dir).collect()
      val total = (System.nanoTime() - t0) / 1e9
      val timed = rows.map(_.getAs[Double]("wall_ms")).sum / 1e3
      println(f"[profsweep] rep=$rep total=$total%.2f s, timed-in-rows=$timed%.2f s, setup=${total - timed}%.2f s")
      rows.foreach { r =>
        println(f"[profsweep]   ${r.getAs[String]("method")}%-10s p=${r.getAs[Int]("param")}%3d wall=${r.getAs[Double]("wall_ms") / 1e3}%6.2f s recall=${r.getAs[Double]("recall")}%.3f")
      }
      s.catalog.clearCache()
    }
    s.stop()
  }
}
