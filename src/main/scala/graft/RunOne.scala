package graft

/** Run named catalog queries against an arbitrary data dir and print
  * per-query wall time + row count — the scale-probe harness ScaleRun
  * is too coarse for. ScaleRun times the curated graph/quantizer
  * experiment set; RunOne points ANY `SparkEntry.queries` entry at a
  * corpus (e.g. the 10M ScaleRun dir, which is a standard `embeddings`
  * table) so catalog operators can be measured at reference-bench
  * scale exactly as a user would run them. Artifact builds triggered
  * by ensure* count toward the first run's time — rerun for the warm
  * number, like the reference's saved-index QPS protocol
  * (README_RoarGraph.md:19-56).
  *
  * Usage: runMain graft.RunOne <dataDir> <query> [query...]
  * Env: SPARK_GRAFT_CPUS (default 8), SPARK_GRAFT_RUNONE_REPS (1),
  * SPARK_GRAFT_RUNONE_GT (optional persisted groundtruth table name,
  * e.g. gt_l2_k10 — if set, a (qid, bid) hit rate vs that artifact is
  * printed for queries exposing those columns).
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunOne <dataDir> <query> [query...]")
    val dir = args(0)
    val names = args.drop(1).toSeq
    val reps = sys.env.getOrElse("SPARK_GRAFT_RUNONE_REPS", "1").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Tables.session("graft-runone", cpus)
    for (n <- names) {
      val fn = SparkEntry.queries.getOrElse(n,
        throw new IllegalArgumentException(s"unknown query $n"))
      for (r <- 1 to reps) {
        // localCheckpoint materializes the full result inside the
        // timing (ScaleRun.bench's shape); the count afterwards reads
        // the checkpointed blocks, not the plan
        val t0 = System.nanoTime()
        val df = fn(spark, dir).localCheckpoint()
        val sec = (System.nanoTime() - t0) / 1e9
        val rows = df.count()
        val recall = sys.env.get("SPARK_GRAFT_RUNONE_GT")
          .filter(_ => Seq("qid", "bid").forall(df.columns.contains)) match {
          case Some(gtName) =>
            // resolves the persisted artifact; the build thunk only
            // fires on a miss, so a missing gt fails loudly
            val gt = graft.operators.ProjIndex.ensureTable(spark, dir, gtName)(
              sys.error(s"gt artifact $gtName missing under $dir"))
              .select(org.apache.spark.sql.functions.col("qid"),
                org.apache.spark.sql.functions.col("bid"))
            val hits = df.select("qid", "bid").join(gt, Seq("qid", "bid")).count()
            f" recall=${hits.toDouble / gt.count()}%.3f"
          case None => ""
        }
        println(f"RUNONE $n%s rep=$r%d sec=$sec%.2f rows=$rows%d$recall%s")
        System.out.flush()
        df.unpersist(blocking = true)
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
