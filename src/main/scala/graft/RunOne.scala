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
  * Env: SPARK_GRAFT_CPUS (default 8), SPARK_GRAFT_RUNONE_REPS (1).
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
        println(f"RUNONE $n%s rep=$r%d sec=$sec%.2f rows=$rows%d")
        System.out.flush()
        df.unpersist(blocking = true)
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
