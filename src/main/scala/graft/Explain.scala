package graft

/** Dev tool: dump formatted plans for representative queries so the
  * pushdown/broadcast/codegen audit (SURVEY §6) is reviewable. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("q1_agg", "q3_join", "gt_topk_cosine", "dedup_minhash", "simhash_ann")
    val spark = Tables.session("graft-explain", "4")
    for (n <- names) {
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
