package graft

import org.apache.spark.sql.functions._

/** Scale regression fixture (r9 verdict item 8): replay the
  * deterministic quantities of a ScaleRun corpus through the
  * UNMODIFIED catalog entries and compare them EXACTLY against a
  * recorded expectations file. The sf0.1 bench can't see frontier
  * regressions (every data-sized rule resolves to the small-N branch
  * there); this is the guard that catches them at the reference's own
  * scale.
  *
  * Every compared quantity is an integer, so "equal" is bitwise:
  *   - routed_hits / routed_visited — the routed search's gt@10 hit
  *     count (recall numerator) and total visited nodes
  *   - ivf_hits — ivf_search's hit count at the data-sized nprobe
  *   - pq_hits — pq_search's hit count at the N-scaled rerank
  *   - dedup_pairs — dedup_embedding's verified near-dup pair count
  *
  * Modes:
  *   runMain graft.ScaleReplay <dir> <expectations.tsv>   # compare
  *     (file missing → record it instead and exit 0)
  * The build thunks behind the catalog entries ensure any missing
  * artifacts, so a fresh container replays end-to-end: corpus gen via
  * ScaleRun (deterministic, seed-pinned), then this main. Exit 1 on
  * any mismatch.
  */
object ScaleReplay {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleReplay <dir> <expectations.tsv>")
    val dir = args(0)
    val expPath = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Tables.session("graft-scale-replay", cpus)

    val gt = graft.operators.ProjIndex.ensureTable(spark, dir, "gt_l2_k10")(
      sys.error(s"gt artifact gt_l2_k10 missing under $dir — run ScaleRun first"))
      .select(col("qid"), col("bid")).localCheckpoint()

    def hits(q: String): Long =
      Catalog.queriesMap(q)(spark, dir)
        .select(col("qid"), col("bid")).join(gt, Seq("qid", "bid")).count()

    val measured = scala.collection.mutable.LinkedHashMap[String, Long]()
    val (routed, visited, seedEvals) =
      queries.HnswQs3.routedSearchCounted(spark, dir, "l2")
    measured += "routed_hits" ->
      routed.select(col("qid"), col("bid")).join(gt, Seq("qid", "bid")).count()
    measured += "routed_visited" -> visited
    // round 13: seed selection is two-level (SeedSelect) — its total
    // distance evals join the fixture so a seeding regression (depth,
    // coarse width, tl rule) is caught at scale, not just at test SF
    measured += "routed_seed_evals" -> seedEvals
    measured += "ivf_hits" -> hits("ivf_search")
    measured += "pq_hits" -> hits("pq_search")
    measured += "dedup_pairs" -> Catalog.queriesMap("dedup_embedding")(spark, dir).count()
    measured.foreach { case (k, v) => println(s"REPLAY_MEASURED $k $v") }
    System.out.flush()

    val f = new java.io.File(expPath)
    if (!f.exists()) {
      val w = new java.io.PrintWriter(f, "UTF-8")
      measured.foreach { case (k, v) => w.println(s"$k\t$v") }
      w.close()
      println(s"REPLAY_RECORDED $expPath")
      spark.stop()
      return
    }
    val expected = scala.io.Source.fromFile(f, "UTF-8").getLines()
      .filter(_.nonEmpty).map { ln =>
        val p = ln.split("\t"); (p(0), p(1).toLong)
      }.toMap
    var bad = 0
    expected.foreach { case (k, e) =>
      measured.get(k) match {
        case Some(m) if m == e => println(s"REPLAY_OK $k $m")
        case Some(m) => println(s"REPLAY_FAIL $k expected=$e got=$m"); bad += 1
        case None => println(s"REPLAY_FAIL $k expected=$e got=<missing>"); bad += 1
      }
    }
    // key sets must MATCH: a metric added after the fixture was
    // recorded must fail loudly, not pass silently (r10 ADVICE)
    measured.keys.filterNot(expected.contains).foreach { k =>
      println(s"REPLAY_FAIL $k expected=<missing from fixture ${f.getName}> got=${measured(k)}")
      bad += 1
    }
    System.out.flush()
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
