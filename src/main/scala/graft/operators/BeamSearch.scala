package graft.operators

import graft.functions.Vec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Batch beam search over an edge-table graph — the Spark re-expression
  * of the reference's queue-driven graph search
  * (roargraph_python.py:325-420, hnsw _search_layer): instead of
  * pointer-chasing per query, ALL queries advance one hop per round via
  * one edges join, keeping a bounded frontier (beam) per query. Rounds
  * ≈ graph hops; each round is one shuffle on node id.
  */
object BeamSearch {

  /** @param edges   (src, dst) directed edge table
    * @param queries (qid, qv) query vectors
    * @param base    (bid, bv) node vectors
    * @param entry   global entry node id (roar_entry_point)
    * @param ef      beam width per query
    * @param rounds  expansion rounds
    * @param kernelInfo Some((baseN, dim)) lets the search run as ONE
    *                fused kernel job when every bound holds
    *                (BeamKernel — bit-identical, BeamKernelSpec);
    *                None = the DataFrame rounds, unchanged
    * @return (qid, rnk, bid, dist) best-ef per query after expansion
    */
  def run(
      edges: DataFrame,
      queries: DataFrame,
      base: DataFrame,
      entry: Long,
      ef: Int,
      rounds: Int,
      kernelInfo: Option[(Long, Int)] = None): DataFrame =
    runFromSeeds(edges, queries, base,
      queries.select(col("qid")).withColumn("bid", lit(entry)), ef, rounds,
      kernelInfo = kernelInfo)

  private def kernelDf(s: org.apache.spark.sql.SparkSession,
      k: BeamKernel.KernelOut): DataFrame = {
    import s.implicits._
    s.createDataset(k.rows.toIndexedSeq).toDF("qid", "rnk", "bid", "dist")
  }

  /** Multi-entry variant (Idea-1023.md MEAR: several anchor seeds per
    * query instead of a single global entry point). `seeds` = (qid,
    * bid) initial frontier. */
  def runFromSeeds(
      edges: DataFrame,
      queries: DataFrame,
      base: DataFrame,
      seeds: DataFrame,
      ef: Int,
      rounds: Int,
      metric: String = "l2",
      kernelInfo: Option[(Long, Int)] = None): DataFrame =
    kernelInfo.flatMap { case (n, dim) =>
      BeamKernel.tryRun(edges, queries, base, seeds, _ => ef, rounds, metric, n, dim)
    } match {
      case Some(k) => kernelDf(base.sparkSession, k)
      case None =>
        runImpl(edges, queries, base, seeds, ef, rounds, countVisited = false,
          metric = metric)._1
    }

  /** Same search, additionally returning the TOTAL number of scored
    * candidate rows (seeds + per-round distinct expansions) — the
    * reference benchmark's visited-nodes column
    * (benchmark_hnsw_vs_roargraph.py avg_visited). Counting runs one
    * extra count() action per round, so the plain runFromSeeds skips
    * it. Deterministic: counts are over distinct candidate sets. */
  def runFromSeedsCounted(
      edges: DataFrame,
      queries: DataFrame,
      base: DataFrame,
      seeds: DataFrame,
      ef: Int,
      rounds: Int,
      metric: String = "l2",
      kernelInfo: Option[(Long, Int)] = None): (DataFrame, Long) = {
    kernelInfo.flatMap { case (n, dim) =>
      BeamKernel.tryRun(edges, queries, base, seeds, _ => ef, rounds, metric, n, dim)
    } match {
      case Some(k) =>
        // the DataFrame ledger verbatim: raw seed rows + Σ per-round
        // per-query distinct-expansion sizes
        val visited = k.seedRows.length.toLong +
          k.expandedPerQuery.iterator.map(_._2).sum
        (kernelDf(base.sparkSession, k), visited)
      case None =>
        val r = runImpl(edges, queries, base, seeds, ef, rounds, countVisited = true,
          metric = metric)
        (r._1, r._2)
    }
  }

  /** One search, a snapshot after EVERY round: element r-1 is (top-ef
    * result, cumulative visited, cumulative wall nanos) as of round r.
    * A rounds-parameter sweep costs one maxRounds search instead of
    * 1+2+…+maxRounds rounds — the beam after round r is identical
    * whether or not the search continues, and each round materializes
    * (localCheckpoint) inside this call, so the per-stage clock is
    * honest. */
  def runStaged(
      edges: DataFrame,
      queries: DataFrame,
      base: DataFrame,
      seeds: DataFrame,
      ef: Int,
      maxRounds: Int): Seq[(DataFrame, Long, Long)] =
    runImpl(edges, queries, base, seeds, ef, maxRounds,
      countVisited = true, keepStages = true)._3

  /** Batched sweep search: several same-shape sweep points advance
    * through ONE search. Query and seed ids arrive pre-tagged
    * (qid' = qid·tagBase + tag, 0 ≤ tag < tagBase), `efOf(qidCol)`
    * gives each row's beam width — the pool keeps maxEf candidates and
    * rank-filters, which is identical to running each tag at its own
    * ef because top-e is the e-prefix of top-maxEf under the strict
    * (dist, id) total order — and visited counts return PER TAG
    * (seeds + per-round distinct expansions, the same ledger
    * runFromSeedsCounted totals). One edges join per round regardless
    * of how many tags ride along: a sweep that scheduled P·rounds
    * jobs for P same-configuration points now schedules rounds. All
    * result columns stay bit-identical per tag to the unbatched runs
    * (BeamBatchSpec). */
  def runFromSeedsCountedByTag(
      edges: DataFrame,
      queries: DataFrame,
      base: DataFrame,
      seeds: DataFrame,
      maxEf: Int,
      efOf: Column => Column,
      tagBase: Int,
      rounds: Int,
      metric: String = "l2",
      efOfId: Option[Long => Int] = None,
      kernelInfo: Option[(Long, Int)] = None): (DataFrame, Map[Int, Long]) = {
    (for {
      (n, dim) <- kernelInfo
      efId <- efOfId
      k <- BeamKernel.tryRun(edges, queries, base, seeds, efId, rounds, metric, n, dim)
    } yield {
      // per-tag ledger verbatim: raw seed rows + per-query expansion
      // sums, grouped by the tag decode (qids are non-negative, so
      // % == pmod)
      val visited = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
      k.seedRows.foreach { case (q, _) => visited((q % tagBase).toInt) += 1L }
      k.expandedPerQuery.foreach { case (q, e) => visited((q % tagBase).toInt) += e }
      (kernelDf(base.sparkSession, k), visited.toMap)
    }) match {
      case Some(r) => return r
      case None => ()
    }
    val scoreOf: DataFrame => DataFrame = cand =>
      cand.join(base, Seq("bid"))
        .join(queries, Seq("qid"))
        .select(col("qid"), col("bid"),
          Vec.metricDist(metric)(col("qv"), col("bv")).as("dist"))
    val visited = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    def addCounts(df: DataFrame): Unit =
      df.groupBy(pmod(col("qid"), lit(tagBase)).as("tag")).count().collect()
        .foreach(r => visited(r.getAs[Long]("tag").toInt) += r.getAs[Long]("count"))
    val seedSet = seeds.select(col("qid"), col("bid"))
    addCounts(seedSet)
    var beam = scoreOf(seedSet)
    for (_ <- 1 to rounds) {
      val frontier = beam.select(col("qid"), col("bid").as("src"))
      // materialize the expansion once (round 15): the per-tag ledger
      // count and the scoring pass below otherwise EACH recompute the
      // frontier⋈edges join — the counted search paid every expand
      // join twice. Checkpointed rows are identical; count and scores
      // read the same materialized set.
      val expanded = frontier.join(edges, Seq("src"))
        .select(col("qid"), col("dst").as("bid"))
        .distinct().localCheckpoint()
      addCounts(expanded)
      beam = TopK.perGroup(beam.union(scoreOf(expanded)), "qid", "bid", "dist", maxEf, asc = true)
        .filter(col("rnk") <= efOf(col("qid")))
        .select(col("qid"), col("bid"), col("dist")).localCheckpoint()
    }
    (TopK.perGroup(beam, "qid", "bid", "dist", maxEf, asc = true)
      .filter(col("rnk") <= efOf(col("qid"))), visited.toMap)
  }

  /** Search-path trace (reference search_steps_to_target /
    * _search_layer_trace_until_target_with_phases,
    * hnsw_cosine_status_high.py:524,737): one search, returning
    * (a) the beam snapshot after every round — element r is the top-ef
    * beam as of round r, element 0 being the scored seeds — and
    * (b) the per-query visited ledger (qid, bid, fr) where fr is the
    * FIRST round each candidate was scored (0 = seed). Both are
    * deterministic (no clocks, no counts), so trace diagnostics built
    * on them are oracle-able, unlike the timed runStaged. */
  def runTrace(
      edges: DataFrame,
      queries: DataFrame,
      base: DataFrame,
      seeds: DataFrame,
      ef: Int,
      maxRounds: Int,
      kernelInfo: Option[(Long, Int)] = None): (Seq[DataFrame], DataFrame) = {
    kernelInfo.flatMap { case (n, dim) =>
      BeamKernel.tryTrace(edges, queries, base, seeds, ef, maxRounds, n, dim)
    } match {
      case Some(t) =>
        val s = base.sparkSession
        import s.implicits._
        val beams = t.beams.map(a =>
          s.createDataset(a.toIndexedSeq).toDF("qid", "bid", "dist"))
        val candFirst = s.createDataset(t.ledger.toIndexedSeq).toDF("qid", "bid", "fr")
        return (beams, candFirst)
      case None => ()
    }
    val scoreOf: DataFrame => DataFrame = cand =>
      cand.join(base, Seq("bid"))
        .join(queries, Seq("qid"))
        .select(col("qid"), col("bid"), Vec.l2Fast(col("qv"), col("bv")).as("dist"))
    val seedSet = seeds.select(col("qid"), col("bid"))
    var beam = scoreOf(seedSet).localCheckpoint()
    val beams = Seq.newBuilder[DataFrame]
    beams += beam
    var cand = seedSet.withColumn("fr", lit(0))
    for (r <- 1 to maxRounds) {
      val frontier = beam.select(col("qid"), col("bid").as("src"))
      // materialized once (round 15): referenced by BOTH the ledger
      // union and the scoring pass — the trace otherwise re-ran every
      // expand join when candFirst materialized.
      val expanded = frontier.join(edges, Seq("src"))
        .select(col("qid"), col("dst").as("bid"))
        .distinct().localCheckpoint()
      cand = cand.union(expanded.withColumn("fr", lit(r)))
      beam = TopK.perGroup(beam.union(scoreOf(expanded)), "qid", "bid", "dist", ef, asc = true)
        .select(col("qid"), col("bid"), col("dist")).localCheckpoint()
      beams += beam
    }
    // a node revisited in a later round keeps its first-scored round
    val candFirst = cand.groupBy(col("qid"), col("bid"))
      .agg(min(col("fr")).as("fr")).localCheckpoint()
    (beams.result(), candFirst)
  }

  private def runImpl(
      edges: DataFrame,
      queries: DataFrame,
      base: DataFrame,
      seeds: DataFrame,
      ef: Int,
      rounds: Int,
      countVisited: Boolean,
      keepStages: Boolean = false,
      metric: String = "l2"): (DataFrame, Long, Seq[(DataFrame, Long, Long)]) = {
    // dist = Vec.metricDist: l2 distance, or negated cosine/ip — the
    // beam always minimizes, so one ordering rule serves all metrics
    val scoreOf: DataFrame => DataFrame = cand =>
      cand.join(base, Seq("bid"))
        .join(queries, Seq("qid"))
        .select(col("qid"), col("bid"),
          Vec.metricDist(metric)(col("qv"), col("bv")).as("dist"))

    var visited = 0L
    val t0 = System.nanoTime()
    val stages = Seq.newBuilder[(DataFrame, Long, Long)]
    val seedSet = seeds.select(col("qid"), col("bid"))
    if (countVisited) visited += seedSet.count()
    var beam = scoreOf(seedSet)
    for (_ <- 1 to rounds) {
      val frontier = beam.select(col("qid"), col("bid").as("src"))
      val expanded0 = frontier.join(edges, Seq("src"))
        .select(col("qid"), col("dst").as("bid"))
        .distinct()
      // counted searches materialize the expansion once (round 15):
      // the ledger count and the scoring pass otherwise each recompute
      // the expand join. Uncounted searches keep the lazy form (one
      // consumer — no double compute to cut, no extra action).
      val expanded = if (countVisited) expanded0.localCheckpoint() else expanded0
      if (countVisited) visited += expanded.count()
      val scoredNew = scoreOf(expanded)
      // no visited-set anti-join: revisited nodes score identically
      // (deterministic distance) and TopKAgg collapses exact-duplicate
      // (score, id) candidates, so re-expansion is only wasted work on
      // the small frontier, not a correctness concern.
      // localCheckpoint: cut the per-round lineage so round r doesn't
      // replan/recompute rounds < r (graph traversals deepen plans fast)
      beam = TopK.perGroup(beam.union(scoredNew), "qid", "bid", "dist", ef, asc = true)
        .select(col("qid"), col("bid"), col("dist")).localCheckpoint()
      if (keepStages)
        stages += ((TopK.perGroup(beam, "qid", "bid", "dist", ef, asc = true), visited,
          System.nanoTime() - t0))
    }
    (TopK.perGroup(beam, "qid", "bid", "dist", ef, asc = true), visited, stages.result())
  }
}
