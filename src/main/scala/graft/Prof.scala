package graft

import org.apache.spark.sql.functions._

/** Throwaway stage profiler for the bench hotspots (dev tool). */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Tables.session("graft-prof", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    // warm artifacts like Bench does
    graft.operators.ProjIndex.ensureGraph(s, dir) {
      queries.VectorQs2.roarProjectionGraph.fn(s, dir)
    }
    queries.HnswQs.sweepIvf(s, dir)
    s.catalog.clearCache()

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // JVM warm
    noop(queries.VectorQs.qs.find(_.name == "gt_topk_cosine").get.fn(s, dir))
    s.catalog.clearCache()

    for (q <- Seq("contamination_check", "knn_descent")) {
      time(s"$q warm")(noop(Catalog.queriesMap(q)(s, dir)))
      s.catalog.clearCache()
    }
    // contamination stages
    {
      import graft.functions.TextFns._
      val d0 = Tables.t(s, dir, "documents")
        .select(col("doc_id"), wordShingles(words(lower(col("text"))), 5).as("sh"))
      val docs = time("cont: shingle build + cp")(d0.localCheckpoint())
      val bench = docs.filter(col("doc_id") % 100 === 0)
        .select(explode(col("sh")).as("g")).distinct()
        .select(md5(col("g")).as("gh"))
      time("cont: bench noop")(noop(bench))
      val train = docs.filter(col("doc_id") % 100 =!= 0)
      val hits = train
        .select(col("doc_id"), explode(col("sh")).as("g"))
        .select(col("doc_id"), md5(col("g")).as("gh"))
        .join(broadcast(bench), Seq("gh"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      time("cont: hits noop")(noop(hits))
      time("cont: full rest")(noop(
        train.select(col("doc_id"))
          .join(hits, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_shared"), lit(0L)).as("n_shared"),
            (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
          .orderBy(col("doc_id"))))
      s.catalog.clearCache()
    }

    // dedup_embedding stages (mirrors the CURRENT query structure)
    {
      import graft.operators.Lsh
      import graft.functions.Vec
      import org.apache.spark.sql.Column
      val e = Tables.t(s, dir, "embeddings")
      val bc = org.apache.spark.sql.graftbridge.Bridge
      val sigs = e.select(col("vec_id"),
        bc.column(graft.functions.LshBandKeys(bc.expr(col("embedding")),
          dim = Tables.embDim(s, dir))).as("ks"))
      time("emb: sigs noop")(noop(sigs))
      val bands = sigs
        .select(col("vec_id"), col("ks"),
          posexplode(col("ks")).as(Seq("band_idx", "bkey")))
        .withColumn("brn", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("band_idx"), col("bkey")).orderBy(col("vec_id"))))
        .filter(col("brn") <= 20000)
        .drop("brn")
      time("emb: bands noop")(noop(bands))
      val cand = bands.as("x")
        .join(bands.as("y"),
          col("x.band_idx") === col("y.band_idx") &&
          col("x.bkey") === col("y.bkey") &&
          col("x.vec_id") < col("y.vec_id"))
        .filter(!((0 until Lsh.PairBands - 1).map { b =>
          col("x.band_idx") > b &&
            element_at(col("x.ks"), b + 1) === element_at(col("y.ks"), b + 1)
        }.reduce((p, q) => p || q)))
        .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      time("emb: cand noop")(noop(cand))
      val verify = cand
        .join(e.select(col("vec_id").as("a"), col("embedding").as("va")), Seq("a"))
        .join(e.select(col("vec_id").as("b"), col("embedding").as("vb")), Seq("b"))
        .select(col("a"), col("b"), Vec.cosineFast(col("va"), col("vb")).as("cos"))
        .filter(col("cos") >= 0.45)
      time("emb: verify noop")(noop(verify))
      time("emb: verify + orderBy noop")(noop(verify.orderBy(col("a"), col("b"))))
      s.catalog.clearCache()
    }

    // ngram_jaccard stages
    {
      import graft.functions.TextFns._
      val g0 = Tables.t(s, dir, "documents")
        .select(col("doc_id"), charGrams(lower(col("text")), 3).as("g"))
      val g = time("ngram: gram build + cp")(g0.localCheckpoint())
      time("ngram: join + jaccard") {
        noop(g.select(col("doc_id").as("a"), col("g").as("ga"))
          .join(g.select(col("doc_id").as("b"), col("g").as("gb")),
            col("a") + 1 === col("b"))
          .select(col("a"), col("b"), jaccard(col("ga"), col("gb")).as("jaccard")))
      }
      s.catalog.clearCache()
    }

    // stage-by-stage mirror of annQualitySweep
    val emb = time("read embeddings")(Tables.t(s, dir, "embeddings"))
    val (cents, base) = time("load sweepIvf")(queries.HnswQs.sweepIvf(s, dir))
    val q2 = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val gt = time("gt_topk l2 + checkpoint") {
      queries.VectorQs.gtTopk(s, dir, "l2").select(col("qid"), col("bid")).localCheckpoint()
    }
    time("gt.count")(gt.count())
    time("q2.count")(q2.count())
    val probed = time("probe ranking") {
      graft.operators.TopK.perGroup(
        q2.crossJoin(broadcast(cents))
          .select(col("qid").as("g"), col("cid"),
            graft.functions.Vec.l2sqFast(col("qv"), col("cv")).as("d2")),
        "g", "cid", "d2", 4, asc = true)
        .select(col("g").as("qid"), col("cid"), col("rnk").as("cell_rnk"))
    }
    val cand = time("candidate scoring + checkpoint") {
      base.join(probed.join(q2, Seq("qid")), Seq("cid"))
        .select(col("qid"), col("vec_id").as("bid"), col("cell_rnk"),
          graft.functions.Vec.l2Fast(col("qv"), col("embedding")).as("dist"))
        .localCheckpoint()
    }
    for (np <- Seq(1, 2, 4)) {
      time(s"ivf point np=$np") {
        val probedCand = cand.filter(col("cell_rnk") <= np)
        val top = graft.operators.TopK.perGroup(probedCand, "qid", "bid", "dist", 10, asc = true)
          .select(col("qid"), col("bid")).localCheckpoint()
        top.join(gt, Seq("qid", "bid")).count()
        probedCand.count()
      }
    }
    val edges = time("load graph + checkpoint") {
      graft.operators.ProjIndex.ensureGraph(s, dir) {
        queries.VectorQs2.roarProjectionGraph.fn(s, dir)
      }.select(col("src"), col("dst")).localCheckpoint()
    }
    val entry = time("entry degree")(
      edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
        .orderBy(col("d").desc, col("src")).head().getLong(0))
    val baseBv = emb.filter(col("vec_id") % 50 =!= 0)
      .select(col("vec_id").as("bid"), col("embedding").as("bv"))
    val seeds = q2.select(col("qid")).withColumn("bid", lit(entry))
    val staged = time("staged beam 3 rounds") {
      graft.operators.BeamSearch.runStaged(edges, q2, baseBv, seeds, ef = 10, maxRounds = 3)
    }
    staged.zipWithIndex.foreach { case ((res, _, _), i) =>
      time(s"beam point r=${i + 1} join+count") {
        val top = res.select(col("qid"), col("bid")).localCheckpoint()
        top.join(gt, Seq("qid", "bid")).count()
      }
    }
    s.stop()
  }
}
