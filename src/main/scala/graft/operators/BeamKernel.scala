package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fully-fused multi-round beam search (round 15b) — the kernel form
  * of BeamSearch's round loop.
  *
  * The DataFrame beam advances every query one hop per round through
  * an expand join + two score joins + a TopK shuffle, each round a
  * localCheckpoint job of 3-4 stages. But queries never interact: the
  * per-round expand/distinct/score/pool are all per-qid. When the
  * whole search state is bounded — base bank under Rescore's 64 MiB
  * budget, edge/seed/query lists under the same budget — the entire
  * multi-round search runs as ONE map-only job over the queries
  * against broadcast CSR edges + the bank: per query, `rounds` ×
  * (expand beam through the CSR into a dedup set, score against the
  * bank, keep best-ef with the exact TopKAgg pool rule). No joins, no
  * shuffles, no per-round driver barrier.
  *
  * Bit-identity contract (BeamKernelSpec, + the full catalog row-diff):
  *  - scoring = the VecExprs folds verbatim (float widened per
  *    element, left fold; cosine/ip negated) — Rescore.l2Of and the
  *    twin folds below;
  *  - pool = TopKAgg's strict (dist, id) order, NaN worst, exact-
  *    duplicate collapse; the per-round DataFrame `distinct` is the
  *    kernel's per-query dedup set;
  *  - the INITIAL beam is the uncut scored seed set (the DataFrame
  *    form cuts to ef only after round 1's union);
  *  - seed rows whose qid/bid resolve nowhere are dropped from the
  *    beam but still counted by the visited ledger (scoreOf's inner
  *    joins dropped them AFTER addCounts/count saw them);
  *  - visited ledger = raw seed rows + Σ per-round |per-query expand
  *    set| — exactly seedSet.count() + Σ expanded.count().
  *
  * Above any gate the callers run the DataFrame form verbatim — the
  * 100 TB shape (per-round shuffles over distributed edge/vector
  * tables) is unchanged; this is the same data-sized dual-branch
  * convention as Rescore/cellKnn/dedup_embedding.
  */
object BeamKernel {

  /** Collected-list caps: same 64 MiB budget class as Rescore's bank
    * (16 B per edge/seed row; one vector per query row). */
  private val RowCap = (Rescore.BankBytesCap / 16L).toInt // 4M rows

  final case class KernelOut(
      rows: Array[(Long, Int, Long, Double)], // (qid, rnk, bid, dist), qid-grouped, rank-ordered
      seedRows: Array[(Long, Long)],          // the RAW collected seed rows (ledger base)
      expandedPerQuery: Array[(Long, Long)])  // (qid, Σ per-round |expand set|)

  private def distFn(metric: String): (Array[Float], Array[Float]) => Double =
    metric match {
      case "l2" => (a, b) => Rescore.l2Of(a, b)
      case "cosine" => (a, b) => {
        val n = math.min(a.length, b.length)
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < n) {
          val x = a(i).toDouble; val y = b(i).toDouble
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        -(dot / math.sqrt(na * nb))
      }
      case "ip" => (a, b) => {
        val n = math.min(a.length, b.length)
        var s = 0.0; var i = 0
        while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
        -s
      }
      case other => throw new IllegalArgumentException(s"unknown metric $other")
    }

  final case class TraceOut(
      beams: IndexedSeq[Array[(Long, Long, Double)]], // element r = (qid, bid, dist) beam after round r (0 = scored seeds, dedup'd)
      ledger: Array[(Long, Long, Int)])               // (qid, bid, fr) — first round scored; raw seed pairs at 0

  /** Run the whole search fused, or return None when any bound fails
    * (caller falls back to the DataFrame rounds). `n`/`dim` size the
    * bank gate — callers know them without extra actions. `efOfId`
    * gives each query's beam width (constant ef for the untagged
    * searches, the tag decode for batched sweeps). */
  private final case class Inputs(
      bank: org.apache.spark.broadcast.Broadcast[Rescore.Bank],
      fwd: Rescore.Csr,
      qids: Array[Long],
      qvs: Array[Array[Float]],
      seedsByQ: Array[Array[Int]],
      seedArr: Array[(Long, Long)])

  /** Shared gate + collection for the fused forms: bank, CSR edges,
    * query arrays, per-query valid-seed lists, raw seed rows. None
    * when any bound fails or an edge endpoint is outside the bank. */
  private def collectInputs(
      edges: DataFrame,
      queries: DataFrame,
      base: DataFrame,
      seeds: DataFrame,
      n: Long,
      dim: Int): Option[Inputs] = {
    if (!Rescore.fitsBank(n, dim)) return None
    val s = base.sparkSession
    import s.implicits._
    val qCap = math.max(1L, Rescore.BankBytesCap / math.max(1, dim * 4)).toInt
    val edgeArr = edges.select(col("src"), col("dst"))
      .limit(RowCap + 1).as[(Long, Long)].collect()
    if (edgeArr.length > RowCap) return None
    val qArr = queries.select(col("qid"), col("qv").cast("array<float>"))
      .limit(qCap + 1).as[(Long, Array[Float])].collect()
    if (qArr.length > qCap) return None
    val seedArr = seeds.select(col("qid"), col("bid"))
      .limit(RowCap + 1).as[(Long, Long)].collect()
    if (seedArr.length > RowCap) return None
    val bank = Rescore.broadcastBank(base)
    val ids = bank.value.ids
    val nI = ids.length
    // edges to idx space; an endpoint outside the bank means the
    // DataFrame form's scoring semantics need the join — fall back
    val esrc = new Array[Int](edgeArr.length)
    val edst = new Array[Int](edgeArr.length)
    var i = 0
    while (i < edgeArr.length) {
      val (a, b) = edgeArr(i)
      val ai = java.util.Arrays.binarySearch(ids, a)
      val bi = java.util.Arrays.binarySearch(ids, b)
      if (ai < 0 || bi < 0) { bank.unpersist(blocking = false); return None }
      esrc(i) = ai; edst(i) = bi; i += 1
    }
    val fwd = Rescore.csrOf(nI, esrc, edst)
    // queries: parallel arrays + an id→index map for the seed grouping
    val nq = qArr.length
    val qids = new Array[Long](nq)
    val qvs = new Array[Array[Float]](nq)
    val qIdx = new java.util.HashMap[Long, Integer](nq * 2)
    i = 0
    while (i < nq) {
      qids(i) = qArr(i)._1; qvs(i) = qArr(i)._2
      qIdx.put(qids(i), Integer.valueOf(i)); i += 1
    }
    // valid seeds grouped per query (bid resolved in the bank; raw
    // rows kept separately for the ledgers)
    val seedB = Array.fill(nq)(new scala.collection.mutable.ArrayBuffer[Int](4))
    seedArr.foreach { case (q, b) =>
      val qi = qIdx.get(q)
      if (qi != null) {
        val bi = java.util.Arrays.binarySearch(ids, b)
        if (bi >= 0) seedB(qi.intValue) += bi
      }
    }
    Some(Inputs(bank, fwd, qids, qvs, seedB.map(_.toArray), seedArr))
  }

  def tryRun(
      edges: DataFrame,
      queries: DataFrame,
      base: DataFrame,
      seeds: DataFrame,
      efOfId: Long => Int,
      rounds: Int,
      metric: String,
      n: Long,
      dim: Int): Option[KernelOut] = {
    val s = base.sparkSession
    val in = collectInputs(edges, queries, base, seeds, n, dim) match {
      case Some(v) => v
      case None => return None
    }
    val bank = in.bank
    val fwd = in.fwd
    val qids = in.qids; val qvs = in.qvs
    val seedsByQ = in.seedsByQ; val seedArr = in.seedArr
    val nq = qids.length
    val sc = s.sparkContext
    val envB = sc.broadcast((fwd, qids, qvs, seedsByQ))
    val dist = distFn(metric)
    val parts = math.max(1, math.min(sc.defaultParallelism, math.max(1, nq)))
    val out = sc.range(0L, nq.toLong, 1L, parts).mapPartitions { it =>
      val (fwdA, qidsA, qvsA, seedsA) = envB.value
      val b = bank.value
      val vs = b.vecs; val bids = b.ids
      val nb = vs.length
      val seen = new Array[Boolean](nb)
      var frontier = new Array[Int](1024)
      var next = new Array[Int](1024)
      var pd = new Array[Double](64)
      var px = new Array[Int](64)
      it.flatMap { qiL =>
        val qi = qiL.toInt
        val qid = qidsA(qi)
        val qv = qvsA(qi)
        val ef = efOfId(qid)
        if (pd.length < ef) { pd = new Array[Double](ef); px = new Array[Int](ef) }
        var expTotal = 0L
        // initial beam: the DEDUP'D scored seed set, uncut (duplicate
        // seed rows collapse in both the frontier and the pool)
        var fn = 0
        var t = 0
        val sArr = seedsA(qi)
        while (t < sArr.length) {
          val c = sArr(t)
          if (!seen(c)) {
            seen(c) = true
            if (fn == frontier.length) frontier = java.util.Arrays.copyOf(frontier, fn << 1)
            frontier(fn) = c; fn += 1
          }
          t += 1
        }
        t = 0
        while (t < fn) { seen(frontier(t)) = false; t += 1 }
        // beam as parallel arrays (idx, dist), pool-ordered only after
        // the first cut; the uncut seed beam keeps insertion order —
        // expansion order never affects the output (sets + total order)
        var beamI = java.util.Arrays.copyOf(frontier, fn)
        var beamD = new Array[Double](fn)
        t = 0
        while (t < fn) { beamD(t) = dist(qv, vs(beamI(t))); t += 1 }
        var r = 0
        while (r < rounds) {
          r += 1
          // expand set = ∪ adj(beam member), dedup'd (the round's
          // DataFrame distinct)
          var en = 0
          var m = 0
          while (m < beamI.length) {
            val src = beamI(m)
            var p = fwdA.heads(src); val e = fwdA.heads(src + 1)
            while (p < e) {
              val c = fwdA.nbrs(p)
              if (!seen(c)) {
                seen(c) = true
                if (en == next.length) next = java.util.Arrays.copyOf(next, en << 1)
                next(en) = c; en += 1
              }
              p += 1
            }
            m += 1
          }
          t = 0
          while (t < en) { seen(next(t)) = false; t += 1 }
          expTotal += en
          // pool = top-ef of beam ∪ scored(expand), TopKAgg's exact
          // insert (strict (dist, id), NaN worst, duplicate collapse)
          var sz = 0
          @inline def ins(d: Double, c: Int): Unit = {
            val id = bids(c)
            var skip = sz == ef && Rescore.poolBeats(pd(ef - 1), bids(px(ef - 1)), d, id)
            if (!skip) {
              var pos = sz
              while (pos > 0 && Rescore.poolBeats(d, id, pd(pos - 1), bids(px(pos - 1)))) pos -= 1
              if (pos >= ef) skip = true
              else if (pos > 0 && px(pos - 1) == c &&
                (pd(pos - 1) == d || (pd(pos - 1) != pd(pos - 1) && d != d))) skip = true
              if (!skip) {
                var j = math.min(sz, ef - 1)
                while (j > pos) { pd(j) = pd(j - 1); px(j) = px(j - 1); j -= 1 }
                pd(pos) = d; px(pos) = c
                if (sz < ef) sz += 1
              }
            }
          }
          m = 0
          while (m < beamI.length) { ins(beamD(m), beamI(m)); m += 1 }
          m = 0
          while (m < en) { ins(dist(qv, vs(next(m))), next(m)); m += 1 }
          beamI = java.util.Arrays.copyOf(px, sz)
          beamD = java.util.Arrays.copyOf(pd, sz)
          m = 0
        }
        val outRows = new Array[(Long, Int, Long, Double, Long)](beamI.length)
        var j = 0
        while (j < beamI.length) {
          outRows(j) = (qid, j + 1, bids(beamI(j)), beamD(j), expTotal)
          j += 1
        }
        // a query with no valid seeds emits no rows and no expansions —
        // exactly the DataFrame form (inner joins drop it everywhere)
        outRows.iterator
      }
    }.collect()
    envB.unpersist(blocking = false)
    bank.unpersist(blocking = false)
    val rows = new Array[(Long, Int, Long, Double)](out.length)
    val expB = Array.newBuilder[(Long, Long)]
    var prevQ = Long.MinValue
    var i = 0
    while (i < out.length) {
      val r = out(i)
      rows(i) = (r._1, r._2, r._3, r._4)
      if (r._1 != prevQ) { expB += ((r._1, r._5)); prevQ = r._1 }
      i += 1
    }
    Some(KernelOut(rows, seedArr, expB.result()))
  }

  /** Fused runTrace: ONE kernel job emitting (a) the beam snapshot
    * after every round — element 0 the scored-seed set, element r the
    * post-round-r top-ef beam — and (b) the first-scored-round ledger
    * for expansion nodes. Snapshot 0 is the DEDUP'D scored seed set
    * (the DataFrame form's beam0 keeps duplicate seed ROWS; every
    * consumer aggregates by (qid, bid), so multiplicity is
    * value-invisible — BeamKernelSpec pins the distinct-set equality
    * and the exact ledger). The raw-seed fr=0 ledger rows (which the
    * DataFrame form keeps even for unresolvable qids/bids) are
    * assembled driver-side from the collected seed rows; the kernel
    * emits only expansion entries, so the (qid, bid) → min(fr) roll-up
    * is reproduced exactly. l2 metric only (runTrace's). */
  def tryTrace(
      edges: DataFrame,
      queries: DataFrame,
      base: DataFrame,
      seeds: DataFrame,
      ef: Int,
      maxRounds: Int,
      n: Long,
      dim: Int): Option[TraceOut] = {
    val s = base.sparkSession
    val in = collectInputs(edges, queries, base, seeds, n, dim) match {
      case Some(v) => v
      case None => return None
    }
    val bank = in.bank
    val sc = s.sparkContext
    val envB = sc.broadcast((in.fwd, in.qids, in.qvs, in.seedsByQ))
    val nq = in.qids.length
    val parts = math.max(1, math.min(sc.defaultParallelism, math.max(1, nq)))
    // row encoding: (round, qid, bid, dist, -1) = snapshot row;
    //               (-1, qid, bid, 0.0, fr)   = ledger expansion row
    val out = sc.range(0L, nq.toLong, 1L, parts).mapPartitions { it =>
      val (fwdA, qidsA, qvsA, seedsA) = envB.value
      val b = bank.value
      val vs = b.vecs; val bids = b.ids
      val nb = vs.length
      val seen = new Array[Boolean](nb)
      val firstRound = new Array[Int](nb)
      java.util.Arrays.fill(firstRound, -1)
      var marked = new Array[Int](1024)
      var next = new Array[Int](1024)
      val pd = new Array[Double](ef); val px = new Array[Int](ef)
      it.flatMap { qiL =>
        val qi = qiL.toInt
        val qid = qidsA(qi)
        val qv = qvsA(qi)
        val rowsB = Array.newBuilder[(Int, Long, Long, Double, Int)]
        // dedup'd valid seed set; ledger marks fr=0 (emission of the
        // fr=0 rows is driver-side over the RAW pairs)
        var mn = 0
        @inline def mark(c: Int, r: Int): Boolean =
          if (firstRound(c) == -1) {
            firstRound(c) = r
            if (mn == marked.length) marked = java.util.Arrays.copyOf(marked, mn << 1)
            marked(mn) = c; mn += 1
            true
          } else false
        val sArr = seedsA(qi)
        var t = 0
        var fn = 0
        var beamI = new Array[Int](math.max(1, sArr.length))
        while (t < sArr.length) {
          val c = sArr(t)
          if (mark(c, 0)) { beamI(fn) = c; fn += 1 }
          t += 1
        }
        beamI = java.util.Arrays.copyOf(beamI, fn)
        var beamD = new Array[Double](fn)
        t = 0
        while (t < fn) {
          beamD(t) = Rescore.l2Of(qv, vs(beamI(t)))
          rowsB += ((0, qid, bids(beamI(t)), beamD(t), -1))
          t += 1
        }
        var r = 0
        while (r < maxRounds) {
          r += 1
          // per-round expansion set (the round's DataFrame distinct)
          var en = 0
          var m = 0
          while (m < beamI.length) {
            val src = beamI(m)
            var p = fwdA.heads(src); val e = fwdA.heads(src + 1)
            while (p < e) {
              val c = fwdA.nbrs(p)
              if (!seen(c)) {
                seen(c) = true
                if (en == next.length) next = java.util.Arrays.copyOf(next, en << 1)
                next(en) = c; en += 1
              }
              p += 1
            }
            m += 1
          }
          t = 0
          while (t < en) { seen(next(t)) = false; t += 1 }
          // ledger: first-scored round for nodes not seen before
          t = 0
          while (t < en) {
            val c = next(t)
            if (mark(c, r)) rowsB += ((-1, qid, bids(c), 0.0, r))
            t += 1
          }
          // pool = top-ef of beam ∪ scored(expansion), the TopKAgg rule
          var sz = 0
          @inline def ins(d: Double, c: Int): Unit = {
            val id = bids(c)
            var skip = sz == ef && Rescore.poolBeats(pd(ef - 1), bids(px(ef - 1)), d, id)
            if (!skip) {
              var pos = sz
              while (pos > 0 && Rescore.poolBeats(d, id, pd(pos - 1), bids(px(pos - 1)))) pos -= 1
              if (pos >= ef) skip = true
              else if (pos > 0 && px(pos - 1) == c &&
                (pd(pos - 1) == d || (pd(pos - 1) != pd(pos - 1) && d != d))) skip = true
              if (!skip) {
                var j = math.min(sz, ef - 1)
                while (j > pos) { pd(j) = pd(j - 1); px(j) = px(j - 1); j -= 1 }
                pd(pos) = d; px(pos) = c
                if (sz < ef) sz += 1
              }
            }
          }
          m = 0
          while (m < beamI.length) { ins(beamD(m), beamI(m)); m += 1 }
          m = 0
          while (m < en) { ins(Rescore.l2Of(qv, vs(next(m))), next(m)); m += 1 }
          beamI = java.util.Arrays.copyOf(px, sz)
          beamD = java.util.Arrays.copyOf(pd, sz)
          t = 0
          while (t < sz) { rowsB += ((r, qid, bids(beamI(t)), beamD(t), -1)); t += 1 }
        }
        t = 0
        while (t < mn) { firstRound(marked(t)) = -1; t += 1 }
        rowsB.result().iterator
      }
    }.collect()
    envB.unpersist(blocking = false)
    bank.unpersist(blocking = false)
    val snaps = IndexedSeq.fill(maxRounds + 1)(Array.newBuilder[(Long, Long, Double)])
    val ledgerB = Array.newBuilder[(Long, Long, Int)]
    // fr=0 rows: the RAW seed pairs, dedup'd by (qid, bid) — exactly
    // candFirst's roll-up of seedSet (unresolvable rows included)
    val seen0 = new java.util.HashSet[(Long, Long)]()
    in.seedArr.foreach { p => if (seen0.add(p)) ledgerB += ((p._1, p._2, 0)) }
    out.foreach { r =>
      if (r._1 >= 0) snaps(r._1) += ((r._2, r._3, r._4))
      else ledgerB += ((r._2, r._3, r._5))
    }
    Some(TraceOut(snaps.map(_.result()), ledgerB.result()))
  }
}
