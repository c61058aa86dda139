package graft.operators

import graft.functions.Vec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Fused rescore + bounded top-k for candidate EDGE PAIRS — the
  * NN-Descent round shape (knn_descent, approxLayers' refinement
  * rounds, knn_refine): candidates (src, dst) are rescored with exact
  * L2 and reduced to the best k per src.
  *
  * Round 15 measurement: the join formulation (cand ⋈ vecs on src,
  * ⋈ vecs on dst, l2, TopKAgg) pays ~1.3 µs/pair of row machinery —
  * two 64-float array copies into UnsafeRows per pair dominate, the
  * arithmetic is ~60 ns — and at bench scale the (2k)²-candidate round
  * stage ran 0.38 s on three tasks. When the vector bank fits a
  * broadcast (n·d·4 B ≤ 64 MiB — data-sized, the lesson-22 bounded-bank
  * rule), the pairs stream through a per-partition kernel against the
  * broadcast bank instead: same float-widened left-fold L2
  * (BruteForce's loop), same pool rule as TopKAgg (strict (dist, id)
  * order, NaN ranks worst, exact-duplicate (dist, id) candidates
  * collapse — dup collapse matters: NN-Descent feeds duplicate pairs
  * by design), partial pools merged through TopK.perGroup exactly like
  * BruteForce, so the output is bit-identical to the join form at any
  * partitioning (RescoreSpec proves it, duplicates included). Above
  * the cutover the join form runs unchanged — the branch is by corpus
  * size only, so a given dir always takes one branch and the two
  * branches are proven equal, exactly the dedup_embedding scale-branch
  * convention.
  *
  * Inner-join semantics preserved: a pair whose src or dst is absent
  * from `vecs` is dropped, and src == dst pairs are dropped (the
  * callers' filter).
  */
object Rescore {

  /** Bank budget: 64 MiB of packed floats (≈ 262k vectors at 64d,
    * ≈ 84k at 200d). Broadcast once per (vecs, round-loop); above it
    * the join form's shuffle is the right 100 TB shape (lesson 50:
    * vectors hit disk once, in the shuffle only). */
  private[graft] val BankBytesCap = 64L << 20

  def fitsBank(n: Long, dim: Int): Boolean = n * dim * 4L <= BankBytesCap

  // ---- the kernel's scalar primitives, shared with the fused round
  // form below (one definition — the pool rule and the distance loop
  // must be THE SAME code in every branch) ----

  /** TopKAgg's strict (dist, id) total order: NaN ranks worst, ties
    * break to the lower id. */
  @inline private[graft] def poolBeats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val n1 = java.lang.Double.isNaN(s1); val n2 = java.lang.Double.isNaN(s2)
    if (n1 || n2) { if (n1 != n2) !n1 else i1 < i2 }
    else if (s1 != s2) s1 < s2
    else i1 < i2
  }

  /** BruteForce's float-widened left-fold L2 over the shared prefix. */
  @inline private[graft] def l2Of(sv: Array[Float], dv: Array[Float]): Double = {
    val nn = math.min(sv.length, dv.length)
    var acc = 0.0; var i = 0
    while (i < nn) {
      val d = sv(i).toDouble - dv(i).toDouble
      acc += d * d; i += 1
    }
    math.sqrt(acc)
  }

  /** Collected, id-sorted bank for the kernel branch. */
  final case class Bank(ids: Array[Long], vecs: Array[Array[Float]])

  private[graft] def collectBank(vecs: DataFrame): Bank = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val arr = vecs.select(col("bid"), col("bv")).as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    Bank(arr.map(_._1), arr.map(_._2))
  }

  /** Rescore + keep best-k per src. `vecs` = (bid, bv: array<float>);
    * `cand` = (src, dst). Returns TopK.perGroup's exact output shape
    * (src, rnk, dst, dist). `n`/`dim` size the branch (callers already
    * know them — no extra count jobs). Pass a pre-collected `bank` to
    * amortize the collect+broadcast across an iterative loop. */
  def keepK(
      cand: DataFrame,
      vecs: DataFrame,
      n: Long,
      dim: Int,
      k: Int,
      bank: Option[org.apache.spark.broadcast.Broadcast[Bank]] = None): DataFrame = {
    val spark = cand.sparkSession
    if (!fitsBank(n, dim) && bank.isEmpty) {
      // join form — the pre-round-15 path, verbatim
      val scored = cand
        .join(vecs.select(col("bid").as("src"), col("bv").as("sv")), Seq("src"))
        .join(vecs.select(col("bid").as("dst"), col("bv").as("dv")), Seq("dst"))
        .select(col("src"), col("dst"), Vec.l2Fast(col("sv"), col("dv")).as("dist"))
      TopK.perGroup(scored.filter(col("src") =!= col("dst")),
        "src", "dst", "dist", k, asc = true)
    } else {
      import spark.implicits._
      val bc = bank.getOrElse(spark.sparkContext.broadcast(collectBank(vecs)))
      val pooled = cand.select(col("src"), col("dst")).as[(Long, Long)]
        .mapPartitions { it =>
          val b = bc.value
          val ids = b.ids; val vs = b.vecs
          def idx(id: Long): Int = java.util.Arrays.binarySearch(ids, id)
          // per-src pools, TopKAgg's exact insert (NaN worst, strict
          // (dist, id) order, exact-duplicate collapse) — order rule
          // shared with the fused round form (poolBeats)
          def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
            poolBeats(s1, i1, s2, i2)
          def sameScore(a: Double, x: Double): Boolean =
            a == x || (a != a && x != x)
          val srcIdx = new java.util.HashMap[Long, Int]()
          val poolS = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
          val poolI = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
          val sizes = scala.collection.mutable.ArrayBuffer.empty[Int]
          val srcs = scala.collection.mutable.ArrayBuffer.empty[Long]
          def poolOf(src: Long): Int =
            if (srcIdx.containsKey(src)) srcIdx.get(src)
            else {
              val pi = srcs.length
              srcIdx.put(src, pi)
              srcs += src; poolS += new Array[Double](k)
              poolI += new Array[Long](k); sizes += 0
              pi
            }
          def insert(pi: Int, s: Double, id: Long): Unit = {
            val ss = poolS(pi); val ii = poolI(pi); val sz = sizes(pi)
            if (sz == k && beats(ss(k - 1), ii(k - 1), s, id)) return
            var pos = sz
            while (pos > 0 && beats(s, id, ss(pos - 1), ii(pos - 1))) pos -= 1
            if (pos >= k) return
            if (pos > 0 && sameScore(ss(pos - 1), s) && ii(pos - 1) == id) return
            var j = math.min(sz, k - 1)
            while (j > pos) { ss(j) = ss(j - 1); ii(j) = ii(j - 1); j -= 1 }
            ss(pos) = s; ii(pos) = id
            if (sz < k) sizes(pi) = sz + 1
          }
          while (it.hasNext) {
            val (src, dst) = it.next()
            if (src != dst) {
              val si = idx(src); val di = idx(dst)
              // inner-join semantics: drop pairs with an absent endpoint
              if (si >= 0 && di >= 0)
                insert(poolOf(src), l2Of(vs(si), vs(di)), dst)
            }
          }
          srcs.indices.iterator.flatMap { pi =>
            val src = srcs(pi)
            Iterator.range(0, sizes(pi)).map(j => (src, poolI(pi)(j), poolS(pi)(j)))
          }
        }
        .toDF("src", "dst", "dist")
      TopK.perGroup(pooled, "src", "dst", "dist", k, asc = true)
    }
  }

  /** Broadcast a bank for reuse across an iterative loop's rounds
    * (one collect, one broadcast). Only call when fitsBank holds. */
  def broadcastBank(vecs: DataFrame): org.apache.spark.broadcast.Broadcast[Bank] =
    vecs.sparkSession.sparkContext.broadcast(collectBank(vecs))

  // ---- fully-fused round form (round 15b) ----
  //
  // The NN-Descent round's remaining DataFrame cost was building the
  // candidate pairs: und = fwd ∪ rev, then non = und ⋈ und on mid — a
  // per-round shuffle whose row volume is (2k)² per node — before the
  // pairs even reach the bank kernel, plus a TopK.perGroup merge of
  // partial pools. When the round's EDGE LIST itself is bounded (n·k
  // idx pairs inside the same 64 MiB budget as the bank), the whole
  // round fuses into ONE map-only job over the node range: candidates
  // are generated per node from a broadcast CSR adjacency, so each
  // node's pool is complete in exactly one task — no join, no shuffle,
  // no merge. Above the gate the keepK join/kernel forms run verbatim
  // (lesson 50's shape is unchanged at scale). DescentFusedSpec proves
  // both modes bit-identical to the keepK forms, duplicate pairs and
  // pathological ties included.

  /** Fused-round gate: collected idx-space edge arrays (16 B/edge)
    * must fit the same budget as the bank. */
  def fitsFused(nEdges: Long): Boolean = nEdges * 16L <= BankBytesCap

  /** Edge list in bank-INDEX space, grouped by src idx ascending with
    * each group in pool (dist, id) rank order. */
  private[graft] final case class IdxEdges(
      src: Array[Int], dst: Array[Int], dist: Array[Double])

  /** Compressed sparse rows over bank indices. */
  private[graft] final case class Csr(heads: Array[Int], nbrs: Array[Int])

  private[graft] def csrOf(n: Int, src: Array[Int], dst: Array[Int]): Csr = {
    val heads = new Array[Int](n + 1)
    var i = 0
    while (i < src.length) { heads(src(i) + 1) += 1; i += 1 }
    i = 0
    while (i < n) { heads(i + 1) += heads(i); i += 1 }
    val nbrs = new Array[Int](src.length)
    val fill = java.util.Arrays.copyOf(heads, n)
    i = 0
    while (i < src.length) {
      val s0 = src(i); nbrs(fill(s0)) = dst(i); fill(s0) += 1; i += 1
    }
    Csr(heads, nbrs)
  }

  /** One fused rescore round — a single map-only job, complete
    * per-node pools. Candidate set for node i (idx space):
    *  - `rev == null`: fwd(i) dedup'd — keepK(pairs) over the given
    *    directed pairs;
    *  - else: und(i) ∪ und(und(i)) with und = fwd ∪ rev — the
    *    NN-Descent round's keepK(fwd ∪ rev ∪ non).
    * c == i candidates are dropped (keepK's src =!= dst filter) and a
    * dedup'd candidate SET yields the same pool as the join form's
    * duplicate-bearing multiset (exact-duplicate (dist, id) entries
    * collapse); distances/order are l2Of/poolBeats — the kernel's own
    * primitives. Bank ids are sorted, so idx-space grouping is id
    * order. */
  private[graft] def fusedRound(
      s: org.apache.spark.sql.SparkSession,
      bankB: org.apache.spark.broadcast.Broadcast[Bank],
      fwd: Csr,
      rev: Csr,
      k: Int): IdxEdges = {
    val n = bankB.value.ids.length
    val adjB = s.sparkContext.broadcast((fwd, rev))
    val parts = math.max(1, math.min(s.sparkContext.defaultParallelism, n))
    val rows = s.sparkContext.range(0L, n.toLong, 1L, parts).mapPartitions { it =>
      val bank = bankB.value
      val vs = bank.vecs; val ids = bank.ids
      val (fwdA, revA) = adjB.value
      val seen = new Array[Boolean](vs.length)
      var touched = new Array[Int](1024)
      val pd = new Array[Double](k); val px = new Array[Int](k)
      it.flatMap { iL =>
        val i = iL.toInt
        var tn = 0
        @inline def add(c: Int): Unit =
          if (c != i && !seen(c)) {
            seen(c) = true
            if (tn == touched.length)
              touched = java.util.Arrays.copyOf(touched, tn << 1)
            touched(tn) = c; tn += 1
          }
        @inline def addAll(a: Csr, v: Int): Unit = {
          var p = a.heads(v); val e = a.heads(v + 1)
          while (p < e) { add(a.nbrs(p)); p += 1 }
        }
        addAll(fwdA, i)
        if (revA != null) {
          addAll(revA, i)
          val tn0 = tn // und(i) snapshot; i ∉ und(i) (no self-edges)
          var m = 0
          while (m < tn0) {
            val mid = touched(m)
            addAll(fwdA, mid); addAll(revA, mid)
            m += 1
          }
        }
        // rescore the candidate set through the pool (insert = the
        // keepK kernel's, with idx-parallel storage; comparisons use
        // the real ids)
        var sz = 0
        val sv = vs(i)
        var t = 0
        while (t < tn) {
          val c = touched(t)
          val d = l2Of(sv, vs(c))
          val id = ids(c)
          var skip = sz == k && poolBeats(pd(k - 1), ids(px(k - 1)), d, id)
          if (!skip) {
            var pos = sz
            while (pos > 0 && poolBeats(d, id, pd(pos - 1), ids(px(pos - 1)))) pos -= 1
            if (pos >= k) skip = true
            // exact-duplicate collapse can't trigger on a dedup'd set;
            // kept for rule parity
            else if (pos > 0 && px(pos - 1) == c &&
              (pd(pos - 1) == d || (pd(pos - 1) != pd(pos - 1) && d != d))) skip = true
            if (!skip) {
              var j = math.min(sz, k - 1)
              while (j > pos) { pd(j) = pd(j - 1); px(j) = px(j - 1); j -= 1 }
              pd(pos) = d; px(pos) = c
              if (sz < k) sz += 1
            }
          }
          t += 1
        }
        t = 0
        while (t < tn) { seen(touched(t)) = false; t += 1 }
        val out = new Array[(Int, Int, Double)](sz)
        var j = 0
        while (j < sz) { out(j) = (i, px(j), pd(j)); j += 1 }
        out.iterator
      }
    }.collect()
    adjB.unpersist(blocking = false)
    val src = new Array[Int](rows.length)
    val dst = new Array[Int](rows.length)
    val dist = new Array[Double](rows.length)
    var i = 0
    while (i < rows.length) {
      val r = rows(i); src(i) = r._1; dst(i) = r._2; dist(i) = r._3; i += 1
    }
    IdxEdges(src, dst, dist)
  }
}
