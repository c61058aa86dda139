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
          // (dist, id) order, exact-duplicate collapse)
          def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
            val n1 = java.lang.Double.isNaN(s1); val n2 = java.lang.Double.isNaN(s2)
            if (n1 || n2) { if (n1 != n2) !n1 else i1 < i2 }
            else if (s1 != s2) s1 < s2
            else i1 < i2
          }
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
              if (si >= 0 && di >= 0) {
                val sv = vs(si); val dv = vs(di)
                val nn = math.min(sv.length, dv.length)
                var acc = 0.0; var i = 0
                while (i < nn) {
                  val d = sv(i).toDouble - dv(i).toDouble
                  acc += d * d; i += 1
                }
                insert(poolOf(src), math.sqrt(acc), dst)
              }
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
}
