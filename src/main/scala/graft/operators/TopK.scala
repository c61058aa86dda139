package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}

/** One (score, id) candidate. Ordering is strict-total: score, then id
  * — so top-k sets are deterministic under any merge order. */
final case class Scored(score: Double, id: Long)

/** Mutable bounded pool: parallel primitive arrays kept sorted
  * best-first. Mutated in place per input row — no per-row allocation. */
final case class Pool(scores: Array[Double], ids: Array[Long], var size: Int)

/** Bounded top-k as a typed Aggregator.
  *
  * This is the scale-critical primitive behind every similarity-search
  * operator (SURVEY §5): because it is an Aggregator, Spark runs it
  * with map-side partial aggregation — each input partition reduces to
  * at most k candidates per group BEFORE the shuffle, so a brute-force
  * scan over B base rows × Q queries shuffles O(partitions·Q·k) small
  * buffers instead of O(B·Q) pairs. The reference's equivalent is the
  * bounded candidate pool in its beam searches
  * (roargraph_python.py:31-63 NeighborPriorityQueue).
  *
  * @param k    pool size
  * @param asc  true = smallest scores win (distances), false = largest
  *             (similarities). Ties always break by ascending id.
  */
final class TopKAgg(k: Int, asc: Boolean)
    extends Aggregator[Scored, Pool, Seq[Scored]] {

  /** true iff (s1,i1) ranks strictly before (s2,i2). NaN (e.g. cosine
    * of a zero-norm vector) always ranks WORST in either direction —
    * IEEE compares are all-false on NaN, so the naive form could never
    * displace a NaN that entered a full pool and results became
    * partition-order-dependent. */
  private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val n1 = java.lang.Double.isNaN(s1); val n2 = java.lang.Double.isNaN(s2)
    if (n1 || n2) { if (n1 != n2) !n1 else i1 < i2 }
    else if (s1 != s2) { if (asc) s1 < s2 else s1 > s2 }
    else i1 < i2
  }

  /** equality that treats NaN == NaN (for duplicate collapse). */
  private def sameScore(a: Double, b: Double): Boolean =
    a == b || (a != a && b != b)

  private def insert(p: Pool, s: Double, id: Long): Unit = {
    if (p.size == k && beats(p.scores(k - 1), p.ids(k - 1), s, id)) return
    var pos = p.size
    while (pos > 0 && beats(s, id, p.scores(pos - 1), p.ids(pos - 1))) pos -= 1
    if (pos >= k) return
    // exact-duplicate (score, id) candidates collapse (lets callers
    // like BeamSearch feed revisited nodes without a visited-set join)
    if (pos > 0 && sameScore(p.scores(pos - 1), s) && p.ids(pos - 1) == id) return
    var j = math.min(p.size, k - 1)
    while (j > pos) { p.scores(j) = p.scores(j - 1); p.ids(j) = p.ids(j - 1); j -= 1 }
    p.scores(pos) = s; p.ids(pos) = id
    if (p.size < k) p.size += 1
  }

  override def zero: Pool = Pool(new Array[Double](k), new Array[Long](k), 0)
  override def reduce(p: Pool, x: Scored): Pool = { insert(p, x.score, x.id); p }
  override def merge(a: Pool, b: Pool): Pool = {
    var i = 0
    while (i < b.size) { insert(a, b.scores(i), b.ids(i)); i += 1 }
    a
  }
  override def finish(p: Pool): Seq[Scored] =
    (0 until p.size).map(i => Scored(p.scores(i), p.ids(i)))
  override def bufferEncoder: Encoder[Pool] = TopKAgg.poolEnc
  override def outputEncoder: Encoder[Seq[Scored]] = TopKAgg.seqEnc
}

object TopKAgg {
  /** Encoders are pure schema derivations — one reflection pass each,
    * shared by every TopKAgg instance (round 15: bufferEncoder/
    * outputEncoder are called during PLANNING of every aggregation, so
    * per-instance ExpressionEncoder() re-derivation was a driver-side
    * tax on all ~50 top-k call sites, several of them inside per-round
    * search loops). */
  private[operators] val poolEnc: Encoder[Pool] = ExpressionEncoder()
  private[operators] val seqEnc: Encoder[Seq[Scored]] = ExpressionEncoder()
}

object TopK {

  /** udaf wrappers memoized per (k, asc): the TopKAgg instance is
    * stateless (k, asc only) and UserDefinedFunction application just
    * wraps it in a fresh Column expression, so one registered wrapper
    * serves every call site and every thread (round 15 — driver-side
    * plan-build cost, output-invariant). */
  private val udafCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Boolean),
      org.apache.spark.sql.expressions.UserDefinedFunction]()

  /** Column function: top-k of (score, id) pairs per group. */
  def topkAgg(k: Int, asc: Boolean): (Column, Column) => Column = {
    val u = udafCache.computeIfAbsent((k, asc),
      _ => udaf(new TopKAgg(k, asc), Encoders.product[Scored]))
    (score, id) => u(score, id)
  }

  /** Per-group top-k of `scored` rows → (groupCols*, rnk, id, score),
    * rnk 1-based, ordered (score asc|desc, id). */
  def perGroup(
      scored: DataFrame,
      groupCol: String,
      idCol: String,
      scoreCol: String,
      k: Int,
      asc: Boolean): DataFrame = {
    val agg = topkAgg(k, asc)(col(scoreCol), col(idCol))
    scored
      .groupBy(col(groupCol))
      .agg(agg.as("pool"))
      .select(col(groupCol), posexplode(col("pool")).as(Seq("pos", "s")))
      .select(
        col(groupCol),
        (col("pos") + 1).cast("int").as("rnk"),
        col("s.id").as(idCol),
        col("s.score").as(scoreCol))
  }
}
