package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}

/** One (score, id) candidate. Ordering is strict-total: score, then id
  * — so top-k sets are deterministic under any merge order. */
final case class Scored(score: Double, id: Long)

/** Bounded top-k as a typed Aggregator.
  *
  * This is the scale-critical primitive behind every similarity-search
  * operator (SURVEY §5): because it is an Aggregator, Spark runs it
  * with map-side partial aggregation — each input partition reduces to
  * at most k candidates per group BEFORE the shuffle, so a brute-force
  * scan over B base rows × Q queries shuffles O(partitions·Q·k) tiny
  * buffers instead of O(B·Q) pairs. The reference's equivalent is the
  * bounded candidate pool in its groundtruth / beam searches
  * (roargraph_python.py:31-63 NeighborPriorityQueue).
  *
  * @param k    pool size
  * @param asc  true = smallest scores win (distances), false = largest
  *             (similarities). Ties always break by ascending id.
  */
final class TopKAgg(k: Int, asc: Boolean)
    extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  /** true iff a ranks strictly before b. */
  private def beats(a: Scored, b: Scored): Boolean =
    if (a.score != b.score) { if (asc) a.score < b.score else a.score > b.score }
    else a.id < b.id

  private def insert(buf: Seq[Scored], x: Scored): Seq[Scored] =
    if (buf.length >= k && beats(buf.last, x)) buf
    else {
      val i = buf.indexWhere(b => beats(x, b))
      val grown = if (i < 0) buf :+ x else (buf.take(i) :+ x) ++ buf.drop(i)
      if (grown.length > k) grown.take(k) else grown
    }

  override def zero: Seq[Scored] = Vector.empty
  override def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] = insert(buf, x)
  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = b.foldLeft(a)(insert)
  override def finish(buf: Seq[Scored]): Seq[Scored] = buf
  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}

object TopK {

  /** Column function: top-k of (score, id) pairs per group. */
  def topkAgg(k: Int, asc: Boolean): (Column, Column) => Column = {
    val u = udaf(new TopKAgg(k, asc), Encoders.product[Scored])
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
