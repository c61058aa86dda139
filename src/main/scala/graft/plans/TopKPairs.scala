package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Catalyst-native bounded top-k of (score, id) pairs — the aggregate
  * the WindowTopKRule rewrites row_number windows into. Unlike the
  * udaf-wrapped TopKAgg, this needs no encoders (it is built directly
  * inside optimizer rules) and serializes its buffer as packed
  * primitives. Ordering rule identical to TopKAgg: score (asc|desc)
  * then id ascending.
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    asc: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKPairs.Buf] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): TopKPairs.Buf =
    new TopKPairs.Buf(new Array[Double](k), new Array[Long](k), 0)

  private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    if (s1 != s2) { if (asc) s1 < s2 else s1 > s2 } else i1 < i2

  private def insert(b: TopKPairs.Buf, s: Double, id0: Long): Unit = {
    if (b.size == k && beats(b.scores(k - 1), b.ids(k - 1), s, id0)) return
    var pos = b.size
    while (pos > 0 && beats(s, id0, b.scores(pos - 1), b.ids(pos - 1))) pos -= 1
    if (pos >= k) return
    var j = math.min(b.size, k - 1)
    while (j > pos) { b.scores(j) = b.scores(j - 1); b.ids(j) = b.ids(j - 1); j -= 1 }
    b.scores(pos) = s; b.ids(pos) = id0
    if (b.size < k) b.size += 1
  }

  override def update(b: TopKPairs.Buf, input: InternalRow): TopKPairs.Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val sv = s match {
        case d: java.lang.Double => d.doubleValue()
        case f: java.lang.Float => f.doubleValue()
        case n: java.lang.Number => n.doubleValue()
      }
      val iv = i match {
        case l: java.lang.Long => l.longValue()
        case n: java.lang.Number => n.longValue()
      }
      insert(b, sv, iv)
    }
    b
  }

  override def merge(a: TopKPairs.Buf, b: TopKPairs.Buf): TopKPairs.Buf = {
    var i = 0
    while (i < b.size) { insert(a, b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(b: TopKPairs.Buf): Any = {
    val out = new Array[Any](b.size)
    var i = 0
    while (i < b.size) {
      out(i) = InternalRow(b.scores(i), b.ids(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: TopKPairs.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + b.size * 16)
    bb.putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putDouble(b.scores(i)); bb.putLong(b.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairs.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.scores(i) = bb.getDouble(); buf.ids(i) = bb.getLong(); i += 1 }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPairs = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairs = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(score = c(0), id = c(1))
  override def prettyName: String = "topk_pairs"
}

object TopKPairs {
  final class Buf(val scores: Array[Double], val ids: Array[Long], var size: Int)
}
