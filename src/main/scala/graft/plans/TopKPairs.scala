package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Catalyst-native bounded top-k of (score, id) pairs — the aggregate
  * the WindowTopKRule rewrites row_number windows into. Unlike the
  * udaf-wrapped TopKAgg, this needs no encoders (it is built directly
  * inside optimizer rules) and serializes its buffer as packed
  * primitives.
  *
  * Ordering must mirror row_number's sort EXACTLY, including NULL and
  * NaN placement, because the rule substitutes this aggregate for a
  * WindowExec on arbitrary (possibly nullable) input:
  * - NULL score/id rank per scoreNullsFirst/idNullsFirst (the window's
  *   declared null ordering); the original NULL is carried in the pool
  *   (flag bits per slot) and emitted back — no sentinel values.
  * - non-null doubles compare exactly like Spark's sort
  *   (nanSafeCompareDoubles semantics: NaN greatest, NaN == NaN, and
  *   -0.0 ties 0.0 so the id breaks the tie like row_number does);
  *   values are stored and emitted RAW — a -0.0 in, a -0.0 out.
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    asc: Boolean,
    scoreNullsFirst: Boolean,
    idNullsFirst: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKPairs.Buf] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = true),
      StructField("id", LongType, nullable = true))),
    containsNull = false)

  override def createAggregationBuffer(): TopKPairs.Buf =
    new TopKPairs.Buf(new Array[Double](k), new Array[Long](k), new Array[Byte](k), 0)

  /** true iff entry 1 ranks strictly before entry 2 under the window's
    * sort. flag bit0 = score NULL, bit1 = id NULL. */
  private def beats(f1: Byte, s1: Double, i1: Long, f2: Byte, s2: Double, i2: Long): Boolean = {
    val sn1 = (f1 & 1) != 0; val sn2 = (f2 & 1) != 0
    if (sn1 != sn2) return sn1 == scoreNullsFirst
    if (!sn1) {
      // == first so -0.0 ties 0.0 (Spark's nanSafeCompareDoubles);
      // Double.compare then handles NaN (greatest, equal to itself)
      val c = if (s1 == s2) 0 else java.lang.Double.compare(s1, s2)
      if (c != 0) return if (asc) c < 0 else c > 0
    }
    val in1 = (f1 & 2) != 0; val in2 = (f2 & 2) != 0
    if (in1 != in2) return in1 == idNullsFirst
    if (!in1 && i1 != i2) i1 < i2 else false
  }

  private def insert(b: TopKPairs.Buf, f: Byte, s: Double, id0: Long): Unit = {
    if (b.size == k && beats(b.flags(k - 1), b.scores(k - 1), b.ids(k - 1), f, s, id0)) return
    var pos = b.size
    while (pos > 0 && beats(f, s, id0, b.flags(pos - 1), b.scores(pos - 1), b.ids(pos - 1))) pos -= 1
    if (pos >= k) return
    var j = math.min(b.size, k - 1)
    while (j > pos) {
      b.scores(j) = b.scores(j - 1); b.ids(j) = b.ids(j - 1); b.flags(j) = b.flags(j - 1)
      j -= 1
    }
    b.scores(pos) = s; b.ids(pos) = id0; b.flags(pos) = f
    if (b.size < k) b.size += 1
  }

  override def update(b: TopKPairs.Buf, input: InternalRow): TopKPairs.Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    var flag = 0
    var sv = 0.0
    s match {
      case null => flag |= 1
      case d: java.lang.Double => sv = d.doubleValue()
      case f: java.lang.Float => sv = f.doubleValue()
      case n: java.lang.Number => sv = n.doubleValue()
    }
    var iv = 0L
    i match {
      case null => flag |= 2
      case l: java.lang.Long => iv = l.longValue()
      case n: java.lang.Number => iv = n.longValue()
    }
    insert(b, flag.toByte, sv, iv)
    b
  }

  override def merge(a: TopKPairs.Buf, b: TopKPairs.Buf): TopKPairs.Buf = {
    var i = 0
    while (i < b.size) { insert(a, b.flags(i), b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(b: TopKPairs.Buf): Any = {
    val out = new Array[Any](b.size)
    var i = 0
    while (i < b.size) {
      val sv: Any = if ((b.flags(i) & 1) != 0) null else b.scores(i)
      val iv: Any = if ((b.flags(i) & 2) != 0) null else b.ids(i)
      out(i) = InternalRow(sv, iv)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: TopKPairs.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + b.size * 17)
    bb.putInt(b.size)
    var i = 0
    while (i < b.size) {
      bb.put(b.flags(i)); bb.putDouble(b.scores(i)); bb.putLong(b.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairs.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      buf.flags(i) = bb.get(); buf.scores(i) = bb.getDouble(); buf.ids(i) = bb.getLong()
      i += 1
    }
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
  final class Buf(val scores: Array[Double], val ids: Array[Long], val flags: Array[Byte], var size: Int)
}
