package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types._

/** The full custom-operator route (LogicalPlan + Strategy + SparkPlan)
  * for the one whole-operator semantic Spark's built-ins can't express
  * efficiently: brute-force vector top-k join. The physical node
  * collects+broadcasts the (small) query side at execution time and
  * streams the base side through tight per-partition scoring loops
  * with bounded pools — the plan-integrated form of
  * operators.BruteForce, with SQL metrics and EXPLAIN visibility.
  *
  * Output: (qid: long, bid: long, score: double) — per-partition pools
  * (≤ partitions·|Q|·k rows, UNMERGED); compose TopK.perGroup on top
  * for the global answer, exactly like the mapPartitions form.
  */
case class VectorTopKJoin(
    queries: LogicalPlan, // (qid: long, qv: array<float>)
    base: LogicalPlan, // (bid: long, bv: array<float>)
    metric: String,
    k: Int,
    excludeSelf: Boolean,
    // output attrs live in the constructor: recomputing them per
    // instance would mint fresh exprIds on every optimizer copy() and
    // break downstream attribute binding
    output: Seq[Attribute] = VectorTopKJoin.freshOutput()) extends BinaryNode {
  override def left: LogicalPlan = queries
  override def right: LogicalPlan = base
  /** No expressions on this node → default `references` would be empty
    * and ColumnPruning would strip the children bare (runtime segfault
    * reading pruned rows). Every child column is required. */
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(queries.output ++ base.output)
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): LogicalPlan =
    copy(queries = l, base = r)
}

object VectorTopKJoin {
  def freshOutput(): Seq[Attribute] = Seq(
    AttributeReference("qid", LongType, nullable = false)(),
    AttributeReference("bid", LongType, nullable = false)(),
    AttributeReference("score", DoubleType, nullable = false)())
}

/** Planner strategy (inject via GraftExtensions). */
object VectorTopKJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: VectorTopKJoin =>
      VectorTopKJoinExec(planLater(j.queries), planLater(j.base),
        j.metric, j.k, j.excludeSelf, j.output) :: Nil
    case _ => Nil
  }
}

case class VectorTopKJoinExec(
    queriesPlan: SparkPlan,
    basePlan: SparkPlan,
    metric: String,
    k: Int,
    excludeSelf: Boolean,
    override val output: Seq[Attribute]) extends BinaryExecNode {

  override def left: SparkPlan = queriesPlan
  override def right: SparkPlan = basePlan

  override lazy val metrics = Map(
    "numQueries" -> SQLMetrics.createMetric(sparkContext, "number of query vectors"),
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numQueries = longMetric("numQueries")
    val numOutputRows = longMetric("numOutputRows")

    // collect + broadcast the query side (bounded by contract)
    val qRows = queriesPlan.executeCollect()
    val qArr: Array[(Long, Array[Float])] = qRows.map { r =>
      (r.getLong(0), r.getArray(1).toFloatArray())
    }.sortBy(_._1)
    numQueries += qArr.length
    val bc = sparkContext.broadcast(qArr)
    val m = metric
    val kk = k
    val skipSelf = excludeSelf

    basePlan.execute().mapPartitions { it =>
      val qs = bc.value
      val nq = qs.length
      val poolS = Array.fill(nq)(new Array[Double](kk))
      val poolI = Array.fill(nq)(new Array[Long](kk))
      val sizes = new Array[Int](nq)
      val ascL = m == "l2"

      // NaN ranks worst in either direction — same rule as TopKAgg.beats
      def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
        val n1 = java.lang.Double.isNaN(s1); val n2 = java.lang.Double.isNaN(s2)
        if (n1 || n2) { if (n1 != n2) !n1 else i1 < i2 }
        else if (s1 != s2) { if (ascL) s1 < s2 else s1 > s2 }
        else i1 < i2
      }

      def insert(qi: Int, s: Double, id: Long): Unit = {
        val sz = sizes(qi)
        val ss = poolS(qi); val ii = poolI(qi)
        if (sz == kk && beats(ss(kk - 1), ii(kk - 1), s, id)) return
        var pos = sz
        while (pos > 0 && beats(s, id, ss(pos - 1), ii(pos - 1))) pos -= 1
        if (pos >= kk) return
        var j = math.min(sz, kk - 1)
        while (j > pos) { ss(j) = ss(j - 1); ii(j) = ii(j - 1); j -= 1 }
        ss(pos) = s; ii(pos) = id
        if (sz < kk) sizes(qi) = sz + 1
      }

      while (it.hasNext) {
        val row = it.next()
        val bid = row.getLong(0)
        val bv = row.getArray(1).toFloatArray()
        var qi = 0
        while (qi < nq) {
          if (skipSelf && qs(qi)._1 == bid) { qi += 1 }
          else {
            val qv = qs(qi)._2
            val n = math.min(qv.length, bv.length)
            var s = 0.0
            m match {
              case "cosine" =>
                var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
                while (i < n) {
                  val x = qv(i).toDouble; val y = bv(i).toDouble
                  dot += x * y; na += x * x; nb += y * y; i += 1
                }
                s = dot / math.sqrt(na * nb)
              case "l2" =>
                var acc = 0.0; var i = 0
                while (i < n) { val d = qv(i).toDouble - bv(i).toDouble; acc += d * d; i += 1 }
                s = math.sqrt(acc)
              case _ =>
                var acc = 0.0; var i = 0
                while (i < n) { acc += qv(i).toDouble * bv(i).toDouble; i += 1 }
                s = acc
            }
            insert(qi, s, bid)
            qi += 1
          }
        }
      }
      val proj = UnsafeProjection.create(Array[DataType](LongType, LongType, DoubleType))
      val out = InternalRow(0L, 0L, 0.0)
      Iterator.range(0, nq).flatMap { qi =>
        Iterator.range(0, sizes(qi)).map { j =>
          out.setLong(0, qs(qi)._1)
          out.setLong(1, poolI(qi)(j))
          out.setDouble(2, poolS(qi)(j))
          numOutputRows += 1
          proj(out).copy()
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(queriesPlan = l, basePlan = r)
}
