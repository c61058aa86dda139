package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd vector kernels over array<float>/array<double> columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * materializes an intermediate array per row pair — at B·Q pairs that
  * allocation dominates brute-force search. These expressions loop over
  * the two ArrayData buffers directly inside whole-stage codegen: zero
  * allocation, float elements widened to double per element.
  *
  * Determinism contract unchanged: each accumulator is a left fold in
  * element order over doubles, so results are bit-identical to the
  * HOF forms and to the DuckDB oracle fragments (Vec.sql*).
  *
  * Reference semantics: l2/cosine/ip distances,
  * /root/reference/hnsw_cosine_status_high.py:26-45,
  * /root/reference/roargraph_python.py:106-127.
  */
abstract class VecBinaryKernel extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  protected def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(
      s"vector kernel needs an array column, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"expected array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  /** Scala-side element accessor (interpreted path). */
  protected def get(a: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  /** Java source for reading element i of `arr` as double. */
  protected def jget(arr: String, i: String, et: DataType): String = et match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _ => s"$arr.getDouble($i)"
  }
}

/** Left-fold dot product. */
case class VecDot(left: Expression, right: Expression) extends VecBinaryKernel {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ea, eb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += get(a, i, ea) * get(b, i, eb); i += 1 }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (i, n, s) = (ctx.freshName("i"), ctx.freshName("n"), ctx.freshName("s"))
      s"""
       |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double $s = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  $s += ${jget(a, i, elemType(left))} * ${jget(b, i, elemType(right))};
       |}
       |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Left-fold squared L2 distance. */
case class VecL2Sq(left: Expression, right: Expression) extends VecBinaryKernel {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ea, eb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { val d = get(a, i, ea) - get(b, i, eb); s += d * d; i += 1 }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (i, n, s, d) =
        (ctx.freshName("i"), ctx.freshName("n"), ctx.freshName("s"), ctx.freshName("d"))
      s"""
       |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double $s = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $d = ${jget(a, i, elemType(left))} - ${jget(b, i, elemType(right))};
       |  $s += $d * $d;
       |}
       |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Scaled squared-L2 (LC-CMD rerank distance, Idea-1023.md):
  * Σ ((a_k−b_k)²)/scale_k as one fused left fold — `scale` is the
  * precomputed per-label-pair denominator array, so the hot loop does
  * no allocation and no per-pair variance math. */
case class VecScaledL2(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def et(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case other => throw new IllegalArgumentException(s"need array, got $other")
  }
  private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }
  private def jget(arr: String, i: String, t: DataType): String = t match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _ => s"$arr.getDouble($i)"
  }

  override def nullSafeEval(l: Any, r: Any, s3: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val w = s3.asInstanceOf[ArrayData]
    val (ea, eb, ew) = (et(first), et(second), et(third))
    val n = math.min(math.min(a.numElements(), b.numElements()), w.numElements())
    var s = 0.0; var i = 0
    while (i < n) {
      val d = get(a, i, ea) - get(b, i, eb)
      s += (d * d) / get(w, i, ew)
      i += 1
    }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, w) => {
      val (i, n, s, d) =
        (ctx.freshName("i"), ctx.freshName("n"), ctx.freshName("s"), ctx.freshName("d"))
      s"""
       |int $n = java.lang.Math.min(java.lang.Math.min($a.numElements(), $b.numElements()), $w.numElements());
       |double $s = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $d = ${jget(a, i, et(first))} - ${jget(b, i, et(second))};
       |  $s += ($d * $d) / ${jget(w, i, et(third))};
       |}
       |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      f: Expression, s2: Expression, t: Expression): Expression =
    copy(first = f, second = s2, third = t)
}

/** Nearest-centroid id over a driver-collected bank: one fused pass
  * per row, no generated rows. The crossJoin(broadcast(cents)) +
  * min(struct(d2, cid)) assignment shape materializes N·k rows and its
  * aggregation falls back to a sort at large k — at 10M×1024 cells that
  * sort spilled a 10-billion-row run to disk until it filled (the round-9
  * scale-run failure). This kernel keeps assignment a map-only scan at
  * any k.
  *
  * Bit-identical to min(struct(VecL2Sq(emb, cv), cid)) by construction:
  * each d2 is the same float-widened left fold in element order;
  * candidates are visited in ascending-cid order with a strict
  * Double.compare update, so exact d2 ties keep the smallest cid and
  * NaN orders largest — the lexicographic struct-min contract.
  *
  * The bank rides the expression into the stage's task binary, which
  * Spark broadcasts once per stage — same shipping cost as the
  * broadcast join it replaces, minus the join. */
case class VecNearestCid(child: Expression, cids: Array[Long], bank: Array[Array[Double]])
    extends UnaryExpression {
  require(bank.nonEmpty && cids.length == bank.length,
    s"centroid bank mismatch: ${cids.length} ids vs ${bank.length} vectors")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  private def et: DataType = child.dataType match {
    case ArrayType(t, _) => t
    case other => throw new IllegalArgumentException(s"need array, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected array<float|double>, got $other")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val t = et
    val n = a.numElements()
    var best = Double.PositiveInfinity
    var bestCid = cids(0)
    var c = 0
    while (c < bank.length) {
      val cv = bank(c)
      val m = math.min(n, cv.length)
      var s = 0.0; var i = 0
      if (t == FloatType) {
        while (i < m) { val d = a.getFloat(i).toDouble - cv(i); s += d * d; i += 1 }
      } else {
        while (i < m) { val d = a.getDouble(i) - cv(i); s += d * d; i += 1 }
      }
      if (java.lang.Double.compare(s, best) < 0) { best = s; bestCid = cids(c) }
      c += 1
    }
    bestCid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bankRef = ctx.addReferenceObj("cidBank", bank, "double[][]")
    val cidsRef = ctx.addReferenceObj("cidIds", cids, "long[]")
    val getElem = et match {
      case FloatType => (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      case _ => (arr: String, i: String) => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, a => {
      val (n, best, bc, c, cv, m, s, d, i) =
        (ctx.freshName("n"), ctx.freshName("best"), ctx.freshName("bcid"),
         ctx.freshName("c"), ctx.freshName("cv"), ctx.freshName("m"),
         ctx.freshName("s"), ctx.freshName("d"), ctx.freshName("i"))
      s"""
       |int $n = $a.numElements();
       |double $best = Double.POSITIVE_INFINITY;
       |long $bc = $cidsRef[0];
       |for (int $c = 0; $c < $bankRef.length; $c++) {
       |  double[] $cv = $bankRef[$c];
       |  int $m = java.lang.Math.min($n, $cv.length);
       |  double $s = 0.0;
       |  for (int $i = 0; $i < $m; $i++) {
       |    double $d = ${getElem(a, i)} - $cv[$i];
       |    $s += $d * $d;
       |  }
       |  if (java.lang.Double.compare($s, $best) < 0) { $best = $s; $bc = $cidsRef[$c]; }
       |}
       |${ev.value} = $bc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fused cosine: dot, |a|², |b|² in one pass (three independent left
  * folds), result dot/sqrt(n2a*n2b) — associating exactly like
  * Vec.sqlCosine. */
case class VecCosine(left: Expression, right: Expression) extends VecBinaryKernel {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ea, eb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = get(a, i, ea); val y = get(b, i, eb)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / math.sqrt(na * nb)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (i, n) = (ctx.freshName("i"), ctx.freshName("n"))
      val (dot, na, nb) = (ctx.freshName("dot"), ctx.freshName("na"), ctx.freshName("nb"))
      val (x, y) = (ctx.freshName("x"), ctx.freshName("y"))
      s"""
       |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $x = ${jget(a, i, elemType(left))};
       |  double $y = ${jget(b, i, elemType(right))};
       |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
       |}
       |${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
