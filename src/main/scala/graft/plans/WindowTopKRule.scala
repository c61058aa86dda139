package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Rewrites the per-group top-k idiom
  *
  *   Filter(rn <= k, Window(rn = row_number() OVER
  *     (PARTITION BY p ORDER BY score [ASC|DESC], id ASC), child))
  *
  * into a bounded aggregation (TopKPairs) + posexplode + project.
  *
  * Why: WindowExec SORTS EVERY ROW of every partition (full shuffle +
  * sort + spill of the whole input) to keep k of them. The rewrite
  * keeps a k-sized pool per group with map-side partial aggregation —
  * at 100 TB that is the difference between shuffling B·Q scored pairs
  * and shuffling pools (SURVEY §5).
  *
  * Soundness gates (bails out unless ALL hold):
  * - single window expression, exactly row_number with the default
  *   UnboundedPreceding..CurrentRow row frame;
  * - order spec = (score ASC NULLS FIRST | DESC NULLS LAST, id ASC) with
  *   score of Double/Float/Integer type and id of Long/Integer type
  *   (values round-trip exactly through the double/long pool). Nullable
  *   keys are fine: the pool carries NULLs as per-slot flag bits ranked
  *   by the window's declared null ordering, and emits the NULL back —
  *   no sentinel values in the output, no ANSI cast of a sentinel;
  * - partition keys are plain attributes and the window child's output
  *   carries no other columns (nothing is lost by reconstructing rows
  *   from (part, score, id));
  * - filter is rn <= lit, rn < lit, or rn = 1.
  */
object WindowTopKRule extends Rule[LogicalPlan] {

  private def scoreTypeOk(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType | IntegerType => true
    case _ => false
  }
  private def idTypeOk(dt: DataType): Boolean = dt match {
    case LongType | IntegerType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      rewriteOrKeep(f, cond, w)
  }

  private def rewriteOrKeep(f: Filter, cond: Expression, w: Window): LogicalPlan = {
    val matched = for {
      (rnAttr, k) <- extractLimit(cond)
      alias <- w.windowExpressions match {
        case Seq(a @ Alias(_, _)) if a.exprId == rnAttr.exprId => Some(a)
        case _ => None
      }
      _ <- alias.child match {
        case WindowExpression(RowNumber(),
          WindowSpecDefinition(_, _, SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))) => Some(())
        case _ => None
      }
      (score, asc) <- w.orderSpec match {
        case Seq(SortOrder(s: AttributeReference, Ascending, NullsFirst, _),
                 SortOrder(i: AttributeReference, Ascending, _, _))
            if scoreTypeOk(s.dataType) && idTypeOk(i.dataType) => Some((s, true))
        case Seq(SortOrder(s: AttributeReference, Descending, NullsLast, _),
                 SortOrder(i: AttributeReference, Ascending, _, _))
            if scoreTypeOk(s.dataType) && idTypeOk(i.dataType) => Some((s, false))
        case _ => None
      }
      id <- w.orderSpec(1).child match { case i: AttributeReference => Some(i); case _ => None }
      idNullsFirst = w.orderSpec(1).nullOrdering == NullsFirst
      parts <- if (w.partitionSpec.forall(_.isInstanceOf[AttributeReference]))
        Some(w.partitionSpec.map(_.asInstanceOf[AttributeReference])) else None
      _ <- {
        val allowed = parts.map(_.exprId).toSet + score.exprId + id.exprId
        if (w.child.output.forall(a => allowed.contains(a.exprId))) Some(()) else None
      }
    } yield (alias, score, id, parts, asc, k, idNullsFirst)

    matched match {
      case None => f
      case Some((alias, score, id, parts, asc, k, idNullsFirst)) =>
        val scoreIn = castTo(score, DoubleType)
        val idIn = castTo(id, LongType)
        // score null ordering is pinned by the gate (NullsFirst with ASC,
        // NullsLast with DESC) = Spark's default = `asc` here
        val poolFn = TopKPairs(scoreIn, idIn, k, asc,
          scoreNullsFirst = asc, idNullsFirst = idNullsFirst)
          .toAggregateExpression()
        val poolAlias = Alias(poolFn, "graft_pool")()
        // when InferWindowGroupLimit already ran (rule registered via
        // experimental.extraOptimizations, which runs last), absorb its
        // WindowGroupLimit — the bounded aggregate subsumes it
        val aggChild = w.child match {
          case wgl: WindowGroupLimit if wgl.limit >= k => wgl.child
          case other => other
        }
        val agg = Aggregate(parts, (parts :+ poolAlias).toSeq, aggChild)

        val pairType = StructType(Seq(
          StructField("score", DoubleType, nullable = true),
          StructField("id", LongType, nullable = true)))
        val posAttr = AttributeReference("graft_pos", IntegerType, nullable = false)()
        val pairAttr = AttributeReference("graft_pair", pairType, nullable = false)()
        val gen = Generate(PosExplode(poolAlias.toAttribute),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(posAttr, pairAttr), agg)

        val projList: Seq[NamedExpression] = f.output.map { a =>
          if (a.exprId == score.exprId)
            Alias(Cast(GetStructField(pairAttr, 0, Some("score")), score.dataType), score.name)(exprId = score.exprId)
          else if (a.exprId == id.exprId)
            Alias(Cast(GetStructField(pairAttr, 1, Some("id")), id.dataType), id.name)(exprId = id.exprId)
          else if (a.exprId == alias.exprId)
            Alias(Add(posAttr, Literal(1)), alias.name)(exprId = alias.exprId)
          else a
        }
        Project(projList, gen)
    }
  }

  /** null-preserving widen to the pool's primitive type. */
  private def castTo(a: AttributeReference, target: DataType): Expression =
    if (a.dataType == target) a else Cast(a, target)

  /** Filter forms: rn <= k | rn < k | rn = 1. */
  private def extractLimit(cond: Expression): Option[(AttributeReference, Int)] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType)) if k >= 1 => Some((a, k))
    case LessThan(a: AttributeReference, Literal(k: Int, IntegerType)) if k >= 2 => Some((a, k - 1))
    case EqualTo(a: AttributeReference, Literal(1, IntegerType)) => Some((a, 1))
    case _ => None
  }
}
