package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: accelerates the universal top-k-per-group idiom
  *
  *   SELECT ... FROM (
  *     SELECT *, row_number() OVER (PARTITION BY g ORDER BY o) AS rn
  *     FROM t) WHERE rn <= k
  *
  * by slipping a [[GroupTopK]] node UNDER the window. The original plan
  * shuffles the entire input and fully sorts every group before the
  * filter discards all but k rows; with the rewrite, GroupTopK's partial
  * phase k-bounds every map partition with per-group heaps, the exchange
  * carries O(partitions x groups x k) rows, and the untouched
  * window+filter above merely re-derive `rn` over k rows per group —
  * output columns and rows are bit-identical by construction, so the
  * rewrite needs NO knowledge of what sits above the filter.
  *
  * Like RangeJoinRewrite this is injected via graft.GraftExtensions, so
  * spark.sql text and DataFrame code (topKPerGroup, dedupFirst, e02's
  * LOCF resample) all hit the fast path with no API change.
  *
  * Scope guards:
  *  - the Window must compute EXACTLY ONE expression: a row_number()
  *    (rank/dense_rank admit >k rows under ties; any other window
  *    function needs the full partition);
  *  - some conjunct of the filter must upper-bound that row number by a
  *    foldable integer k (rn <= k, rn < k+1, rn = 1, k on either side);
  *    the WHOLE condition stays as a residual, so extra conjuncts are
  *    fine;
  *  - ordered window (row_number without ORDER BY is degenerate);
  *  - k <= 65536: the per-group heap state is k rows per group per task,
  *    and beyond that the sort-based window is the better plan anyway;
  *  - reentrance: skip when the window already sits on a GroupTopK of
  *    the same spec (this rule runs inside a fixed-point batch).
  *
  * Pruning caveat: GroupTopK outputs its child's full schema (the window
  * above needs it), and ColumnPruning does not see through custom nodes —
  * so the rewrite relies on the window's child already being projected to
  * the needed columns, which both the DataFrame idiom (select before
  * window) and SQL subqueries provide; PlanQualitySpec pins q14's pruned
  * ReadSchema with the rewrite active.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val maxK = 65536L

  /** The upper bound on `rn` implied by one conjunct, if any. */
  private def boundOf(conjunct: Expression, rn: Attribute): Option[Long] = {
    def lit(e: Expression): Option[Long] = e match {
      case Literal(v: Int, _) => Some(v.toLong)
      case Literal(v: Long, _) => Some(v)
      case Literal(v: Short, _) => Some(v.toLong)
      case _ => None
    }
    conjunct match {
      case LessThanOrEqual(a: Attribute, l) if a.semanticEquals(rn) => lit(l)
      case LessThan(a: Attribute, l) if a.semanticEquals(rn) => lit(l).map(_ - 1)
      case GreaterThanOrEqual(l, a: Attribute) if a.semanticEquals(rn) => lit(l)
      case GreaterThan(l, a: Attribute) if a.semanticEquals(rn) => lit(l).map(_ - 1)
      case EqualTo(a: Attribute, l) if a.semanticEquals(rn) => lit(l)
      case EqualTo(l, a: Attribute) if a.semanticEquals(rn) => lit(l)
      case _ => None
    }
  }

  private def isRowNumberWindow(e: NamedExpression): Option[Attribute] = e match {
    case a @ Alias(WindowExpression(RowNumber(),
        WindowSpecDefinition(_, _, SpecifiedWindowFrame(RowFrame,
          UnboundedPreceding, CurrentRow))), _) =>
      Some(a.toAttribute)
    case _ => None
  }

  /** Same rewrite already applied? (fixed-point batch reentrance guard) */
  private def alreadyRewritten(w: Window): Boolean = w.child match {
    case g: GroupTopK =>
      g.groupExprs.length == w.partitionSpec.length &&
        g.groupExprs.zip(w.partitionSpec).forall { case (a, b) => a.semanticEquals(b) } &&
        g.sortOrder.length == w.orderSpec.length &&
        g.sortOrder.zip(w.orderSpec).forall { case (a, b) => a.semanticEquals(b) }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window)
        if w.windowExpressions.length == 1 && w.orderSpec.nonEmpty &&
          !alreadyRewritten(w) =>
      isRowNumberWindow(w.windowExpressions.head) match {
        case Some(rn) =>
          val ks = splitConjunctivePredicates(cond).flatMap(boundOf(_, rn))
          ks.filter(k => k > 0 && k <= maxK).minOption match {
            case Some(k) =>
              val topk = GroupTopK(w.partitionSpec, w.orderSpec, k.toInt, w.child)
              f.copy(child = w.withNewChildren(Seq(topk)).asInstanceOf[Window])
            case None => f
          }
        case None => f
      }
  }
}
