package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Count
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Standard-SQL semantics for grouping-set aggregates over EMPTY input
  * (round-15 differential-fuzzer finding, FUZZ_r15_sf01 f0068/f0137).
  *
  * SQL:2011 defines `GROUP BY GROUPING SETS (..., ())` as the UNION ALL
  * of the per-set aggregations, and a `GROUP BY ()` (grand total) over an
  * empty input yields ONE row — the aggregate functions' empty-input
  * values (MIN/MAX/SUM -> NULL, COUNT -> 0). DuckDB and PostgreSQL both
  * return that row; Spark's lowering (Expand replicates input rows per
  * grouping set, then groups by (cols..., spark_grouping_id)) produces
  * ZERO groups from zero rows, silently dropping every ()-set row. A
  * rollup/cube dashboard over a filtered-to-empty slice loses its total
  * line — the exact class a fixed-catalog test suite never hits, found
  * by the seeded fuzzer on its second sweep.
  *
  * Rewrite (post-hoc resolution, once per analysis): for each aggregate
  * over a grouping-set Expand whose projections contain k >= 1 empty
  * sets, emit
  *
  *   Union(agg, fallback_1, ..., fallback_k)
  *   fallback_i = Project(Filter(cnt == 0,
  *     Aggregate(Nil, substituted aggExprs :+ count(1) AS cnt, child)))
  *
  * where the substitution maps every grouping attribute to a NULL
  * literal and the grouping-id attribute to the i-th empty set's mask
  * literal (so `grouping()`/`grouping_id()` projections fold to the
  * right constants). When the input is non-empty the fallback filters
  * itself out (cnt > 0) and the plan behaves exactly as before; when it
  * is empty, the fallback contributes the standard grand-total row(s).
  * The cost is one extra global aggregate over the input subtree —
  * map-side-combined to a single row per partition — paid only by
  * queries that actually use rollup/cube/grouping-sets with a () set.
  *
  * Guards: streaming aggregates are skipped (a Union of a streaming agg
  * with a filtered global agg is not a supported streaming plan);
  * `spark.graft.standardEmptyGroupingSets=false` restores Spark's
  * native behavior; a marker-alias re-entrancy check keeps the rewrite
  * idempotent if the batch ever re-runs.
  */
object EmptyGroupingSetsRewrite extends Rule[LogicalPlan] {

  private val Marker = "__graft_empty_gs_cnt"
  private val GidName = "spark_grouping_id"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (SQLConf.get.getConfString(
        "spark.graft.standardEmptyGroupingSets", "true") != "true") return plan
    val alreadyApplied = plan.exists {
      case Aggregate(_, as, _, _) =>
        as.exists { case a: Alias => a.name == Marker; case _ => false }
      case _ => false
    }
    if (alreadyApplied) return plan
    plan.transformUp {
      case agg @ Aggregate(gExprs, _, expand: Expand, _)
          if gExprs.nonEmpty && !agg.isStreaming =>
        rewrite(agg, expand).getOrElse(agg)
    }
  }

  private def rewrite(agg: Aggregate, expand: Expand): Option[LogicalPlan] = {
    // only the analyzer-lowered grouping-sets shape: every grouping
    // expression is an attribute and one of them is the grouping id
    val gAttrs = agg.groupingExpressions.collect { case a: AttributeReference => a }
    if (gAttrs.size != agg.groupingExpressions.size) return None
    val gid = gAttrs.find(_.name == GidName).getOrElse(return None)
    val groupCols = gAttrs.filterNot(_.exprId == gid.exprId)
    if (groupCols.isEmpty) return None
    val out = expand.output
    val gidPos = out.indexWhere(_.exprId == gid.exprId)
    val colPos = groupCols.map(c => out.indexWhere(_.exprId == c.exprId))
    if (gidPos < 0 || colPos.exists(_ < 0)) return None
    // the ()-set replicas: a null literal at EVERY grouping position
    // (null-ness, not mask arithmetic, so the detection is convention-free)
    val emptySets = expand.projections.filter { p =>
      colPos.forall(i => p(i) match {
        case Literal(null, _) => true
        case _ => false
      })
    }
    if (emptySets.isEmpty) return None
    val child = expand.child
    val fallbacks: Seq[LogicalPlan] = emptySets.map { p =>
      val subst: Map[ExprId, Expression] =
        (groupCols.map(c =>
          c.exprId -> (Literal.create(null, c.dataType): Expression)) :+
          (gid.exprId -> p(gidPos))).toMap
      val fbExprs: Seq[NamedExpression] = agg.aggregateExpressions.map { ne =>
        val substituted = ne.transform {
          case a: AttributeReference if subst.contains(a.exprId) => subst(a.exprId)
        }
        val core = substituted match {
          case al: Alias => al.child
          case other => other
        }
        Alias(core, ne.name)()
      }
      val cnt = Alias(Count(Literal(1)).toAggregateExpression(), Marker)()
      val fbAgg = Aggregate(Nil, fbExprs :+ cnt, child)
      val guarded = Filter(EqualTo(cnt.toAttribute, Literal(0L)), fbAgg)
      Project(fbExprs.map(_.toAttribute), guarded)
    }
    Some(Union(agg +: fallbacks))
  }
}
