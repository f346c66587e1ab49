package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}

/** Optimizer rule: turns an un-keyed interval ("range") join
  *
  *   SELECT ... FROM l JOIN r
  *     ON  r.ts >  l.ts            -- or >=
  *     AND r.ts <= l.ts + W        -- or <, interval or numeric W
  *
  * into a bucketed equi join. Without an equi-join key Spark can only plan
  * this as a BroadcastNestedLoopJoin / CartesianProduct — O(|l|x|r|)
  * comparisons, the first thing that dies at scale. The rewrite assigns
  * every row the time bucket `floor(ts / W)`, explodes the right side into
  * its own and the previous bucket, and equi-joins on the bucket: each left
  * row then meets only rows within one window-width of it, and the original
  * predicates remain as a cheap residual filter. This is the standard
  * interval-join binning strategy (cf. the overlap-join rewrites in
  * vectorized engines); here it is a `Rule[LogicalPlan]` injected through
  * `SparkSessionExtensions` (graft.GraftExtensions), so it applies to ANY
  * user query — spark.sql text or DataFrame code — not just callers of
  * RelationalOps.rangeJoinBucketed.
  *
  * Scope guards (correctness first):
  *  - inner joins only, with no equi conjunct (if one exists the hash join
  *    already bounds the match space; rewriting would only add overhead);
  *  - `ts` sides must be bare attributes (or casts of attributes) so bucket
  *    expressions are cheap and deterministic;
  *  - W must be a positive foldable literal: numeric (seconds) or a
  *    day-time interval of whole seconds.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** (rightTs, leftTs, windowSeconds) for `r.ts <= l.ts + W` shapes. */
  private case class RangeBound(rts: Expression, lts: Expression, wSec: Long)

  private def sameAttr(a: Expression, b: Expression): Boolean =
    (stripCast(a), stripCast(b)) match {
      case (x: Attribute, y: Attribute) => x.semanticEquals(y)
      case _ => false
    }

  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, _, _, _) => stripCast(c)
    case other => other
  }

  private def attrOf(e: Expression): Option[Attribute] = stripCast(e) match {
    case a: Attribute => Some(a)
    case _ => None
  }

  /** Window width in whole seconds from `l.ts + W`'s addend. */
  private def windowSeconds(e: Expression): Option[(Expression, Long)] = e match {
    // timestamp + INTERVAL '...' resolves to TimestampAddInterval with a
    // DayTimeIntervalType literal holding microseconds
    case TimestampAddInterval(ts, Literal(micros: Long, _: DayTimeIntervalType), _)
        if micros > 0 && micros % 1000000L == 0 =>
      Some((ts, micros / 1000000L))
    case Add(ts, Literal(v, LongType | IntegerType | ShortType), _) =>
      val w = v.toString.toLong
      if (w > 0) Some((ts, w)) else None
    case _ => None
  }

  /** Match one conjunct as the upper range bound r.ts <= l.ts + W. */
  private def upperBound(c: Expression): Option[RangeBound] = c match {
    case LessThanOrEqual(r, add) =>
      windowSeconds(add).map { case (l, w) => RangeBound(r, l, w) }
    case LessThan(r, add) =>
      windowSeconds(add).map { case (l, w) => RangeBound(r, l, w) }
    case GreaterThanOrEqual(add, r) =>
      windowSeconds(add).map { case (l, w) => RangeBound(r, l, w) }
    case GreaterThan(add, r) =>
      windowSeconds(add).map { case (l, w) => RangeBound(r, l, w) }
    case _ => None
  }

  /** Match one conjunct as the lower bound r.ts > l.ts (or >=). */
  private def lowerBound(c: Expression): Option[(Expression, Expression)] = c match {
    case GreaterThan(r, l) => Some((r, l))
    case GreaterThanOrEqual(r, l) => Some((r, l))
    case LessThan(l, r) => Some((r, l))
    case LessThanOrEqual(l, r) => Some((r, l))
    case _ => None
  }

  /** Epoch-seconds bucket id of a timestamp/numeric expression. Callers
    * must pass the bound expression AS WRITTEN in the predicate (coercion
    * casts included), so the bucketed number line is exactly the one the
    * residual predicate compares on. Shared with
    * RelationalOps.rangeJoinBucketed via [[bucketOf]]. */
  private[graft] def bucketOf(ts: Expression, w: Long): Expression = {
    val asLong = ts.dataType match {
      case TimestampType => Cast(ts, LongType) // timestamp->long = epoch seconds
      // Pure-NTZ predicates compare on the LOCAL-time number line, so the
      // bucket must be computed on that same line. Casting through the
      // SESSION zone is only difference-preserving for fixed-offset zones —
      // across a DST fall-back two NTZ values 8s apart land ~3608s apart in
      // epoch seconds, >1 bucket, silently dropping matches. A fixed UTC
      // zone makes NTZ->TIMESTAMP exactly the local number line for every
      // session zone. (A zoneless NTZ->TZ Cast would be unresolved, which
      // is why the zone is pinned explicitly.)
      case TimestampNTZType =>
        Cast(Cast(ts, TimestampType, Some("UTC")), LongType)
      case LongType => ts
      case _ => Cast(ts, LongType)
    }
    // FLOOR division, not bare IntegralDivide: truncation-toward-zero is
    // still monotone with bucket width >= w (so correct), but it creates
    // one double-width bucket straddling zero — for pre-1970 epochs that
    // bucket matches ~2x the rows it needs to. (x - pmod(x, w)) / w
    // floors for any sign, keeping every bucket exactly w wide.
    IntegralDivide(Subtract(asLong, Pmod(asLong, Literal(w))), Literal(w))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        // reentrance guard: a side that already carries a bucket column is
        // our own rewrite output — never rebucket it (idempotence under
        // fixpoint batches and transformDown recursion)
        if !(left.output.iterator ++ right.output.iterator)
          .exists(_.name.startsWith("__graft_lb")) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) =>
          (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
            (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
        case _ => false
      }
      val rewritten = if (hasEqui) None else {
        val bounds = for {
          ub <- conjuncts.flatMap(upperBound).headOption
          rAttr <- attrOf(ub.rts)
          lAttr <- attrOf(ub.lts)
          if rAttr.references.subsetOf(right.outputSet) &&
            lAttr.references.subsetOf(left.outputSet)
          // a matching lower bound on the same pair of columns
          if conjuncts.flatMap(lowerBound).exists { case (r2, l2) =>
            sameAttr(r2, ub.rts) && sameAttr(l2, ub.lts)
          }
        } yield ub
        bounds.map { ub =>
          val w = ub.wSec
          val lb = AttributeReference("__graft_lb", LongType, nullable = true)()
          val rb = AttributeReference("__graft_rb", LongType, nullable = true)()
          // bucket the bound EXPRESSIONS as written (coercion casts and
          // all), not the stripped attributes: for mixed TZ/NTZ predicates
          // the comparison happens after coercion, and bucketing anything
          // else would bucket a different number line than the predicate
          val newLeft = Project(left.output :+ Alias(bucketOf(ub.lts, w), lb.name)(lb.exprId), left)
          val rBucketed = Project(right.output :+ Alias(bucketOf(ub.rts, w), rb.name)(rb.exprId), right)
          // right rows land in their own bucket and the previous one, so a
          // left bucket always holds every right row within (lts, lts + W]
          val gen = Generate(
            Explode(CreateArray(Seq(rb, Subtract(rb, Literal(1L))))),
            unrequiredChildIndex = Seq(right.output.size), // rb only feeds the generator
            outer = false,
            qualifier = None,
            generatorOutput = Seq(lb.newInstance().withName("__graft_lb_r")),
            child = rBucketed)
          val rbOut = gen.generatorOutput.head
          val newCond = (EqualTo(lb, rbOut) +: conjuncts).reduce(And)
          Project(j.output,
            Join(newLeft, gen, Inner, Some(newCond), hint))
        }
      }
      rewritten.getOrElse(j)
  }
}
