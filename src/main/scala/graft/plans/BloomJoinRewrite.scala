package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.Bridge

/** Optimizer rule: injects [[graft.operators.Layout.bloomPrefilter]] into
  * inner equi joins the size heuristic marks as fact-x-dim — the probe
  * (big) side is pre-filtered by a Bloom filter of the build (small)
  * side's join keys BEFORE the real join, so at 100 TB the fact table's
  * shuffle carries |matches| + ε rows instead of the whole table. The
  * real join still runs and keeps only true matches: a Bloom false
  * positive costs a wasted row, never a wrong one, and a Bloom filter has
  * no false negatives, so results are exactly the un-rewritten join's
  * (the q65-certified membership arithmetic, md5-portable).
  *
  * This is the graft-native twin of Spark's `InjectRuntimeFilter`: same
  * plan shape (the build subtree is duplicated into a pre-aggregated
  * filter on the probe side), but the filter arithmetic is engine-
  * replayable, which is what lets the oracle certify a rewritten plan's
  * result bit-for-bit.
  *
  * Opt-in via `spark.graft.bloomJoin=true` (runtime conf, default off —
  * injecting joins by default would reshape every pinned query plan).
  * Heuristic gates, all runtime confs:
  *  - build side's estimated size <= `spark.graft.bloomJoin.maxBuildBytes`
  *    (default 64 MB — the filter build must be cheap and broadcastable);
  *  - probe side at least `spark.graft.bloomJoin.sizeRatio` (default 4x)
  *    larger than the build side — symmetric sides gain nothing;
  *  - inner joins only: pruning the preserved side of an outer join drops
  *    rows the join must keep, and the probe side of a semi/anti join is
  *    already minimal.
  *
  * Reentrance: the injected subplan carries `__graft_bloom_*` columns in
  * its internal projections; any join whose subtree shows the marker is
  * skipped (conservative: one bloom per join chain per side, which also
  * keeps the fixpoint batch convergent).
  */
class BloomJoinRewrite(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {
  import BloomJoinRewrite._

  private def conf(key: String, dflt: String): String =
    session.conf.getOption(key).getOrElse(dflt)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf(Flag, "false").toBoolean) plan
    else {
      val ratio = BigInt(conf(RatioKey, "4").toLong)
      val maxBuild = BigInt(conf(MaxBuildKey, (64L << 20).toString).toLong)
      val mBits = conf(MBitsKey, "1048576").toInt
      plan.transform {
        case j @ Join(left, right, Inner, Some(cond), _)
            if cond.deterministic && !hasMarker(j) =>
          val equis = splitConjunctivePredicates(cond).collect {
            case EqualTo(a, b)
                if a.references.subsetOf(left.outputSet) &&
                  b.references.subsetOf(right.outputSet) => (a, b)
            case EqualTo(a, b)
                if b.references.subsetOf(left.outputSet) &&
                  a.references.subsetOf(right.outputSet) => (b, a)
          }
          equis.headOption.map { case (lk, rk) =>
            val (ls, rs) = (left.stats.sizeInBytes, right.stats.sizeInBytes)
            if (rs <= maxBuild && ls >= rs * ratio)
              j.copy(left = prefiltered(left, lk, right, rk, mBits))
            else if (ls <= maxBuild && rs >= ls * ratio)
              j.copy(right = prefiltered(right, rk, left, lk, mBits))
            else j
          }.getOrElse(j)
      }
    }

  /** Subtree-wide marker scan (collectFirst, cheap: name prefix test per
    * node output) — sees the internal projections bloomPrefilter builds. */
  private def hasMarker(p: LogicalPlan): Boolean =
    p.collectFirst {
      case n if n.output.exists(_.name.startsWith(Marker)) => n
    }.isDefined

  /** The probe side with the Bloom membership filter applied, built with
    * the public operator through the analyzer (Bridge.ofRows) so rule and
    * operator can never drift apart — q65 certifies this exact plan. */
  private def prefiltered(probe: LogicalPlan, probeKey: Expression,
                          build: LogicalPlan, buildKey: Expression,
                          mBits: Int): LogicalPlan = {
    val analyzed = graft.operators.Layout.bloomPrefilter(
        Bridge.ofRows(session, probe), Bridge.column(probeKey),
        Bridge.ofRows(session, build), Bridge.column(buildKey),
        mBits = mBits)
      .drop("bloom_pass")
      .queryExecution.analyzed
    // the operator's broadcast() hint is still a ResolvedHint node; the
    // optimizer's hint-elimination batch ran BEFORE this rule, so fold it
    // into the word-join's JoinHint ourselves or physical planning fails
    org.apache.spark.sql.catalyst.optimizer.EliminateResolvedHint(analyzed)
  }
}

object BloomJoinRewrite {
  val Flag = "spark.graft.bloomJoin"
  val RatioKey = "spark.graft.bloomJoin.sizeRatio"
  val MaxBuildKey = "spark.graft.bloomJoin.maxBuildBytes"
  val MBitsKey = "spark.graft.bloomJoin.mBits"
  private[graft] val Marker = "__graft_bloom"
}
