package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Window}

/** Engine-level plan invariant checks, injected through
  * `SparkSessionExtensions.injectCheckRule` (SURVEY §4's check-rule tier):
  * run after analysis on every query, BEFORE any execution starts — the
  * place to stop known at-scale footguns while they are still cheap.
  *
  * Opt-in via `spark.graft.strictPlans=true` (runtime conf, default off):
  * a global default would also reject deliberately tiny global windows
  * and broadcast-small products, which are legitimate (e.g. ranking 16
  * centroid seeds, a 1-row totals cross join).
  *
  * Current invariants:
  *  - no unpartitioned window: `Window.partitionBy()` with an empty
  *    partition spec moves EVERY row to one task — the single most common
  *    silent killer of an otherwise-distributed plan at 100 TB;
  *  - no condition-less inner/cross join: an accidental `df.join(other)`
  *    is |l|x|r| rows — the other fatal-at-scale shape that is silent on
  *    test-sized inputs.
  */
object StrictPlanChecks {
  val Flag = "spark.graft.strictPlans"

  def apply(spark: SparkSession)(plan: LogicalPlan): Unit =
    if (spark.conf.getOption(Flag).exists(_.toBoolean)) {
      plan.foreach {
        case w: Window if w.partitionSpec.isEmpty =>
          throw new IllegalStateException(
            "graft strict plan check: window with empty PARTITION BY moves " +
              "all rows to a single task (set a partition key, or disable " +
              s"$Flag for deliberately-small inputs); window exprs: " +
              w.windowExpressions.map(_.sql).mkString(", "))
        case j @ Join(_, _, Inner | Cross, None, _) =>
          throw new IllegalStateException(
            "graft strict plan check: join without a condition is a " +
              "|left| x |right| cartesian product (add a join condition, " +
              s"or disable $Flag for deliberately-tiny sides); " +
              s"outputs: ${j.left.output.map(_.name).mkString(",")} x " +
              j.right.output.map(_.name).mkString(","))
        case _ => ()
      }
    }
}
