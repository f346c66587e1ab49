package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.GpsSeconds

/** SparkSessionExtensions entry point: registers graft's native Catalyst
  * functions with the SQL function registry (so `SELECT gps_seconds(ts)`
  * works in spark.sql as well as the Column API) and graft's optimizer
  * rules (RangeJoinRewrite: un-keyed interval joins become bucketed equi
  * joins instead of nested-loop O(n^2) plans).
  *
  * Activate with .config("spark.sql.extensions", "graft.GraftExtensions").
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("gps_seconds"),
      new ExpressionInfo(classOf[GpsSeconds].getName, "gps_seconds"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GpsSeconds(exprs.head)))
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    ext.injectOptimizerRule(_ => graft.plans.WindowTopKRewrite)
    ext.injectOptimizerRule(s => new graft.plans.BloomJoinRewrite(s))
    ext.injectPlannerStrategy(_ => graft.plans.GroupTopKStrategy)
    ext.injectCheckRule(session => graft.plans.StrictPlanChecks(session))
  }
}
