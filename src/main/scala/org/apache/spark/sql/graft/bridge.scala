package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into the `org.apache.spark.sql` package to convert
  * between the public Column API and catalyst Expressions — the converters
  * are `private[sql]` in Spark 4 after the Connect refactor — and to wrap
  * a custom LogicalPlan node back into a DataFrame (`ofRows`). Standard
  * extension-library pattern; nothing else from the private surface is
  * touched. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager ColumnNode -> catalyst conversion. `expression` returns a LAZY
    * ColumnNodeExpression wrapper that only standard operators unwrap
    * during their own analysis; inside a CUSTOM logical node the wrapper
    * would survive to execution and fail codegen. This converts up front,
    * yielding plain (possibly Unresolved*) catalyst expressions the
    * analyzer resolves generically in any node. */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Register a SQL function on an EXISTING session's registry — what
    * `SparkSessionExtensions.injectFunction` does at session build, made
    * available post-hoc so test suites can install GraftExtensions'
    * function list on the shared test session. */
  def registerSqlFunction(spark: SparkSession,
      fn: (org.apache.spark.sql.catalyst.FunctionIdentifier,
           org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
           Seq[Expression] => Expression)): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(fn._1, fn._2, fn._3)
}
