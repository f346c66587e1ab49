package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into the `org.apache.spark.sql` package to convert
  * between the public Column API and catalyst Expressions — the converters
  * are `private[sql]` in Spark 4 after the Connect refactor. Standard
  * extension-library pattern; nothing else from the private surface is
  * touched. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
