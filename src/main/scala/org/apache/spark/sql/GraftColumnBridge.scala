package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column <-> Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so graft's native
  * Catalyst expressions can be exposed as plain `Column`s without
  * requiring session-level function registration. Spark-version-coupled
  * by design; the only non-public Spark surface this library touches.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
