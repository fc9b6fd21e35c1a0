package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's `private[sql]` Column ↔ Expression conversions so
  * custom Catalyst expressions can be exposed as `Column`s from library
  * code (the classic pre-4.x `new Column(expr)` constructor is gone). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
