package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's package-private Column <-> Expression conversions
  * (org.apache.spark.sql.classic.ExpressionUtils) so graft can build Column
  * wrappers around its native Catalyst expressions under Spark 4's
  * Connect-compatible Column API.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
