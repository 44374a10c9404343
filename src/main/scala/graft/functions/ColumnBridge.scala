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

  /** Register a Catalyst expression builder as a SQL-callable function on
    * this session (FunctionRegistry is package-private in Spark 4).
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Drive a SparkSessionExtensions' injected functions into a live
    * session's registry — what session construction does when
    * `spark.sql.extensions` is set (`registerFunctions` is private[sql]).
    */
  def applyExtensionFunctions(ext: SparkSessionExtensions, spark: SparkSession): Unit =
    ext.registerFunctions(
      spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry)
}
