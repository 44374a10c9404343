package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}

/** SQL-facing registration of graft's native expressions, so `spark.sql`
  * users get the same codegen'd operators as the Column API:
  *
  *   GraftFunctions.register(spark)
  *   spark.sql("SELECT graft_dot(a.v, b.v) FROM ...")
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit =
    graft.GraftExtensions.functions.foreach { case (id, _, builder) =>
      GraftColumnBridge.registerFunction(spark, id.funcName, builder)
    }

  /** Column-API twins (same expressions, no registration needed). */
  def graftDot(a: Column, b: Column): Column = VectorFunctions.dot(a, b)
  def graftCosine(a: Column, b: Column): Column = VectorFunctions.cosine(a, b)
  def graftImageHeader(payload: Column): Column =
    GraftColumnBridge.column(
      ImageHeaderExpr(GraftColumnBridge.expression(payload)))
  def graftMediaHeader(payload: Column): Column =
    GraftColumnBridge.column(
      MediaHeaderExpr(GraftColumnBridge.expression(payload)))
  def graftLuhnCheck(digits: Column): Column =
    GraftColumnBridge.column(
      LuhnCheckExpr(GraftColumnBridge.expression(digits)))
}
