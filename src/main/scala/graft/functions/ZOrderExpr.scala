package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression computing the Z-order (Morton) index of two
  * non-negative coordinates: the low `bits` bits of x and y interleaved,
  * with x supplying the odd (higher) bit positions. Z-ordering is the
  * standard multi-dimensional data-layout key at lake scale — rows sorted
  * by the interleaved index land range-queries on EITHER dimension in a
  * bounded set of files, where a lexicographic (x, y) sort helps only x.
  *
  * One codegen'd shift/mask loop per row replaces the 2×`bits`
  * shift-and-test column expressions the declarative form needs (the
  * DuckDB oracle keeps that expanded form, so semantics are pinned
  * cross-engine). Inputs outside [0, 2^bits) contribute only their low
  * `bits` bits — callers bucket first.
  */
case class ZOrderExpr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  require(bits >= 1 && bits <= 32, s"bits must be in [1,32], got $bits")

  // ImplicitCast (not bare ExpectsInputTypes) so SQL callers can pass any
  // integer width — bucketed coordinates are routinely INT. Declared as
  // Seq[DataType] (covariant with the Seq[AbstractDataType] contract)
  // because AbstractDataType is private[sql].
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType

  override def nullSafeEval(x: Any, y: Any): Any = {
    val xv = x.asInstanceOf[Long]; val yv = y.asInstanceOf[Long]
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((xv >> i) & 1L) << (2 * i + 1)
      z |= ((yv >> i) & 1L) << (2 * i)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($x >> $i) & 1L) << (2 * $i + 1);
         |  $z |= (($y >> $i) & 1L) << (2 * $i);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderExpr =
    copy(left = newLeft, right = newRight)
}

object ZOrderExpr {

  /** Column wrapper: Z-order index of two long columns at `bits` bits each. */
  def zorder(x: Column, y: Column, bits: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(ZOrderExpr(expression(x), expression(y), bits))
  }

  /** SQL twin: the expanded shift/mask sum over `bits` bit positions,
    * usable verbatim in a DuckDB oracle (and in Spark SQL).
    */
  def zorderSql(x: String, y: String, bits: Int): String =
    (0 until bits).map(i =>
      s"((($x >> $i) & 1) << ${2 * i + 1}) + ((($y >> $i) & 1) << ${2 * i})")
      .mkString(" + ")
}
