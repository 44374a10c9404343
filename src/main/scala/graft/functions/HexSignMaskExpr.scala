package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Native Catalyst expression turning a hex digest string into a sign
  * bitmask: bit b is set iff hex character b is in '0'..'7' (i.e. the
  * nibble's high bit is 0 — the "positive sign" convention of the SimHash
  * queries). Up to 64 leading characters contribute.
  *
  * This replaces 32 separate `substring(h, b+1, 1) <= '7'` projections per
  * row — each a UTF8String allocation plus a string comparison — with ONE
  * byte scan compiled into whole-stage codegen. The semantics are exactly
  * the substring formulation's, so the DuckDB oracle (which keeps the
  * substring form) still hash-matches.
  */
case class HexSignMaskExpr(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType

  private def maskOf(bytes: Array[Byte]): Long = {
    val n = math.min(bytes.length, 64)
    var mask = 0L
    var i = 0
    while (i < n) {
      val c = bytes(i)
      if (c >= '0' && c <= '7') mask |= (1L << i)
      i += 1
    }
    mask
  }

  override def nullSafeEval(h: Any): Any =
    maskOf(h.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val mask = ctx.freshName("mask")
      s"""
         |byte[] $bytes = $h.getBytes();
         |int $n = java.lang.Math.min($bytes.length, 64);
         |long $mask = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  byte $c = $bytes[$i];
         |  if ($c >= '0' && $c <= '7') $mask |= (1L << $i);
         |}
         |${ev.value} = $mask;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HexSignMaskExpr =
    copy(child = newChild)
}
