package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Luhn (mod-10) validity of a digit string —
  * the checksum every real payment-card number satisfies, and therefore the
  * filter that separates card-shaped digit runs from actual card numbers in
  * a PII sweep. Pattern matching alone ([0-9]{16}) flags any 16-digit id;
  * the Luhn gate keeps false positives out of the governance report.
  *
  * Semantics: NULL in, NULL out; empty string or any non-ASCII-digit
  * character → false (a candidate that is not purely digits is not a card
  * number); otherwise true iff the doubled-alternate digit sum ≡ 0 mod 10.
  *
  * One codegen'd byte loop per candidate (digits are ASCII, so the UTF-8
  * bytes are scanned directly — no decode, no allocation), keeping the
  * whole PII audit inside whole-stage codegen. Used per-element under
  * `filter(cards, x => luhn(x))`, where it runs once per extracted
  * candidate, not per row.
  */
case class LuhnCheckExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].getBytes
    if (b.isEmpty) return false
    var sum = 0
    var alt = false
    var i = b.length - 1
    while (i >= 0) {
      var d = b(i) - '0'
      if (d < 0 || d > 9) return false
      if (alt) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      alt = !alt
      i -= 1
    }
    sum % 10 == 0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("b")
      val sum = ctx.freshName("sum")
      val alt = ctx.freshName("alt")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val bad = ctx.freshName("bad")
      s"""
         |byte[] $b = $c.getBytes();
         |int $sum = 0; boolean $alt = false; boolean $bad = ($b.length == 0);
         |for (int $i = $b.length - 1; $i >= 0 && !$bad; $i--) {
         |  int $d = $b[$i] - '0';
         |  if ($d < 0 || $d > 9) { $bad = true; break; }
         |  if ($alt) { $d *= 2; if ($d > 9) $d -= 9; }
         |  $sum += $d; $alt = !$alt;
         |}
         |${ev.value} = !$bad && ($sum % 10 == 0);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LuhnCheckExpr =
    copy(child = newChild)
}
