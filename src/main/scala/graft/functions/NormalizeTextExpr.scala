package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, StringType}

/** Unicode text canonicalization for corpus cleaning, done in one pass:
  * NFC-compose, strip combining diacritics (NFD + drop marks), lowercase,
  * collapse every whitespace run to a single ASCII space, trim. This is the
  * standard pre-dedup normalization a training pipeline applies so that
  * "Café  Rená" and "cafe rena" share fingerprints.
  *
  * Implemented as a native Catalyst expression (not a UDF) so it stays
  * inside whole-stage codegen: the generated code makes one static call per
  * row with no closure, no serialization, and no Row boxing. ASCII input
  * (the common case by far at corpus scale) takes a fast path that never
  * allocates the Normalizer's intermediate buffers.
  */
case class NormalizeTextExpr(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    TextNormalizer.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextNormalizer.normalize($s);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeTextExpr =
    copy(child = newChild)
}

/** The scalar kernel behind [[NormalizeTextExpr]]. A top-level object with
  * no companion class, so Scala emits static forwarders that janino-generated
  * code can call directly.
  */
object TextNormalizer {
  import java.text.Normalizer

  /** Supported input class (where kernel and the q88 oracle provably
    * agree): text whose whitespace is ASCII [\t\n\f\r ] or Unicode
    * SPACE_SEPARATOR, whose cased letters lowercase without locale/context
    * rules (no Greek final sigma, no Turkish dotted-I), and whose
    * combining marks are in the BMP. Outside that class the kernel and the
    * DuckDB oracle's RE2 \s + utf8proc lower() may diverge: Java
    * Character.isWhitespace also collapses \x0B and \x1C-\x1F (RE2 \s
    * does not), per-char toLowerCase maps final sigma context-free, and
    * per-char getType misses supplementary-plane marks in surrogate
    * pairs. The corpus generator emits only the supported class; q88's
    * oracle comment documents the same assumption.
    */
  def normalize(u: UTF8String): UTF8String = {
    val bytes = u.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) { if (bytes(i) < 0) ascii = false; i += 1 }
    if (ascii) UTF8String.fromString(collapse(lowerAscii(bytes)))
    else {
      val decomposed = Normalizer.normalize(u.toString, Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(decomposed.length)
      var j = 0
      while (j < decomposed.length) {
        val c = decomposed.charAt(j)
        if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
        j += 1
      }
      val composed = Normalizer.normalize(sb, Normalizer.Form.NFC)
      UTF8String.fromString(collapse(composed.toLowerCase(java.util.Locale.ROOT)))
    }
  }

  private def lowerAscii(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      out(i) = if (b >= 'A' && b <= 'Z') (b + 32).toChar else b.toChar
      i += 1
    }
    new String(out)
  }

  /** Collapse whitespace runs to one space; trim leading/trailing runs. */
  private def collapse(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) { if (sb.length > 0) pendingSpace = true }
      else { if (pendingSpace) { sb.append(' '); pendingSpace = false }; sb.append(c) }
      i += 1
    }
    sb.toString
  }
}
