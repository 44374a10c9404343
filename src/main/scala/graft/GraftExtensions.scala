package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, ExpressionInfo, Multiply, Sqrt}

import graft.functions.{DotProductExpr, HexSignMaskExpr, ImageHeaderExpr, LuhnCheckExpr, MediaHeaderExpr, NormalizeTextExpr, ZOrderExpr}

/** SparkSessionExtensions entry point — the library-deployment packaging of
  * graft's native expressions: add
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * to a cluster config and every session (including ones the library never
  * touches programmatically, e.g. Thrift/Connect users) gets the codegen'd
  * graft_* functions in SQL. The per-session `GraftFunctions.register`
  * remains for ad-hoc use; both routes register the same builders.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage, "")

  /** Clean arity error at analysis time — without this, a wrong-arity SQL
    * call dies with a bare IndexOutOfBoundsException that names neither
    * the function nor its signature.
    */
  private def arity(name: String, n: Int, exprs: Seq[Expression]): Unit =
    if (exprs.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${exprs.length}")

  /** The injectable function set (identifier, info, builder). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info(classOf[DotProductExpr], "graft_dot",
        "graft_dot(a, b) - codegen'd dot product of two array<double>"),
      (exprs: Seq[Expression]) => {
        arity("graft_dot", 2, exprs); DotProductExpr(exprs(0), exprs(1))
      }),
    (FunctionIdentifier("graft_cosine"),
      info(classOf[DotProductExpr], "graft_cosine",
        "graft_cosine(a, b) - cosine similarity via codegen'd dot products"),
      (exprs: Seq[Expression]) => {
        arity("graft_cosine", 2, exprs)
        val (a, b) = (exprs(0), exprs(1))
        Divide(
          DotProductExpr(a, b),
          Multiply(Sqrt(DotProductExpr(a, a)), Sqrt(DotProductExpr(b, b))))
      }),
    (FunctionIdentifier("graft_hex_sign_mask"),
      info(classOf[HexSignMaskExpr], "graft_hex_sign_mask",
        "graft_hex_sign_mask(h) - bitmask of hex digest chars in '0'..'7' (SimHash signs)"),
      (exprs: Seq[Expression]) => {
        arity("graft_hex_sign_mask", 1, exprs); HexSignMaskExpr(exprs(0))
      }),
    (FunctionIdentifier("graft_normalize_text"),
      info(classOf[NormalizeTextExpr], "graft_normalize_text",
        "graft_normalize_text(s) - NFC + accent strip + lowercase + whitespace collapse"),
      (exprs: Seq[Expression]) => {
        arity("graft_normalize_text", 1, exprs); NormalizeTextExpr(exprs(0))
      }),
    (FunctionIdentifier("graft_zorder"),
      info(classOf[ZOrderExpr], "graft_zorder",
        "graft_zorder(x, y) - 16-bit Z-order (Morton) interleave of two 8-bit bucketed coordinates"),
      (exprs: Seq[Expression]) => {
        arity("graft_zorder", 2, exprs); ZOrderExpr(exprs(0), exprs(1), 8)
      }),
    (FunctionIdentifier("graft_image_header"),
      info(classOf[ImageHeaderExpr], "graft_image_header",
        "graft_image_header(payload) - struct<format,width,height> parsed from PNG/JPEG/GIF container bytes; NULL if unrecognized"),
      (exprs: Seq[Expression]) => {
        arity("graft_image_header", 1, exprs); ImageHeaderExpr(exprs(0))
      }),
    (FunctionIdentifier("graft_media_header"),
      info(classOf[MediaHeaderExpr], "graft_media_header",
        "graft_media_header(payload) - struct<format,duration_ms,channels,sample_rate> parsed from WAV/MP4 container bytes; NULL if unrecognized"),
      (exprs: Seq[Expression]) => {
        arity("graft_media_header", 1, exprs); MediaHeaderExpr(exprs(0))
      }),
    (FunctionIdentifier("graft_luhn_check"),
      info(classOf[LuhnCheckExpr], "graft_luhn_check",
        "graft_luhn_check(s) - true iff s is a non-empty all-digit string with a valid Luhn (mod-10) checksum"),
      (exprs: Seq[Expression]) => {
        arity("graft_luhn_check", 1, exprs); LuhnCheckExpr(exprs(0))
      }))
}
