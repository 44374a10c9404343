package graft

/** Error taxonomy mirroring the reference's exception hierarchy
  * (/root/reference/etlhelper/exceptions.py:7-43): every failure surfaces as
  * an `EtlError` subtype carrying the failing SQL/context, matching the
  * reference's contract of embedding the statement in the message
  * (/root/reference/etlhelper/etl.py:100-102, :322-324).
  */
sealed abstract class EtlError(message: String, cause: Throwable = null)
    extends RuntimeException(message, cause)

final class EtlConnectionError(msg: String, cause: Throwable = null)
    extends EtlError(msg, cause)

final class EtlQueryError(msg: String, cause: Throwable = null)
    extends EtlError(msg, cause)

final class EtlDbParamsError(msg: String) extends EtlError(msg)

final class EtlExtractError(msg: String, val sql: String, cause: Throwable = null)
    extends EtlError(s"$msg\nSQL: $sql", cause)

final class EtlInsertError(msg: String, val sql: String, cause: Throwable = null)
    extends EtlError(s"$msg\nSQL: $sql", cause)

final class EtlAbortError(msg: String) extends EtlError(msg)

final class EtlBadIdentifierError(msg: String) extends EtlError(msg)

/** Identifier validation before any string-interpolated SQL — the same
  * PostgreSQL-style unicode-aware rule as the reference
  * (/root/reference/etlhelper/etl.py:642-664): letters/underscore start,
  * word characters + $ after, optional schema. prefix.
  */
object Identifiers {
  private val rule = """^[\p{L}_][\p{L}\p{N}_$]*$""".r

  def validate(identifier: String): String = {
    val parts = identifier.split("\\.", -1)
    val ok = parts.nonEmpty && parts.length <= 2 &&
      parts.forall(p => rule.pattern.matcher(p).matches())
    if (!ok)
      throw new EtlBadIdentifierError(s"'$identifier' contains invalid characters")
    identifier
  }

  def isValid(identifier: String): Boolean =
    try { validate(identifier); true } catch { case _: EtlBadIdentifierError => false }

  /** Column-name validation: like validate but WITHOUT the schema.table
    * dot allowance — a dotted column would render broken placeholders
    * (`:a.b`, `%(a.b)s`) and an unresolvable column list.
    */
  def validateColumn(identifier: String): String = {
    if (!rule.pattern.matcher(identifier).matches())
      throw new EtlBadIdentifierError(s"'$identifier' contains invalid characters")
    identifier
  }
}
