package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers for the DuckDB-oracle differential harness.
  *
  * The driver hash-compares Spark results against DuckDB running the same
  * ANSI SQL. Double-precision aggregation is order-dependent, and Spark's
  * partial/final aggregation order differs from DuckDB's, so every SUM/AVG
  * over a double column goes through an exact decimal representation first
  * (the testdata's doubles carry <= 4 decimal digits), then back to double.
  * Decimal addition is associative/commutative => bit-identical results on
  * both engines regardless of partitioning. This costs nothing at scale:
  * decimal sums still use partial aggregation (map-side combine) and stay
  * inside whole-stage codegen.
  */
object Exact {
  /** Exact fixed-point view of a <=4-decimal-digit double column. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Order-insensitive exact sum of a double column, emitted as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Order-insensitive exact average of a double column, emitted as double. */
  def davg(c: Column): Column = sum(dec(c)).cast("double") / count(lit(1))

  /** SQL fragments for the DuckDB twin of the above. */
  def sqlDec(col: String): String = s"CAST($col AS DECIMAL(18,4))"
  def sqlDsum(col: String): String = s"CAST(SUM(${sqlDec(col)}) AS DOUBLE)"
  def sqlDavg(col: String): String =
    s"(CAST(SUM(${sqlDec(col)}) AS DOUBLE) / COUNT(*))"
}
