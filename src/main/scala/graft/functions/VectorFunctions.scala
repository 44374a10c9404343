package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `array<float>` columns, built from
  * codegen'd higher-order functions (zip_with/aggregate) — no UDFs, no
  * per-row JVM object churn beyond the array itself.
  *
  * Determinism: dot products are sequential left folds over doubles
  * (element order), which is bit-identical to DuckDB's list_dot_product —
  * verified empirically — so cosine scores hash-match the oracle without
  * rounding. Bucketing for LSH uses exact integer arithmetic (quantized
  * components) so bucket assignment can never flip on a ulp.
  */
object VectorFunctions {

  /** Cast an array<float> embedding to array<double> (exact widening). */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential-fold dot product of two array<double> columns, as a native
    * codegen'd expression (see DotProductExpr — bit-identical to the
    * aggregate(zip_with(...)) fold but compiled to a primitive loop).
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(DotProductExpr(expression(a), expression(b)))
  }

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity; formula written identically in the SQL oracle
    * (dot / (sqrt(dot_aa) * sqrt(dot_bb))) for bit-exact agreement.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact integer quantization of one component: round(v[i] * 1e6) as a
    * bigint via floor(x+0.5) — deterministic on every engine.
    */
  private def quant(v: Column, i: Column): Column =
    floor(element_at(v, i) * lit(1000000.0) + lit(0.5)).cast("long")

  /** Pseudo-random sign for (plane, dim) derived from md5 — the engine-
    * portable stand-in for a random hyperplane: first hex char in [0-7]
    * is +1, else -1 (a fair coin per coordinate).
    */
  private def planeSign(plane: Int, i: Column): Column =
    when(substring(md5(concat(lit(s"$plane:"), i.cast("string"))), 1, 1) <= "7",
      lit(1L)).otherwise(lit(-1L))

  /** Signed projection of the quantized vector onto pseudo-random plane p —
    * an exact integer, so the sign (the LSH bit) is engine-independent.
    */
  def signProjection(v: Column, plane: Int, dims: Int): Column =
    aggregate(
      sequence(lit(1), lit(dims)),
      lit(0L),
      (acc, i) => acc + planeSign(plane, i) * quant(v, i))

  /** Random-hyperplane LSH bucket id from `planes` sign bits. Vectors with
    * high cosine similarity land in the same bucket with high probability;
    * bucket count 2^planes bounds the per-bucket candidate set at scale.
    *
    * `table` selects an independent hyperplane set (plane ids
    * table·planes … table·planes+planes−1): the OR-amplification
    * primitive — L tables give per-pair hit probability 1−(1−r)^L while
    * each table keeps its own equality-joinable bucket id. table=0 is
    * the original single-table bucket.
    *
    * Compiled as ONE native expression per table (LshBucketExpr): the
    * sign-projection formulation below recomputed the md5-derived plane
    * signs per (plane, dim) per row through interpreted aggregate
    * lambdas — 1,536 digests/row at the 4x6x64 default — for signs that
    * are data-independent constants. Bit-identical semantics, pinned by
    * the differential test in GraftFunctionsSpec against [[lshBucketHof]].
    */
  def lshBucket(v: Column, planes: Int, dims: Int, table: Int = 0): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(LshBucketExpr(expression(v), table, planes, dims))
  }

  /** The pre-r14 HOF formulation of [[lshBucket]], kept as the
    * differential witness for GraftFunctionsSpec's lshBucket test (and as
    * executable documentation of the bucket's definition in portable SQL
    * terms).
    */
  private[graft] def lshBucketHof(v: Column, planes: Int, dims: Int,
      table: Int = 0): Column =
    (0 until planes).map { p =>
      when(signProjection(v, table * planes + p, dims) > 0, lit(1L << p))
        .otherwise(lit(0L))
    }.reduce(_ + _)
}
