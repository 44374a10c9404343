package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression for a random-hyperplane LSH bucket id —
  * the whole `planes`-bit bucket of one table in ONE pass over the
  * vector.
  *
  * The HOF formulation it replaces (see VectorFunctions.signProjection)
  * recomputed `planeSign` — an md5 of "plane:i" — per (plane, dim) per
  * ROW through interpreted lambda plumbing: at 4 tables x 6 planes x 64
  * dims that is 1,536 md5 digests and string comparisons for every
  * corpus row bucketed, for signs that are DATA-INDEPENDENT constants.
  * Here the sign matrix is computed once at plan construction (and once
  * per executor on deserialization) and the per-row work compiles to a
  * primitive loop inside whole-stage codegen.
  *
  * Semantics are EXACTLY the HOF formulation's, pinned by the
  * differential test in GraftFunctionsSpec against the old expression
  * tree:
  *   - quant(i)  = (long) floor(v[i] * 1e6 + 0.5)   (exact integers)
  *   - proj(p)   = sum_i sign(table*planes+p, i) * quant(i)
  *   - bucket    = sum_p (proj(p) > 0 ? 1L << p : 0L)
  *   - a NULL vector or any NULL element makes every proj NULL, and
  *     `when(null > 0, ..).otherwise(0)` made the old bucket 0 — so the
  *     result is 0, never NULL, and the column stays non-nullable
  *     (schema-identical to the old sum of CaseWhen literals).
  *   - a vector shorter than `dims` is an error (ANSI element_at past
  *     the end), raised here with the operator named.
  */
case class LshBucketExpr(child: Expression, table: Int, planes: Int,
    dims: Int) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  @transient private lazy val signs: Array[Long] =
    LshBucketExpr.signMatrix(table, planes, dims)

  override def eval(input: InternalRow): Any = {
    val value = child.eval(input)
    if (value == null) return 0L
    val arr = value.asInstanceOf[ArrayData]
    // same exception type and message as the codegen path (doGenCode),
    // so diagnostics do not depend on which execution path ran
    if (arr.numElements() < dims)
      throw new IllegalArgumentException(
        s"lshBucket: vector length ${arr.numElements()} < dims $dims")
    var i = 0
    while (i < dims) {
      if (arr.isNullAt(i)) return 0L
      i += 1
    }
    val accs = new Array[Long](planes)
    i = 0
    while (i < dims) {
      val q = math.floor(arr.getDouble(i) * 1000000.0 + 0.5).toLong
      var p = 0
      while (p < planes) { accs(p) += signs(p * dims + i) * q; p += 1 }
      i += 1
    }
    var bucket = 0L
    var p = 0
    while (p < planes) {
      if (accs(p) > 0L) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val signsRef = ctx.addReferenceObj("lshSigns", signs, "long[]")
    val arr = ctx.freshName("arr")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val p = ctx.freshName("p")
    val b = ctx.freshName("b")
    val q = ctx.freshName("q")
    val accs = ctx.freshName("accs")
    val hasNull = ctx.freshName("hasNull")
    val code = childGen.code +
      code"""
        |long ${ev.value} = 0L;
        |if (!${childGen.isNull}) {
        |  org.apache.spark.sql.catalyst.util.ArrayData $arr = ${childGen.value};
        |  if ($arr.numElements() < $dims) {
        |    throw new IllegalArgumentException(
        |      "lshBucket: vector length " + $arr.numElements() + " < dims $dims");
        |  }
        |  boolean $hasNull = false;
        |  for (int $i = 0; $i < $dims; $i++) {
        |    if ($arr.isNullAt($i)) { $hasNull = true; break; }
        |  }
        |  if (!$hasNull) {
        |    long[] $accs = new long[$planes];
        |    for (int $j = 0; $j < $dims; $j++) {
        |      long $q = (long) java.lang.Math.floor($arr.getDouble($j) * 1000000.0 + 0.5);
        |      for (int $p = 0; $p < $planes; $p++) {
        |        $accs[$p] += $signsRef[$p * $dims + $j] * $q;
        |      }
        |    }
        |    for (int $b = 0; $b < $planes; $b++) {
        |      if ($accs[$b] > 0L) ${ev.value} |= (1L << $b);
        |    }
        |  }
        |}
      """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}

object LshBucketExpr {
  /** The sign matrix for one table, flattened [plane][dim]: +1 iff the
    * first hex char of md5("$plane:$i") is in '0'..'7' (i is the 1-BASED
    * element index, matching the SQL element_at convention), i.e. the
    * digest's high nibble <= 7 — byte-for-byte the planeSign column
    * expression, evaluated once instead of per row.
    */
  def signMatrix(table: Int, planes: Int, dims: Int): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](planes * dims)
    var p = 0
    while (p < planes) {
      val plane = table * planes + p
      var i = 1
      while (i <= dims) {
        val d = md.digest(
          s"$plane:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out(p * dims + (i - 1)) = if (((d(0) >> 4) & 0xF) <= 7) 1L else -1L
        i += 1
      }
      p += 1
    }
    out
  }
}
