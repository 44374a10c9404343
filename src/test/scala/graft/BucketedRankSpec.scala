package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.BucketedRank

/** The two-pass bucketed rank: result-identical to the naive global /
  * group-keyed window when the bucket is a prefix of the order, fails
  * fast on contract violations.
  */
class BucketedRankSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def base = Tables(spark, dir, "customer")
    .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
    .withColumn("kb", expr("c_custkey div 64"))

  test("global two-pass rank equals the naive single-partition window") {
    val naive = base.withColumn("rank", row_number().over(
        Window.orderBy(col("c_custkey").asc)))
      .select("c_custkey", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong)).sortBy(_._1)
    val got = BucketedRank.rank(base, Seq.empty, "kb",
        bucketAsc = true, Seq(col("c_custkey").asc))
      .select("c_custkey", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.sameElements(naive))
  }

  test("per-group descending rank equals the naive group window when " +
    "the bucket descends with the order") {
    val withQb = Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      .withColumn("ab", floor(col("c_acctbal")).cast("long"))
    val naive = withQb.withColumn("rank", row_number().over(
        Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)))
      .select("c_custkey", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong)).sortBy(_._1)
    val got = BucketedRank.rank(withQb, Seq("c_nationkey"), "ab",
        bucketAsc = false,
        Seq(col("c_acctbal").desc, col("c_custkey").asc))
      .select("c_custkey", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.sameElements(naive))
  }

  test("missing bucket column and rank-name collisions fail fast") {
    val ex = intercept[IllegalArgumentException] {
      BucketedRank.rank(base.drop("kb"), Seq.empty, "kb",
        bucketAsc = true, Seq(col("c_custkey").asc))
    }
    assert(ex.getMessage.contains("kb"))
    val ex2 = intercept[IllegalArgumentException] {
      BucketedRank.rank(base.withColumn("rank", lit(1)), Seq.empty, "kb",
        bucketAsc = true, Seq(col("c_custkey").asc))
    }
    assert(ex2.getMessage.contains("rank"))
  }

  test("a NULL bucket fails loudly — the offsets equi-join would " +
    "silently drop the row where the naive window would rank it") {
    val withNull = base.withColumn("kb",
      when(col("c_custkey") === 7L, lit(null)).otherwise(col("kb")))
    val ex = intercept[Exception] {
      BucketedRank.rank(withNull, Seq.empty, "kb",
        bucketAsc = true, Seq(col("c_custkey").asc)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("BucketedRank: NULL")),
      s"expected the null-bucket guard, got: ${messages(ex).mkString(" | ")}")
  }
}
