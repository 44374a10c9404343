package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.GroupTopK

/** The exact two-stage per-group top-k: result-identical to the naive
  * group-keyed window at any bucket count, while never materializing a
  * whole group in one window partition.
  */
class GroupTopKSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def naive(k: Int) = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables(spark, dir, "customer")
      .select("c_nationkey", "c_custkey", "c_acctbal")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  private def staged(k: Int, buckets: Int) =
    GroupTopK.topK(
      Tables(spark, dir, "customer")
        .select("c_nationkey", "c_custkey", "c_acctbal"),
      Seq(col("c_nationkey")),
      Seq(col("c_acctbal").desc, col("c_custkey").asc),
      col("c_custkey"), k, numBuckets = buckets)

  test("two-stage top-k equals the naive single-window top-k — " +
    "at the default and at a degenerate bucket count") {
    val want = naive(3).orderBy("c_nationkey", "rank")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    for (buckets <- Seq(256, 1)) {
      val got = staged(3, buckets).orderBy("c_nationkey", "rank")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      assert(got.sameElements(want), s"mismatch at numBuckets=$buckets")
    }
  }

  test("the local stage partitions on (group, hash cell) — the plan " +
    "never windows on the bare group key first") {
    val p = staged(3, 256).queryExecution.executedPlan.toString
    assert("row_number\\(\\) windowspecdefinition\\(c_nationkey#\\d+, __graft_topk_bk#".r
      .findFirstIn(p).isDefined,
      s"local window not cell-keyed in:\n$p")
  }

  test("reserved-column and rank-name collisions fail fast") {
    val df = Tables(spark, dir, "customer")
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
    val ex = intercept[IllegalArgumentException] {
      GroupTopK.topK(df.withColumn("__graft_topk_bk", lit(1)),
        Seq(col("c_nationkey")), Seq(col("c_custkey").asc),
        col("c_custkey"), 2)
    }
    assert(ex.getMessage.contains("__graft_topk_"))
    val ex2 = intercept[IllegalArgumentException] {
      GroupTopK.topK(df.withColumn("rank", lit(1)),
        Seq(col("c_nationkey")), Seq(col("c_custkey").asc),
        col("c_custkey"), 2)
    }
    assert(ex2.getMessage.contains("rank"))
  }
}
