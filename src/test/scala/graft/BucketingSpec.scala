package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: writing both sides bucketed+sorted on
  * the join key lets SortMergeJoin run with NO shuffle exchange — the
  * pre-partitioning strategy for repeated fact-fact joins at 100 TB.
  */
class BucketingSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val adaptiveBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val broadcastBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
      Tables(spark, dir, "lineitem")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      Tables(spark, dir, "orders")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("o_bucketed")

      val li = spark.table("li_bucketed")
      val o = spark.table("o_bucketed")
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(o("o_orderstatus")).agg(count(lit(1)).as("n"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      // the join itself must not shuffle; only the final small aggregation may
      val joinSection = plan.split("SortMergeJoin").last
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
        s"join should read bucketed layout without exchange:\n$plan")

      val nonBucketed = Tables(spark, dir, "lineitem")
        .join(Tables(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val planNb = nonBucketed.queryExecution.executedPlan.toString
      assert(planNb.contains("Exchange hashpartitioning"),
        "control: the non-bucketed join must shuffle")

      // correctness: both layouts agree
      val a = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val b = nonBucketed.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(a == b)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", adaptiveBefore)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastBefore)
    }
  }
}
