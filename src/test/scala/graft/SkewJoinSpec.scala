package graft

import org.apache.spark.sql.functions._

/** AQE skew-join: the runtime answer to skewed join keys (the manual answer
  * is q49's salting). With a hot key concentrating most of one side in a
  * single shuffle partition, adaptive execution splits that partition into
  * subpartitions at runtime — the final plan marks the join `skew=true`.
  */
class SkewJoinSpec extends SparkSuite {

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      import spark.implicits._
      // ~100k of 200k rows share key 1 -> one shuffle partition far past the
      // threshold; payload pads the row bytes so sizes, not counts, trigger
      val skewed = spark.range(200000)
        .select(when($"id" % 2 === 0, 1L).otherwise($"id").as("k"),
          lpad($"id".cast("string"), 32, "x").as("payload"))
      val other = spark.range(20000).select($"id".as("k"), ($"id" * 2).as("v"))
      val joined = skewed.join(other, "k")
      // execute THIS DataFrame's plan (count() would build a different
      // query tree whose final adaptive plan we couldn't inspect)
      assert(joined.collect().length > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the join skew=true:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
