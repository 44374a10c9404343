package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.IntervalJoin

/** The bucketed interval join: pair-identical to the naive nested-loop
  * predicate at any bucket width, while planning as a hash EQUALITY join
  * (never a BroadcastNestedLoopJoin / cartesian product).
  */
class IntervalJoinSpec extends SparkSuite {

  import spark.implicits._

  private def ts(min: Long): Timestamp =
    new Timestamp(Timestamp.valueOf("2024-03-01 00:00:00").getTime + min * 60000L)

  // 300 points at 7-minute steps over ~35 hours
  private lazy val points: DataFrame =
    (0 until 300).map(i => (i.toLong, ts(i * 7))).toDF("point_id", "ts")

  // overlapping, unaligned windows of wildly different lengths (8 min .. 16 h)
  private lazy val intervals: DataFrame = Seq(
    (1L, ts(3), ts(11)), (2L, ts(5), ts(200)), (3L, ts(199), ts(201)),
    (4L, ts(0), ts(960)), (5L, ts(955), ts(957)), (6L, ts(2000), ts(2100)),
    (7L, ts(100), ts(100)),   // empty: dropped
    (8L, ts(50), ts(40)),     // inverted: dropped
    (9L, ts(2099), ts(2101))).toDF("win_id", "ws", "we")

  private def naive: Set[(Long, Long)] =
    points.crossJoin(intervals)
      .where(col("ts") >= col("ws") && col("ts") < col("we"))
      .select("point_id", "win_id").as[(Long, Long)].collect().toSet

  test("bucketed join equals the naive predicate at widths below, near, " +
    "and far above the interval lengths — and produces no duplicate pairs") {
    val want = naive
    for (widthSec <- Seq(60L, 3600L, 7 * 24 * 3600L)) {
      val got = IntervalJoin.join(points, "ts", intervals, "ws", "we", widthSec)
        .select("point_id", "win_id").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicate pairs at width=$widthSec")
      assert(got.toSet == want, s"pair mismatch at width=$widthSec")
    }
  }

  test("a point exactly on a bucket boundary still matches (integer " +
    "bucket arithmetic — a double division would round it away)") {
    // interval [60 min, 120 min) with 3600 s buckets: the point at exactly
    // 60 min sits on the bucket edge and inside the interval
    val p = Seq((1L, ts(60))).toDF("point_id", "ts")
    val iv = Seq((1L, ts(60), ts(120))).toDF("win_id", "ws", "we")
    assert(IntervalJoin.join(p, "ts", iv, "ws", "we", 3600L).count() == 1L)
  }

  test("plan is an equality join even when the interval side cannot " +
    "broadcast — never a nested-loop or cartesian scan") {
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = IntervalJoin.join(points, "ts", intervals, "ws", "we", 3600L)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"non-equality join in:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"no shuffled equality join in:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("a HOT bucket (one bucket holding ~all points) is ordinary key " +
    "skew: AQE's skew-join split engages on the bucketed equality join, " +
    "as the operator's scaladoc claims, and pairs stay exact") {
    // 150k points inside ONE hour-bucket + a thin tail over 50 others
    val hot = spark.range(150000)
      .select(col("id").as("point_id"),
        to_timestamp(lit("2024-03-01 10:00:00")).as("ts"))
    val tail = spark.range(50)
      .select((col("id") + 150000L).as("point_id"),
        (to_timestamp(lit("2024-03-01 12:00:00"))
          + expr("make_interval(0, 0, 0, 0, CAST(id AS INT), 0, 0)")).as("ts"))
    val pts = hot.unionByName(tail)
    val ivs = Seq(
      (1L, Timestamp.valueOf("2024-03-01 09:30:00"),
        Timestamp.valueOf("2024-03-01 10:30:00")),   // covers the hot bucket
      (2L, Timestamp.valueOf("2024-03-01 20:00:00"),
        Timestamp.valueOf("2024-03-01 22:00:00"))).toDF("win_id", "ws", "we")
    val conf = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force the SMJ path
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536")
    val prior = conf.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      val joined = IntervalJoin.join(pts, "ts", ivs, "ws", "we", 3600L)
      // exact pairs first — executed on THIS DataFrame (count() would
      // plan a separate query and leave this one's adaptive plan
      // unfinalized): the hot interval catches all 150k hot points, the
      // other window its 2 tail points
      assert(joined.collect().length == 150000 + 2)
      // then the plan evidence: the finalized adaptive plan carries the
      // skew-split marker on the join/read of the hot side
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE skew split did not engage on the hot bucket:\n$plan")
    } finally prior.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("an interval spanning more buckets than the cap fails loudly " +
    "instead of exploding the plan") {
    val iv = Seq((1L, ts(0), ts(10 * 24 * 60))).toDF("win_id", "ws", "we")
    val e = intercept[Exception] {
      IntervalJoin.join(points, "ts", iv, "ws", "we", 60L,
        maxBucketsPerInterval = 1000).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("IntervalJoin")),
      s"unexpected failure: $e")
  }
}
