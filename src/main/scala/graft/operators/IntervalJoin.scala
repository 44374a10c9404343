package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed point-in-interval (range) join WITHOUT an equality key,
  * executed as an equality join — the scale-correct shape for "which
  * incident/maintenance/promo windows does each event fall in".
  *
  * The naive plan for `p.ts >= i.start AND p.ts < i.end` is a
  * BroadcastNestedLoopJoin (or worse, a cartesian product): every point
  * row tested against every interval — |P|·|I| work, the classic 100-TB
  * killer. This operator decomposes time into fixed-width buckets:
  *
  *   - each interval explodes into the buckets it covers
  *     (ceil(length/width) rows — pick `bucketSeconds` near the typical
  *     interval length so the fan-out is a small constant),
  *   - each point maps to exactly ONE bucket (map-only),
  *   - an ordinary hash equality join on the bucket id pairs them,
  *   - the exact containment predicate filters inside the join.
  *
  * Each qualifying (point, interval) pair is produced exactly once — the
  * point's single bucket meets each interval's distinct bucket list at
  * most once — so no dedup pass is needed. The point side shuffles once
  * on the bucket key (the same cost as any keyed join; a hot bucket is
  * ordinary key skew, which AQE skew-join splits), and the interval side
  * shuffles its exploded rows. With a small interval side Catalyst
  * broadcasts it and the point side never shuffles at all.
  *
  * Bucket ids come from INTEGER `div` on epoch micros — never a double
  * division, whose rounding at bucket boundaries would mis-bucket a
  * point and silently drop a matching pair. (Truncating vs flooring
  * division is immaterial: both are monotone, so an interval's bucket
  * range still covers every bucket its points can map to.)
  *
  * Intervals are half-open [start, end); empty/inverted intervals are
  * dropped (nothing can fall inside them). An interval spanning more
  * than `maxBucketsPerInterval` buckets fails the job loudly (via
  * raise_error) instead of silently exploding the plan — a year-long
  * interval at 60 s buckets is a mis-chosen width, not a bigger join.
  */
object IntervalJoin {

  private val bkCol = "__graft_iv_bucket"

  /** Join `points` to every row of `intervals` whose [startCol, endCol)
    * contains the point's `tsCol`. All three columns are timestamps.
    * Output columns: points' then intervals' (minus the join scaffolding);
    * callers disambiguate duplicate names up front, as with any join.
    */
  def join(points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSeconds: Long, maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be > 0, got $bucketSeconds")
    require(maxBucketsPerInterval >= 1,
      s"maxBucketsPerInterval must be >= 1, got $maxBucketsPerInterval")
    require(!(points.columns ++ intervals.columns).exists(_.startsWith("__graft_iv_")),
      "input already carries a reserved __graft_iv_* column")
    val w = bucketSeconds * 1000000L // micros per bucket
    // exact integer bucket id (see scaladoc: double division mis-buckets)
    def bucketOf(c: String): Column = expr(s"unix_micros(`$c`) div ${w}L")
    val span = expr(s"(unix_micros(`$endCol`) - 1) div ${w}L") - bucketOf(startCol)
    val ivs = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("__graft_iv_span",
        when(span < maxBucketsPerInterval, span)
          .otherwise(raise_error(concat(
            lit(s"IntervalJoin: interval spans > $maxBucketsPerInterval buckets of " +
              s"$bucketSeconds s starting at "), col(startCol).cast("string")))))
      .withColumn("__graft_iv_off", explode(sequence(lit(0L), col("__graft_iv_span"))))
      .withColumn(bkCol, col("__graft_iv_off") + bucketOf(startCol))
      .drop("__graft_iv_span", "__graft_iv_off")
    points.withColumn(bkCol, bucketOf(tsCol))
      .join(ivs, bkCol)
      .where(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop(bkCol)
  }
}
