package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Loud size guard for uncapped bucket self-joins (guide §2.5).
  *
  * q35's simhash bands and q38's LSH buckets join a relation to itself
  * on the bucket key with NO membership cap — their declared semantics
  * (and oracles) have none, so the capped-pair kernel (q32's
  * dropHotBuckets + inBucketPairs) is not available to them. At sf0.1
  * the largest bucket is a few hundred rows; at 100 TB a degenerate
  * bucket (an all-zeros signature mode, a boilerplate cluster) makes
  * the join quadratic IN THAT BUCKET: one task owns cap² candidate
  * pairs and the stage straggles or dies with no message naming the
  * cause. This guard turns that failure mode into a diagnosis: any
  * bucket over `cap` members fails the query naming the operator, the
  * cap and the observed size, BEFORE the quadratic join materializes
  * its pairs.
  *
  * Result-neutral by construction when every bucket is under the cap:
  * the overflow relation is empty, the broadcast left join matches
  * nothing, and the filter's assert_true passes every row (SkewGuardSpec
  * pins byte-identical results and the trip). Cost: one aggregate over
  * the (small, key+count) bucket relation plus an empty broadcast —
  * no extra pass over payload columns, no exchange of `rel` itself.
  *
  * The guard deliberately FAILS rather than drops: silently skipping a
  * hot bucket would change declared results. The message tells the
  * operator what to do instead (shrink bands / raise planes so buckets
  * split, or move to the capped kernel and re-declare semantics).
  */
object SkewGuard {

  def boundedBuckets(rel: DataFrame, keys: Seq[String], cap: Long,
      what: String): DataFrame = {
    require(keys.nonEmpty, "SkewGuard.boundedBuckets: no keys")
    // materialize the bucketed relation ONCE: the size aggregate, and
    // both sides of the caller's self-join, would otherwise each
    // re-execute the (expensive) signature/bucket pipeline feeding it —
    // measured 1.4x on q35 with the aggregate recomputing simhash32.
    // The relation is bucket-key-sized rows (keys + id [+ payload]),
    // the same thing the join was already going to shuffle.
    val r = rel.localCheckpoint(true)
    val overflow = r.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__bucket_n"))
      .filter(col("__bucket_n") > cap)
    val guarded = r.join(broadcast(overflow), keys, "left")
      .filter(assert_true(col("__bucket_n").isNull,
        concat(lit(s"$what: a bucket of ("), lit(keys.mkString(",")),
          lit(") holds "), col("__bucket_n").cast("string"),
          lit(s" members (cap $cap) — the self-join would be quadratic in"
            + " it; split the bucket key (narrower bands / more planes)"
            + " or move this path to the capped pair kernel"))).isNull)
    guarded.select(r.columns.map(col): _*)
  }
}
