package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Star-schema table access (TESTDATA.md layout: one parquet per table).
  *
  * Mirrors the reference's source surface (etlhelper reads any SELECT from a
  * backend DB — /root/reference/etlhelper/etl.py:95); here the primary store is
  * parquet and laziness/chunking come from Spark's partitioned scans, so a
  * "table" is simply a lazily-planned DataFrame. Filters and projections
  * applied downstream are pushed into the parquet scan by Catalyst
  * (PushedFilters / ReadSchema), which at 100 TB is the difference between
  * reading a column slice and reading the world.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    if (name == "events") readEvents(spark, s"$dir/$name.parquet")
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Read the events table regardless of which physical `ts` type this
    * testdata generation carries (see [[normalizeTs]]). The nanos legacy conf
    * is set up-front because INT64 TIMESTAMP(NANOS) files fail at schema
    * inference time without it; on non-nanos files the conf is inert.
    */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(path))
  }

  /** Normalize the events `ts` column to a session-timezone TimestampType
    * whatever the stored physical type. Generations of the testdata have
    * shipped three variants, and a 100 TB lake accumulates all of them as
    * writers evolve — a reader pinned to one physical type is a time bomb:
    *
    *  - INT64 TIMESTAMP(NANOS): surfaces as LongType under the legacy
    *    nanos-as-long conf; the values are micro-precision so
    *    `timestamp_micros(ts div 1000)` is exact.
    *  - TIMESTAMP_NTZ (isAdjustedToUTC=false micros): cast to TimestampType.
    *    All graft entry points pin `spark.sql.session.timeZone=UTC`, making
    *    the cast value-identical to the stored micros.
    *  - TIMESTAMP (instant semantics, incl. INT96): already what we want.
    */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case TimestampType => df
    case other => throw new IllegalArgumentException(
      s"events.ts has unsupported type $other (expected INT64 nanos, TIMESTAMP_NTZ, or TIMESTAMP)")
  }
}
