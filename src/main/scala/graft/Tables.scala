package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    if (name == "events") {
      // events.ts is INT64 TIMESTAMP(NANOS) parquet, which Spark's vectorized
      // reader rejects. Read nanos as long (legacy conf) and convert exactly
      // to a microsecond timestamp (the values are micro-precision anyway).
      if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
