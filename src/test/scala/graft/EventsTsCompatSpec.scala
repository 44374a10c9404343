package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** The events `ts` column has shipped under different physical parquet types
  * as the testdata generator evolved (INT64 TIMESTAMP(NANOS) through round 6,
  * TIMESTAMP_NTZ micros from round 7). `Tables.normalizeTs` must make every
  * generation read identically, so a driver-side regeneration in EITHER
  * direction is a no-op for the whole events query family. This spec writes
  * the same rows under each physical variant and asserts byte-identical
  * query output — batch and streaming.
  */
class EventsTsCompatSpec extends SparkSuite {

  private val srcDir = "/root/testdata/sf0.001"

  /** The canonical rows: today's testdata, normalized (TimestampType, UTC). */
  private lazy val canon: DataFrame =
    Tables(spark, srcDir, "events").orderBy("event_id").cache()

  /** Write `canon` under one physical ts variant into its own dir. */
  private def variantDir(name: String, df: DataFrame): String = {
    val d = tmpDir(s"events-$name")
    df.write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  // INT64 plain long (micro-precision nanos, as the old generator's logical
  // NANOS type surfaces under the legacy conf): ts = epoch nanos as long
  private lazy val nanosDir = variantDir("nanos",
    canon.withColumn("ts", expr("unix_micros(ts) * 1000L")))
  // TIMESTAMP_NTZ micros: today's generation
  private lazy val ntzDir = variantDir("ntz",
    canon.withColumn("ts", col("ts").cast(TimestampNTZType)))
  // TIMESTAMP (instant) micros: the plain-instant future generation
  private lazy val tzDir = variantDir("tz", canon)

  private def readTypeOf(dir: String) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
  }

  test("the three variants really are three distinct physical types") {
    assert(readTypeOf(nanosDir) == LongType)
    assert(readTypeOf(ntzDir) == TimestampNTZType)
    assert(readTypeOf(tzDir) == TimestampType)
  }

  test("Tables reads every physical variant to the identical normalized table") {
    val want = canon.collect().toSeq
    Seq("nanos" -> nanosDir, "ntz" -> ntzDir, "tz" -> tzDir).foreach {
      case (label, d) =>
        val got = Tables(spark, d, "events")
        assert(got.schema("ts").dataType == TimestampType, label)
        assert(got.orderBy("event_id").collect().toSeq == want,
          s"variant $label does not round-trip")
    }
  }

  test("an events query produces identical output on every variant") {
    val q39 = graft.queries.EventQueries.defs
      .find(_.name == "q39_tumbling_window").get.fn
    val want = q39(spark, srcDir).collect().toSeq
    Seq("nanos" -> nanosDir, "ntz" -> ntzDir, "tz" -> tzDir).foreach {
      case (label, d) =>
        assert(q39(spark, d).collect().toSeq == want, s"variant $label drifts")
    }
  }

  test("the streaming reader normalizes every variant identically") {
    import graft.streaming.EventStreams
    val want = canon.select("event_id", "ts").collect().toSet
    Seq("nanos" -> nanosDir, "ntz" -> ntzDir, "tz" -> tzDir).foreach {
      case (label, d) =>
        val stream = EventStreams.readStream(spark, s"$d/events.parquet")
        assert(stream.schema("ts").dataType == TimestampType, label)
        val got = EventStreams.runToMemory(spark,
          stream.select("event_id", "ts"), s"ts_compat_$label",
          org.apache.spark.sql.streaming.OutputMode.Append())
        assert(got.collect().toSet == want, s"stream variant $label drifts")
    }
  }
}
