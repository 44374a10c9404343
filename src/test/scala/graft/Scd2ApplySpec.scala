package graft

import org.apache.spark.sql.functions._
import graft.queries.EventQueries

/** The incremental SCD2 apply beyond its full-rebuild oracle (q155):
  * replay idempotence and new-key handling — the CDC-applier contracts
  * that make the verb safe in an at-least-once pipeline.
  */
class Scd2ApplySpec extends SparkSuite {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def intervals(rows: (Long, Long, String, String, Option[String])*) =
    rows.map { case (e, u, t, f, to) =>
      (e, u, t, ts(f), to.map(ts).orNull)
    }.toDF("event_id", "user_id", "event_type", "valid_from", "valid_to")

  private def events(rows: (Long, Long, String, String)*) =
    rows.map { case (e, u, tm, t) => (e, u, ts(tm), t) }
      .toDF("event_id", "user_id", "ts", "event_type")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("user_id", "valid_from", "event_id").collect().toSeq

  test("replaying an already-applied batch is a no-op, and a same-type " +
    "change never opens a new interval") {
    val current = intervals(
      (1L, 10L, "view", "2024-01-01 00:00:00", Some("2024-01-02 00:00:00")),
      (2L, 10L, "click", "2024-01-02 00:00:00", None),
      (3L, 20L, "view", "2024-01-01 12:00:00", None))
    val batch = events(
      (7L, 10L, "2024-01-03 00:00:00", "view"),   // real change for 10
      (8L, 20L, "2024-01-03 06:00:00", "view"))   // same type: no-op for 20
    val once = EventQueries.scd2Apply(current, batch).localCheckpoint(true)
    // user 20's open interval is unchanged (same type collapsed)
    assert(canon(once.filter(col("user_id") === 20L)) ==
      canon(intervals((3L, 20L, "view", "2024-01-01 12:00:00", None))))
    // user 10 gained one interval, old open closed at the change ts
    assert(canon(once.filter(col("user_id") === 10L)) == canon(intervals(
      (1L, 10L, "view", "2024-01-01 00:00:00", Some("2024-01-02 00:00:00")),
      (2L, 10L, "click", "2024-01-02 00:00:00", Some("2024-01-03 00:00:00")),
      (7L, 10L, "view", "2024-01-03 00:00:00", None))))
    // replay: applying the SAME batch to the applied table changes nothing
    val twice = EventQueries.scd2Apply(once, batch)
    assert(canon(twice) == canon(once),
      "replayed batch must be a no-op on the applied table")
  }

  test("a key with no prior history opens its first interval from the " +
    "batch alone") {
    val current = intervals(
      (1L, 10L, "view", "2024-01-01 00:00:00", None))
    val batch = events(
      (9L, 30L, "2024-01-04 00:00:00", "view"),
      (10L, 30L, "2024-01-05 00:00:00", "click"))
    val got = EventQueries.scd2Apply(current, batch)
    assert(canon(got.filter(col("user_id") === 30L)) == canon(intervals(
      (9L, 30L, "view", "2024-01-04 00:00:00", Some("2024-01-05 00:00:00")),
      (10L, 30L, "click", "2024-01-05 00:00:00", None))))
    // untouched key passes through untouched
    assert(canon(got.filter(col("user_id") === 10L)) ==
      canon(intervals((1L, 10L, "view", "2024-01-01 00:00:00", None))))
  }
}
