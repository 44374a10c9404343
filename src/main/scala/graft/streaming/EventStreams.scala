package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming pipelines over the `events` table (SURVEY.md §2.9:
  * the designed superset of the reference, which has no streaming engine —
  * its closest analogues are unbounded-generator ingestion + per-chunk
  * commit, which map to micro-batches + checkpointing).
  *
  * Batch/stream unification: the window aggregations below accept either a
  * streaming or a batch DataFrame — the batch twins in EventQueries are the
  * DuckDB-verified versions of exactly these plans.
  */
object EventStreams {

  /** File-based streaming source over an events parquet directory. A stream
    * source needs an explicit schema, but the PHYSICAL `ts` type varies by
    * testdata generation (INT64 nanos → LongType under the legacy conf,
    * TIMESTAMP_NTZ micros, or plain TIMESTAMP — see `Tables.normalizeTs`), so
    * the schema is sniffed from the footers already in `dir` (a footer-only
    * batch read, no data scan) and the same normalization as the batch
    * reader is applied. Batch and stream twins therefore agree byte-for-byte
    * on `ts` whatever generation wrote the files.
    */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val physical: StructType = spark.read.parquet(dir).schema
    graft.Tables.normalizeTs(
      spark.readStream.schema(physical).parquet(dir))
  }

  /** Tumbling/sliding window counts with a watermark: late data beyond
    * `watermark` is dropped; in append mode a window emits once its end
    * passes the watermark.
    */
  def windowedCounts(events: DataFrame, width: String,
      slide: Option[String] = None, watermark: String = "10 minutes"): DataFrame = {
    val w = slide match {
      case Some(s) => window(col("ts"), width, s)
      case None => window(col("ts"), width)
    }
    events.withWatermark("ts", watermark)
      .groupBy(w.as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
  }

  /** Run a streaming aggregation from `dir` to an in-memory table and block
    * until all available input is processed (the deterministic local-test
    * harness for streaming plans). Returns the result table.
    */
  def runToMemory(spark: SparkSession, src: DataFrame, queryName: String,
      mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val q = src.writeStream
      .format("memory").queryName(queryName).outputMode(mode)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName)
  }

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double,
      last_ts: Timestamp)
  final case class UserSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, session_value: Double)

  /** Event-time session windows via the built-in session_window: sessions
    * close when no event arrives within `gap`; the watermark bounds state
    * and emits closed sessions in append mode. This is the streaming twin
    * of the q41 batch sessionization.
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("session_value"))

  /** Streaming exact deduplication bounded by the watermark: duplicate
    * event_ids arriving within the horizon are dropped, and the dedup state
    * for ids older than the watermark is garbage-collected — the streaming
    * twin of q29/q30 batch dedup, and the only dedup formulation whose state
    * doesn't grow without bound on an infinite stream.
    */
  def dedupedStream(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: right events of the same user within
    * `within` after the left event. Both sides are watermarked so Spark can
    * bound and GC the join state buffers; the interval condition is what
    * makes that GC possible at all (an unbounded-time stream join would
    * buffer forever).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, within: String = "10 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark).alias("l")
    val r = right.withWatermark("ts", watermark).alias("r")
    l.join(r, expr(
      s"l.user_id = r.user_id AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL $within"))
  }

  /** Custom sessionization via flatMapGroupsWithState with an event-time
    * timeout — the fully general state API (0..N outputs per group per
    * batch, explicit state machine): events accumulate into an open
    * session; when the watermark passes the session's gap the timeout
    * fires and the CLOSED session is emitted. Unlike the built-in
    * session_window (sessionWindows above) this shape can carry arbitrary
    * per-session state (e.g. first/last event payloads) — it is the escape
    * hatch when session semantics outgrow the built-in.
    */
  def sessionizeWithState(events: Dataset[Event], gapMinutes: Long = 30,
      watermark: String = "10 minutes"): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60 * 1000
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserSession, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserSession]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed the gap: close and emit the session
            val done = state.get
            state.remove()
            Iterator.single(done)
          } else {
            val evs = batch.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption.orNull
            val closed = Seq.newBuilder[UserSession]
            evs.foreach { e =>
              cur match {
                case null =>
                  cur = UserSession(userId, e.ts, e.ts, 1L, e.value)
                case s if e.ts.getTime - s.session_end.getTime > gapMs =>
                  closed += s // gap exceeded inside the batch: emit, start anew
                  cur = UserSession(userId, e.ts, e.ts, 1L, e.value)
                case s if s.session_start.getTime - e.ts.getTime > gapMs =>
                  // a late event more than `gap` BEFORE the open session
                  // (possible when the watermark delay exceeds the gap):
                  // it is its own session, already closed by construction —
                  // merging it would fabricate a session spanning silence
                  closed += UserSession(userId, e.ts, e.ts, 1L, e.value)
                case s =>
                  // min/max bounds, not blind assignment: a late-but-within-
                  // watermark event from a later batch may precede the
                  // session's current bounds, and moving session_end
                  // backwards would corrupt the gap/timeout arithmetic
                  cur = s.copy(
                    session_start =
                      if (e.ts.before(s.session_start)) e.ts else s.session_start,
                    session_end =
                      if (e.ts.after(s.session_end)) e.ts else s.session_end,
                    n_events = s.n_events + 1,
                    session_value = s.session_value + e.value)
              }
            }
            if (cur != null) {
              state.update(cur)
              state.setTimeoutTimestamp(cur.session_end.getTime + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  final case class UserRateState(user_id: Long, n_days: Long, sum: Long,
      sumsq: Long, open_day: Long, open_count: Long)
  final case class UserDayAnomaly(user_id: Long, day: Timestamp,
      n_events: Long, mean_prior: Double, std_prior: Double)

  /** Streaming twin of the q118 batch anomaly detector: per-user daily
    * event counts judged IN-FLIGHT against that user's own history. A
    * user's day closes when their first event of a later day arrives;
    * the closed count is compared to the mean + `sigmas`·σ of the user's
    * PRIOR closed days (at least `minPriorDays` of them, σ from the same
    * integer sum/sum-of-squares arithmetic as q118) and an anomaly row
    * is emitted on breach — then the day folds into the baseline.
    *
    * Semantics vs q118: the batch form judges each day against the
    * user's WHOLE series; this online form judges against the history
    * available at close time — the shape a live abuse monitor wants
    * (yesterday's spike must not whitewash today's baseline).
    *
    * State is six numbers per user — O(#users), never O(events) — the
    * bounded-state discipline of the other stateful operators here.
    * Events older than the user's open day (cross-batch stragglers) fold
    * into nothing: a production deployment fronts this with the q39
    * watermarked day aggregation so closures are watermark-driven;
    * within a batch, events are processed in event-time order.
    *
    * Day boundaries follow the SESSION TIMEZONE (captured on the driver
    * at plan time), matching q118's date_trunc('DAY') — a UTC epoch-ms
    * division would split days differently in any non-UTC session.
    * One deliberate divergence from q118: a spike over a ZERO-variance
    * baseline (c > mean, σ = 0) IS flagged here, while the batch report
    * filters user_std > 0 (its z column is undefined at σ = 0) — a live
    * monitor must flag a 5× spike over a perfectly steady baseline, and
    * this operator emits the raw mean/σ, no division involved.
    */
  def rateAnomalies(events: Dataset[Event], minPriorDays: Int = 3,
      sigmas: Double = 2.5): Dataset[UserDayAnomaly] = {
    import events.sparkSession.implicits._
    val noDay = Long.MinValue // impossible epoch day, unlike -1 (1969-12-31)
    val zoneId = events.sparkSession.conf.get("spark.sql.session.timeZone")
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRateState, UserDayAnomaly](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserRateState]) =>
          val zone = java.time.ZoneId.of(zoneId)
          def dayOf(t: Timestamp): Long =
            t.toInstant.atZone(zone).toLocalDate.toEpochDay
          def dayStart(d: Long): Timestamp = Timestamp.from(
            java.time.LocalDate.ofEpochDay(d).atStartOfDay(zone).toInstant)
          var st = state.getOption
            .getOrElse(UserRateState(userId, 0L, 0L, 0L, noDay, 0L))
          val out = Seq.newBuilder[UserDayAnomaly]
          def close(): Unit = {
            val c = st.open_count
            if (st.n_days >= minPriorDays) {
              val n = st.n_days.toDouble
              val mean = st.sum.toDouble / n
              val variance =
                (st.sumsq.toDouble - st.sum.toDouble * st.sum.toDouble / n) / n
              val std = math.sqrt(math.max(variance, 0.0))
              if (c.toDouble > mean + sigmas * std)
                out += UserDayAnomaly(userId, dayStart(st.open_day), c, mean, std)
            }
            st = st.copy(n_days = st.n_days + 1, sum = st.sum + c,
              sumsq = st.sumsq + c * c, open_day = noDay, open_count = 0L)
          }
          batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val d = dayOf(e.ts)
            if (st.open_day == noDay) st = st.copy(open_day = d, open_count = 1L)
            else if (d == st.open_day)
              st = st.copy(open_count = st.open_count + 1L)
            else if (d > st.open_day) {
              close()
              st = st.copy(open_day = d, open_count = 1L)
            } // d < open_day: straggler past the close — dropped (see doc)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Custom streaming state (§2.9 upgrade): per-user running totals via
    * mapGroupsWithState — the KeyValueGroupedDataset state-store surface.
    * Emits the updated running aggregate for each user every micro-batch.
    */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](
        GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0, new Timestamp(0L)))
          val evs = batch.toSeq
          val next = UserRunning(
            userId,
            prev.n_events + evs.size,
            prev.total_value + evs.map(_.value).sum,
            evs.map(_.ts).foldLeft(prev.last_ts)((a, b) => if (b.after(a)) b else a))
          state.update(next)
          next
      }
  }
}
