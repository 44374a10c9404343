package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import Exact._

/** Event-time analytics over the `events` table — the batch twins of the
  * Structured Streaming pipelines in graft.streaming (SURVEY.md §2.9: the
  * reference has no streaming engine; this is the designed superset).
  * Tumbling/sliding windows use Spark's `window()` (epoch-aligned, matching
  * DuckDB time_bucket — origin 2000-01-03 is a multiple of every bucket
  * width used here); sessionization is the classic gap-marker cumulative
  * sum, microsecond-exact via timestamp interval comparison.
  */
object EventQueries extends QueryModule {

  /** Tumbling 15-minute windows: count + exact value sum per event type. */
  private val q39 = QueryDef(
    "q39_tumbling_window",
    (s, d) => Tables(s, d, "events")
      .groupBy(window(col("ts"), "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
      .orderBy("window_start", "event_type"),
    Some(s"""SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
                    event_type, COUNT(*) AS n_events,
                    ${sqlDsum("value")} AS total_value
             FROM events GROUP BY window_start, event_type
             ORDER BY window_start, event_type"""))

  /** Sliding 30-minute windows every 10 minutes: each event contributes to
    * exactly 3 windows (Spark explodes via window(); the oracle replicates
    * with a range(3) lateral join).
    */
  private val q40 = QueryDef(
    "q40_sliding_window",
    (s, d) => Tables(s, d, "events")
      .groupBy(window(col("ts"), "30 minutes", "10 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .select(col("w.start").as("window_start"), col("n_events"), col("n_users"))
      .orderBy("window_start"),
    Some("""SELECT time_bucket(INTERVAL '10 minutes', ts) - k * INTERVAL '10 minutes' AS window_start,
                   COUNT(*) AS n_events,
                   COUNT(DISTINCT user_id) AS n_users
            FROM events, range(3) r(k)
            GROUP BY window_start ORDER BY window_start"""))

  /** Gap-based sessionization (30-minute inactivity): session boundaries by
    * lag + cumulative marker sum, then per-session metrics. The batch twin
    * of flatMapGroupsWithState; two shuffles (user, then user+session).
    */
  private val q41 = QueryDef(
    "q41_sessionize",
    (s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables(s, d, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1)
            .otherwise(0))
        .withColumn("session_idx",
          sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"),
          dsum(col("value")).as("session_value"))
        .orderBy("user_id", "session_idx")
    },
    Some(s"""WITH marked AS (
               SELECT user_id, ts, value,
                      CASE WHEN lag(ts, 1) OVER w IS NULL
                             OR ts > lag(ts, 1) OVER w + INTERVAL '30 minutes'
                           THEN 1 ELSE 0 END AS new_session
               FROM events
               WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
             sessions AS (
               SELECT user_id, ts, value,
                      SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
               FROM marked)
             SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
                    MIN(ts) AS session_start, MAX(ts) AS session_end,
                    COUNT(*) AS n_events, ${sqlDsum("value")} AS session_value
             FROM sessions GROUP BY user_id, session_idx
             ORDER BY user_id, session_idx"""))

  /** Semi-structured extraction: pull a JSON field out of `props` and
    * aggregate it — Spark get_json_object vs DuckDB json_extract.
    */
  private val q42 = QueryDef(
    "q42_json_extract",
    (s, d) => Tables(s, d, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).as("k_sum"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"))
      .orderBy("event_type"),
    Some("""SELECT event_type, COUNT(*) AS n_events,
                   CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
                   MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS k_min,
                   MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS k_max
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** As-of join (the canonical "operator Spark lacks"): match each click to
    * the most recent strictly-prior view of the same user. Composed from
    * built-ins per the preference order — union-tag + last(ignoreNulls)
    * over a (-inf, -1) frame — which is ALSO the scalable formulation: one
    * shuffle on user_id, single ordered pass per user, versus the naive
    * inequality self-join (quadratic per user). DuckDB's last_value ...
    * IGNORE NULLS agrees exactly.
    */
  private val q50 = QueryDef(
    "q50_asof_join",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables(s, d, "events")
        .withColumn("prior_view_ts",
          last(when(col("event_type") === "view", col("ts")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "click")
        .select("user_id", "event_id", "ts", "prior_view_ts")
        .orderBy("user_id", "event_id")
    },
    Some("""SELECT user_id, event_id, ts, prior_view_ts FROM (
              SELECT user_id, event_id, ts, event_type,
                     last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_view_ts
              FROM events) t
            WHERE event_type = 'click' ORDER BY user_id, event_id"""))

  /** RANGE window frame (value-based, not row-based): for each event, how
    * many same-user events occurred in the preceding 10 minutes. Ordered by
    * exact epoch microseconds so the frame bounds are integers on both
    * engines. One shuffle on user_id, single ordered pass.
    */
  private val q55 = QueryDef(
    "q55_range_frame",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"))
        .rangeBetween(-600000000L, -1L)
      Tables(s, d, "events")
        .withColumn("ts_us", expr("unix_micros(ts)"))
        .withColumn("prior_10min", count(lit(1)).over(w))
        .select("user_id", "event_id", "ts", "prior_10min")
        .orderBy("user_id", "ts", "event_id")
    },
    Some("""SELECT user_id, event_id, ts, prior_10min FROM (
              SELECT user_id, event_id, ts,
                     COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                       RANGE BETWEEN 600000000 PRECEDING AND 1 PRECEDING) AS prior_10min
              FROM events) t
            ORDER BY user_id, ts, event_id"""))

  /** Daily active users + volume: the workhorse engagement rollup. One
    * shuffle; DISTINCT users via partial aggregation (at extreme scale swap
    * countDistinct for the q47 HLL sketch — same plan shape).
    */
  private val q64 = QueryDef(
    "q64_daily_active",
    (s, d) => Tables(s, d, "events")
      .groupBy(date_trunc("DAY", col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("dau"),
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"))
      .orderBy("day"),
    Some(s"""SELECT date_trunc('day', ts) AS day,
                    COUNT(DISTINCT user_id) AS dau,
                    COUNT(*) AS n_events,
                    ${sqlDsum("value")} AS total_value
             FROM events GROUP BY day ORDER BY day"""))

  /** Cohort retention: users bucketed by first-seen day, distinct actives
    * per (cohort, day-offset). Three shuffles — first-seen per user, daily
    * activity dedup, then the cohort rollup — each on a high-cardinality
    * key, no driver-side state.
    */
  private val q65 = QueryDef(
    "q65_retention_cohort",
    (s, d) => {
      val ev = Tables(s, d, "events")
      val firstDay = ev.groupBy("user_id")
        .agg(min(date_trunc("DAY", col("ts"))).as("cohort"))
      val activity = ev
        .select(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
        .distinct()
      activity.join(firstDay, "user_id")
        .withColumn("day_offset", datediff(col("day"), col("cohort")).cast("int"))
        .groupBy("cohort", "day_offset")
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort", "day_offset")
    },
    Some("""WITH fd AS (SELECT user_id, MIN(date_trunc('day', ts)) AS cohort
                        FROM events GROUP BY user_id),
                 act AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day
                         FROM events)
            SELECT cohort, CAST(date_diff('day', cohort, day) AS INT) AS day_offset,
                   COUNT(DISTINCT user_id) AS n_users
            FROM act JOIN fd USING (user_id)
            GROUP BY cohort, day_offset ORDER BY cohort, day_offset"""))

  /** Funnel conversion: of users whose journey contains a view, how many
    * click strictly after their first view. Two grouped aggregates and one
    * join, all on user_id — the per-user funnel state never leaves the
    * executors, and the output is one summary row.
    */
  private val q71 = QueryDef(
    "q71_funnel_conversion",
    (s, d) => {
      val ev = Tables(s, d, "events")
      val viewers = ev.groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("ts"))).as("first_view"))
        .filter(col("first_view").isNotNull)
      val clicks = ev.filter(col("event_type") === "click")
        .join(viewers, "user_id")
        .filter(col("ts") > col("first_view"))
        .groupBy("user_id")
        .agg(min(col("ts")).as("first_click_after"))
      viewers.join(clicks, Seq("user_id"), "left")
        .agg(count(lit(1)).as("n_viewers"),
          count(col("first_click_after")).as("n_converted"))
        .select(col("n_viewers"), col("n_converted"),
          (col("n_converted").cast("double") / col("n_viewers").cast("double"))
            .as("conv_rate"))
    },
    Some("""WITH viewers AS (
              SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view
              FROM events GROUP BY user_id HAVING first_view IS NOT NULL),
            clicks AS (
              SELECT e.user_id, MIN(e.ts) AS first_click_after
              FROM events e JOIN viewers v ON e.user_id = v.user_id
              WHERE e.event_type = 'click' AND e.ts > v.first_view
              GROUP BY e.user_id)
            SELECT COUNT(*) AS n_viewers,
                   COUNT(first_click_after) AS n_converted,
                   CAST(COUNT(first_click_after) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS conv_rate
            FROM viewers LEFT JOIN clicks USING (user_id)"""))

  /** SCD2-style state intervals: collapse each user's event stream to its
    * state CHANGES (event_type != previous), then build validity intervals
    * [valid_from, valid_to) via lead — the slowly-changing-dimension
    * construction every warehouse history table runs; the open current
    * state has a NULL valid_to. Two windows over the same (user, time)
    * partitioning — one sort, both computed in a single window stage.
    * event_id breaks timestamp ties deterministically and keys the sort.
    */
  private val q83 = QueryDef(
    "q83_scd2_intervals",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val changes = Tables(s, d, "events")
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      val w2 = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      changes
        .withColumn("valid_to", lead(col("ts"), 1).over(w2))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts").as("valid_from"), col("valid_to"))
        .orderBy("user_id", "valid_from", "event_id")
    },
    Some("""WITH changes AS (
              SELECT event_id, user_id, ts, event_type
              FROM (SELECT event_id, user_id, ts, event_type,
                           LAG(event_type, 1) OVER (PARTITION BY user_id
                             ORDER BY ts ASC, event_id ASC) AS prev_type
                    FROM events) t
              WHERE prev_type IS NULL OR prev_type <> event_type)
            SELECT event_id, user_id, event_type,
                   ts AS valid_from,
                   LEAD(ts, 1) OVER (PARTITION BY user_id
                     ORDER BY ts ASC, event_id ASC) AS valid_to
            FROM changes
            ORDER BY user_id, valid_from, event_id"""))

  /** Per-user event-rate anomaly detection: flag (user, day) cells whose
    * event count exceeds that user's own mean by 2.5 of the user's
    * standard deviations — the self-normalized spike detector behind
    * abuse monitoring and pipeline-health dashboards (a global threshold
    * would drown quiet users under loud ones; q90's global z-score is the
    * population form, this is the per-entity form).
    *
    * Cross-engine determinism: the window sums are pure integers (count,
    * sum, sum-of-squares over BIGINT counts — exact in any order); mean /
    * variance / sigma are then IEEE double arithmetic on bit-identical
    * operands in the identical expression order, and sqrt is correctly
    * rounded everywhere. GREATEST(var, 0) absorbs the tiny negative
    * variance cancellation can produce.
    *
    * Scale shape: one hash shuffle to (user_id, day) — high-cardinality
    * key, no skew exposure — then the per-user stats come from a window
    * over the DAILY frame, whose partitions are bounded by the calendar
    * (#days per user), not the corpus: no second shuffle of raw events,
    * no join, nothing driver-side. Only anomalous cells are emitted.
    */
  private val q118 = QueryDef(
    "q118_event_anomaly",
    (s, d) => {
      val daily = Tables(s, d, "events")
        .groupBy(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"))
      val w = Window.partitionBy("user_id")
      val n = count(lit(1)).over(w).cast("double")
      val sc = sum(col("n_events")).over(w).cast("double")
      val sq = sum(col("n_events") * col("n_events")).over(w).cast("double")
      val mean = sc / n
      val sigma = sqrt(greatest((sq - sc * sc / n) / n, lit(0.0)))
      daily.withColumn("user_mean", mean).withColumn("user_std", sigma)
        .filter(col("user_std") > 0 &&
          col("n_events").cast("double") >
            col("user_mean") + lit(2.5) * col("user_std"))
        .withColumn("z",
          (col("n_events").cast("double") - col("user_mean")) / col("user_std"))
        .select("user_id", "day", "n_events", "user_mean", "user_std", "z")
        .orderBy("user_id", "day")
    },
    Some("""WITH daily AS (SELECT user_id, date_trunc('day', ts) AS day,
                                  COUNT(*) AS n_events
                           FROM events GROUP BY user_id, day),
                 st AS (SELECT user_id, day, n_events,
                          CAST(CAST(COUNT(*) OVER (PARTITION BY user_id)
                            AS BIGINT) AS DOUBLE) AS n,
                          CAST(CAST(SUM(n_events) OVER (PARTITION BY user_id)
                            AS BIGINT) AS DOUBLE) AS sc,
                          CAST(CAST(SUM(n_events * n_events)
                            OVER (PARTITION BY user_id)
                            AS BIGINT) AS DOUBLE) AS sq
                        FROM daily),
                 s2 AS (SELECT user_id, day, n_events,
                          sc / n AS user_mean,
                          sqrt(GREATEST((sq - sc * sc / n) / n, 0.0)) AS user_std
                        FROM st)
            SELECT user_id, day, n_events, user_mean, user_std,
                   (CAST(n_events AS DOUBLE) - user_mean) / user_std AS z
            FROM s2
            WHERE user_std > 0
              AND CAST(n_events AS DOUBLE) > user_mean + 2.5 * user_std
            ORDER BY user_id, day"""))

  /** k-anonymity audit over the quasi-identifier (event_type, day,
    * value-decade): every group observable by fewer than k = 5 distinct
    * users is a re-identification risk — the privacy-governance
    * complement of q85's PII redaction (there: scrub direct identifiers;
    * here: find indirect ones). The audit output is the risky-group list
    * a release review suppresses or generalizes.
    *
    * Scale shape: one hash aggregate on the quasi-identifier (the
    * distinct-user count shuffles (qid-tuple, user) pairs once); the
    * group space is bounded by types × days × value-decades, orders of
    * magnitude under the event count, and only sub-k groups are emitted.
    * floor(value/10) is exact IEEE on both engines.
    */
  private val q122 = QueryDef(
    "q122_k_anonymity",
    (s, d) => Tables(s, d, "events")
      .groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("day"),
        floor(col("value") / lit(10.0)).cast("long").as("value_decade"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .filter(col("n_users") < 5)
      .orderBy("event_type", "day", "value_decade"),
    Some("""SELECT event_type, date_trunc('day', ts) AS day,
                   CAST(FLOOR(value / 10.0) AS BIGINT) AS value_decade,
                   COUNT(DISTINCT user_id) AS n_users,
                   COUNT(*) AS n_events
            FROM events
            GROUP BY event_type, day, value_decade
            HAVING COUNT(DISTINCT user_id) < 5
            ORDER BY event_type, day, value_decade"""))

  /** Purged temporal train/test split (the time-series twin of q124's
    * cluster-aware content split): train strictly before the embargo,
    * test strictly after the cutoff, and the two embargo days BETWEEN
    * them dropped entirely. A plain temporal cut leaks whenever features
    * are computed over trailing windows — a training event at 23:59 of
    * the last train day contributes to rolling aggregates that cross
    * into the test period, so the model trains on information adjacent
    * to what it is evaluated on; the embargo must cover the longest
    * feature window (2 days here, matching the repo's widest rolling
    * frame). The report is the audit: per split, event/user counts and
    * the first/last day — train's last day < test's first day minus the
    * gap, visible in the output rather than asserted in prose.
    *
    * Scale shape: one scan, map-only split tagging, a 3-row aggregate
    * with map-side partials (countDistinct shuffles (split, user) pairs,
    * user-cardinality-bounded). Nothing else moves.
    */
  private val q150 = QueryDef(
    "q150_purged_temporal_split",
    (s, d) => {
      val embargoStart = to_timestamp(lit("2024-01-20 00:00:00"))
      val testStart = to_timestamp(lit("2024-01-22 00:00:00"))
      Tables(s, d, "events")
        .select(col("ts"), col("user_id"),
          when(col("ts") < embargoStart, lit("1_train"))
            .when(col("ts") < testStart, lit("2_purged"))
            .otherwise(lit("3_test")).as("split"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          date_trunc("day", min(col("ts"))).as("first_day"),
          date_trunc("day", max(col("ts"))).as("last_day"))
        .orderBy("split")
    },
    Some("""SELECT split, COUNT(*) AS n_events,
                   COUNT(DISTINCT user_id) AS n_users,
                   date_trunc('day', MIN(ts)) AS first_day,
                   date_trunc('day', MAX(ts)) AS last_day
            FROM (SELECT ts, user_id,
                    CASE WHEN ts < TIMESTAMP '2024-01-20 00:00:00'
                           THEN '1_train'
                         WHEN ts < TIMESTAMP '2024-01-22 00:00:00'
                           THEN '2_purged'
                         ELSE '3_test' END AS split
                  FROM events) t
            GROUP BY split ORDER BY split"""))

  /** Incremental SCD2 maintenance: apply a CDC batch to a PERSISTED
    * interval table (q83's output shape) without rebuilding history —
    * the q139 incremental-clusters discipline applied to the warehouse
    * history table. Closed intervals of untouched keys pass through
    * with zero per-row work (one anti join against the batch-bounded
    * key set); for touched keys, the OPEN interval is re-seeded as a
    * pseudo-event and the q83 state-change collapse re-runs over
    * (seed + batch) only — batch-bounded, never history-sized. Replay
    * safe: an already-applied change collapses against the open state
    * it created (same type → no new interval).
    *
    * `current` must predate every batch event (the CDC contract: the
    * history table is as-of the last watermark) — a batch event OLDER
    * than a key's open interval would need retro-splitting, which SCD2
    * CDC appliers reject upstream.
    */
  def scd2Apply(current: org.apache.spark.sql.DataFrame,
      batch: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val touched = batch.select("user_id").distinct()
    val untouched = current.join(broadcast(touched), Seq("user_id"), "left_anti")
    val curTouched = current.join(broadcast(touched), Seq("user_id"))
    val closed = curTouched.filter(col("valid_to").isNotNull)
      .select("event_id", "user_id", "event_type", "valid_from", "valid_to")
    val seed = curTouched.filter(col("valid_to").isNull)
      .select(col("event_id"), col("user_id"),
        col("valid_from").as("ts"), col("event_type"))
    val stream = seed.unionByName(
      batch.select("event_id", "user_id", "ts", "event_type"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val reopened = stream
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").as("valid_from"), col("valid_to"))
    untouched.select("event_id", "user_id", "event_type",
        "valid_from", "valid_to")
      .unionByName(closed).unionByName(reopened)
  }

  /** q155: the incremental path proven against the full rebuild — the
    * history table is bootstrapped from the pre-cutoff stream (in
    * production it is the PERSISTED artifact), the post-cutoff events
    * arrive as the CDC batch, and the ORACLE is q83's from-scratch
    * construction over the full stream: incremental apply must
    * reproduce the complete rebuild exactly, row for row.
    */
  private val q155 = QueryDef(
    "q155_scd2_apply",
    (s, d) => {
      val cutoff = to_timestamp(lit("2024-01-22 00:00:00"))
      val ev = Tables(s, d, "events")
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val current = ev.filter(col("ts") < cutoff)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts").as("valid_from"), col("valid_to"))
        .localCheckpoint(true) // the persisted history artifact stand-in
      scd2Apply(current, ev.filter(col("ts") >= cutoff))
        .orderBy("user_id", "valid_from", "event_id")
    },
    Some("""WITH changes AS (
              SELECT event_id, user_id, ts, event_type
              FROM (SELECT event_id, user_id, ts, event_type,
                           LAG(event_type, 1) OVER (PARTITION BY user_id
                             ORDER BY ts ASC, event_id ASC) AS prev_type
                    FROM events) t
              WHERE prev_type IS NULL OR prev_type <> event_type)
            SELECT event_id, user_id, event_type,
                   ts AS valid_from,
                   LEAD(ts, 1) OVER (PARTITION BY user_id
                     ORDER BY ts ASC, event_id ASC) AS valid_to
            FROM changes
            ORDER BY user_id, valid_from, event_id"""))

  /** q159: point-in-interval (range) join with NO equality key — "which
    * surge windows does each event fall in". Surge windows are derived
    * from the data itself: per event type, the top-4 events by
    * (value DESC, event_id ASC) each open a ±90-minute window; windows
    * overlap and are unaligned, so no natural join key exists. The join
    * runs through [[graft.operators.IntervalJoin]] — fixed 3-hour time
    * buckets turn the non-equi predicate into ONE hash equality join
    * (each window covers ≤ 2 buckets, each event maps to 1) — never a
    * nested-loop/cartesian scan of points × windows. At this SF the 20
    * windows broadcast and the event side never shuffles; at 10⁶ windows
    * the same plan becomes a bucket-keyed shuffle join, which is the
    * point of the operator. The oracle states the predicate naively
    * (ts >= ws AND ts < we) — semantics pinned, shape free.
    */
  private val q159 = QueryDef(
    "q159_interval_join",
    (s, d) => {
      val ev = Tables(s, d, "events")
      val peaks = graft.operators.GroupTopK.topK(
          ev.select(col("event_type").as("window_type"),
            col("event_id").as("peak_id"), col("ts").as("peak_ts"),
            col("value")),
          Seq(col("window_type")),
          Seq(col("value").desc, col("peak_id").asc),
          col("peak_id"), k = 4)
        .select(col("window_type"), col("peak_id"),
          (col("peak_ts") - expr("INTERVAL 90 MINUTES")).as("ws"),
          (col("peak_ts") + expr("INTERVAL 90 MINUTES")).as("we"))
      graft.operators.IntervalJoin.join(
          ev.select(col("event_id"), col("ts"), col("event_type"), col("value")),
          "ts", peaks, "ws", "we", bucketSeconds = 3 * 3600)
        .groupBy("window_type", "peak_id", "event_type")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .orderBy("window_type", "peak_id", "event_type")
    },
    Some(s"""WITH ranked AS (
               SELECT event_type AS window_type, event_id AS peak_id, ts AS peak_ts,
                      row_number() OVER (PARTITION BY event_type
                        ORDER BY value DESC, event_id ASC) AS rk
               FROM events),
             win AS (
               SELECT window_type, peak_id,
                      peak_ts - INTERVAL 90 MINUTE AS ws,
                      peak_ts + INTERVAL 90 MINUTE AS we
               FROM ranked WHERE rk <= 4)
             SELECT w.window_type, w.peak_id, e.event_type,
                    COUNT(*) AS n, ${sqlDsum("e.value")} AS total_value
             FROM win w JOIN events e ON e.ts >= w.ws AND e.ts < w.we
             GROUP BY w.window_type, w.peak_id, e.event_type
             ORDER BY w.window_type, w.peak_id, e.event_type"""))

  /** q164: EXACT rolling 7-day distinct users per day — the metric
    * every engagement dashboard wants and the one a naive plan cannot
    * deliver at scale: `COUNT(DISTINCT user) OVER (RANGE 6 PRECEDING)`
    * is unsupported (distinct in a window), and the day × trailing-week
    * self-join reprocesses every event 7×. The scale-correct shape used
    * here: dedup to (user, day) presence (the same one shuffle any DAU
    * query pays), then per user turn consecutive seen-days into
    * DISJOINT contribution intervals [day, min(day+6, next_seen−1)] —
    * a user seen on day d is "active" for the 7 windows d..d+6, minus
    * the overlap the next sighting already covers. Each presence row
    * explodes into ≤ 7 day rows and each user hits each day AT MOST
    * ONCE (intervals are disjoint by construction), so the final
    * per-day aggregate is a plain COUNT(*) — no distinct, no 7× event
    * reprocess, no window over the corpus. The per-user lead() window
    * partitions on user_id with calendar-bounded partitions. The
    * oracle states the semantics naively (days × presence BETWEEN
    * join + COUNT DISTINCT) — shape free, values pinned.
    */
  private val q164 = QueryDef(
    "q164_rolling_distinct_users",
    (s, d) => {
      // (user, day) presence feeds BOTH the contribution explode and
      // the day axis — materialize once or the events scan + dedup
      // shuffle (the query's dominant cost) runs twice
      val ud = Tables(s, d, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        .localCheckpoint(true)
      val w = Window.partitionBy("user_id").orderBy("day")
      val contrib = ud
        .withColumn("next_day", lead(col("day"), 1).over(w))
        .withColumn("until",
          when(col("next_day").isNull, date_add(col("day"), 6))
            .otherwise(least(date_add(col("day"), 6),
              date_sub(col("next_day"), 1))))
        .withColumn("d", explode(expr("sequence(day, until)")))
        .select("user_id", "d")
      val days = ud.select(col("day").as("d")).distinct()
      contrib.join(days, "d")
        .groupBy("d").agg(count(lit(1)).as("n_users_7d"))
        .orderBy("d")
    },
    Some("""WITH ud AS (
              SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
            days AS (SELECT DISTINCT day AS d FROM ud)
            SELECT d, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_7d
            FROM days JOIN ud ON ud.day BETWEEN d - 6 AND d
            GROUP BY d ORDER BY d"""))

  /** q169: per-event-type daily-volume TREND (least-squares slope +
    * intercept over the day index) — the "is this metric growing?"
    * query every ops dashboard runs. The regression is closed-form
    * from five sums (n, Σx, Σy, Σxy, Σx²), so the plan is: one
    * (type, day) count shuffle, then ONE map-combined aggregate to
    * #types rows — no window, no per-type iteration, nothing driver-
    * side. Cross-engine exactness: all five sums are INTEGER (exact,
    * order-insensitive); slope is numerator/denominator as one IEEE
    * division of two exactly-computed longs, and the intercept reuses
    * slope with an identically-parenthesized expression — bit-equal
    * on both engines.
    */
  private val q169 = QueryDef(
    "q169_daily_trend",
    (s, d) => {
      val daily = Tables(s, d, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
        .withColumn("x", datediff(col("day"), to_date(lit("2024-01-01"))).cast("long"))
      val sums = daily.groupBy("event_type").agg(
        count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      // a single-distinct-day group has denominator 0: 0/0 is NaN on
      // Spark but renders differently across engines — an undefined
      // slope is NULL on both sides (the oracle's NULLIF), never NaN
      val denom = col("n") * col("sxx") - col("sx") * col("sx")
      val slope = when(denom =!= 0,
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          denom.cast("double"))
      sums.select(col("event_type"), col("n").as("n_days"),
          slope.as("slope"),
          ((col("sy").cast("double") - slope * col("sx").cast("double")) /
            col("n").cast("double")).as("intercept"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (
              SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS y
              FROM events GROUP BY 1, 2),
            sums AS (
              SELECT event_type, COUNT(*) AS n,
                     CAST(SUM(datediff('day', DATE '2024-01-01', day)) AS BIGINT) AS sx,
                     CAST(SUM(y) AS BIGINT) AS sy,
                     CAST(SUM(datediff('day', DATE '2024-01-01', day) * y) AS BIGINT) AS sxy,
                     CAST(SUM(datediff('day', DATE '2024-01-01', day)
                              * datediff('day', DATE '2024-01-01', day)) AS BIGINT) AS sxx
              FROM daily GROUP BY event_type)
            SELECT event_type, n AS n_days,
                   CAST(n * sxy - sx * sy AS DOUBLE)
                     / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0) AS slope,
                   (CAST(sy AS DOUBLE)
                      - (CAST(n * sxy - sx * sy AS DOUBLE)
                           / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0))
                        * CAST(sx AS DOUBLE))
                     / CAST(n AS DOUBLE) AS intercept
            FROM sums ORDER BY event_type"""))

  override def defs: Seq[QueryDef] =
    Seq(q39, q40, q41, q42, q50, q55, q64, q65, q71, q83, q118, q122, q150,
      q155, q159, q164, q169)
}
