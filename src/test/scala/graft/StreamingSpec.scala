package graft

import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStreams

/** Structured Streaming pipelines driven synchronously from static parquet
  * (memory sink + processAllAvailable — the deterministic local harness).
  */
class StreamingSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  /** File-stream sources need a directory; stage the single parquet file. */
  private lazy val streamDir: String = {
    val d = tmpDir("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$d/events.parquet"))
    d
  }

  test("tumbling window counts stream end-to-end and match the batch twin") {
    val events = EventStreams.readStream(spark, streamDir)
    val agg = EventStreams.windowedCounts(events, "15 minutes")
    val got = EventStreams.runToMemory(spark, agg, "tumbling_t", OutputMode.Complete())
    assert(got.count() > 0)
    // batch twin over the same data must agree on total event count
    val batchTotal = graft.queries.EventQueries.defs
      .find(_.name == "q39_tumbling_window").get
      .fn(spark, dir).agg(org.apache.spark.sql.functions.sum("n_events")).head().getLong(0)
    val streamTotal = got.agg(org.apache.spark.sql.functions.sum("n_events")).head().getLong(0)
    assert(streamTotal == batchTotal)
  }

  test("sliding windows emit ~3 windows per event") {
    val events = EventStreams.readStream(spark, streamDir)
    val agg = EventStreams.windowedCounts(events, "30 minutes", Some("10 minutes"))
    val got = EventStreams.runToMemory(spark, agg, "sliding_t", OutputMode.Complete())
    val nEvents = spark.read.parquet(s"$dir/events.parquet").count()
    val windowed = got.agg(org.apache.spark.sql.functions.sum("n_events")).head().getLong(0)
    assert(windowed == 3 * nEvents)
  }

  test("foreachBatch JDBC sink: micro-batch epochs land in Derby " +
    "(commit_chunks ~ epoch commits)") {
    val db = DbParams("derby", filename = "memory:streamdb;create=true")
    val conn = java.sql.DriverManager.getConnection(db.jdbcUrl)
    try {
      try conn.createStatement().execute("DROP TABLE stream_sink")
      catch { case _: java.sql.SQLException => () }
      conn.createStatement().execute(
        "CREATE TABLE stream_sink (window_start TIMESTAMP, event_type VARCHAR(20)," +
          " n_events BIGINT, total_value DOUBLE)")
    } finally conn.close()

    val events = EventStreams.readStream(spark, streamDir)
    val agg = EventStreams.windowedCounts(events, "1 hour", watermark = "5 minutes")
    val q = agg.writeStream
      .outputMode("append")
      .option("checkpointLocation", tmpDir("stream-ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.operators.Load.load(batch, db, "stream_sink")
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    // append mode with watermark: windows strictly before the final
    // watermark have been emitted and committed as epochs
    val got = graft.operators.Extract.fromJdbc(spark, db,
      "SELECT COUNT(*) AS n FROM stream_sink").head()
    assert(got.getAs[Number]("N").longValue() > 0)
  }

  test("event-time session windows close by gap and bound state via watermark") {
    val events = EventStreams.readStream(spark, streamDir)
    val sessions = EventStreams.sessionWindows(events, gap = "30 minutes",
      watermark = "1 hour")
    val got = EventStreams.runToMemory(spark, sessions, "sessions_t",
      OutputMode.Append())
    assert(got.count() > 0)
    // session windows: start <= end, gap semantics make end >= start always
    val bad = got.filter(org.apache.spark.sql.functions
      .col("session_end") < org.apache.spark.sql.functions.col("session_start")).count()
    assert(bad == 0)
  }

  test("watermark drops late data in append mode (out-of-order input)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val input = MemoryStream[(java.sql.Timestamp, String, Double)](spark)
    val agg = EventStreams.windowedCounts(
      input.toDF().toDF("ts", "event_type", "value"),
      width = "10 minutes", watermark = "10 minutes")
    val q = agg.writeStream.format("memory").queryName("late_t")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmpDir("late-ckpt"))
      .start()
    try {
      // batch 1: two events in the 10:00 window, plus 11:00 which advances
      // the watermark to 10:50 — the 10:00 window closes and emits n=2
      input.addData((ts("10:00"), "a", 1.0), (ts("10:05"), "a", 1.0), (ts("11:00"), "a", 1.0))
      q.processAllAvailable()
      // batch 2: a late event at 10:01, behind the watermark -> dropped
      input.addData((ts("10:01"), "a", 99.0))
      q.processAllAvailable()
      // batch 3: advance far enough to flush every remaining window
      input.addData((ts("12:00"), "a", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("late_t")
      .filter($"window_start" === ts("10:00")).collect()
    assert(got.length == 1, "the 10:00 window must emit exactly once")
    assert(got.head.getAs[Long]("n_events") == 2L,
      "late 10:01 event must NOT be counted")
    assert(got.head.getAs[Double]("total_value") == 2.0)
  }

  test("streaming dedup drops duplicate event_ids within the watermark, " +
    "across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val input = MemoryStream[(Long, java.sql.Timestamp)](spark)
    val deduped = EventStreams.dedupedStream(
      input.toDF().toDF("event_id", "ts"), watermark = "30 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_t")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmpDir("dedup-ckpt"))
      .start()
    try {
      // batch 1: id 1 twice in one batch + id 2
      input.addData((1L, ts("10:00")), (1L, ts("10:00")), (2L, ts("10:05")))
      q.processAllAvailable()
      // batch 2: id 1 again, still inside the watermark horizon -> dropped
      input.addData((1L, ts("10:01")), (3L, ts("10:10")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("dedup_t").collect()
    assert(got.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L),
      "each event_id must survive exactly once")
  }

  test("stream-stream interval join matches right events within the window, " +
    "same user only") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    val views = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    val joined = EventStreams.intervalJoin(
      clicks.toDF().toDF("event_id", "user_id", "ts"),
      views.toDF().toDF("event_id", "user_id", "ts"),
      within = "10 minutes")
      .selectExpr("l.event_id AS click_id", "r.event_id AS view_id",
        "l.user_id AS user_id")
    val q = joined.writeStream.format("memory").queryName("ssjoin_t")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmpDir("ssjoin-ckpt"))
      .start()
    try {
      clicks.addData((100L, 1L, ts("10:00")))
      views.addData(
        (200L, 1L, ts("10:05")), // same user, within 10 min -> match
        (201L, 1L, ts("10:20")), // same user, outside the interval -> no match
        (202L, 2L, ts("10:02"))) // different user -> no match
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ssjoin_t").collect()
    assert(got.length == 1)
    assert(got.head.getLong(0) == 100L && got.head.getLong(1) == 200L)
  }

  test("flatMapGroupsWithState sessionization: event-time timeout closes " +
    "and emits sessions once the watermark passes the gap") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    def ev(id: Long, user: Long, t: String, v: Double) =
      EventStreams.Event(id, ts(t), user, "click", v)
    val input = MemoryStream[EventStreams.Event](spark)
    val sessions = EventStreams.sessionizeWithState(input.toDS(), gapMinutes = 30)
    val q = sessions.toDF().writeStream.format("memory").queryName("fmgws_t")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmpDir("fmgws-ckpt"))
      .start()
    try {
      // open two sessions
      input.addData(ev(1, 1L, "10:00", 1.0), ev(2, 1L, "10:10", 2.0),
        ev(3, 2L, "10:05", 5.0))
      q.processAllAvailable()
      // a much later event advances the watermark past both sessions' gaps,
      // firing their event-time timeouts
      input.addData(ev(4, 3L, "13:00", 0.0))
      q.processAllAvailable()
      input.addData(ev(5, 3L, "16:00", 0.0)) // flush user 3's first session too
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("fmgws_t").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).sortBy(_._1)
    assert(got.exists(s => s._1 == 1L && s._2 == ts("10:00") && s._3 == ts("10:10")
      && s._4 == 2L && s._5 == 3.0), s"user1 session missing: ${got.mkString(",")}")
    assert(got.exists(s => s._1 == 2L && s._4 == 1L && s._5 == 5.0),
      s"user2 session missing: ${got.mkString(",")}")
  }

  test("idempotent epoch sink: replayed and partially-written epochs do " +
    "not duplicate rows; new epochs land exactly once") {
    import spark.implicits._
    import graft.streaming.IdempotentSink
    val db = DbParams("derby", filename = "memory:epochdb;create=true")
    def exec(sql: String): Unit =
      try graft.operators.Db.execute(db, sql)
      catch { case _: EtlQueryError => () }
    exec("DROP TABLE sink_data"); exec("DROP TABLE sink_epochs")
    exec("CREATE TABLE sink_data (event_id BIGINT PRIMARY KEY, v DOUBLE)")
    exec(IdempotentSink.ledgerDdl("sink_epochs"))

    val batch1 = Seq((1L, 1.0), (2L, 2.0)).toDF("event_id", "v")
    def countRows: Long = graft.operators.Extract.fromJdbc(spark, db,
      "SELECT COUNT(*) AS n FROM sink_data").head().getAs[Number](0).longValue()

    // first delivery writes
    assert(IdempotentSink.processEpoch(batch1, 0L, db, "sink_data",
      "sink_epochs", Seq("event_id"), "q"))
    assert(countRows == 2)
    // full replay of the same epoch (checkpoint recovery) is skipped
    assert(!IdempotentSink.processEpoch(batch1, 0L, db, "sink_data",
      "sink_epochs", Seq("event_id"), "q"))
    assert(countRows == 2)
    // partial epoch: rows landed but the ledger write was lost -> the keyed
    // appendIfAbsent finishes the epoch without duplicating them
    val batch2 = Seq((2L, 2.0), (3L, 3.0)).toDF("event_id", "v")
    assert(IdempotentSink.processEpoch(batch2, 1L, db, "sink_data",
      "sink_epochs", Seq("event_id"), "q"))
    assert(countRows == 3) // 2 deduped by key, 3 inserted
    // the streaming wiring end-to-end
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Double)](spark)
    val q = IdempotentSink.start(input.toDF().toDF("event_id", "v"), db,
      "sink_data", "sink_epochs", Seq("event_id"), tmpDir("epoch-ckpt"), "q_stream")
    try {
      input.addData((10L, 1.0), (11L, 2.0))
      q.processAllAvailable()
    } finally q.stop()
    assert(countRows == 5)
  }

  test("checkpoint-restart e2e: a query killed after the sink write but " +
    "before the streaming commit REPLAYS the epoch on restart, the " +
    "ledger dedupes it, and totals stay exactly-once") {
    import spark.implicits._
    import graft.streaming.IdempotentSink
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val db = DbParams("derby", filename = "memory:epochdb3;create=true")
    def exec(sql: String): Unit =
      try graft.operators.Db.execute(db, sql)
      catch { case _: EtlQueryError => () }
    exec("DROP TABLE restart_data"); exec("DROP TABLE restart_epochs")
    exec("CREATE TABLE restart_data (event_id BIGINT PRIMARY KEY, v DOUBLE)")
    exec(IdempotentSink.ledgerDdl("restart_epochs"))
    def countRows: Long = graft.operators.Db.queryScalarLong(db,
      "SELECT COUNT(*) FROM restart_data")

    val input = MemoryStream[(Long, Double)](spark)
    val ckpt = tmpDir("restart-ckpt")
    def startQuery() = IdempotentSink.start(input.toDF().toDF("event_id", "v"),
      db, "restart_data", "restart_epochs", Seq("event_id"), ckpt, "q_restart")

    val q1 = startQuery()
    try {
      input.addData((1L, 1.0), (2L, 2.0))
      q1.processAllAvailable()
    } finally {
      q1.stop()
      q1.awaitTermination() // fully release the checkpoint before restart
    }
    assert(countRows == 2)

    // the crash window steps 2+3 of the sink exist for: rows and ledger
    // are written but the streaming commit is not — delete the latest
    // commit marker so the restarted query replays that epoch from the
    // checkpointed offsets (exactly what recovery does after a real kill)
    val commits = new java.io.File(s"$ckpt/commits")
      .listFiles().filter(_.getName.forall(_.isDigit))
    assert(commits.nonEmpty, "checkpoint must have committed batches")
    val latest = commits.maxBy(_.getName.toInt)
    // drop the Hadoop checksum twin too: a stale .crc makes the replayed
    // commit's atomic re-create fail as a phantom concurrent writer
    val crc = new java.io.File(latest.getParentFile, s".${latest.getName}.crc")
    if (crc.exists()) assert(crc.delete())
    assert(latest.delete())

    val q2 = startQuery()
    try {
      q2.processAllAvailable() // recovery replays the uncommitted epoch
      assert(countRows == 2,
        "the replayed epoch must be deduped by the ledger, not re-appended")
      input.addData((3L, 3.0)) // and the restarted query keeps consuming
      q2.processAllAvailable()
    } finally q2.stop()
    assert(countRows == 3, "a new post-restart epoch must land exactly once")
    // the ledger holds one row per processed epoch, none double-recorded
    val epochs = graft.operators.Db.queryScalarLong(db,
      "SELECT COUNT(*) FROM restart_epochs WHERE query_name = 'q_restart'")
    val distinctEpochs = graft.operators.Db.queryScalarLong(db,
      "SELECT COUNT(DISTINCT epoch_id) FROM restart_epochs " +
        "WHERE query_name = 'q_restart'")
    assert(epochs == distinctEpochs && epochs >= 2)
  }

  test("idempotent epoch sink refuses to record an epoch with failed rows") {
    import spark.implicits._
    import graft.streaming.IdempotentSink
    val db = DbParams("derby", filename = "memory:epochdb2;create=true")
    def exec(sql: String): Unit =
      try graft.operators.Db.execute(db, sql)
      catch { case _: EtlQueryError => () }
    exec("DROP TABLE strict_data"); exec("DROP TABLE strict_epochs")
    exec("CREATE TABLE strict_data (event_id BIGINT PRIMARY KEY, v DOUBLE NOT NULL)")
    exec(IdempotentSink.ledgerDdl("strict_epochs"))
    // a NOT NULL violation quarantines one row -> the epoch must fail loudly
    val bad = Seq((1L, Some(1.0)), (2L, None))
      .toDF("event_id", "v").selectExpr("event_id", "CAST(v AS DOUBLE) AS v")
    intercept[EtlInsertError](IdempotentSink.processEpoch(bad, 0L, db,
      "strict_data", "strict_epochs", Seq("event_id"), "qs"))
    // the ledger did NOT record epoch 0: a clean retry still processes it
    val clean = Seq((1L, 1.0), (2L, 2.0)).toDF("event_id", "v")
    assert(IdempotentSink.processEpoch(clean, 0L, db,
      "strict_data", "strict_epochs", Seq("event_id"), "qs"))
    val n = graft.operators.Db.queryScalarLong(db,
      "SELECT COUNT(*) FROM strict_data")
    assert(n == 2)
  }

  test("flatMapGroupsWithState sessionization merges late-but-within-" +
    "watermark events instead of moving session bounds backwards") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    def ev(id: Long, user: Long, t: String, v: Double) =
      EventStreams.Event(id, ts(t), user, "click", v)
    val input = MemoryStream[EventStreams.Event](spark)
    val sessions = EventStreams.sessionizeWithState(input.toDS(),
      gapMinutes = 30, watermark = "10 minutes")
    val q = sessions.toDF().writeStream.format("memory").queryName("late_sess_t")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmpDir("late-sess-ckpt"))
      .start()
    try {
      input.addData(ev(1, 1L, "10:00", 1.0))
      q.processAllAvailable()
      // 09:59 is behind the session but above the watermark (09:50):
      // it must extend the session backwards, not reset its end
      input.addData(ev(2, 1L, "09:59", 2.0))
      q.processAllAvailable()
      input.addData(ev(3, 2L, "13:00", 0.0)) // advance watermark, fire timeout
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("late_sess_t")
      .filter($"user_id" === 1L).collect()
    assert(got.length == 1, s"one merged session expected: ${got.mkString(",")}")
    assert(got.head.getTimestamp(1) == ts("09:59")) // session_start min-adjusted
    assert(got.head.getTimestamp(2) == ts("10:00")) // session_end NOT moved back
    assert(got.head.getLong(3) == 2L)
  }

  test("flatMapGroupsWithState sessionization: a late event more than gap " +
    "BEFORE the open session becomes its own session, not a merged span") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    def ev(id: Long, user: Long, t: String, v: Double) =
      EventStreams.Event(id, ts(t), user, "click", v)
    val input = MemoryStream[EventStreams.Event](spark)
    val sessions = EventStreams.sessionizeWithState(input.toDS(),
      gapMinutes = 30, watermark = "3 hours") // watermark > gap: stray possible
    val q = sessions.toDF().writeStream.format("memory").queryName("stray_sess_t")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmpDir("stray-sess-ckpt"))
      .start()
    try {
      input.addData(ev(1, 1L, "12:00", 1.0))
      q.processAllAvailable()
      // 10:30 is 90 min before the open session yet above the watermark:
      // must NOT merge into [10:30,12:00]
      input.addData(ev(2, 1L, "10:30", 2.0))
      q.processAllAvailable()
      input.addData(ev(3, 2L, "16:00", 0.0)) // flush via timeout
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("stray_sess_t")
      .filter($"user_id" === 1L)
      .collect().map(r => (r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .sortBy(_._1.getTime)
    assert(got.length == 2, s"two sessions expected: ${got.mkString(",")}")
    assert(got(0) == ((ts("10:30"), ts("10:30"), 1L)))
    assert(got(1) == ((ts("12:00"), ts("12:00"), 1L)))
  }

  test("stateful running totals via mapGroupsWithState") {
    import spark.implicits._
    val events = EventStreams.readStream(spark, streamDir)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStreams.Event]
    val running = EventStreams.runningUserTotals(events)
    val got = EventStreams.runToMemory(spark, running.toDF(), "running_t",
      OutputMode.Update())
    assert(got.count() > 0)
    assert(got.select("user_id").distinct().count() ==
      spark.read.parquet(s"$dir/events.parquet")
        .select("user_id").distinct().count())
  }

  test("checkpoint restart: a stopped file-source stream resumes exactly " +
    "where it left off — no duplicates, no losses across the boundary") {
    import org.apache.spark.sql.functions._
    val srcDir = tmpDir("restart-src")
    val ckpt = tmpDir("restart-ckpt")
    val outDir = tmpDir("restart-out")

    // stage the corpus as two parquet files in whatever PHYSICAL ts type
    // this testdata generation carries — readStream sniffs and normalizes,
    // so staging must not force a schema; restore the session conf
    // afterwards so later tests see the default again (no order coupling)
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    val nanosPrev = spark.conf.getOption(nanosKey)
    spark.conf.set(nanosKey, "true")
    try {
    val all = spark.read.parquet(s"$dir/events.parquet")
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = tmpDir(s"restart-stage-$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$srcDir/$name.parquet"))
    }
    val first = all.filter(col("event_id") % 2 === 0)
    val second = all.filter(col("event_id") % 2 === 1)
    stage(first, "f1")

    def runOnce(): Long = {
      val q = EventStreams.readStream(spark, srcDir)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append())
        .start()
      try q.processAllAvailable() finally q.stop() // stop = the "kill"
      q.recentProgress.map(_.numInputRows).sum
    }

    val firstRows = runOnce()
    assert(firstRows == first.count(), "first run must ingest exactly file 1")

    // arrival of new data while the stream is down, then restart with the
    // SAME checkpoint and sink
    stage(second, "f2")
    val secondRows = runOnce()
    assert(secondRows == second.count(),
      s"restart must process only the new file, got $secondRows input rows")

    // the sink (guarded by its commit log) holds every event exactly once
    val out = spark.read.parquet(outDir)
    assert(out.count() == all.count())
    assert(out.select("event_id").distinct().count() == all.count())
    } finally {
      nanosPrev match {
        case Some(v) => spark.conf.set(nanosKey, v)
        case None    => spark.conf.unset(nanosKey)
      }
    }
  }

  test("streaming decontamination probes the static benchmark bloom " +
    "map-side — stateless plan, contaminated docs dropped in-flight") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import graft.functions.{BloomFunctions, TextFunctions}
    import graft.streaming.CorpusStreams

    // static benchmark: one eval doc -> distinct 5-gram fingerprints
    val bench = Seq((900L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val fp = TextFunctions.explodeShingles(
        bench.select("doc_id", "text"), col("text"), 5, "sh")
      .select(xxhash64(col("sh")).as("fp")).distinct()
    val bloom = BloomFunctions.buildLongBloom(fp, col("fp"), fp.count(), 0.01)

    val input = MemoryStream[(Long, String)](spark)
    val out = CorpusStreams.decontaminated(
      input.toDF().toDF("doc_id", "text"), bloom)
    val q = out.writeStream.format("memory").queryName("decon_t")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmpDir("decon-ckpt"))
      .start()
    try {
      input.addData(
        (1L, "alpha beta gamma delta epsilon"), // shares a bench 5-gram
        (2L, "totally novel words in here nothing shared with the suite"),
        (3L, "short doc")) // < 5 tokens -> no shingles -> kept
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("decon_t").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(2L, 3L),
      s"doc 1 must be dropped in-flight, 2 and 3 kept; got $kept")
    // the whole point: the streaming plan carries NO stateful operator
    // (progress must exist — a null would make this check vacuous)
    val progress = q.lastProgress
    assert(progress != null, "no progress recorded — cannot verify statelessness")
    assert(progress.stateOperators.isEmpty, "decontamination must be stateless")
  }

  test("streaming embedding near-dup gate: an incoming vector whose sign " +
    "code sits within the Hamming radius of the static corpus codes is " +
    "dropped in-flight — stateless plan, agrees with the batch packing") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.asDouble
    import graft.queries.SimilarityQueries
    import graft.streaming.CorpusStreams

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val corpus = emb.filter(col("vec_id") >= 100)
    val lanes = SimilarityQueries.binCodes(corpus)
      .select("w0", "w1").collect()
    val w0s = lanes.map(_.getLong(0)).toSeq
    val w1s = lanes.map(_.getLong(1)).toSeq
    val radius = 5

    // probes: fresh vectors (vec_id < 20) plus an exact copy of a corpus
    // vector under a new id — the copy's Hamming distance is 0, so the
    // gate MUST drop it whatever the corpus geometry
    val dupRow = corpus.filter(col("vec_id") === 100)
      .select(lit(-100L).as("vec_id"), col("v"))
    val probes = emb.filter(col("vec_id") < 20).unionAll(dupRow)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))

    // batch ground truth under the SAME packing convention
    val probeDf = probes.toSeq.toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    val pc = SimilarityQueries.binCodes(probeDf).select("vec_id", "w0", "w1")
    val cc = SimilarityQueries.binCodes(corpus)
      .select(col("w0").as("cw0"), col("w1").as("cw1"))
    val droppedExpected = pc.crossJoin(cc)
      .filter(expr(s"bit_count(w0 ^ cw0) + bit_count(w1 ^ cw1) <= $radius"))
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
    val keptExpected = probes.map(_._1).toSet -- droppedExpected
    assert(droppedExpected.contains(-100L), "the exact copy must be dropped")

    val input = MemoryStream[(Long, Seq[Double])](spark)
    val gated = CorpusStreams.embeddingNearDupGate(
      input.toDF().toDF("vec_id", "v"), w0s, w1s, radius)
    val q = gated.writeStream.format("memory").queryName("neardup_gate_t")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmpDir("neardup-gate-ckpt"))
      .start()
    try {
      input.addData(probes.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("neardup_gate_t").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == keptExpected,
      s"stream gate disagrees with batch packing: kept $kept, " +
        s"expected $keptExpected")
    val progress = q.lastProgress
    assert(progress != null, "no progress recorded — cannot verify statelessness")
    assert(progress.stateOperators.isEmpty,
      "the near-dup gate must be stateless")
  }

  test("decontaminated fails fast when the input already carries the " +
    "reserved __graft_tk column instead of silently destroying it") {
    import spark.implicits._
    import graft.streaming.CorpusStreams
    val docs = Seq((1L, "some text", "caller data"))
      .toDF("doc_id", "text", "__graft_tk")
    val ex = intercept[IllegalArgumentException] {
      CorpusStreams.decontaminated(docs, Array.fill(16)(0.toByte))
    }
    assert(ex.getMessage.contains("__graft_tk"))
  }

  test("streaming corpus-clean composite gates quality before the bloom " +
    "probe") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import graft.functions.BloomFunctions
    import graft.streaming.CorpusStreams

    // empty benchmark -> bloom rejects nothing; quality gate does the work
    val bloom = BloomFunctions.buildLongBloom(
      Seq.empty[Long].toDF("fp"), col("fp"), 0L, 0.01)
    val input = MemoryStream[(Long, String)](spark)
    val out = CorpusStreams.cleaned(
      input.toDF().toDF("doc_id", "text"), bloom, minQuality = 0.5)
    val q = out.writeStream.format("memory").queryName("clean_t")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmpDir("clean-ckpt"))
      .start()
    try {
      input.addData(
        (1L, "the quick brown fox jumps over the lazy dog and runs to the " +
          "hills in a fine morning light with a steady pace and a clear goal"),
        (2L, "!!! ??? ###")) // pure punctuation -> quality ~ 0
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("clean_t").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L), s"only the natural-text doc survives; got $kept")
  }

  test("streaming rate anomalies: a spike day is flagged against the " +
    "user's PRIOR days when it closes; quiet users and pre-baseline " +
    "days stay silent") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(day: Int, hh: Int, mm: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d $hh%02d:$mm%02d:00")
    var id = 0L
    def evs(user: Long, day: Int, n: Int): Seq[EventStreams.Event] =
      (0 until n).map { i =>
        id += 1
        EventStreams.Event(id, ts(day, 10, i), user, "click", 1.0)
      }
    val input = MemoryStream[EventStreams.Event](spark)
    val q = EventStreams.rateAnomalies(input.toDS(), minPriorDays = 3)
      .toDF().writeStream.format("memory").queryName("anom_t")
      .outputMode("update")
      .option("checkpointLocation", tmpDir("anom-ckpt"))
      .start()
    try {
      // user 1: three quiet days (2 events each), then a 10-event spike,
      // then one event the day after — which CLOSES the spike day.
      // user 2: uniform throughout — must never be flagged.
      input.addData(evs(1L, 1, 2) ++ evs(1L, 2, 2) ++ evs(1L, 3, 2)
        ++ evs(2L, 1, 2) ++ evs(2L, 2, 2) ++ evs(2L, 3, 2): _*)
      q.processAllAvailable()
      input.addData(evs(1L, 4, 10) ++ evs(2L, 4, 2): _*)
      q.processAllAvailable()
      // nothing emitted yet: day 4 is still open for both users
      assert(spark.table("anom_t").isEmpty)
      input.addData(evs(1L, 5, 1) ++ evs(2L, 5, 2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("anom_t")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.length == 1, s"exactly the spike day: ${got.mkString(",")}")
    val a = got.head
    assert(a._1 == 1L && a._3 == 10L)
    assert(a._4 == 2.0 && a._5 == 0.0,
      s"baseline must be the three quiet days: $a")
  }
}
