package graft

import java.sql.DriverManager

import graft.operators.{Extract, Load}

/** Executor-side onError capture: local-mode executors share this JVM, so a
  * static holder observes the distributed callback invocations.
  */
object LoadSpecState {
  val errors = new java.util.concurrent.ConcurrentLinkedQueue[graft.operators.FailedRow]()
  val calls = new java.util.concurrent.atomic.AtomicInteger()
  val totalRows = new java.util.concurrent.atomic.AtomicInteger()

  def reset(): Unit = { errors.clear(); calls.set(0); totalRows.set(0) }

  val record: Seq[graft.operators.FailedRow] => Unit = { rows =>
    calls.incrementAndGet()
    totalRows.addAndGet(rows.size)
    rows.foreach(errors.add)
  }
}

/** Load semantics against embedded Derby (the in-process JDBC backend):
  * mirror of /root/reference/test/integration/etl/test_etl_load.py —
  * happy path, duplicate-PK error channel with exact (processed, failed)
  * counts, empty input, identifier validation.
  */
class LoadSpec extends SparkSuite {
  import Fixture._

  private val db = DbParams("derby", filename = "memory:loaddb;create=true")

  private def withTable(name: String)(body: => Unit): Unit = {
    val conn = DriverManager.getConnection(db.jdbcUrl)
    try {
      try { conn.createStatement().execute(s"DROP TABLE $name") }
      catch { case _: java.sql.SQLException => () }
      conn.createStatement().execute(
        s"""CREATE TABLE $name (
           |  id INT PRIMARY KEY, value DOUBLE NOT NULL,
           |  simple_text VARCHAR(100) DEFAULT 'default',
           |  utf8_text VARCHAR(100), day DATE, date_time TIMESTAMP)""".stripMargin)
    } finally conn.close()
    body
  }

  private def rowCount(name: String): Int = {
    val conn = DriverManager.getConnection(db.jdbcUrl)
    try {
      val rs = conn.createStatement().executeQuery(s"SELECT COUNT(*) FROM $name")
      rs.next(); rs.getInt(1)
    } finally conn.close()
  }

  private def fixtureDf = {
    import spark.implicits._
    spark.createDataset(rows).toDF()
  }

  test("load: happy path writes all rows via Spark JDBC writer") {
    withTable("dest_happy") {
      Load.load(fixtureDf, db, "dest_happy")
      assert(rowCount("dest_happy") == 3)
    }
  }

  test("loadWithErrorChannel: clean input -> (3, 0)") {
    withTable("dest_clean") {
      val r = Load.loadWithErrorChannel(fixtureDf, db, "dest_clean")
      assert(r.processed == 3 && r.failed == 0 && r.failedRows.isEmpty)
      assert(rowCount("dest_clean") == 3)
    }
  }

  test("loadWithErrorChannel: duplicate PKs -> processed=6, failed=3, " +
    "good rows inserted, failures quarantined (reference count contract)") {
    withTable("dest_dupes") {
      val dupes = fixtureDf.union(fixtureDf) // 6 rows, 3 will hit PK conflicts
      val r = Load.loadWithErrorChannel(dupes.coalesce(1), db, "dest_dupes", chunkSize = 2)
      assert(r.processed == 6, s"processed=${r.processed}")
      assert(r.failed == 3, s"failed=${r.failed}")
      assert(r.failedRows.length == 3)
      assert(r.failedRows.head.error.toLowerCase.contains("duplicate")
        || r.failedRows.head.error.nonEmpty)
      assert(rowCount("dest_dupes") == 3)
    }
  }

  test("loadWithErrorChannel: failures spread across many chunks and " +
    "partitions keep exact counts") {
    withTable("dest_bulk") {
      import spark.implicits._
      // 1000 clean rows + 50 conflicting ids sprinkled through the range
      val base = (1 to 1000).map(i =>
        (i, i * 1.0, "t", "u", java.sql.Date.valueOf("2020-01-01"),
          java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
      val dupes = (1 to 1000 by 20).map(i =>
        (i, -1.0, "dup", "u", java.sql.Date.valueOf("2020-01-01"),
          java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
      val df = (base ++ dupes)
        .toDF("id", "value", "simple_text", "utf8_text", "day", "date_time")
        .repartition(4) // conflicts land in arbitrary chunks of arbitrary partitions
      val r = Load.loadWithErrorChannel(df, db, "dest_bulk", chunkSize = 100)
      assert(r.processed == 1050)
      assert(r.failed == 50, s"failed=${r.failed}")
      assert(rowCount("dest_bulk") == 1000)
    }
  }

  test("loadWithErrorChannel: empty input -> (0, 0) (load() empty contract)") {
    withTable("dest_empty") {
      val r = Load.loadWithErrorChannel(fixtureDf.limit(0), db, "dest_empty")
      assert(r.processed == 0 && r.failed == 0)
      assert(rowCount("dest_empty") == 0)
    }
  }

  test("loadWithErrorChannel: maxQuarantine bounds TOTAL quarantined rows " +
    "across partitions; failure counts stay exact") {
    withTable("dest_qbound") {
      import spark.implicits._
      val all = (1 to 200).map(i =>
        (i, i * 1.0, "t", "u", java.sql.Date.valueOf("2020-01-01"),
          java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
        .toDF("id", "value", "simple_text", "utf8_text", "day", "date_time")
      Load.load(all, db, "dest_qbound") // pre-populate: every re-insert conflicts
      val r = Load.loadWithErrorChannel(all.repartition(4), db, "dest_qbound",
        chunkSize = 25, maxQuarantine = 20)
      assert(r.failed == 200, s"failed=${r.failed}") // exact regardless of bound
      assert(r.processed == 200)
      // global bound: 4 partitions × (20/4) budget — never maxQuarantine × tasks
      assert(r.failedRows.length == 20, s"quarantined=${r.failedRows.length}")
      // more partitions than budget: remainder split keeps the EXACT bound
      val r2 = Load.loadWithErrorChannel(all.repartition(8), db, "dest_qbound",
        chunkSize = 25, maxQuarantine = 3)
      assert(r2.failed == 200)
      assert(r2.failedRows.length == 3, s"quarantined=${r2.failedRows.length}")
    }
  }

  test("loadWithErrorChannel: onError invoked per failed chunk with exactly " +
    "that chunk's failed rows (etl.py:305-320 parity)") {
    withTable("dest_onerr") {
      import spark.implicits._
      val all = (1 to 10).map(i =>
        (i, i * 1.0, "t", "u", java.sql.Date.valueOf("2020-01-01"),
          java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
        .toDF("id", "value", "simple_text", "utf8_text", "day", "date_time")
      Load.load(all, db, "dest_onerr")
      LoadSpecState.reset()
      val r = Load.loadWithErrorChannel(all.coalesce(1), db, "dest_onerr",
        chunkSize = 5, onError = Some(LoadSpecState.record))
      assert(r.failed == 10)
      assert(LoadSpecState.calls.get() == 2) // 10 rows / 5-row chunks, both failed
      assert(LoadSpecState.totalRows.get() == 10)
      assert(LoadSpecState.errors.iterator().next().error.nonEmpty)
    }
  }

  test("LOB round-trip: 40k-char CLOB and 40k-byte BLOB survive load + " +
    "extract (reference test_oracle.py:289-328 parity, via Derby)") {
    val conn = DriverManager.getConnection(db.jdbcUrl)
    try {
      try conn.createStatement().execute("DROP TABLE lob_t")
      catch { case _: java.sql.SQLException => () }
      conn.createStatement().execute(
        "CREATE TABLE lob_t (id INT PRIMARY KEY, big_text CLOB, big_bytes BLOB)")
    } finally conn.close()
    import spark.implicits._
    val bigText = "etlhelper" * 4445 + "END" // 40,008 chars
    val bigBytes = Array.tabulate[Byte](40000)(i => (i % 251).toByte)
    val df = Seq((1, bigText, bigBytes)).toDF("id", "big_text", "big_bytes")
    val r = Load.loadWithErrorChannel(df, db, "lob_t")
    assert(r.processed == 1 && r.failed == 0)
    val back = Extract.fromJdbc(spark, db,
      "SELECT id, big_text, big_bytes FROM lob_t").head()
    assert(back.getAs[String]("BIG_TEXT") == bigText)
    assert(back.getAs[Array[Byte]]("BIG_BYTES").sameElements(bigBytes))
  }

  test("short/byte columns bind natively (SMALLINT round-trip)") {
    val conn = DriverManager.getConnection(db.jdbcUrl)
    try {
      try conn.createStatement().execute("DROP TABLE small_t")
      catch { case _: java.sql.SQLException => () }
      conn.createStatement().execute(
        "CREATE TABLE small_t (id INT PRIMARY KEY, sv SMALLINT, bv SMALLINT)")
    } finally conn.close()
    import spark.implicits._
    val df = Seq((1, 32767.toShort, 127.toByte), (2, (-32768).toShort, (-128).toByte))
      .toDF("id", "sv", "bv")
    val r = Load.loadWithErrorChannel(df, db, "small_t")
    assert(r.processed == 2 && r.failed == 0)
    val back = Extract.fromJdbc(spark, db,
        "SELECT id, sv, bv FROM small_t ORDER BY id")
      .collect().map(x => (x.getInt(0), x.getAs[Number](1).intValue,
        x.getAs[Number](2).intValue)).toSeq
    assert(back == Seq((1, 32767, 127), (2, -32768, -128)))
  }

  test("nested column types (array/map/struct) fail fast with a clear bind " +
    "error instead of a driver-specific setObject failure") {
    withTable("dest_nested") {
      import spark.implicits._
      val df = Seq((1, Seq(1, 2, 3))).toDF("id", "value")
      val e = intercept[Exception] {
        Load.loadWithErrorChannel(df, db, "dest_nested")
      }
      val messages = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString("\n")
      assert(messages.contains("no portable binding for nested types"),
        s"expected the bind-time nested-type error, got:\n$messages")
    }
  }

  test("quarantinePath writes failed rows as a queryable parquet DLQ") {
    withTable("dest_dlq") {
      import spark.implicits._
      val all = (1 to 10).map(i =>
        (i, i * 1.0, "t", "u", java.sql.Date.valueOf("2020-01-01"),
          java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
        .toDF("id", "value", "simple_text", "utf8_text", "day", "date_time")
      Load.load(all, db, "dest_dlq") // pre-populate: re-insert all conflicts
      val dlq = tmpDir("dlq") + "/failed"
      val r = Load.loadWithErrorChannel(all, db, "dest_dlq",
        quarantinePath = Some(dlq))
      assert(r.failed == 10)
      val back = spark.read.parquet(dlq)
      assert(back.count() == 10)
      assert(back.columns.toSeq == Seq("values", "error"))
      assert(back.head().getSeq[String](0).nonEmpty)
    }
  }

  test("observed() exposes single-pass in-flight row metrics") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i, i * 2.0)).toDF("id", "v")
    val (out, obs) = Logging.observed(df.filter(org.apache.spark.sql.functions
      .col("id") > 40), "load_metrics")
    assert(out.count() == 60)
    assert(obs.get("rows") == 60L)
  }

  test("validateAgainstTable reports every schema problem in one error; " +
    "clean match passes") {
    withTable("dest_schema") {
      import spark.implicits._
      Load.validateAgainstTable(fixtureDf, db, "dest_schema") // clean: no throw
      // extra column + missing NOT NULL column, reported together
      val bad = Seq((1, "x")).toDF("id", "mystery_col")
      val e = intercept[EtlInsertError](
        Load.validateAgainstTable(bad, db, "dest_schema"))
      assert(e.getMessage.contains("mystery_col"))
      assert(e.getMessage.toLowerCase.contains("value")) // NOT NULL, no default
    }
  }

  test("invalid table name raises EtlBadIdentifierError before any SQL") {
    assertThrows[EtlBadIdentifierError](
      Load.loadWithErrorChannel(fixtureDf, db, "bad;table"))
  }

  test("generateInsertSql emits qmark-style INSERT from the schema") {
    val sql = Load.generateInsertSql("dest", fixtureDf.schema)
    assert(sql == "INSERT INTO dest (id, value, simple_text, utf8_text, day, date_time)" +
      " VALUES (?, ?, ?, ?, ?, ?)")
  }

  test("generateInsertSqlNamed emits named-paramstyle INSERT (reference " +
    "named/pyformat surface)") {
    val sql = Load.generateInsertSqlNamed("dest", fixtureDf.schema)
    assert(sql == "INSERT INTO dest (id, value, simple_text, utf8_text, day, date_time)" +
      " VALUES (:id, :value, :simple_text, :utf8_text, :day, :date_time)")
    assertThrows[EtlBadIdentifierError](
      Load.generateInsertSqlNamed("bad;table", fixtureDf.schema))
  }

  test("generateInsertSqlStyled renders all five reference paramstyles") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", IntegerType),
      StructField("name", StringType)))
    val cases = Seq(
      "qmark"    -> "VALUES (?, ?)",
      "numeric"  -> "VALUES (:1, :2)",
      "named"    -> "VALUES (:id, :name)",
      "format"   -> "VALUES (%s, %s)",
      "pyformat" -> "VALUES (%(id)s, %(name)s)")
    cases.foreach { case (style, tail) =>
      val sql = Load.generateInsertSqlStyled("dest", schema, style)
      assert(sql == s"INSERT INTO dest (id, name) $tail", s"style=$style")
    }
    // identifiers are validated in every style; unknown styles are rejected
    assertThrows[EtlBadIdentifierError](
      Load.generateInsertSqlStyled("bad;table", schema, "qmark"))
    assertThrows[IllegalArgumentException](
      Load.generateInsertSqlStyled("dest", schema, "qmarkish"))
  }

  test("round-trip: load then extract back preserves values incl UTF-8") {
    withTable("dest_rt") {
      Load.load(fixtureDf, db, "dest_rt")
      val back = Extract.fromJdbc(spark, db, "SELECT * FROM dest_rt")
      val got = back.orderBy("id").collect()
      assert(got.length == 3)
      assert(got.head.getAs[String]("UTF8_TEXT") == "Öæ°\nz")
    }
  }
}
