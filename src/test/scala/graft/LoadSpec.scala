package graft

import java.sql.DriverManager

import graft.operators.{Extract, Load}

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

  test("invalid table name raises EtlBadIdentifierError before any SQL") {
    assertThrows[EtlBadIdentifierError](
      Load.loadWithErrorChannel(fixtureDf, db, "bad;table"))
  }

  test("generateInsertSql emits qmark-style INSERT from the schema") {
    val sql = Load.generateInsertSql("dest", fixtureDf.schema)
    assert(sql == "INSERT INTO dest (id, value, simple_text, utf8_text, day, date_time)" +
      " VALUES (?, ?, ?, ?, ?, ?)")
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
