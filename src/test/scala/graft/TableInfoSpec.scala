package graft

import java.sql.DriverManager

import graft.operators.TableInfo

/** table_info semantics (mirror of /root/reference/test/integration/
  * test_utils.py:13-82): name/type/not_null/has_default flags; missing
  * table raises.
  */
class TableInfoSpec extends SparkSuite {

  private val db = DbParams("derby", filename = "memory:infodb;create=true")

  private def setup(): Unit = {
    val conn = DriverManager.getConnection(db.jdbcUrl)
    try {
      try { conn.createStatement().execute("DROP TABLE info_src") }
      catch { case _: java.sql.SQLException => () }
      conn.createStatement().execute(
        """CREATE TABLE info_src (
          |  id INT NOT NULL, value DOUBLE NOT NULL,
          |  simple_text VARCHAR(100) DEFAULT 'default',
          |  utf8_text VARCHAR(100))""".stripMargin)
    } finally conn.close()
  }

  test("fromJdbc reports name/type/not_null/has_default") {
    setup()
    val cols = TableInfo.fromJdbc(db, "info_src")
    assert(cols.map(_.name) == Seq("id", "value", "simple_text", "utf8_text"))
    val byName = cols.map(c => c.name -> c).toMap
    assert(byName("id").notNull && byName("value").notNull)
    assert(!byName("simple_text").notNull && !byName("utf8_text").notNull)
    assert(byName("simple_text").hasDefault)
    assert(!byName("utf8_text").hasDefault)
    assert(byName("id").dataType.toUpperCase.contains("INT"))
  }

  test("case folding follows the backend's catalog convention " +
    "(mixed-case lookup still resolves on an upper-folding store)") {
    val conn = DriverManager.getConnection(db.jdbcUrl)
    try {
      try { conn.createStatement().execute("DROP TABLE mixed_t") }
      catch { case _: java.sql.SQLException => () }
      conn.createStatement().execute(
        "CREATE TABLE mixed_t (id INT NOT NULL, label VARCHAR(10))")
    } finally conn.close()
    // Derby stores unquoted identifiers upper-cased; the fold must be asked
    // of DatabaseMetaData, not assumed — so any casing of the name resolves
    for (name <- Seq("mixed_t", "MIXED_T", "MiXeD_t")) {
      val cols = TableInfo.fromJdbc(db, name)
      assert(cols.map(_.name) == Seq("id", "label"), s"lookup of $name")
    }
  }

  test("underscore in a table name is escaped, not treated as a LIKE " +
    "wildcard matching sibling tables") {
    val conn = DriverManager.getConnection(db.jdbcUrl)
    try {
      for (t <- Seq("MY_TABLE", "MYXTABLE")) {
        try { conn.createStatement().execute(s"DROP TABLE $t") }
        catch { case _: java.sql.SQLException => () }
      }
      conn.createStatement().execute("CREATE TABLE my_table (a INT, b INT)")
      conn.createStatement().execute(
        "CREATE TABLE myxtable (c INT, d INT, e INT)")
    } finally conn.close()
    // without escaping, the MY_TABLE pattern matches both tables and the
    // column list silently merges (or a spurious ambiguity error fires)
    val cols = TableInfo.fromJdbc(db, "my_table")
    assert(cols.map(_.name) == Seq("a", "b"), cols.map(_.name).toString)
  }

  test("missing table raises EtlQueryError") {
    val e = intercept[EtlQueryError](TableInfo.fromJdbc(db, "no_such_table"))
    assert(e.getMessage.contains("not found"))
  }

  test("fromDataFrame maps nullability to not_null") {
    import spark.implicits._
    val df = spark.createDataset(Fixture.rows).toDF()
    val cols = TableInfo.fromDataFrame(df)
    assert(cols.map(_.name) ==
      Seq("id", "value", "simple_text", "utf8_text", "day", "date_time"))
    // primitives in a case class are non-nullable in the encoder schema
    assert(cols.find(_.name == "id").get.notNull)
    assert(!cols.find(_.name == "simple_text").get.notNull)
  }
}
