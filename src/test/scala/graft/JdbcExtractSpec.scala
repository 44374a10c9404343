package graft

import java.sql.DriverManager

import graft.operators.{Extract, Load}

/** Parallel partitioned JDBC extract — the upgrade the single-threaded
  * reference cannot do (SURVEY §1.1): numPartitions JDBC readers each pull
  * a key range concurrently.
  */
class JdbcExtractSpec extends SparkSuite {

  private val db = DbParams("derby", filename = "memory:jdbcx;create=true")

  test("partitioned JDBC read splits the key range across partitions") {
    val conn = DriverManager.getConnection(db.jdbcUrl)
    try {
      try conn.createStatement().execute("DROP TABLE big_t")
      catch { case _: java.sql.SQLException => () }
      conn.createStatement().execute(
        "CREATE TABLE big_t (id INT PRIMARY KEY, val DOUBLE)")
    } finally conn.close()
    import spark.implicits._
    Load.load((1 to 1000).map(i => (i, i * 1.5)).toDF("id", "val"), db, "big_t")

    // dbtable + partitionColumn: 4 concurrent range readers
    val df = spark.read.format("jdbc")
      .option("url", db.jdbcUrl)
      .option("driver", db.driverClass)
      .option("dbtable", "big_t")
      .option("partitionColumn", "id")
      .option("lowerBound", "1")
      .option("upperBound", "1000")
      .option("numPartitions", "4")
      .option("fetchsize", "100")
      .load()
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 1000)
    // every partition actually carries rows (ranges are non-degenerate)
    val sizes = df.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(sizes.forall(_ > 0) && sizes.sum == 1000)

    // the query-based path still works single-partition
    val q = Extract.fromJdbc(spark, db, "SELECT COUNT(*) AS n FROM big_t")
    assert(q.head().getAs[Number]("N").longValue() == 1000)
  }

  test("predicates-array read: one partition per predicate, disjoint " +
    "predicates partition the table exactly") {
    val preds = Seq("id <= 250", "id > 250 AND id <= 700", "id > 700")
    val df = Extract.fromJdbcPredicates(spark, db, "big_t", preds)
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == 1000)
    val sizes = df.rdd.mapPartitions(it => Iterator(it.size)).collect().sorted
    assert(sizes.toSeq == Seq(250, 300, 450))
  }

  test("fromJdbcAutoPartitioned probes bounds and fans out range readers; " +
    "empty table falls back to one partition") {
    val df = Extract.fromJdbcAutoPartitioned(spark, db, "big_t", "id", 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 1000)
    // date split columns work too (bounds travel as strings)
    val conn0 = DriverManager.getConnection(db.jdbcUrl)
    try {
      try conn0.createStatement().execute("DROP TABLE date_t")
      catch { case _: java.sql.SQLException => () }
      conn0.createStatement().execute("CREATE TABLE date_t (d DATE PRIMARY KEY, v INT)")
      val ins = conn0.prepareStatement("INSERT INTO date_t VALUES (?, ?)")
      (0 until 60).foreach { i =>
        ins.setDate(1, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)))
        ins.setInt(2, i); ins.addBatch()
      }
      ins.executeBatch()
    } finally conn0.close()
    val byDate = Extract.fromJdbcAutoPartitioned(spark, db, "date_t", "d", 3)
    assert(byDate.rdd.getNumPartitions == 3)
    assert(byDate.count() == 60)
    // empty predicate list must be rejected, not silently read zero rows
    assertThrows[IllegalArgumentException](
      Extract.fromJdbcPredicates(spark, db, "big_t", Seq.empty))
    val conn = DriverManager.getConnection(db.jdbcUrl)
    try {
      try conn.createStatement().execute("DROP TABLE empty_t")
      catch { case _: java.sql.SQLException => () }
      conn.createStatement().execute("CREATE TABLE empty_t (id INT PRIMARY KEY)")
    } finally conn.close()
    val empty = Extract.fromJdbcAutoPartitioned(spark, db, "empty_t", "id", 4)
    assert(empty.count() == 0)
  }

  test("JDBC scan pushes filter predicates and column projection into " +
    "the database (no full-table transfer)") {
    import org.apache.spark.sql.execution.RowDataSourceScanExec
    import org.apache.spark.sql.functions.col
    val df = spark.read.format("jdbc")
      .option("url", db.jdbcUrl)
      .option("driver", db.driverClass)
      .option("dbtable", "big_t")
      .load()
      .filter(col("id") > 500)
      .select("id")
    val scans = df.queryExecution.executedPlan.collect {
      case s: RowDataSourceScanExec => s
    }
    assert(scans.size == 1, "expected exactly one JDBC scan node")
    // the filter travels to the database as a pushed predicate...
    val pushed = scans.head.metadata("PushedFilters").toLowerCase
    assert(pushed.contains("greaterthan(id,500)"),
      s"filter not pushed into the JDBC source: $pushed")
    // ...and the scan fetches only the projected column, not the row
    assert(scans.head.output.map(_.name.toLowerCase) == Seq("id"),
      s"projection not pruned at the scan: ${scans.head.output}")
    assert(df.count() == 500)
  }

  test("withSafeColumnNames renames invalid/colliding columns positionally " +
    "(namedtuple row-factory parity)") {
    import spark.implicits._
    val df = Seq((1, 2, 3, 4)).toDF("good", "count(*)", "GOOD", "also_good")
    val safe = Extract.withSafeColumnNames(df)
    assert(safe.columns.toSeq == Seq("good", "_2", "_3", "also_good"))
    // all-valid names pass through untouched (same DataFrame)
    val clean = Seq((1, 2)).toDF("a", "b")
    assert(Extract.withSafeColumnNames(clean).columns.toSeq == Seq("a", "b"))
    // a pre-existing underscore name is itself renamed (namedtuple rule),
    // so positional _N targets can never collide with a kept column
    val tricky = Seq((1, 2, 3)).toDF("a", "_3", "b c")
    val safeTricky = Extract.withSafeColumnNames(tricky)
    assert(safeTricky.columns.toSeq == Seq("a", "_2", "_3"))
    assert(safeTricky.columns.distinct.length == 3)
    // dotted column names break select/INSERT resolution -> renamed
    val dotted = Seq((1, 2)).toDF("ok", "price.usd")
    assert(Extract.withSafeColumnNames(dotted).columns.toSeq == Seq("ok", "_2"))
  }
}
