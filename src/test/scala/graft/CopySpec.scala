package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import graft.operators.{Copy, Extract}

/** Cross-store copy semantics (mirror of copy_rows/copy_table_rows tests,
  * /root/reference/test/integration/etl/test_etl_transform.py:28-90):
  * read -> transform -> write as one plan; transform applied exactly once.
  */
class CopySpec extends SparkSuite {
  import Fixture._

  private val db = DbParams("derby", filename = "memory:copydb;create=true")

  private def exec(ddl: String): Unit = {
    val conn = DriverManager.getConnection(db.jdbcUrl)
    try {
      try { conn.createStatement().execute(ddl) }
      catch { case _: java.sql.SQLException if ddl.startsWith("DROP") => () }
    } finally conn.close()
  }

  private val tableDdl = "(id INT PRIMARY KEY, value DOUBLE NOT NULL," +
    " simple_text VARCHAR(100), utf8_text VARCHAR(100), day DATE, date_time TIMESTAMP)"

  test("copyTableRows: whole-table derby -> derby") {
    exec("DROP TABLE src_t"); exec("DROP TABLE dest_t")
    exec(s"CREATE TABLE src_t $tableDdl"); exec(s"CREATE TABLE dest_t $tableDdl")
    import spark.implicits._
    CopyFixtures.loadFixture(spark, db, "src_t")
    val r = Copy.copyTableRows(spark, db, db, "src_t", target = Some("dest_t"))
    assert(r.processed == 3 && r.failed == 0)
    val back = Extract.fromJdbc(spark, db, "SELECT * FROM dest_t")
    assert(back.count() == 3)
  }

  test("copyRows with transform: filter + computed column land transformed") {
    exec("DROP TABLE dest_agg")
    exec("CREATE TABLE dest_agg (id INT, value DOUBLE)")
    import spark.implicits._
    val src = spark.createDataset(rows).toDF()
    val r = Copy.copyRows(src, db, "dest_agg",
      transform = d => d.filter(col("id") > 1)
        .select(col("id") + 1000 as "id", col("value")))
    assert(r.processed == 2 && r.failed == 0)
    val got = Extract.fromJdbc(spark, db, "SELECT * FROM dest_agg")
      .orderBy("ID").collect()
    assert(got.map(_.getAs[Int]("ID")).toSeq == Seq(1002, 1003))
  }

  test("copyParquet with partitionBy lays out hive dirs and prunes on read") {
    val destPath = tmpDir("copy-part") + "/out"
    Copy.copyParquet(spark, "/root/testdata/sf0.001/lineitem.parquet", destPath,
      partitionByCols = Seq("l_returnflag"))
    val dirs = new java.io.File(destPath).listFiles().map(_.getName).filter(_.startsWith("l_returnflag="))
    assert(dirs.toSet == Set("l_returnflag=A", "l_returnflag=N", "l_returnflag=R"))
    val pruned = spark.read.parquet(destPath).filter(col("l_returnflag") === "A")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("l_returnflag"),
      s"partition pruning should appear in scan:\n$plan")
    assert(pruned.count() ==
      Tables(spark, "/root/testdata/sf0.001", "lineitem")
        .filter(col("l_returnflag") === "A").count())
  }

  test("compactParquet rewrites a many-small-files dataset to the sized " +
    "file count with identical data") {
    import spark.implicits._
    val srcPath = tmpDir("compact-src")
    // 40 tiny files (one per partition)
    (1 to 2000).map(i => (i.toLong, s"doc $i body"))
      .toDF("id", "body").repartition(40)
      .write.mode("overwrite").parquet(srcPath)
    val before = new java.io.File(srcPath).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before == 40)
    val destPath = tmpDir("compact-dest") + "/out"
    val n = Copy.compactParquet(spark, srcPath, destPath,
      targetFileBytes = 512L * 1024)
    val after = new java.io.File(destPath).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(after == n && after < before, s"expected $n files, got $after (before=$before)")
    // identical data
    assert(spark.read.parquet(destPath).orderBy("id").collect().toSeq ==
      spark.read.parquet(srcPath).orderBy("id").collect().toSeq)
    // self-overwrite guard catches path spellings of the same dir AND
    // nesting in either direction
    assertThrows[IllegalArgumentException](
      Copy.compactParquet(spark, srcPath, srcPath + "/"))
    assertThrows[IllegalArgumentException](
      Copy.compactParquet(spark, srcPath, srcPath + "/nested"))
    assertThrows[IllegalArgumentException](
      Copy.compactParquet(spark, srcPath + "/part", srcPath))
  }

  test("copyParquet: parquet -> transform -> parquet single lazy plan") {
    import spark.implicits._
    val srcPath = tmpDir("copy-src")
    spark.createDataset(rows).toDF().write.mode("overwrite").parquet(srcPath)
    val destPath = tmpDir("copy-dest") + "/out"
    Copy.copyParquet(spark, srcPath, destPath,
      transform = _.withColumn("value", col("value") * 2))
    val back = spark.read.parquet(destPath).orderBy("id")
    assert(back.head().getAs[Double]("value") == 2.468)
  }
}

/** Test-only helper keeping LoadSpec/CopySpec independent. */
private object CopyFixtures {
  def loadFixture(spark: org.apache.spark.sql.SparkSession, db: DbParams,
      table: String): Unit = {
    import spark.implicits._
    graft.operators.Load.load(spark.createDataset(Fixture.rows).toDF(), db, table)
  }
}
