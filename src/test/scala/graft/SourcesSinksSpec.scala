package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.functions._
import graft.operators.{ApiSink, Extract}

/** CSV/JSON file-format parity and the injectable-transport API sink. */
class SourcesSinksSpec extends SparkSuite {
  import Fixture._

  private def fixtureDf = {
    import spark.implicits._
    spark.createDataset(rows).toDF()
  }

  test("csv round-trip with explicit schema keeps types") {
    val p = tmpDir("csv-rt") + "/data"
    fixtureDf.write.option("header", "true").csv(p)
    val back = Extract.fromCsv(spark, p, Some(fixtureDf.schema), multiLine = true).orderBy("id")
    assert(back.count() == 3)
    assert(back.head().getAs[java.sql.Timestamp]("date_time") ==
      java.sql.Timestamp.valueOf("2018-12-07 13:01:59"))
    assert(back.schema("value").dataType.typeName == "double")
  }

  test("json-lines round-trip") {
    val p = tmpDir("json-rt") + "/data"
    fixtureDf.write.json(p)
    val back = Extract.fromJson(spark, p, Some(fixtureDf.schema)).orderBy("id")
    assert(back.count() == 3)
    assert(back.head().getAs[String]("utf8_text") == "Öæ°\nz")
  }

  test("orc round-trip keeps types and UTF-8 content") {
    val p = tmpDir("orc-rt") + "/data"
    fixtureDf.write.orc(p)
    val back = Extract.fromOrc(spark, p).orderBy("id")
    assert(back.count() == 3)
    assert(back.head().getAs[String]("utf8_text") == "Öæ°\nz")
    assert(back.schema("value").dataType.typeName == "double")
    // predicate pushdown reaches the ORC scan like parquet
    val plan = Extract.fromOrc(spark, p).filter(col("id") === 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"), plan)
  }

  test("text source reads one row per line into a `value` column") {
    val p = tmpDir("text-src")
    java.nio.file.Files.write(java.nio.file.Paths.get(p, "corpus.txt"),
      "first line\nsecond line\nthird".getBytes("UTF-8"))
    val back = Extract.fromText(spark, p)
    assert(back.columns.toSeq == Seq("value"))
    assert(back.count() == 3)
    assert(back.orderBy("value").head().getString(0) == "first line")
  }

  test("xml source reads one row per rowTag element, keeps UTF-8 and " +
    "nested attributes") {
    val p = tmpDir("xml-src")
    java.nio.file.Files.write(java.nio.file.Paths.get(p, "feed.xml"),
      ("""<feed><doc id="1"><title>first</title><body>Öæ° text</body></doc>""" +
        """<doc id="2"><title>second</title><body>plain</body></doc></feed>""")
        .getBytes("UTF-8"))
    val back = Extract.fromXml(spark, p, rowTag = "doc").orderBy("_id")
    assert(back.count() == 2)
    val first = back.head()
    assert(first.getAs[Long]("_id") == 1L)
    assert(first.getAs[String]("body") == "Öæ° text")
  }

  test("schema evolution: mergeSchema unions parquet batches with " +
    "different columns (nulls where absent)") {
    import spark.implicits._
    val p = tmpDir("schema-evo") + "/data"
    Seq((1, "a")).toDF("id", "old_col").write.parquet(p + "/batch=1")
    Seq((2, 3.5)).toDF("id", "new_col").write.parquet(p + "/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert(merged.columns.sorted.toSeq == Seq("batch", "id", "new_col", "old_col"))
    assert(merged.count() == 2)
    val r1 = merged.filter(col("id") === 1).head()
    assert(r1.getAs[String]("old_col") == "a" && r1.isNullAt(r1.fieldIndex("new_col")))
  }

  test("api sink posts bounded JSON batches and counts exactly") {
    ApiCollector.batches.clear()
    val df = fixtureDf.union(fixtureDf).union(fixtureDf).coalesce(2) // 9 rows
    val shipped = ApiSink.postJson(df, batchSize = 2)(ApiCollector.receive)
    assert(shipped == 9)
    val batches = ApiCollector.drain()
    assert(batches.map(_.size).sum == 9)
    assert(batches.forall(_.size <= 2))
    assert(batches.flatten.forall(_.contains("\"id\":")))
  }
}

/** Local-mode transport double: executors share this JVM in tests. */
object ApiCollector {
  val batches = new ConcurrentLinkedQueue[Seq[String]]()
  def receive(batch: Seq[String]): Unit = batches.add(batch)
  def drain(): Seq[Seq[String]] = {
    var out = Vector.empty[Seq[String]]
    var b = batches.poll()
    while (b != null) { out :+= b; b = batches.poll() }
    out
  }
}
