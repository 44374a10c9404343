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
