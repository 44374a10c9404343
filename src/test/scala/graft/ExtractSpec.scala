package graft

import org.apache.spark.sql.functions._
import graft.operators.Extract

/** Operator semantics of extract (mirror of
  * /root/reference/test/integration/etl/test_etl_extract.py and
  * test_etl_transform.py): chunk-boundary slicing, fetch variants, and all
  * transform styles over the canonical fixture.
  */
class ExtractSpec extends SparkSuite {
  import Fixture._

  private lazy val srcPath: String = {
    val p = tmpDir("extract-src")
    import spark.implicits._
    spark.createDataset(rows).toDF().coalesce(1).write.mode("overwrite").parquet(p)
    p
  }

  test("round-trip preserves all 6 column types incl UTF-8 + newline") {
    val df = Extract.fromParquet(spark, srcPath).orderBy("id")
    val got = Extract.fetchAll(df)
    assert(got.length == 3)
    assert(got.head.getAs[String]("utf8_text") == "Öæ°\nz")
    assert(got.head.getAs[java.sql.Date]("day") == java.sql.Date.valueOf("2018-12-07"))
    assert(got.head.getAs[java.sql.Timestamp]("date_time") ==
      java.sql.Timestamp.valueOf("2018-12-07 13:01:59"))
  }

  test("fetchOne returns first row; empty result returns None") {
    val df = Extract.fromParquet(spark, srcPath).orderBy("id")
    assert(Extract.fetchOne(df).map(_.getAs[Int]("id")).contains(1))
    assert(Extract.fetchOne(df.filter(col("id") > 100)).isEmpty)
  }

  for (chunkSize <- Seq(1, 2, 5000)) {
    test(s"iterChunks slices at chunk_size=$chunkSize") {
      val df = Extract.fromParquet(spark, srcPath).orderBy("id")
      val chunks = Extract.iterChunks(df, chunkSize).toSeq
      assert(chunks.map(_.size).sum == 3)
      assert(chunks.forall(_.size <= chunkSize))
      if (chunkSize == 1) assert(chunks.length == 3)
      if (chunkSize == 5000) assert(chunks.length == 1)
    }
  }

  test("transform: filter rows (id > 1) changes row count") {
    val df = Extract.withTransform(Extract.fromParquet(spark, srcPath))(
      _.filter(col("id") > 1))
    assert(df.count() == 2)
  }

  test("transform: project to (id, value)") {
    val df = Extract.withTransform(Extract.fromParquet(spark, srcPath))(
      _.select("id", "value"))
    assert(df.columns.toSeq == Seq("id", "value"))
  }

  test("transform: mutate id += 1000, upper(simple_text), strip newlines") {
    val df = Extract.withTransform(Extract.fromParquet(spark, srcPath)) { d =>
      d.withColumn("id", col("id") + 1000)
        .withColumn("simple_text", upper(col("simple_text")))
        .withColumn("utf8_text", regexp_replace(col("utf8_text"), "\n", " "))
    }.orderBy("id")
    val first = df.head()
    assert(first.getAs[Int]("id") == 1001)
    assert(first.getAs[String]("simple_text") == "TEXT")
    assert(first.getAs[String]("utf8_text") == "Öæ° z")
  }

  test("typed chunk transform: mapPartitions may reshape and multiply rows") {
    import spark.implicits._
    val ds = Extract.fromParquet(spark, srcPath).as[SrcRow]
    // 1 -> N generator-style transform (test_etl_transform.py:120-133 analogue)
    val out = Extract.transformChunks(ds)(it =>
      it.flatMap(r => Seq(r.id, r.id * 10)))
    assert(out.collect().sorted.toSeq == Seq(1, 2, 3, 10, 20, 30))
  }

  test("parameterized predicate closure (bind analogue)") {
    val minId = 2 // the "bind parameter"
    val df = Extract.fromParquet(spark, srcPath).filter(col("id") >= minId)
    assert(df.count() == 2)
  }

  test("tuple-typed facade (tuple_row_factory parity) gives positional access") {
    import spark.implicits._
    val ds = Extract.fromParquet(spark, srcPath)
      .select("id", "value").as[(Int, Double)]
    val got = ds.collect().sortBy(_._1)
    assert(got.head == ((1, 1.234)))
    assert(got.map(_._1).toSeq == Seq(1, 2, 3))
  }

  test("incremental extract filters by watermark and pushes the predicate") {
    val df = Extract.incremental(
      Extract.fromParquet(spark, srcPath), "day", java.sql.Date.valueOf("2018-12-07"))
    assert(df.count() == 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(day"),
      s"watermark predicate should reach the scan:\n$plan")
    // first run (no watermark yet): full extract, not zero rows
    assert(Extract.incremental(
      Extract.fromParquet(spark, srcPath), "day", null).count() == 3)
  }

  test("named-parameter SQL binds values without interpolation") {
    Extract.fromParquet(spark, srcPath).createOrReplaceTempView("src_v")
    val df = Extract.sql(spark,
      "SELECT id, value FROM src_v WHERE id >= :min_id AND simple_text = :txt",
      Map("min_id" -> 2, "txt" -> "text"))
    assert(df.count() == 2)
  }
}
