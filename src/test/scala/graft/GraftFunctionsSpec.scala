package graft

import graft.functions.{GraftFunctions, VectorFunctions}
import org.apache.spark.sql.functions._

/** SQL-registered native functions agree with the Column API. */
class GraftFunctionsSpec extends SparkSuite {

  test("GraftExtensions injects the graft_* functions through the " +
    "SparkSessionExtensions path") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    // drive the extension's own registration hook against a live registry,
    // exactly what session construction does with spark.sql.extensions set
    org.apache.spark.sql.GraftColumnBridge.applyExtensionFunctions(ext, spark)
    val got = spark.sql(
      "SELECT graft_hex_sign_mask('07f') AS m, graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head()
    assert(got.getLong(0) == 3L) // '0','7' set, 'f' clear
    assert(got.getDouble(1) == 11.0)
  }

  test("hexSignMask equals the 32-way substring formulation bit for bit") {
    import spark.implicits._
    import graft.functions.TextFunctions.hexSignMask
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .distinct()
      .withColumn("h", md5(col("tok")))
    val viaSubstring = (0 until 32).map { b =>
      when(substring(col("h"), b + 1, 1) <= "7", lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val rows = docs.select(
        hexSignMask(col("h")).bitwiseAND(lit(0xFFFFFFFFL)).as("fast"),
        viaSubstring.as("slow"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("graft_dot / graft_cosine callable from SQL, equal to Column API") {
    GraftFunctions.register(spark)
    Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .selectExpr("vec_id", "CAST(embedding AS array<double>) AS v")
      .createOrReplaceTempView("emb_v")
    val viaSql = spark.sql(
      """SELECT a.vec_id AS qid, b.vec_id AS nid,
        |       graft_dot(a.v, b.v) AS d, graft_cosine(a.v, b.v) AS c
        |FROM emb_v a JOIN emb_v b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 3 AND b.vec_id < 6
        |ORDER BY qid, nid""".stripMargin).collect()
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("v"))
    val a = e.as("a"); val b = e.as("b")
    val viaCol = a.join(b, col("a.vec_id") < col("b.vec_id"))
      .filter(col("a.vec_id") < 3 && col("b.vec_id") < 6)
      .select(col("a.vec_id").as("qid"), col("b.vec_id").as("nid"),
        VectorFunctions.dot(col("a.v"), col("b.v")).as("d"),
        VectorFunctions.cosine(col("a.v"), col("b.v")).as("c"))
      .orderBy("qid", "nid").collect()
    assert(viaSql.length == viaCol.length && viaSql.nonEmpty)
    viaSql.zip(viaCol).foreach { case (x, y) =>
      assert(x.getDouble(2) == y.getDouble(2)) // bit-exact
      assert(x.getDouble(3) == y.getDouble(3))
    }
  }
}
