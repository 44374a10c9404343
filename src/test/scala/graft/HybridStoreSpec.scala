package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.QuantQueries
import graft.queries.SearchQueries._
import graft.functions.VectorFunctions._

/** q171's composition law: hybrid retrieval assembled from the two
  * persisted stores equals the same fusion computed from scratch, and
  * the composed search plan touches ONLY the store paths — no corpus
  * file is read at query time.
  */
class HybridStoreSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def docs: DataFrame = Tables(spark, dir, "documents")

  private def emb: DataFrame = Tables(spark, dir, "embeddings")
    .select(col("vec_id"), asDouble(col("embedding")).as("v"))

  private def fuse(bm: DataFrame, vr: DataFrame): Seq[Row3] =
    bm.join(vr, col("doc_id") === col("vec_id"), "full_outer")
      .select(coalesce(col("doc_id"), col("vec_id")).as("id"),
        col("bm25_rank"), col("adc_rank"))
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60.0) + col("bm25_rank").cast("double")),
          lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("adc_rank").cast("double")),
            lit(0.0)))
      .orderBy(col("rrf").desc, col("id").asc).limit(15)
      .collect().map(r => Row3(r.getLong(0),
        Option(r.get(1)).map(_.toString), Option(r.get(2)).map(_.toString)))
      .toSeq

  case class Row3(id: Long, bm: Option[String], adc: Option[String])

  test("store-served fusion equals the from-scratch fusion: BM25 off the " +
    "inverted index + ADC off the SQ8 codes vs both sides computed " +
    "directly from the corpus") {
    // store side
    val tPath = tmpDir("hyb-text") + "/idx"
    val (p, ds) = textIndexBuild(docs)
    textIndexSave(p, ds, tPath)
    val vPath = tmpDir("hyb-vec") + "/idx"
    graft.operators.VectorIndex.build(emb, "sq8", vPath, protocol = "rename")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val bmStore = textIndexSearch(spark, tPath)
      .orderBy(col("score").desc, col("doc_id").asc).limit(30)
      .select(col("doc_id"), row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)).as("bm25_rank"))
    val vrStore = graft.operators.VectorIndex.search(emb, q, vPath, k = 30)
      .select(col("neighbor_id").as("vec_id"), col("rank").as("adc_rank"))
    // from-scratch side: q92's scorer + freshly trained SQ8, no stores
    val bmDirect = bm25Scores(docs)
      .orderBy(col("score").desc, col("doc_id").asc).limit(30)
      .select(col("doc_id"), row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)).as("bm25_rank"))
    val params = QuantQueries.sqTrain(emb).localCheckpoint(true)
    val vrDirect = QuantQueries
      .sqAdcSearch(params, QuantQueries.sqCodes(params, emb), q, topR = 30)
      .select(col("vec_id"), col("arank").as("adc_rank"))
    assert(fuse(bmStore, vrStore) == fuse(bmDirect, vrDirect))
  }

  test("the composed store search reads ONLY the two stores: no corpus " +
    "path appears in the plan (query vector supplied as a literal)") {
    import spark.implicits._
    val tPath = tmpDir("hyb-text2") + "/idx"
    val (p, ds) = textIndexBuild(docs)
    textIndexSave(p, ds, tPath)
    val vPath = tmpDir("hyb-vec2") + "/idx"
    graft.operators.VectorIndex.build(emb, "sq8", vPath, protocol = "rename")
    // an external query vector — no corpus read on the query side either
    val qv = emb.filter(col("vec_id") === 0)
      .select("v").as[Seq[Double]].head()
    val q = Seq((0L, qv)).toDF("qid", "qv")
    val bm = textIndexSearch(spark, tPath)
      .orderBy(col("score").desc, col("doc_id").asc).limit(30)
      .select(col("doc_id"), row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)).as("bm25_rank"))
    val vr = graft.operators.VectorIndex.search(
        emb.limit(0), q, vPath, k = 30)
      .select(col("neighbor_id").as("vec_id"), col("rank").as("adc_rank"))
    val fused = bm.join(vr, col("doc_id") === col("vec_id"), "full_outer")
      .select(coalesce(col("doc_id"), col("vec_id")).as("id"))
    val plan = fused.queryExecution.executedPlan.toString
    assert(!plan.contains("/root/testdata"),
      s"hybrid store search still reads a corpus file:\n$plan")
    assert(plan.contains(tPath) && plan.contains(vPath),
      s"hybrid store search does not read both stores:\n$plan")
    assert(fused.count() > 0)
  }
}
