package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{asDouble, dot}
import graft.queries.QuantQueries

/** The SQ8 scalar-quantized index — train / encode / save / load / append
  * / search, the PQ/IVF/binary store lifecycle applied to the byte-per-
  * dimension family, plus the measured claim that makes SQ8 worth its
  * slot: near-exact recall at 8× compression (the quantization family's
  * middle rung between exact floats and PQ's lossy 32×).
  */
class SqIndexSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables(spark, dir, "embeddings")
    .select(col("vec_id"), asDouble(col("embedding")).as("v"))

  private def queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("v").as("qv"))

  /** Exact L2 top-5 per query (the recall ground truth). */
  private def bruteTop5: Map[Long, Seq[Long]] = {
    val q = queries
    val l2 = dot(col("qv"), col("qv")) - lit(2.0) * dot(col("qv"), col("v")) +
      dot(col("v"), col("v"))
    emb.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), l2.as("d"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        qid -> rows.sortBy(r => (r.getDouble(2), r.getLong(1)))
          .take(5).map(_.getLong(1)).toSeq
      }
  }

  test("SQ8 ADC recall@5 is near-exact at 8x compression — the family's " +
    "middle-rung claim, measured against brute-force L2") {
    val truth = bruteTop5
    val got = SparkEntry.queries("q136_sq8_adc_search")(spark, dir)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) => qid -> rows.map(_.getLong(1)).toSet }
    val hits = truth.toSeq.map { case (qid, t) =>
      t.count(got.getOrElse(qid, Set.empty).contains)
    }.sum
    val recall = hits.toDouble / (truth.size * 5)
    println(s"[sq8] recall@5 vs exact L2 = $recall " +
      s"(${hits} of ${truth.size * 5}; 64 B/vector codes vs 512 B floats)")
    assert(recall >= 0.9,
      s"SQ8 with exact rerank over ADC top-25 must be near-exact, got $recall")
  }

  test("ADC ordering alone (no rerank, topR = 5) already tracks the " +
    "exact ordering closely — byte reconstruction error is small " +
    "relative to inter-vector distances") {
    val truth = bruteTop5
    val params = QuantQueries.sqTrain(emb).localCheckpoint(true)
    val codes = QuantQueries.sqCodes(params, emb)
    val got = QuantQueries
      .sqAdcSearch(params, codes, queries, topR = 5, excludeSelfMatches = true)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) => qid -> rows.map(_.getLong(1)).toSet }
    val hits = truth.toSeq.map { case (qid, t) =>
      t.count(got.getOrElse(qid, Set.empty).contains)
    }.sum
    val recall = hits.toDouble / (truth.size * 5)
    println(s"[sq8] ADC-only recall@5 (topR=5, no rerank) = $recall")
    assert(recall >= 0.8,
      s"raw ADC top-5 should nearly match exact top-5, got $recall")
  }

  test("save -> load -> search round-trips: the loaded store's ADC " +
    "candidates equal the in-memory ones, and the corpus side reads " +
    "ONLY the code rows") {
    val params = QuantQueries.sqTrain(emb).localCheckpoint(true)
    val codes = QuantQueries.sqCodes(params, emb)
    val base = tmpDir("sqidx")
    QuantQueries.sqSaveIndex(params, codes, s"$base/sq")
    val (lp, lc) = QuantQueries.sqLoadIndex(spark, s"$base/sq")
    assert(lc.count() == emb.count(), "one code row per vector")

    def key(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    val mem = key(QuantQueries
      .sqAdcSearch(params, codes, queries, excludeSelfMatches = true)
      .select("qid", "vec_id", "adc_dist"))
    val disk = key(QuantQueries
      .sqAdcSearch(lp, lc, queries, excludeSelfMatches = true)
      .select("qid", "vec_id", "adc_dist"))
    assert(mem.sameElements(disk),
      "loaded-store ADC candidates must equal in-memory candidates")

    // a loaded-store search must never rescan the raw embedding vectors —
    // with a literal query set, the only legitimate parquet scan is the
    // persisted code store (the ADC property that makes SQ8 an 8x scan cut)
    import spark.implicits._
    val litQ = Seq((-7L, Array.fill(64)(0.25)))
      .toDF("qid", "qv")
      .select(col("qid"), col("qv").cast("array<double>").as("qv"))
    val p = QuantQueries.sqAdcSearch(lp, lc, litQ)
      .queryExecution.executedPlan.toString
    assert(!p.contains("embeddings.parquet"),
      s"search over a loaded store rescans the raw vectors in:\n$p")
  }

  test("a corrupted parameter row fails at load (fingerprint recompute), " +
    "and codes from foreign parameters fail at save") {
    val params = QuantQueries.sqTrain(emb).localCheckpoint(true)
    val codes = QuantQueries.sqCodes(params, emb)
    val base = tmpDir("sqidx-gate")
    QuantQueries.sqSaveIndex(params, codes, s"$base/sq")

    // splice: overwrite the meta row with DIFFERENT parameters but keep
    // the stored fingerprint -> the load-time recompute must catch it
    val foreign = QuantQueries
      .sqTrain(emb.withColumn("v", expr("transform(v, x -> x * 2.0D)")))
      .localCheckpoint(true)
    val storedFp = spark.read.parquet(s"$base/sq/meta")
      .select("fp").head().getString(0)
    foreign.select(col("mn"), col("mx"), lit(storedFp).as("fp"),
        lit(64).as("dims"), lit(256).as("levels"))
      .coalesce(1).write.mode("overwrite").parquet(s"$base/sq/meta")
    val e1 = intercept[Exception] {
      QuantQueries.sqLoadIndex(spark, s"$base/sq")
    }
    assert(e1.getMessage.contains("does not match the stored parameter"),
      s"unexpected failure: ${e1.getMessage}")

    // foreign-parameter codes must be rejected before they hit a store
    val e2 = intercept[Exception] {
      QuantQueries.sqSaveIndex(params, QuantQueries.sqCodes(foreign, emb),
        tmpDir("sqidx-gate2") + "/sq")
    }
    assert(e2.getMessage.contains("do not match the parameter frame"),
      s"unexpected failure: ${e2.getMessage}")
  }

  test("append is idempotent on vec_id, clamps out-of-range increments, " +
    "and the increment is immediately searchable") {
    val old = emb.filter(col("vec_id") >= 5)
    val inc = emb.filter(col("vec_id") < 5)
    val params = QuantQueries.sqTrain(old).localCheckpoint(true)
    val base = tmpDir("sqidx-append")
    QuantQueries.sqSaveIndex(params, QuantQueries.sqCodes(params, old),
      s"$base/sq")
    QuantQueries.sqAppendCodes(inc, s"$base/sq")
    // a retried append must not duplicate code rows
    QuantQueries.sqAppendCodes(inc, s"$base/sq")
    val (lp, lc) = QuantQueries.sqLoadIndex(spark, s"$base/sq")
    assert(lc.count() == emb.count(),
      "appended store must hold old + increment exactly once")
    // an increment beyond the trained min/max clamps instead of erroring
    // or wrapping: every code stays a byte
    import spark.implicits._
    val wild = Seq((9999L, Array.fill(64)(99.0)))
      .toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    QuantQueries.sqAppendCodes(wild, s"$base/sq")
    val codes9999 = spark.read.parquet(s"$base/sq/codes")
      .filter(col("vec_id") === 9999L)
      .select(explode(col("code")).as("c")).collect().map(_.getInt(0))
    assert(codes9999.length == 64 && codes9999.forall(c => c >= 0 && c <= 255),
      "out-of-range append must clamp to the byte range")
    val got = QuantQueries.sqAdcSearch(lp,
      spark.read.parquet(s"$base/sq/codes"), queries.limit(1))
    assert(got.count() > 0, "appended store must be searchable")
  }
}
