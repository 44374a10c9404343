package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.asDouble
import graft.queries.SimilarityQueries

/** The persisted-store lifecycle applied to the FOURTH index family:
  * multi-table LSH buckets (q111's candidate generator) get the same
  * build-once / search-forever / append-increments verbs as the PQ, IVF,
  * and binary stores. There is no training to protect here — the
  * hyperplanes are deterministic functions of the plane id — so the spec
  * stamp pins GEOMETRY (tables, planes, dims) and the projection
  * convention, and every failure mode is a format mismatch, not a
  * foreign training.
  */
class LshIndexSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables(spark, dir, "embeddings")
    .select(col("vec_id"), asDouble(col("embedding")).as("v"))

  private def queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("v").as("qv"))

  test("save → load → search round-trips: searching from the persisted " +
    "buckets equals the standalone q111 exactly (the bucket function is " +
    "deterministic, so stored and recomputed candidates coincide)") {
    val buckets = SimilarityQueries.lshBuckets(emb)
    val base = tmpDir("lshidx")
    SimilarityQueries.lshSaveIndex(buckets, 4, 6, s"$base/lsh")
    val (loaded, tables, planes) =
      SimilarityQueries.lshLoadIndex(spark, s"$base/lsh")
    assert((tables, planes) == (4, 6))
    assert(loaded.count() == 4 * emb.count(), "one row per (vector, table)")

    val fromStore = SimilarityQueries
      .lshSearchIndex(loaded, emb, queries, tables, planes,
        excludeSelfMatches = true)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val standalone = SparkEntry.queries("q111_ann_lsh_multitable")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(fromStore.sameElements(standalone),
      "loaded-store search must equal the standalone q111 result")
  }

  test("a loaded-store search never re-buckets the corpus: with the " +
    "vector side checkpointed, the only parquet scan is the bucket store") {
    import spark.implicits._
    val buckets = SimilarityQueries.lshBuckets(emb)
    val base = tmpDir("lshidx-plan")
    SimilarityQueries.lshSaveIndex(buckets, 4, 6, s"$base/lsh")
    val (loaded, tables, planes) =
      SimilarityQueries.lshLoadIndex(spark, s"$base/lsh")
    val litQ = Seq((-7L, Array.fill(64)(0.25)))
      .toDF("qid", "qv")
      .select(col("qid"), col("qv").cast("array<double>").as("qv"))
    val p = SimilarityQueries
      .lshSearchIndex(loaded, emb.localCheckpoint(true), litQ, tables, planes)
      .queryExecution.executedPlan.toString
    assert(!p.contains("embeddings.parquet"),
      s"search over a loaded store re-buckets the raw vectors in:\n$p")
    assert(p.contains("/buckets"),
      s"candidates must come from the persisted bucket store in:\n$p")
  }

  test("a geometry mismatch between the store and the declared search " +
    "parameters fails the row-wise stamp check instead of joining wrong " +
    "candidates") {
    val buckets = SimilarityQueries.lshBuckets(emb)
    val base = tmpDir("lshidx-geom")
    SimilarityQueries.lshSaveIndex(buckets, 4, 6, s"$base/lsh")
    val (loaded, _, _) = SimilarityQueries.lshLoadIndex(spark, s"$base/lsh")
    val ex = intercept[Exception] {
      SimilarityQueries.lshSearchIndex(loaded, emb, queries,
        tables = 4, planes = 4).collect() // store is planes=6
    }
    assert(ex.getMessage != null && ex.getMessage.contains("does not match"),
      s"expected the stamp check, got: ${ex.getMessage}")
    // and a mis-declared SAVE fails before writing
    val ex2 = intercept[IllegalArgumentException] {
      SimilarityQueries.lshSaveIndex(buckets, 2, 6,
        tmpDir("lshidx-misdecl") + "/lsh")
    }
    assert(ex2.getMessage.contains("different spec"))
  }

  test("a store spliced from two geometries — foreign buckets appended " +
    "onto a saved store — fails at load") {
    val base = tmpDir("lshidx-splice")
    SimilarityQueries.lshSaveIndex(
      SimilarityQueries.lshBuckets(emb), 4, 6, s"$base/lsh")
    // the splice: planes=4 buckets land in the planes=6 store's files
    SimilarityQueries.lshBuckets(emb, tables = 4, planes = 4)
      .select("vec_id", "tbl", "bucket", "fp")
      .write.mode("append").parquet(s"$base/lsh/buckets")
    val ex = intercept[IllegalArgumentException] {
      SimilarityQueries.lshLoadIndex(spark, s"$base/lsh")
    }
    assert(ex.getMessage.contains("mixes geometries"),
      s"expected the mixed-store check, got: ${ex.getMessage}")
  }

  test("the APPEND verb: an increment bucketed under the store's own " +
    "geometry lands, search sees it, and a retried append is a no-op") {
    val old = emb.filter(col("vec_id") >= 10)
    val inc = emb.filter(col("vec_id") < 10)
    val base = tmpDir("lshidx-append")
    SimilarityQueries.lshSaveIndex(
      SimilarityQueries.lshBuckets(old), 4, 6, s"$base/lsh")
    SimilarityQueries.lshAppendBuckets(inc, s"$base/lsh")
    val (loaded, tables, planes) =
      SimilarityQueries.lshLoadIndex(spark, s"$base/lsh")
    val n = emb.count()
    assert(loaded.count() == 4 * n, "buckets must cover old + increment")

    // search sees the increment: vector 0 queries itself — it collides
    // with itself in every table, so the top hit is the exact match
    val q0 = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val top = SimilarityQueries
      .lshSearchIndex(loaded, emb, q0, tables, planes, topK = 1)
      .collect()
    assert(top.length == 1 && top.head.getLong(1) == 0L,
      s"search over the appended store must retrieve the increment: " +
        s"${top.toSeq}")

    // retried append of the same batch: no-op
    SimilarityQueries.lshAppendBuckets(inc, s"$base/lsh")
    assert(SimilarityQueries.lshLoadIndex(spark, s"$base/lsh")
      ._1.count() == 4 * n,
      "re-appending an already-stored batch must not duplicate buckets")
  }
}
