package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.asDouble
import graft.queries.SimilarityQueries

/** The binary sign-code index lifecycle — build / save / load / append /
  * search, the q82/PQ/IVF store trilogy applied to the Hamming family.
  * Everything is deterministic integers, so every contract is provable
  * by exact equality: a loaded search equals the in-memory search, and
  * both equal q128's inline candidate stage.
  */
class BinIndexSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables(spark, dir, "embeddings")
    .select(col("vec_id"), asDouble(col("embedding")).as("v"))

  private def queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("v").as("qv"))

  test("save → load → search round-trips: the loaded store's Hamming " +
    "candidates equal the in-memory ones, and the corpus side reads " +
    "ONLY the 16-byte code rows") {
    val codes = SimilarityQueries.binCodes(emb)
    val base = tmpDir("binidx")
    SimilarityQueries.binSaveIndex(codes, s"$base/bin")
    val loaded = SimilarityQueries.binLoadIndex(spark, s"$base/bin")
    assert(loaded.count() == emb.count(), "one code row per vector")

    val mem = SimilarityQueries
      .binHammingSearch(codes, queries, excludeSelfMatches = true)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getInt(2)))
      .sorted
    val disk = SimilarityQueries
      .binHammingSearch(loaded, queries, excludeSelfMatches = true)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getInt(2)))
      .sorted
    assert(mem.sameElements(disk),
      "loaded-store candidates must equal in-memory candidates")

    // the CORPUS side of a loaded-store search must not touch the raw
    // embedding vectors — with a literal query set, the only legitimate
    // parquet scan left is the persisted codes relation
    import spark.implicits._
    val litQ = Seq((-7L, Array.fill(64)(0.25)))
      .toDF("qid", "qv")
      .select(col("qid"), col("qv").cast("array<double>").as("qv"))
    val p = SimilarityQueries.binHammingSearch(loaded, litQ)
      .queryExecution.executedPlan.toString
    assert(!p.contains("embeddings.parquet"),
      s"search over a loaded store rescans the raw vectors in:\n$p")
  }

  test("an external query vector (not a corpus member) retrieves a full " +
    "Hamming top-R, and self-exclusion stays opt-in") {
    import spark.implicits._
    val codes = SimilarityQueries.binCodes(emb)
    val external = Seq((-1L, Array.fill(64)(0.1)))
      .toDF("qid", "qv")
      .select(col("qid"), col("qv").cast("array<double>").as("qv"))
    val got = SimilarityQueries.binHammingSearch(codes, external, topR = 7)
      .collect()
    assert(got.length == 7, s"expected a full top-7, got ${got.length}")
    assert(got.map(_.getLong(0)).forall(_ == -1L))
  }

  test("append is fingerprint-gated, idempotent on vec_id, and the " +
    "increment is immediately searchable") {
    val old = emb.filter(col("vec_id") >= 5)
    val inc = emb.filter(col("vec_id") < 5)
    val base = tmpDir("binidx-append")
    SimilarityQueries.binSaveIndex(SimilarityQueries.binCodes(old),
      s"$base/bin")
    SimilarityQueries.binAppendCodes(inc, s"$base/bin")
    val n = emb.count()
    assert(SimilarityQueries.binLoadIndex(spark, s"$base/bin").count() == n,
      "appended store must hold old + increment")

    // a RETRIED append of the same batch is a no-op
    SimilarityQueries.binAppendCodes(inc, s"$base/bin")
    assert(SimilarityQueries.binLoadIndex(spark, s"$base/bin").count() == n,
      "re-appending an already-stored batch must not duplicate codes")

    // the increment's vectors are retrievable from the appended store
    val loaded = SimilarityQueries.binLoadIndex(spark, s"$base/bin")
    val hits = SimilarityQueries
      .binHammingSearch(loaded, queries, topR = 1)
      .filter(col("vec_id") === col("qid")).count()
    assert(hits == 5,
      "each appended query vector must retrieve itself at Hamming 0")
  }

  test("a wrong or foreign store fails loudly: missing meta, a PQ store " +
    "path, and un-stamped codes are all rejected before any distance " +
    "is computed") {
    val base = tmpDir("binidx-foreign")
    // a missing store path fails on the meta read itself (the same
    // loud-before-write contract, surfaced by the datasource)
    intercept[Exception] {
      SimilarityQueries.binAppendCodes(emb, s"$base/nowhere")
    }

    // a PQ store is a different family: binLoadIndex must refuse its
    // layout rather than read garbage lanes
    val index = SimilarityQueries.pqTrain(emb)
    SimilarityQueries.pqSaveIndex(index,
      SimilarityQueries.pqCodes(index, emb), s"$base/pq")
    intercept[Exception] {
      SimilarityQueries.binLoadIndex(spark, s"$base/pq")
    }

    val ex3 = intercept[IllegalArgumentException] {
      SimilarityQueries.binSaveIndex(
        SimilarityQueries.binCodes(emb).drop("fp"), s"$base/bin")
    }
    assert(ex3.getMessage.contains("no spec stamp"))
  }
}
