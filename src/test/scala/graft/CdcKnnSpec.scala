package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.asDouble
import graft.operators.VersionedStore
import graft.queries.SimilarityQueries

/** The CDC bridge between the versioned embedding store and the
  * kNN-list graph store (q196): one revision-window call maintains the
  * lists in O(corpus × batch). The pinned contract is the STRONGEST in
  * the bridge family: for the exact generator the maintained store
  * loads byte-equal to a from-scratch build of `read(toRev)` even
  * across DELETE windows — the delete-repair recomputes every anchor
  * whose stored list referenced a doomed id, so the tombstone mask
  * never leaves k-minus-holes lists behind. The LSH generator gets the
  * same rebuilt-equality through its own refresh merge.
  */
class CdcKnnSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables(spark, dir, "embeddings")
    .filter(col("vec_id") < 300)
    .select(col("vec_id"), asDouble(col("embedding")).as("v"))

  private def boot = emb.filter(col("vec_id") % 4 =!= 3)
  private def late = emb.filter(col("vec_id") % 4 === 3)
  private def doomed = emb.filter(col("vec_id") % 8 === 1 ||
    col("vec_id") % 8 === 7).select("vec_id")

  private def loaded(path: String): Seq[(Long, Long, Double, Int)] = {
    val (l, _) = SimilarityQueries.knnLoadLists(spark, path)
    l.select("aid", "bid", "sim", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sorted.toSeq
  }

  test("maintained brute-cos store is BYTE-equal to a from-scratch build " +
    "of read(toRev) — across an append window AND a delete window whose " +
    "doomed ids sit in stored lists; replaying the window changes nothing") {
    val base = tmpDir("cdcknn")
    val store = s"$base/emb"; val idx = s"$base/knn"
    val r1 = VersionedStore.save(Map("emb" -> boot), store)
    SimilarityQueries.knnSaveLists(
      SimilarityQueries.bruteTopLists(
        VersionedStore.read(spark, store, "emb", Some(r1))
          .select("vec_id", "v"), 3),
      3, "brute-cos", idx)
    // the repair path must be EXERCISED: some bootstrap list references
    // a doomed id (otherwise this test proves nothing about deletes)
    val refs = spark.read.parquet(s"$idx/lists")
      .join(doomed.select(col("vec_id").as("bid")), Seq("bid"), "left_semi")
      .count()
    assert(refs > 0, "fixture defect: no stored list references a doomed id")

    VersionedStore.append(Map("emb" -> late), store)
    val r3 = VersionedStore.delete(doomed, "emb", store)
    SimilarityQueries.knnMaintainFromStore(spark, store, "emb", r1, r3, idx)

    val fresh = s"$base/fresh"
    SimilarityQueries.knnSaveLists(
      SimilarityQueries.bruteTopLists(
        VersionedStore.read(spark, store, "emb", None)
          .select("vec_id", "v"), 3),
      3, "brute-cos", fresh)
    assert(loaded(idx) == loaded(fresh),
      "maintained store must load identically to a from-scratch rebuild")

    // replay: re-tombstoning is idempotent, no doomed references remain
    // to repair, the append left-anti's to nothing, re-knit merges to
    // the same rows
    SimilarityQueries.knnMaintainFromStore(spark, store, "emb", r1, r3, idx)
    assert(loaded(idx) == loaded(fresh))
  }

  test("sync: bootstrap builds and checkpoints; one call absorbs pending " +
    "append+delete revisions rebuilt-equal; no-op when current; a marker " +
    "tracking another store refuses") {
    val base = tmpDir("cdcknnsync")
    val store = s"$base/emb"; val idx = s"$base/knn"
    val r1 = VersionedStore.save(Map("emb" -> boot), store)
    assert(SimilarityQueries.knnSyncWithStore(spark, store, "emb", idx,
      k = 3) == Some((r1, r1)))
    VersionedStore.append(Map("emb" -> late), store)
    val r3 = VersionedStore.delete(doomed, "emb", store)
    assert(SimilarityQueries.knnSyncWithStore(spark, store, "emb", idx,
      k = 3) == Some((r1, r3)))
    val fresh = s"$base/fresh"
    SimilarityQueries.knnSaveLists(
      SimilarityQueries.bruteTopLists(
        VersionedStore.read(spark, store, "emb", None)
          .select("vec_id", "v"), 3),
      3, "brute-cos", fresh)
    assert(loaded(idx) == loaded(fresh))
    assert(SimilarityQueries.knnSyncWithStore(spark, store, "emb", idx,
      k = 3).isEmpty, "sync against an absorbed store must be a no-op")
    // a marker tracking a DIFFERENT corpus refuses
    val other = s"$base/other"
    VersionedStore.save(Map("emb" -> boot), other)
    val e = intercept[IllegalArgumentException] {
      SimilarityQueries.knnSyncWithStore(spark, other, "emb", idx, k = 3)
    }
    assert(e.getMessage.contains("tracks store"))
  }

  test("LSH-generated store maintains through its own refresh merge and " +
    "stays rebuilt-equal to a fresh lshTopLists build of read(toRev)") {
    val base = tmpDir("cdcknnlsh")
    val store = s"$base/emb"; val idx = s"$base/knn"
    VersionedStore.save(Map("emb" -> boot), store)
    assert(SimilarityQueries.knnSyncWithStore(spark, store, "emb", idx,
      k = 3, generator = "lsh-multi-4x6").isDefined)
    VersionedStore.append(Map("emb" -> late), store)
    VersionedStore.delete(doomed, "emb", store)
    assert(SimilarityQueries.knnSyncWithStore(spark, store, "emb", idx,
      k = 3, generator = "lsh-multi-4x6").isDefined)
    val fresh = s"$base/fresh"
    SimilarityQueries.knnSaveLists(
      SimilarityQueries.lshTopLists(
        VersionedStore.read(spark, store, "emb", None)
          .select("vec_id", "v"), 3, tables = 4, planes = 6),
      3, "lsh-multi-4x6", fresh)
    assert(loaded(idx) == loaded(fresh),
      "maintained LSH store must load identically to a fresh generation")
  }
}
