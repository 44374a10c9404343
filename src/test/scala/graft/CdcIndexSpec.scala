package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.VersionedStore
import graft.queries.SearchQueries._

/** The CDC bridge between the versioned corpus store and the text index
  * (q189): one revision-window call maintains the index in O(delta),
  * and the result is indistinguishable from a fresh build of the
  * window's end revision — q139's incremental-equals-full discipline.
  */
class CdcIndexSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def docs: DataFrame =
    Tables(spark, dir, "documents").select("doc_id", "text", "source")

  private def loaded(path: String): (Set[(String, Long, Int)], Set[(Long, Int)]) = {
    val (p, ds) = textIndexLoad(spark, path)
    (p.select("term", "doc_id", "tf").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet,
      ds.select("doc_id", "dl").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet)
  }

  private def freshOf(corpus: DataFrame, path: String): Unit = {
    val (p, ds) = textIndexBuild(corpus.select("doc_id", "text"))
    textIndexSave(p, ds, path)
  }

  test("a maintained index LOADS identically to a fresh build of the " +
    "window's end revision — appends and tombstone deletes propagate in " +
    "one call, and replaying the same window changes nothing") {
    val base = tmpDir("cdcix")
    val store = s"$base/corpus"; val idx = s"$base/idx"
    val old = docs.filter(col("doc_id") % 3 =!= 0)
    val r1 = VersionedStore.save(Map("docs" -> old), store)
    freshOf(VersionedStore.read(spark, store, "docs", Some(r1)), idx)
    // the corpus evolves through store verbs alone
    VersionedStore.append(
      Map("docs" -> docs.filter(col("doc_id") % 3 === 0)), store)
    val doomed = docs.filter(col("doc_id") % 7 === 2).select("doc_id")
    val r3 = VersionedStore.delete(doomed, "docs", store)
    textIndexMaintainFromStore(spark, store, "docs", r1, r3, idx)
    val fresh = s"$base/fresh"
    freshOf(VersionedStore.read(spark, store, "docs", Some(r3)), fresh)
    assert(loaded(idx) == loaded(fresh),
      "maintained index must load identically to the fresh build")
    val m = textIndexSearch(spark, idx).orderBy("doc_id").collect().toSeq
    val f = textIndexSearch(spark, fresh).orderBy("doc_id").collect().toSeq
    assert(m == f)
    // replay: the same window re-applied is a no-op (append probe +
    // idempotent tombstones)
    textIndexMaintainFromStore(spark, store, "docs", r1, r3, idx)
    assert(loaded(idx) == loaded(fresh))
  }

  test("a doc deleted AND re-appended inside the window stays invisible " +
    "(sticky tombstones agree on both sides); maintaining from a store " +
    "whose tombstones are not doc_id-keyed refuses loudly") {
    val base = tmpDir("cdcix2")
    val store = s"$base/corpus"; val idx = s"$base/idx"
    val half = docs.filter(col("doc_id") % 2 === 0)
    val r1 = VersionedStore.save(Map("docs" -> half), store)
    freshOf(half, idx)
    val victim = half.select("doc_id").orderBy("doc_id").head.getLong(0)
    VersionedStore.delete(Seq(victim).toDF("doc_id"), "docs", store)
    // re-append the same doc inside the window: the store's sticky
    // tombstone keeps it invisible at the end revision
    val r3 = VersionedStore.append(
      Map("docs" -> docs.filter(col("doc_id") === victim)), store)
    textIndexMaintainFromStore(spark, store, "docs", r1, r3, idx)
    val fresh = s"$base/fresh"
    freshOf(VersionedStore.read(spark, store, "docs", Some(r3)), fresh)
    assert(loaded(idx) == loaded(fresh))
    assert(!textIndexSearch(spark, idx).collect().map(_.getLong(0))
      .contains(victim))
    // a store keyed by some other column cannot drive the doc_id index
    val store2 = s"$base/other"
    val r21 = VersionedStore.save(Map("docs" ->
      half.withColumnRenamed("doc_id", "id")), store2)
    val r22 = VersionedStore.delete(Seq(1L).toDF("id"), "docs", store2)
    val e = intercept[IllegalArgumentException] {
      textIndexMaintainFromStore(spark, store2, "docs", r21, r22, idx)
    }
    assert(e.getMessage.contains("no doc_id"))
  }
}
