package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.asDouble
import graft.operators.{RevisionSync, VersionedStore}
import graft.queries.SimilarityQueries._

/** The manifest-committed binary store — the no-trained-artifact family
  * on the rename-free protocol. Pinned: bit-equality against the rename
  * family across build/append/delete, sticky tombstones retired by
  * compact, `asOf`, the packing-spec gate, and the one-verb sync.
  */
class VersionedBinSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables(spark, dir, "embeddings")
    .select(col("vec_id"), asDouble(col("embedding")).as("v"))

  private def queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("v").as("qv"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("qid", "vec_id", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("build/append/delete driven through BOTH families yields " +
    "bit-identical Hamming candidate sets at every step") {
    val base = tmpDir("vbin")
    val ren = s"$base/rename"; val ver = s"$base/versioned"
    val boot = emb.filter(col("vec_id") % 4 =!= 3)
    val inc = emb.filter(col("vec_id") % 4 === 3)
    binSaveIndex(binCodes(boot), ren)
    binSaveIndexVersioned(binCodes(boot), ver)

    def renSearch() =
      binHammingSearch(binLoadIndex(spark, ren), queries, topR = 10)
    assert(rows(binHammingSearchVersioned(spark, queries, ver, topR = 10))
      == rows(renSearch()), "post-build searches must be bit-identical")

    binAppendCodes(inc, ren)
    binAppendCodesVersioned(inc, ver)
    assert(rows(binHammingSearchVersioned(spark, queries, ver, topR = 10))
      == rows(renSearch()), "post-append searches must be bit-identical")

    val doomed = emb.filter(col("vec_id") % 8 === 1 ||
      col("vec_id") % 8 === 7).select("vec_id")
    binDeleteVectors(doomed, ren)
    binDeleteVectorsVersioned(doomed, ver)
    val after = rows(binHammingSearchVersioned(spark, queries, ver,
      topR = 10))
    assert(after == rows(renSearch()),
      "post-delete searches must be bit-identical")
    val deadIds = doomed.collect().map(_.getLong(0)).toSet
    assert(after.forall(t => !deadIds.contains(t._2)),
      "tombstoned vec_ids must never surface as candidates")
  }

  test("append idempotence, sticky delete until compact, and asOf") {
    val ver = tmpDir("vbini") + "/v"
    val boot = emb.filter(col("vec_id") < 40)
    val r1 = binSaveIndexVersioned(binCodes(boot), ver)
    val asBuilt = rows(binHammingSearchVersioned(spark, queries, ver,
      topR = 10))
    // zero-fresh append commits nothing
    assert(binAppendCodesVersioned(boot, ver) == r1)
    binDeleteVectorsVersioned(
      emb.filter(col("vec_id") === 7L).select("vec_id"), ver)
    def visible() = binLoadIndexVersioned(spark, ver)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!visible().contains(7L))
    binAppendCodesVersioned(emb.filter(col("vec_id") === 7L ||
      col("vec_id") === 45L), ver)
    assert(!visible().contains(7L), "sticky forget across re-append")
    assert(visible().contains(45L), "fresh ids admitted by the same append")
    VersionedStore.compact(spark, ver)
    assert(!visible().contains(7L) && visible().contains(45L))
    binAppendCodesVersioned(emb.filter(col("vec_id") === 7L), ver)
    assert(visible().contains(7L), "post-compact re-admission")
    assert(rows(binHammingSearchVersioned(spark, queries, ver, topR = 10,
      asOf = Some(r1))) == asBuilt,
      "asOf the build revision reproduces the bootstrap candidates")
  }

  test("the packing-spec gate holds: a meta row claiming a different " +
    "spec fails at load") {
    val ver = tmpDir("vbing") + "/v"
    binSaveIndexVersioned(binCodes(emb), ver)
    VersionedStore.commitMixed(Map.empty, Map.empty,
      Map("meta" -> spark.range(1)
        .select(lit("bin:dims=64:lanes=4:lane_bits=16:sign=gt0").as("fp"),
          lit(64).as("dims"))), ver)
    val e = intercept[Exception] { binLoadIndexVersioned(spark, ver) }
    assert(e.getMessage.contains("does not match this library's"))
  }

  test("sync: bootstrap packs read(current); one call absorbs an " +
    "append+delete window as ONE delta revision; replays are no-ops") {
    val base = tmpDir("vbiny")
    val store = s"$base/emb"; val ver = s"$base/v"; val hand = s"$base/h"
    val boot = emb.filter(col("vec_id") % 4 =!= 3)
    VersionedStore.save(Map("emb" -> boot), store)
    assert(binSyncVersionedWithStore(spark, store, "emb", ver)
      .contains((1L, 1L)))
    binSaveIndexVersioned(binCodes(boot), hand)
    VersionedStore.append(
      Map("emb" -> emb.filter(col("vec_id") % 4 === 3)), store)
    val doomed = emb.filter(col("vec_id") % 8 === 1 ||
      col("vec_id") % 8 === 7).select("vec_id")
    VersionedStore.delete(doomed, "emb", store)
    val verBefore = VersionedStore.currentVersion(spark, ver).get
    assert(binSyncVersionedWithStore(spark, store, "emb", ver)
      .contains((1L, 3L)))
    assert(VersionedStore.currentVersion(spark, ver).get == verBefore + 1,
      "the whole window lands as ONE delta revision")
    binAppendCodesVersioned(emb.filter(col("vec_id") % 4 === 3), hand)
    binDeleteVectorsVersioned(doomed, hand)
    assert(rows(binHammingSearchVersioned(spark, queries, ver, topR = 10))
      == rows(binHammingSearchVersioned(spark, queries, hand, topR = 10)),
      "synced store must search identically to the hand-driven verbs")
    assert(binSyncVersionedWithStore(spark, store, "emb", ver).isEmpty)
    assert(RevisionSync.syncedRev(spark, ver) == Some((store, 3L)))
  }
}
