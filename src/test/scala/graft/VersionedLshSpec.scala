package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.asDouble
import graft.operators.{RevisionSync, VersionedStore}
import graft.queries.SimilarityQueries._

/** The manifest-committed LSH store — the fixed-geometry family on the
  * rename-free protocol. Pinned: bit-equality against the rename family
  * across build/append/delete, a vector's bucket rows vanishing from
  * ALL tables on delete, sticky-until-compact, `asOf`, the geometry
  * gate, and the one-verb sync.
  */
class VersionedLshSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables(spark, dir, "embeddings")
    .select(col("vec_id"), asDouble(col("embedding")).as("v"))

  private def queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("v").as("qv"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "neighbor_id", "cos_sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("build/append/delete driven through BOTH families yields " +
    "bit-identical ANN searches at every step") {
    val base = tmpDir("vlsh")
    val ren = s"$base/rename"; val ver = s"$base/versioned"
    val boot = emb.filter(col("vec_id") % 4 =!= 3)
    val inc = emb.filter(col("vec_id") % 4 === 3)
    lshSaveIndex(lshBuckets(boot), 4, 6, ren)
    lshSaveIndexVersioned(lshBuckets(boot), 4, 6, ver)

    def renSearch() = { val (b, t, p) = lshLoadIndex(spark, ren)
      lshSearchIndex(b, emb, queries, t, p, topK = 5,
        excludeSelfMatches = true) }
    def verSearch() = lshSearchIndexVersioned(spark, emb, queries, ver,
      topK = 5, excludeSelfMatches = true)
    assert(rows(verSearch()) == rows(renSearch()),
      "post-build searches must be bit-identical")

    lshAppendBuckets(inc, ren)
    lshAppendBucketsVersioned(inc, ver)
    assert(rows(verSearch()) == rows(renSearch()),
      "post-append searches must be bit-identical")

    val doomed = emb.filter(col("vec_id") % 8 === 1 ||
      col("vec_id") % 8 === 7).select("vec_id")
    lshDeleteVectors(doomed, ren)
    lshDeleteVectorsVersioned(doomed, ver)
    val after = rows(verSearch())
    assert(after == rows(renSearch()),
      "post-delete searches must be bit-identical")
    val deadIds = doomed.collect().map(_.getLong(0)).toSet
    assert(after.forall(t => !deadIds.contains(t._2)),
      "tombstoned vec_ids must never surface as neighbors")
    // the delete keyed vec_id alone must remove EVERY table's row
    val (b, _, _) = lshLoadIndexVersioned(spark, ver)
    assert(b.join(doomed, b("vec_id") === doomed("vec_id"), "left_semi")
      .isEmpty, "a deleted vector keeps no bucket row in ANY table")
  }

  test("append idempotence (zero-fresh commits nothing), sticky delete " +
    "until compact, and asOf") {
    val ver = tmpDir("vlshi") + "/v"
    val boot = emb.filter(col("vec_id") < 40)
    val r1 = lshSaveIndexVersioned(lshBuckets(boot), 4, 6, ver)
    assert(lshAppendBucketsVersioned(boot, ver) == r1,
      "a zero-fresh append must not bump the revision")
    lshDeleteVectorsVersioned(
      emb.filter(col("vec_id") === 7L).select("vec_id"), ver)
    def visible() = lshLoadIndexVersioned(spark, ver)._1
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
    assert(!visible().contains(7L))
    lshAppendBucketsVersioned(emb.filter(col("vec_id") === 7L ||
      col("vec_id") === 45L), ver)
    assert(!visible().contains(7L), "sticky forget across re-append")
    assert(visible().contains(45L))
    VersionedStore.compact(spark, ver)
    lshAppendBucketsVersioned(emb.filter(col("vec_id") === 7L), ver)
    assert(visible().contains(7L), "post-compact re-admission")
    val asBuilt = lshLoadIndexVersioned(spark, ver, asOf = Some(r1))._1
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
    assert(asBuilt == boot.select("vec_id").collect()
      .map(_.getLong(0)).toSet,
      "asOf the build revision sees exactly the bootstrap assignment")
  }

  test("the geometry gate holds: a meta row whose stamp disagrees with " +
    "its own declared geometry fails at load; a mis-declared save is " +
    "refused") {
    val ver = tmpDir("vlshg") + "/v"
    lshSaveIndexVersioned(lshBuckets(emb), 4, 6, ver)
    val e1 = intercept[Exception] {
      lshSaveIndexVersioned(lshBuckets(emb), 8, 6, tmpDir("vlshg2") + "/v")
    }
    assert(e1.getMessage.contains("different spec"))
    val storedFp = VersionedStore.read(spark, ver, "meta")
      .select("fp").head().getString(0)
    VersionedStore.commitMixed(Map.empty, Map.empty,
      Map("meta" -> spark.range(1).select(lit(storedFp).as("fp"),
        lit(8).as("tables"), lit(6).as("planes"), lit(64).as("dims"))), ver)
    val e2 = intercept[Exception] { lshLoadIndexVersioned(spark, ver) }
    assert(e2.getMessage.contains("does not match its own declared"))
  }

  test("sync: bootstrap buckets read(current) under the pinned " +
    "geometry; one call absorbs an append+delete window as ONE delta " +
    "revision; replays are no-ops") {
    val base = tmpDir("vlshy")
    val store = s"$base/emb"; val ver = s"$base/v"; val hand = s"$base/h"
    val boot = emb.filter(col("vec_id") % 4 =!= 3)
    VersionedStore.save(Map("emb" -> boot), store)
    assert(lshSyncVersionedWithStore(spark, store, "emb", ver)
      .contains((1L, 1L)))
    lshSaveIndexVersioned(lshBuckets(boot), 4, 6, hand)
    VersionedStore.append(
      Map("emb" -> emb.filter(col("vec_id") % 4 === 3)), store)
    val doomed = emb.filter(col("vec_id") % 8 === 1 ||
      col("vec_id") % 8 === 7).select("vec_id")
    VersionedStore.delete(doomed, "emb", store)
    val verBefore = VersionedStore.currentVersion(spark, ver).get
    assert(lshSyncVersionedWithStore(spark, store, "emb", ver)
      .contains((1L, 3L)))
    assert(VersionedStore.currentVersion(spark, ver).get == verBefore + 1,
      "the whole window lands as ONE delta revision")
    lshAppendBucketsVersioned(emb.filter(col("vec_id") % 4 === 3), hand)
    lshDeleteVectorsVersioned(doomed, hand)
    assert(rows(lshSearchIndexVersioned(spark, emb, queries, ver,
        topK = 5, excludeSelfMatches = true)) ==
      rows(lshSearchIndexVersioned(spark, emb, queries, hand,
        topK = 5, excludeSelfMatches = true)),
      "synced store must search identically to the hand-driven verbs")
    assert(lshSyncVersionedWithStore(spark, store, "emb", ver).isEmpty)
    assert(RevisionSync.syncedRev(spark, ver) == Some((store, 3L)))
  }
}
