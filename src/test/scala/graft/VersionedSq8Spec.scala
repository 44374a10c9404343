package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.asDouble
import graft.operators.{RevisionSync, VersionedStore}
import graft.queries.QuantQueries._

/** The manifest-committed SQ8 store — the VECTOR-family migration off
  * the rename-based commit protocol (the params+codes template, after
  * q197's single-relation and q198's multi-relation templates). Pinned
  * here: bit-equality against the rename family across the full
  * build/append/delete lifecycle, the frozen-quantizer append, the
  * shared provenance gates, sticky tombstones retired by compact,
  * `asOf` time travel, and the one-verb sync.
  */
class VersionedSq8Spec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables(spark, dir, "embeddings")
    .select(col("vec_id"), asDouble(col("embedding")).as("v"))

  private def queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("v").as("qv"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("qid", "vec_id", "adc_dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("build/append/delete driven through BOTH families yields " +
    "bit-identical ADC searches at every step — the commit protocol is " +
    "invisible to the arithmetic (frozen-quantizer appends included)") {
    val base = tmpDir("vsq8")
    val ren = s"$base/rename"; val ver = s"$base/versioned"
    val boot = emb.filter(col("vec_id") % 4 =!= 3)
    val inc = emb.filter(col("vec_id") % 4 === 3)
    val params = sqTrain(boot).localCheckpoint(true)
    sqSaveIndex(params, sqCodes(params, boot), ren)
    sqSaveIndexVersioned(params, sqCodes(params, boot), ver)

    def renSearch() = { val (p, c) = sqLoadIndex(spark, ren)
      sqAdcSearch(p, c, queries, topR = 5) }
    assert(rows(sqAdcSearchVersioned(spark, queries, ver, topR = 5)) ==
      rows(renSearch()), "post-build searches must be bit-identical")

    sqAppendCodes(inc, ren)
    sqAppendCodesVersioned(inc, ver)
    assert(rows(sqAdcSearchVersioned(spark, queries, ver, topR = 5)) ==
      rows(renSearch()), "post-append searches must be bit-identical " +
        "(both appends encode under the FROZEN bootstrap quantizer)")

    val doomed = emb.filter(col("vec_id") % 8 === 1 ||
      col("vec_id") % 8 === 7).select("vec_id")
    sqDeleteVectors(doomed, ren)
    sqDeleteVectorsVersioned(doomed, ver)
    val after = rows(sqAdcSearchVersioned(spark, queries, ver, topR = 5))
    assert(after == rows(renSearch()),
      "post-delete searches must be bit-identical")
    val deadIds = doomed.collect().map(_.getLong(0)).toSet
    assert(after.forall(t => !deadIds.contains(t._2)),
      "tombstoned vec_ids must never surface as neighbors")
  }

  test("append is idempotent on vec_id and a zero-fresh batch commits " +
    "NOTHING (no empty data dir, revision unchanged)") {
    val ver = tmpDir("vsq8i") + "/v"
    val params = sqTrain(emb).localCheckpoint(true)
    sqSaveIndexVersioned(params, sqCodes(params, emb), ver)
    val r1 = VersionedStore.currentVersion(spark, ver).get
    val n1 = sqLoadIndexVersioned(spark, ver)._2.count()
    // the whole corpus is already coded: a replayed ingest nets to zero
    val r2 = sqAppendCodesVersioned(emb.limit(10), ver)
    assert(r2 == r1, "a zero-fresh append must not bump the revision")
    assert(sqLoadIndexVersioned(spark, ver)._2.count() == n1)
  }

  test("delete is sticky for a re-appended SAME vec_id until compact " +
    "retires the tombstone; fresh vec_ids are never affected") {
    val ver = tmpDir("vsq8s") + "/v"
    val boot = emb.filter(col("vec_id") < 40)
    val params = sqTrain(boot).localCheckpoint(true)
    sqSaveIndexVersioned(params, sqCodes(params, boot), ver)
    sqDeleteVectorsVersioned(emb.filter(col("vec_id") === 7L)
      .select("vec_id"), ver)
    def visible() = sqLoadIndexVersioned(spark, ver)._2
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!visible().contains(7L))
    // re-append the tombstoned id plus a genuinely fresh one
    sqAppendCodesVersioned(emb.filter(col("vec_id") === 7L ||
      col("vec_id") === 45L), ver)
    assert(!visible().contains(7L),
      "a re-appended tombstoned vec_id stays masked (sticky forget)")
    assert(visible().contains(45L),
      "fresh vec_ids must be admitted by the same append")
    VersionedStore.compact(spark, ver)
    assert(!visible().contains(7L) && visible().contains(45L),
      "compact folds the masked row and the tombstone out together — " +
        "no zombie resurfaces")
    // post-compact the id is re-admittable (the documented trade)
    sqAppendCodesVersioned(emb.filter(col("vec_id") === 7L), ver)
    assert(visible().contains(7L))
  }

  test("the provenance gates hold across the protocol: a spliced meta " +
    "row fails at load on the fingerprint recompute; foreign-parameter " +
    "codes fail at save") {
    val ver = tmpDir("vsq8g") + "/v"
    val params = sqTrain(emb).localCheckpoint(true)
    sqSaveIndexVersioned(params, sqCodes(params, emb), ver)
    val foreign = sqTrain(
      emb.withColumn("v", expr("transform(v, x -> x * 2.0D)")))
      .localCheckpoint(true)
    val storedFp = VersionedStore.read(spark, ver, "meta")
      .select("fp").head().getString(0)
    // splice through the store's own verbs: replace meta with foreign
    // arrays under the ORIGINAL fingerprint
    VersionedStore.commitMixed(Map.empty, Map.empty,
      Map("meta" -> foreign.select(col("mn"), col("mx"),
        lit(storedFp).as("fp"), lit(64).as("dims"),
        lit(256).as("levels"))), ver)
    val e1 = intercept[Exception] { sqLoadIndexVersioned(spark, ver) }
    assert(e1.getMessage.contains("does not match the stored parameter"))
    val e2 = intercept[Exception] {
      sqSaveIndexVersioned(params, sqCodes(foreign, emb),
        tmpDir("vsq8g2") + "/v")
    }
    assert(e2.getMessage.contains("do not match the parameter frame"))
  }

  test("time travel: after the append and the delete land, asOf the " +
    "build revision reproduces the bootstrap search bit-exactly") {
    val ver = tmpDir("vsq8t") + "/v"
    val boot = emb.filter(col("vec_id") % 4 =!= 3)
    val params = sqTrain(boot).localCheckpoint(true)
    val r1 = sqSaveIndexVersioned(params, sqCodes(params, boot), ver)
    val asBuilt = rows(sqAdcSearchVersioned(spark, queries, ver, topR = 5))
    sqAppendCodesVersioned(emb.filter(col("vec_id") % 4 === 3), ver)
    sqDeleteVectorsVersioned(emb.filter(col("vec_id") % 8 === 1)
      .select("vec_id"), ver)
    assert(rows(sqAdcSearchVersioned(spark, queries, ver, topR = 5)) !=
      asBuilt, "the mutations must be visible at current")
    assert(rows(sqAdcSearchVersioned(spark, queries, ver, topR = 5,
      asOf = Some(r1))) == asBuilt,
      "asOf the build revision must reproduce the bootstrap search")
  }

  test("sync: bootstrap trains+saves from read(current); one call " +
    "absorbs an append+delete window as ONE delta revision; no-op when " +
    "current; the maintained store searches identically to the " +
    "hand-driven verbs") {
    val base = tmpDir("vsq8y")
    val store = s"$base/emb"; val ver = s"$base/v"; val hand = s"$base/h"
    val boot = emb.filter(col("vec_id") % 4 =!= 3)
    VersionedStore.save(Map("emb" -> boot), store)
    assert(sqSyncVersionedWithStore(spark, store, "emb", ver)
      .contains((1L, 1L)), "bootstrap absorbs the store's current rev")
    // hand-driven twin from the same bootstrap corpus
    val params = sqTrain(boot).localCheckpoint(true)
    sqSaveIndexVersioned(params, sqCodes(params, boot), hand)
    // window: append net-new, delete across both generations
    VersionedStore.append(
      Map("emb" -> emb.filter(col("vec_id") % 4 === 3)), store)
    val doomed = emb.filter(col("vec_id") % 8 === 1 ||
      col("vec_id") % 8 === 7).select("vec_id")
    VersionedStore.delete(doomed, "emb", store)
    val verBefore = VersionedStore.currentVersion(spark, ver).get
    assert(sqSyncVersionedWithStore(spark, store, "emb", ver)
      .contains((1L, 3L)), "catch-up absorbs the two pending revisions")
    assert(VersionedStore.currentVersion(spark, ver).get == verBefore + 1,
      "the whole window lands as ONE delta revision (maintainAtomic)")
    sqAppendCodesVersioned(emb.filter(col("vec_id") % 4 === 3), hand)
    sqDeleteVectorsVersioned(doomed, hand)
    assert(rows(sqAdcSearchVersioned(spark, queries, ver, topR = 5)) ==
      rows(sqAdcSearchVersioned(spark, queries, hand, topR = 5)),
      "synced store must search identically to the hand-driven verbs")
    assert(sqSyncVersionedWithStore(spark, store, "emb", ver).isEmpty,
      "a current index syncs as a no-op")
    assert(RevisionSync.syncedRev(spark, ver) == Some((store, 3L)),
      "the checkpoint records the absorbed store revision")
  }
}
