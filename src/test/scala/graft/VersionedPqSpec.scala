package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.asDouble
import graft.operators.{RevisionSync, VersionedStore}
import graft.queries.SimilarityQueries._

/** The manifest-committed PQ store — the codebook-family migration off
  * the rename-based commit protocol (q201's params+codes template with
  * a richer trained artifact). Pinned here: bit-equality against the
  * rename family across the full build/append/delete lifecycle, the
  * frozen-codebook append, the shared fingerprint gates, sticky
  * tombstones retired by compact, `asOf` time travel, and the one-verb
  * sync.
  */
class VersionedPqSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables(spark, dir, "embeddings")
    .select(col("vec_id"), asDouble(col("embedding")).as("v"))

  private def queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("v").as("qv"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "neighbor_id", "adc_dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("build/append/delete driven through BOTH families yields " +
    "bit-identical ADC searches at every step — the commit protocol is " +
    "invisible to the arithmetic (frozen-codebook appends included)") {
    val base = tmpDir("vpq")
    val ren = s"$base/rename"; val ver = s"$base/versioned"
    val boot = emb.filter(col("vec_id") % 4 =!= 3)
    val inc = emb.filter(col("vec_id") % 4 === 3)
    val index = pqTrain(boot)
    pqSaveIndex(index, pqCodes(index, boot), ren)
    pqSaveIndexVersioned(index, pqCodes(index, boot), ver)

    def renSearch() = { val (i, c) = pqLoadIndex(spark, ren)
      pqAdcSearch(i, c, queries, topK = 5) }
    assert(rows(pqAdcSearchVersioned(spark, queries, ver, topK = 5)) ==
      rows(renSearch()), "post-build searches must be bit-identical")

    pqAppendCodes(index, inc, ren)
    pqAppendCodesVersioned(index, inc, ver)
    assert(rows(pqAdcSearchVersioned(spark, queries, ver, topK = 5)) ==
      rows(renSearch()), "post-append searches must be bit-identical " +
        "(both appends encode under the FROZEN bootstrap codebooks)")

    val doomed = emb.filter(col("vec_id") % 8 === 1 ||
      col("vec_id") % 8 === 7).select("vec_id")
    pqDeleteVectors(doomed, ren)
    pqDeleteVectorsVersioned(doomed, ver)
    val after = rows(pqAdcSearchVersioned(spark, queries, ver, topK = 5))
    assert(after == rows(renSearch()),
      "post-delete searches must be bit-identical")
    val deadIds = doomed.collect().map(_.getLong(0)).toSet
    assert(after.forall(t => !deadIds.contains(t._2)),
      "tombstoned vec_ids must never surface as neighbors")
  }

  test("append is idempotent on vec_id, fingerprint-gated, and a " +
    "zero-fresh batch commits NOTHING (revision unchanged)") {
    val ver = tmpDir("vpqi") + "/v"
    val index = pqTrain(emb)
    pqSaveIndexVersioned(index, pqCodes(index, emb), ver)
    val r1 = VersionedStore.currentVersion(spark, ver).get
    val n1 = pqLoadIndexVersioned(spark, ver)._2.count()
    val r2 = pqAppendCodesVersioned(index, emb.limit(10), ver)
    assert(r2 == r1, "a zero-fresh append must not bump the revision")
    assert(pqLoadIndexVersioned(spark, ver)._2.count() == n1)
    // a foreign training is refused BEFORE the store is touched
    val foreign = pqTrain(
      emb.withColumn("v", expr("transform(v, x -> x * 2.0D)")))
    val e = intercept[Exception] {
      pqAppendCodesVersioned(foreign, emb.limit(10), ver)
    }
    assert(e.getMessage.contains("does not match the store's"))
    assert(VersionedStore.currentVersion(spark, ver).get == r1)
  }

  test("delete is sticky for a re-appended SAME vec_id until compact " +
    "retires the tombstone; fresh vec_ids are never affected") {
    val ver = tmpDir("vpqs") + "/v"
    val boot = emb.filter(col("vec_id") < 40)
    val index = pqTrain(boot)
    pqSaveIndexVersioned(index, pqCodes(index, boot), ver)
    pqDeleteVectorsVersioned(emb.filter(col("vec_id") === 7L)
      .select("vec_id"), ver)
    def visible() = pqLoadIndexVersioned(spark, ver)._2
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
    assert(!visible().contains(7L))
    pqAppendCodesVersioned(index, emb.filter(col("vec_id") === 7L ||
      col("vec_id") === 45L), ver)
    assert(!visible().contains(7L),
      "a re-appended tombstoned vec_id stays masked (sticky forget)")
    assert(visible().contains(45L),
      "fresh vec_ids must be admitted by the same append")
    VersionedStore.compact(spark, ver)
    assert(!visible().contains(7L) && visible().contains(45L),
      "compact folds the masked rows and the tombstone out together")
    pqAppendCodesVersioned(index, emb.filter(col("vec_id") === 7L), ver)
    assert(visible().contains(7L),
      "post-compact the id is re-admittable (the documented trade)")
  }

  test("the provenance gate holds across the protocol: codebooks " +
    "replaced under the ORIGINAL fingerprint fail at load on the " +
    "recompute") {
    val ver = tmpDir("vpqg") + "/v"
    val index = pqTrain(emb)
    pqSaveIndexVersioned(index, pqCodes(index, emb), ver)
    val foreign = pqTrain(
      emb.withColumn("v", expr("transform(v, x -> x * 2.0D)")))
    val storedFp = VersionedStore.read(spark, ver, "codebooks")
      .select("fp").head().getString(0)
    // foreign codeword arrays under the ORIGINAL fingerprint
    val spliced = foreign.codebooks.zipWithIndex.map { case (c, s) =>
        c.select(lit(s).as("sub"), col("cid"), col("cv"))
      }.reduce(_ unionAll _)
      .withColumn("subspaces", lit(foreign.subspaces))
      .withColumn("sub_dim", lit(foreign.subDim))
      .withColumn("fp", lit(storedFp))
      .localCheckpoint(true)
    VersionedStore.commitMixed(Map.empty, Map.empty,
      Map("codebooks" -> spliced), ver)
    val e = intercept[Exception] { pqLoadIndexVersioned(spark, ver) }
    assert(e.getMessage.contains("does not match"))
  }

  test("time travel: after the append and the delete land, asOf the " +
    "build revision reproduces the bootstrap search bit-exactly") {
    val ver = tmpDir("vpqt") + "/v"
    val boot = emb.filter(col("vec_id") % 4 =!= 3)
    val index = pqTrain(boot)
    val r1 = pqSaveIndexVersioned(index, pqCodes(index, boot), ver)
    val asBuilt = rows(pqAdcSearchVersioned(spark, queries, ver, topK = 5))
    pqAppendCodesVersioned(index, emb.filter(col("vec_id") % 4 === 3), ver)
    pqDeleteVectorsVersioned(emb.filter(col("vec_id") % 8 === 1)
      .select("vec_id"), ver)
    assert(rows(pqAdcSearchVersioned(spark, queries, ver, topK = 5)) !=
      asBuilt, "the mutations must be visible at current")
    assert(rows(pqAdcSearchVersioned(spark, queries, ver, topK = 5,
      asOf = Some(r1))) == asBuilt,
      "asOf the build revision must reproduce the bootstrap search")
  }

  test("sync: bootstrap trains+saves from read(current); one call " +
    "absorbs an append+delete window as ONE delta revision; no-op when " +
    "current; the maintained store searches identically to the " +
    "hand-driven verbs") {
    val base = tmpDir("vpqy")
    val store = s"$base/emb"; val ver = s"$base/v"; val hand = s"$base/h"
    val boot = emb.filter(col("vec_id") % 4 =!= 3)
    VersionedStore.save(Map("emb" -> boot), store)
    assert(pqSyncVersionedWithStore(spark, store, "emb", ver)
      .contains((1L, 1L)), "bootstrap absorbs the store's current rev")
    val index = pqTrain(boot)
    pqSaveIndexVersioned(index, pqCodes(index, boot), hand)
    VersionedStore.append(
      Map("emb" -> emb.filter(col("vec_id") % 4 === 3)), store)
    val doomed = emb.filter(col("vec_id") % 8 === 1 ||
      col("vec_id") % 8 === 7).select("vec_id")
    VersionedStore.delete(doomed, "emb", store)
    val verBefore = VersionedStore.currentVersion(spark, ver).get
    assert(pqSyncVersionedWithStore(spark, store, "emb", ver)
      .contains((1L, 3L)), "catch-up absorbs the two pending revisions")
    assert(VersionedStore.currentVersion(spark, ver).get == verBefore + 1,
      "the whole window lands as ONE delta revision (maintainAtomic)")
    pqAppendCodesVersioned(index, emb.filter(col("vec_id") % 4 === 3), hand)
    pqDeleteVectorsVersioned(doomed, hand)
    assert(rows(pqAdcSearchVersioned(spark, queries, ver, topK = 5)) ==
      rows(pqAdcSearchVersioned(spark, queries, hand, topK = 5)),
      "synced store must search identically to the hand-driven verbs")
    assert(pqSyncVersionedWithStore(spark, store, "emb", ver).isEmpty,
      "a current index syncs as a no-op")
    assert(RevisionSync.syncedRev(spark, ver) == Some((store, 3L)),
      "the checkpoint records the absorbed store revision")
  }
}
