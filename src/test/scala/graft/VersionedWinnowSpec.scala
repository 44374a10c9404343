package graft

import org.apache.spark.sql.functions._
import graft.operators.{RevisionSync, VersionedStore}
import graft.queries.DedupQueries._

/** The manifest-committed winnow index — q197's signature template
  * applied to the fingerprint family: same probe semantics as the
  * rename family (row-identical, spec-pinned here), every verb one
  * manifest PUT, the (k, w) selection knobs recorded WITH the
  * fingerprints so a caller can never silently mix selections, and the
  * sync window applied as ONE mixed commit (tombstones + increment
  * fingerprints visible at the same instant).
  */
class VersionedWinnowSpec extends SparkSuite {
  import spark.implicits._

  // >= w+k-1 = 8 shared tokens between doc 3 and the probe guarantee
  // at least one shared fingerprint (the winnowing floor)
  private def oldDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog while the cat sleeps"),
    (2L, "pack my box with five dozen liquor jugs before the night train"),
    (3L, "how vexingly quick daft zebras jump today under the warm sun"),
    (4L, "sphinx of black quartz judge my vow now and forever more"),
    (5L, "jackdaws love my big sphinx of quartz too much to leave")
  ).toDF("doc_id", "text")

  private def increment = Seq(
    (101L, "how vexingly quick daft zebras jump today under the warm sun"),
    (102L, "an entirely fresh document with brand new content words only here")
  ).toDF("doc_id", "text")

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("new_doc", "old_doc").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("probe over the manifest-committed store is row-identical to the " +
    "rename-family probe; the increment is fingerprinted with the " +
    "STORE's recorded knobs; append is a delta commit visible to the " +
    "next probe") {
    val base = tmpDir("vwin")
    val ren = s"$base/rename"; val ver = s"$base/versioned"
    buildWinnowIndex(oldDocs, ren, k = 4, w = 5)
    buildWinnowIndexVersioned(oldDocs, ver, k = 4, w = 5)
    assert(winnowIndexVersionedKnobs(spark, ver) == (4, 5))
    val renRows = probeWinnowIndex(spark, increment, ren, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val verRows = probeWinnowIndexVersioned(spark, increment, ver,
        minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(verRows == renRows)
    assert(pairs(probeWinnowIndexVersioned(spark, increment, ver,
      minShared = 1)) == Set((101L, 3L)))
    appendWinnowIndexVersioned(increment, ver)
    val day2 = Seq(
      (201L, "an entirely fresh document with brand new content words only here")
    ).toDF("doc_id", "text")
    assert(pairs(probeWinnowIndexVersioned(spark, day2, ver, minShared = 1))
      == Set((201L, 102L)),
      "appended fingerprints must be visible to the next probe")
  }

  test("knobs ride the store: a build at k=3,w=4 probes increments at " +
    "the stored geometry, not the caller's habit") {
    val ver = tmpDir("vwink") + "/versioned"
    buildWinnowIndexVersioned(oldDocs, ver, k = 3, w = 4)
    assert(winnowIndexVersionedKnobs(spark, ver) == (3, 4))
    // identical text still matches under the stored knobs — the probe
    // fingerprinted the increment with (3, 4), not the defaults
    assert(pairs(probeWinnowIndexVersioned(spark, increment, ver,
      minShared = 1)).contains((101L, 3L)))
  }

  test("forget is a tombstone: the doc stops matching immediately; a " +
    "re-appended SAME doc_id stays masked until compact retires the " +
    "tombstone; fresh doc_ids are never affected") {
    val ver = tmpDir("vwinf") + "/versioned"
    buildWinnowIndexVersioned(oldDocs, ver)
    val probe3 = Seq(
      (300L, "how vexingly quick daft zebras jump today under the warm sun")
    ).toDF("doc_id", "text")
    assert(pairs(probeWinnowIndexVersioned(spark, probe3, ver,
      minShared = 1)).exists(_._2 == 3L))
    forgetWinnowIndexVersioned(spark, Seq(3L).toDF("doc_id"), ver)
    assert(pairs(probeWinnowIndexVersioned(spark, probe3, ver,
      minShared = 1)).isEmpty,
      "a tombstoned doc must stop matching immediately")
    appendWinnowIndexVersioned(
      Seq((3L, "how vexingly quick daft zebras jump today under the warm sun"))
        .toDF("doc_id", "text"), ver)
    assert(pairs(probeWinnowIndexVersioned(spark, probe3, ver,
      minShared = 1)).isEmpty,
      "the sticky tombstone window: same doc_id before compact stays masked")
    VersionedStore.compact(spark, ver)
    appendWinnowIndexVersioned(
      Seq((3L, "how vexingly quick daft zebras jump today under the warm sun"))
        .toDF("doc_id", "text"), ver)
    assert(pairs(probeWinnowIndexVersioned(spark, probe3, ver,
      minShared = 1)).exists(_._2 == 3L),
      "after compact retires the tombstone a re-append re-admits")
  }

  test("sync: bootstrap builds rev 1 and checkpoints beside _versions; " +
    "one call absorbs an append+delete window as ONE index revision " +
    "(the mixed commit); no-op when current; vacuum keeps the marker") {
    val base = tmpDir("vwinsync")
    val store = s"$base/docs"; val ver = s"$base/fp"
    val r1 = VersionedStore.save(Map("docs" -> oldDocs), store)
    assert(syncWinnowIndexVersionedWithStore(spark, store, "docs", ver)
      == Some((r1, r1)))
    val revAfterBoot = VersionedStore.currentVersion(spark, ver).get
    VersionedStore.append(Map("docs" -> increment), store)
    val r3 = VersionedStore.delete(Seq(2L).toDF("doc_id"), "docs", store)
    assert(syncWinnowIndexVersionedWithStore(spark, store, "docs", ver)
      == Some((r1, r3)))
    assert(VersionedStore.currentVersion(spark, ver).get == revAfterBoot + 1,
      "an append+delete window must land as ONE mixed commit — " +
        "tombstones and increment fingerprints visible at the same instant")
    // the synced index's visible fingerprints == a rebuild's (set-equal)
    def fpSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "fp_pos", "fp_hash").collect()
        .map(_.toSeq.toList).toSet
    assert(fpSet(VersionedStore.read(spark, ver, "fp")) ==
      fpSet(winnowFingerprints(
        VersionedStore.read(spark, store, "docs", None), 4, 5)))
    assert(syncWinnowIndexVersionedWithStore(spark, store, "docs", ver)
      .isEmpty)
    VersionedStore.vacuum(spark, ver, keep = 1)
    assert(RevisionSync.syncedRev(spark, ver) == Some((store, r3)),
      "vacuum must never reclaim the sync checkpoint")
    assert(pairs(probeWinnowIndexVersioned(spark,
      Seq((400L, "pack my box with five dozen liquor jugs before the night train"))
        .toDF("doc_id", "text"), ver, minShared = 1)).isEmpty,
      "doc 2 was deleted in the window — its copy must probe clean")
  }
}
