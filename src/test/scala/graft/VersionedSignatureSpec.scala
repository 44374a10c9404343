package graft

import org.apache.spark.sql.functions._
import graft.operators.{RevisionSync, VersionedStore}
import graft.queries.DedupQueries._

/** The manifest-committed signature index — the migration template off
  * the rename-based commit protocol: same probe semantics as the
  * rename family (row-identical, spec-pinned here), but every verb
  * commits by one manifest PUT (object-store-safe, no recover verb).
  * The one semantic trade is pinned too: forget is a tombstone, sticky
  * for a re-appended SAME doc_id until compact folds it out.
  */
class VersionedSignatureSpec extends SparkSuite {
  import spark.implicits._

  private def oldDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs"),
    (3L, "how vexingly quick daft zebras jump today"),
    (4L, "sphinx of black quartz judge my vow now"),
    (5L, "jackdaws love my big sphinx of quartz too")
  ).toDF("doc_id", "text")

  private def increment = Seq(
    (101L, "how vexingly quick daft zebras jump today"),
    (102L, "an entirely fresh document with brand new content words")
  ).toDF("doc_id", "text")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("probe over the manifest-committed store is row-identical to the " +
    "rename-family probe and the from-scratch recompute; append is a " +
    "delta commit visible to the next probe") {
    val base = tmpDir("vsig")
    val ren = s"$base/rename"; val ver = s"$base/versioned"
    buildSignatureIndex(oldDocs, ren)
    buildSignatureIndexVersioned(oldDocs, ver)
    assert(rows(probeSignatureIndexVersioned(spark, increment, ver)) ==
      rows(probeSignatureIndexPruned(spark, increment, ren)))
    assert(rows(probeSignatureIndexVersioned(spark, increment, ver)) ==
      Set((101L, 3L, 1.0)))
    appendSignatureIndexVersioned(increment, ver)
    val day2 = Seq(
      (201L, "an entirely fresh document with brand new content words")
    ).toDF("doc_id", "text")
    assert(rows(probeSignatureIndexVersioned(spark, day2, ver)) ==
      Set((201L, 102L, 1.0)),
      "appended rows must be visible to the next probe")
  }

  test("forget is a tombstone: the doc stops matching immediately; a " +
    "re-appended SAME doc_id stays masked until compact retires the " +
    "tombstone (the documented sticky window); fresh doc_ids are never " +
    "affected") {
    val ver = tmpDir("vsigf") + "/versioned"
    buildSignatureIndexVersioned(oldDocs, ver)
    val probe3 = Seq((300L, "how vexingly quick daft zebras jump today"))
      .toDF("doc_id", "text")
    assert(rows(probeSignatureIndexVersioned(spark, probe3, ver))
      .exists(_._2 == 3L))
    forgetSignatureIndexVersioned(spark, Seq(3L).toDF("doc_id"), ver)
    assert(rows(probeSignatureIndexVersioned(spark, probe3, ver)).isEmpty,
      "a tombstoned doc must stop matching immediately")
    // sticky: re-appending doc_id 3 BEFORE compact stays masked
    appendSignatureIndexVersioned(
      Seq((3L, "how vexingly quick daft zebras jump today"))
        .toDF("doc_id", "text"), ver)
    assert(rows(probeSignatureIndexVersioned(spark, probe3, ver)).isEmpty,
      "the sticky tombstone window: same doc_id before compact stays masked")
    // compact folds the tombstone out; a post-compact re-append re-admits
    VersionedStore.compact(spark, ver)
    appendSignatureIndexVersioned(
      Seq((3L, "how vexingly quick daft zebras jump today"))
        .toDF("doc_id", "text"), ver)
    assert(rows(probeSignatureIndexVersioned(spark, probe3, ver))
      .exists(_._2 == 3L),
      "after compact retires the tombstone a re-append re-admits")
  }

  test("sync: bootstrap builds rev 1 and checkpoints beside _versions; " +
    "one call absorbs an append+delete window; no-op when current; " +
    "vacuum never reclaims the marker") {
    val base = tmpDir("vsigsync")
    val store = s"$base/docs"; val ver = s"$base/sig"
    val r1 = VersionedStore.save(Map("docs" -> oldDocs), store)
    assert(syncSignatureIndexVersionedWithStore(spark, store, "docs", ver)
      == Some((r1, r1)))
    VersionedStore.append(Map("docs" -> increment), store)
    val r3 = VersionedStore.delete(Seq(2L).toDF("doc_id"), "docs", store)
    assert(syncSignatureIndexVersionedWithStore(spark, store, "docs", ver)
      == Some((r1, r3)))
    // the synced index's visible signatures == the visible corpus's
    def sigSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.toList).toSet
    assert(sigSet(VersionedStore.read(spark, ver, "sig")) ==
      sigSet(minhashSigs(VersionedStore.read(spark, store, "docs", None))))
    assert(syncSignatureIndexVersionedWithStore(spark, store, "docs", ver)
      .isEmpty)
    VersionedStore.vacuum(spark, ver, keep = 1)
    assert(RevisionSync.syncedRev(spark, ver) == Some((store, r3)),
      "vacuum must never reclaim the sync checkpoint")
    assert(rows(probeSignatureIndexVersioned(spark,
      Seq((400L, "pack my box with five dozen liquor jugs"))
        .toDF("doc_id", "text"), ver)).isEmpty,
      "doc 2 was deleted in the window — its copy must probe clean")
  }
}
