package graft

import org.apache.spark.sql.functions._
import graft.operators.{RevisionSync, VersionedStore}
import graft.queries.SearchQueries._

/** The manifest-committed text index — the MULTI-relation migration off
  * the rename-based commit protocol. Pinned here: (1) every query verb
  * is bit-identical to its rename-family twin over the same visible
  * corpus; (2) every mutation verb is exactly ONE revision spanning all
  * its relations (postings, docstats, positions, champions) — no reader
  * can see a half-applied append/delete; (3) champion heads are
  * re-elected INSIDE the same revision as the mutation, so a deleted
  * doc can never resurface through a stale head; (4) `asOf` serves the
  * index exactly as it stood (time travel); (5) sync absorbs an
  * append+delete window as one mixed commit.
  */
class VersionedTextIndexSpec extends SparkSuite {
  import spark.implicits._

  private val qTerms = Seq("quick", "quartz", "jugs")

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs"),
    (3L, "how vexingly quick daft zebras jump today"),
    (4L, "sphinx of black quartz judge my vow now"),
    (5L, "jackdaws love my big sphinx of quartz too quick")
  ).toDF("doc_id", "text")

  private def increment = Seq(
    (101L, "a quick quartz clock beats five dozen liquor jugs"),
    (102L, "an entirely fresh document with brand new content")
  ).toDF("doc_id", "text")

  private def scores(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "n_terms_hit", "score").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet

  private def hits(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(1))).toSet

  test("search, champion search, phrase, and proximity over the " +
    "manifest-committed index are bit-identical to the rename-family " +
    "verbs over the same corpus") {
    val base = tmpDir("vtix")
    val ren = s"$base/rename"; val ver = s"$base/versioned"
    val (p, ds) = textIndexBuild(corpus)
    textIndexSave(p, ds, ren, Some(positionalPostings(corpus)))
    textIndexChampionsSave(spark, ren, m = 2)
    textIndexSaveVersioned(corpus, ver, withPositions = true)
    textIndexChampionsSaveVersioned(spark, ver, m = 2)
    assert(scores(textIndexSearchVersioned(spark, ver, qTerms)) ==
      scores(textIndexSearch(spark, ren, qTerms)))
    assert(scores(textIndexChampionSearchVersioned(spark, ver, qTerms, m = 2)) ==
      scores(textIndexChampionSearch(spark, ren, qTerms, m = 2)))
    assert(hits(textIndexPhraseSearchVersioned(spark, ver,
        Seq("sphinx", "of"))) ==
      hits(textIndexPhraseSearch(spark, ren, Seq("sphinx", "of"))))
    assert(hits(textIndexProximitySearchVersioned(spark, ver,
        "quick", "fox", 3)) ==
      hits(textIndexProximitySearch(spark, ren, "quick", "fox", 3)))
  }

  test("append and delete are each ONE revision spanning every relation " +
    "— postings, docstats, positions, and the re-elected champions land " +
    "at the same instant; search after the dance matches a rename-family " +
    "index driven through the same dance") {
    val base = tmpDir("vtixm")
    val ren = s"$base/rename"; val ver = s"$base/versioned"
    val (p, ds) = textIndexBuild(corpus)
    textIndexSave(p, ds, ren, Some(positionalPostings(corpus)))
    textIndexChampionsSave(spark, ren, m = 2)
    textIndexSaveVersioned(corpus, ver, withPositions = true)
    textIndexChampionsSaveVersioned(spark, ver, m = 2)
    val r0 = VersionedStore.currentVersion(spark, ver).get

    textIndexAppend(increment, ren)
    textIndexAppendVersioned(increment, ver)
    assert(VersionedStore.currentVersion(spark, ver).get == r0 + 1,
      "append must be ONE mixed commit (delta dirs + champion splice)")

    textIndexDelete(Seq(3L).toDF("doc_id"), ren)
    textIndexDeleteVersioned(Seq(3L).toDF("doc_id"), ver)
    assert(VersionedStore.currentVersion(spark, ver).get == r0 + 2,
      "delete must be ONE mixed commit (tombstones + champion splice)")

    assert(scores(textIndexSearchVersioned(spark, ver, qTerms)) ==
      scores(textIndexSearch(spark, ren, qTerms)))
    assert(scores(textIndexChampionSearchVersioned(spark, ver, qTerms, m = 2)) ==
      scores(textIndexChampionSearch(spark, ren, qTerms, m = 2)))
    // positions followed both mutations
    assert(hits(textIndexPhraseSearchVersioned(spark, ver,
        Seq("liquor", "jugs"))) ==
      hits(textIndexPhraseSearch(spark, ren, Seq("liquor", "jugs"))))
    // the deleted doc is gone from the champion RELATION itself, not
    // merely masked at query time
    assert(VersionedStore.read(spark, ver, "champions")
      .filter(col("doc_id") === 3L).isEmpty,
      "champion heads must be re-elected in the deleting revision")
  }

  test("time travel: after append and delete land, asOf the build " +
    "revision serves the search, the champion heads, and the positions " +
    "exactly as they stood — bit-equal to a fresh index of the old corpus") {
    val base = tmpDir("vtixtt")
    val ver = s"$base/versioned"; val fresh = s"$base/fresh"
    val r1 = textIndexSaveVersioned(corpus, ver, withPositions = true)
    textIndexChampionsSaveVersioned(spark, ver, m = 2)
    val r2 = VersionedStore.currentVersion(spark, ver).get
    textIndexAppendVersioned(increment, ver)
    textIndexDeleteVersioned(Seq(1L, 4L).toDF("doc_id"), ver)
    textIndexSaveVersioned(corpus, fresh, withPositions = true)
    textIndexChampionsSaveVersioned(spark, fresh, m = 2)
    assert(scores(textIndexSearchVersioned(spark, ver, qTerms,
        asOf = Some(r1))) ==
      scores(textIndexSearchVersioned(spark, fresh, qTerms)))
    assert(scores(textIndexChampionSearchVersioned(spark, ver, qTerms,
        m = 2, asOf = Some(r2))) ==
      scores(textIndexChampionSearchVersioned(spark, fresh, qTerms, m = 2)))
    assert(hits(textIndexPhraseSearchVersioned(spark, ver,
        Seq("sphinx", "of"), asOf = Some(r1))) ==
      hits(textIndexPhraseSearchVersioned(spark, fresh, Seq("sphinx", "of"))))
    // and the current revision reflects the mutations
    val cur = scores(textIndexSearchVersioned(spark, ver, qTerms))
    assert(cur.exists(_._1 == 101L) && !cur.exists(_._1 == 1L))
  }

  test("sync: bootstrap builds rev 1 and checkpoints beside _versions; " +
    "one call absorbs an append+delete window as ONE index revision; " +
    "no-op when current; the maintained index searches identically to " +
    "a fresh build of the final visible corpus") {
    val base = tmpDir("vtixsync")
    val store = s"$base/docs"; val ver = s"$base/idx"; val fresh = s"$base/fresh"
    val r1 = VersionedStore.save(Map("docs" -> corpus), store)
    assert(textIndexSyncVersionedWithStore(spark, store, "docs", ver)
      == Some((r1, r1)))
    val revAfterBoot = VersionedStore.currentVersion(spark, ver).get
    VersionedStore.append(Map("docs" -> increment), store)
    val r3 = VersionedStore.delete(Seq(2L).toDF("doc_id"), "docs", store)
    assert(textIndexSyncVersionedWithStore(spark, store, "docs", ver)
      == Some((r1, r3)))
    assert(VersionedStore.currentVersion(spark, ver).get == revAfterBoot + 1,
      "the window's tombstones and delta relations must land as ONE commit")
    assert(textIndexSyncVersionedWithStore(spark, store, "docs", ver).isEmpty)
    textIndexSaveVersioned(VersionedStore.read(spark, store, "docs", None)
      .select("doc_id", "text"), fresh)
    assert(scores(textIndexSearchVersioned(spark, ver, qTerms)) ==
      scores(textIndexSearchVersioned(spark, fresh, qTerms)))
    VersionedStore.vacuum(spark, ver, keep = 1)
    assert(RevisionSync.syncedRev(spark, ver) == Some((store, r3)),
      "vacuum must never reclaim the sync checkpoint")
  }
}
