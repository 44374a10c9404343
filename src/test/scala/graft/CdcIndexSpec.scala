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

  test("sync: bootstrap builds and checkpoints; one call absorbs several " +
    "pending revisions; a current index is a no-op; a crash-lagged " +
    "marker (maintenance applied, bump lost) re-syncs to the identical " +
    "index") {
    import graft.operators.RevisionSync
    val base = tmpDir("cdcsync")
    val store = s"$base/corpus"; val idx = s"$base/idx"
    VersionedStore.save(Map("docs" ->
      docs.filter(col("doc_id") % 3 =!= 0).select("doc_id", "text")), store)
    // bootstrap: fresh build + checkpoint at current
    assert(textIndexSyncWithStore(spark, store, "docs", idx).isDefined)
    assert(RevisionSync.syncedRev(spark, idx).map(_._2).contains(1L))
    assert(textIndexSyncWithStore(spark, store, "docs", idx).isEmpty,
      "an up-to-date index must sync as a no-op")
    // two pending revisions, ONE sync
    VersionedStore.append(Map("docs" ->
      docs.filter(col("doc_id") % 3 === 0).select("doc_id", "text")), store)
    val doomed = docs.filter(col("doc_id") % 7 === 2).select("doc_id")
    val r3 = VersionedStore.delete(doomed, "docs", store)
    assert(textIndexSyncWithStore(spark, store, "docs", idx)
      .contains((1L, r3)))
    val fresh = s"$base/fresh"
    freshOf(VersionedStore.read(spark, store, "docs", Some(r3)), fresh)
    assert(loaded(idx) == loaded(fresh))
    // crash-lag: apply a new window's maintenance by hand, leave the
    // marker stale — the next sync replays the window (idempotent) and
    // lands on the same index
    val r4 = VersionedStore.delete(
      docs.filter(col("doc_id") % 11 === 1).select("doc_id"), "docs", store)
    textIndexMaintainFromStore(spark, store, "docs", r3, r4, idx)
    assert(RevisionSync.syncedRev(spark, idx).map(_._2).contains(r3),
      "the simulated crash leaves the marker lagging")
    assert(textIndexSyncWithStore(spark, store, "docs", idx)
      .contains((r3, r4)))
    val fresh4 = s"$base/fresh4"
    freshOf(VersionedStore.read(spark, store, "docs", Some(r4)), fresh4)
    assert(loaded(idx) == loaded(fresh4))
  }

  test("sync refusals: an existing unmarked index, a marker tracking a " +
    "different store, and a marker ahead of a rebuilt store all refuse " +
    "with guidance") {
    import graft.operators.RevisionSync
    val base = tmpDir("cdcsync-ref")
    val store = s"$base/corpus"; val idx = s"$base/idx"
    VersionedStore.save(Map("docs" -> docs.select("doc_id", "text")), store)
    // unmarked index: built by hand, no provenance
    freshOf(docs, idx)
    val e1 = intercept[IllegalArgumentException] {
      textIndexSyncWithStore(spark, store, "docs", idx)
    }
    assert(e1.getMessage.contains("_synced_rev"))
    // marker tracking another store
    val idx2 = s"$base/idx2"
    assert(textIndexSyncWithStore(spark, store, "docs", idx2).isDefined)
    val store2 = s"$base/corpus2"
    VersionedStore.save(Map("docs" -> docs.select("doc_id", "text")), store2)
    val e2 = intercept[IllegalArgumentException] {
      textIndexSyncWithStore(spark, store2, "docs", idx2)
    }
    assert(e2.getMessage.contains("mix corpora"))
    // marker ahead: the store was rebuilt from scratch under the index
    VersionedStore.append(
      Map("docs" -> docs.limit(1).select("doc_id", "text")), store)
    textIndexSyncWithStore(spark, store, "docs", idx2)
    RevisionSync.setSyncedRev(spark, idx2, store, 99L)
    val e3 = intercept[IllegalArgumentException] {
      textIndexSyncWithStore(spark, store, "docs", idx2)
    }
    assert(e3.getMessage.contains("AHEAD"))
  }

  test("a bootstrap that crashes mid-build self-heals: the sentinel " +
    "marker (-1) makes the next sync rebuild instead of refusing forever") {
    import graft.operators.RevisionSync
    val base = tmpDir("cdcsync-boot")
    val store = s"$base/corpus"; val idx = s"$base/idx"
    val r1 = VersionedStore.save(Map("docs" ->
      docs.filter(col("doc_id") % 2 === 0).select("doc_id", "text")), store)
    // simulate the crash: sentinel written, build half-done (postings
    // exist, marker never bumped) — exactly the state a die-mid-build
    // leaves behind
    RevisionSync.setSyncedRev(spark, idx, store, -1L)
    freshOf(docs.limit(3), idx) // a wrong, partial index
    assert(textIndexSyncWithStore(spark, store, "docs", idx)
      .contains((r1, r1)), "the sentinel must re-bootstrap, not refuse")
    val fresh = s"$base/fresh"
    freshOf(VersionedStore.read(spark, store, "docs", Some(r1)), fresh)
    assert(loaded(idx) == loaded(fresh),
      "the re-bootstrap must overwrite the partial index completely")
    assert(RevisionSync.syncedRev(spark, idx).map(_._2).contains(r1))
    // the explicit-window path refuses a sentinel with guidance
    RevisionSync.setSyncedRev(spark, idx, store, -1L)
    val e = intercept[IllegalArgumentException] {
      RevisionSync.window(spark, idx, store)
    }
    assert(e.getMessage.contains("sentinel"))
  }

  test("streaming composition: exactly-once versioned ingest + per-batch " +
    "sync — a replayed batch skips AND its sync no-ops; a batch whose " +
    "sync crashed is absorbed by the NEXT batch's sync; the final index " +
    "equals a fresh build of the store's current revision") {
    import graft.streaming.VersionedIngest
    val base = tmpDir("ingestsync")
    val store = s"$base/corpus"; val idx = s"$base/idx"
    val d = docs.select("doc_id", "text")
    val slice = (m: Long) => d.filter(col("doc_id") % 4 === m)
    // pre-stream bootstrap: corpus then index
    VersionedIngest.bootstrap(slice(0), store)
    assert(textIndexSyncWithStore(spark, store, "docs", idx).isDefined)
    // batch 0 applies; its sync applies one window
    assert(VersionedIngest.ingestBatch(slice(1), 0L, store))
    assert(textIndexSyncWithStore(spark, store, "docs", idx).isDefined)
    // batch 0 REPLAYED (post-crash re-run): ingest skips, sync no-ops
    assert(!VersionedIngest.ingestBatch(slice(1), 0L, store))
    assert(textIndexSyncWithStore(spark, store, "docs", idx).isEmpty)
    // batch 1 applies but its sync CRASHES (simulated by skipping it);
    // batch 2 applies and its sync absorbs both pending revisions
    assert(VersionedIngest.ingestBatch(slice(2), 1L, store))
    assert(VersionedIngest.ingestBatch(slice(3), 2L, store))
    val w = textIndexSyncWithStore(spark, store, "docs", idx)
    assert(w.isDefined && w.get._2 - w.get._1 == 2,
      s"the catch-up sync must span both pending revisions, got $w")
    val fresh = s"$base/fresh"
    freshOf(VersionedStore.read(spark, store, "docs"), fresh)
    assert(loaded(idx) == loaded(fresh))
  }
}
