package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{RevisionSync, VersionedStore}
import graft.queries.{DedupQueries, SearchQueries}
import graft.streaming.{IngestPipeline, TextIngest, VersionedIngest}

/** The FULLY-VERSIONED streaming composition (TextIngest.startVersioned
  * / IngestPipeline.startVersionedSharded): per micro-batch, the corpus
  * lands in its manifest-committed store under the batch marker and the
  * derived manifest-committed index syncs its revision window. Pins the
  * IncrementalIngestSpec discipline on the rename-free form:
  * streaming-equals-batch (the streamed index is indistinguishable from
  * a fresh build of the final corpus), replayed batches are no-ops on
  * BOTH stores, and a crash between corpus ingest and index sync
  * converges on the next batch.
  */
class VersionedIngestSyncSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def docs: DataFrame =
    Tables(spark, dir, "documents").select("doc_id", "text")

  private def searchRows(idx: String) =
    SearchQueries.textIndexSearchVersioned(spark, idx)
      .orderBy("doc_id").collect().toSeq

  test("startVersioned streaming e2e: bootstrap + two micro-batches " +
    "equals a fresh versioned build of the whole corpus, and the index " +
    "checkpoint tracks the corpus head") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = tmpDir("vtix-stream")
    val store = s"$base/corpus"; val idx = s"$base/idx"
    VersionedIngest.bootstrap(docs.filter(col("doc_id") % 3 === 0), store)
    val input = MemoryStream[(Long, String)](spark)
    val q = TextIngest.startVersioned(input.toDF().toDF("doc_id", "text"),
      store, idx, tmpDir("vtix-ckpt"))
    try {
      val rest = docs.filter(col("doc_id") % 3 =!= 0)
        .as[(Long, String)].collect()
      val (b1, b2) = rest.splitAt(rest.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    // the corpus store holds everything, marker at the last batch
    assert(VersionedStore.read(spark, store, "docs").count() ==
      docs.count())
    assert(VersionedStore.batchMarker(spark, store).contains(1L))
    // streaming == batch: a fresh versioned index of the final corpus
    val fresh = s"$base/fresh"
    SearchQueries.textIndexSaveVersioned(
      VersionedStore.read(spark, store, "docs"), fresh)
    assert(searchRows(idx) == searchRows(fresh),
      "the streamed index must be indistinguishable from a fresh build")
    assert(RevisionSync.syncedRev(spark, idx) ==
      Some((store, VersionedStore.currentVersion(spark, store).get)),
      "the index checkpoint tracks the corpus head")
  }

  test("a replayed micro-batch is a no-op on BOTH stores; a crash " +
    "between corpus ingest and index sync converges on the next call") {
    val base = tmpDir("vtix-replay")
    val store = s"$base/corpus"; val idx = s"$base/idx"
    val b0 = docs.filter(col("doc_id") % 3 === 0).localCheckpoint(true)
    val b1 = docs.filter(col("doc_id") % 3 === 1).localCheckpoint(true)
    val b2 = docs.filter(col("doc_id") % 3 === 2).localCheckpoint(true)
    VersionedIngest.bootstrap(b0, store)
    assert(TextIngest.ingestBatchVersioned(b1, 0L, store, idx))
    val revS = VersionedStore.currentVersion(spark, store).get
    val revI = VersionedStore.currentVersion(spark, idx).get
    val rowsBefore = searchRows(idx)
    // replay batch 0: the corpus skips (marker), the index is current
    assert(!TextIngest.ingestBatchVersioned(b1, 0L, store, idx))
    assert(VersionedStore.currentVersion(spark, store).contains(revS) &&
      VersionedStore.currentVersion(spark, idx).contains(revI),
      "a replay commits nothing on either store")
    assert(searchRows(idx) == rowsBefore)
    // crash window: batch 1's corpus ingest landed, the sync did not
    VersionedIngest.ingestBatch(b2, 1L, store)
    // the NEXT batch (a replay of 1, as Structured Streaming would
    // re-run it) finds the corpus current and the index behind by one
    // revision — its sync absorbs the window
    assert(!TextIngest.ingestBatchVersioned(b2, 1L, store, idx))
    val fresh = s"$base/fresh"
    SearchQueries.textIndexSaveVersioned(
      VersionedStore.read(spark, store, "docs"), fresh)
    assert(searchRows(idx) == searchRows(fresh),
      "the crash-interrupted sync converges on the replay")
  }

  test("corpus + index retention in the composed loop: the vacuum runs " +
    "AFTER each batch's sync (the CDC window's manifests are always " +
    "retained), both stores stay bounded, markers survive, and the " +
    "index still equals a fresh build") {
    val base = tmpDir("vtix-retain")
    val store = s"$base/corpus"; val idx = s"$base/idx"
    val parts = (0 to 3).map(i =>
      docs.filter(col("doc_id") % 4 === i).localCheckpoint(true))
    VersionedIngest.bootstrap(parts(0), store)
    // three batches, corpus vacuumed to ONE revision after each sync,
    // index to two — the tightest floors the composed ordering allows
    (1 to 3).foreach { i =>
      assert(TextIngest.ingestBatchVersioned(parts(i), i - 1L, store, idx,
        corpusRetain = Some(1), indexRetain = Some(2)))
    }
    assert(VersionedStore.listVersions(spark, store).size == 1,
      "corpus bounded to one retained revision")
    assert(VersionedStore.listVersions(spark, idx).size <= 2,
      "index bounded to two retained revisions")
    assert(VersionedStore.batchMarker(spark, store).contains(2L),
      "the batch marker rides the retained manifest")
    // a replay of the last batch is still a no-op after all the vacuums
    assert(!TextIngest.ingestBatchVersioned(parts(3), 2L, store, idx,
      corpusRetain = Some(1), indexRetain = Some(2)))
    val fresh = s"$base/fresh"
    SearchQueries.textIndexSaveVersioned(
      VersionedStore.read(spark, store, "docs"), fresh)
    assert(searchRows(idx) == searchRows(fresh),
      "retention must not change what the index serves")
  }

  test("startVersionedSharded: the streamed signature federation equals " +
    "a from-scratch federated build of the final corpus; the probe " +
    "equals the model recompute") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = tmpDir("vsig-stream")
    val store = s"$base/corpus"; val fed = s"$base/fed"
    val corpus = Tables(spark, dir, "documents")
      .filter(col("source") =!= "src19").select("doc_id", "text")
      .localCheckpoint(true)
    VersionedIngest.bootstrap(corpus.filter(col("doc_id") % 3 === 0),
      store)
    val input = MemoryStream[(Long, String)](spark)
    val q = IngestPipeline.startVersionedSharded(
      input.toDF().toDF("doc_id", "text"), store, fed,
      tmpDir("vsig-ckpt"), nShards = 3)
    try {
      val rest = corpus.filter(col("doc_id") % 3 =!= 0)
        .as[(Long, String)].collect()
      val (b1, b2) = rest.splitAt(rest.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val probe = Tables(spark, dir, "documents")
      .filter(col("source") === "src19").select("doc_id", "text")
      .limit(10).localCheckpoint(true)
    val got = DedupQueries.probeSignatureIndexShardedVersioned(spark,
      probe, fed).collect().map(_.toSeq).toSet
    val want = DedupQueries.incrementalReject(
      DedupQueries.minhashSigs(VersionedStore.read(spark, store, "docs")),
      DedupQueries.minhashSigs(probe)).collect().map(_.toSeq).toSet
    assert(got == want,
      "the streamed federation probes exactly like the model recompute")
  }
}
