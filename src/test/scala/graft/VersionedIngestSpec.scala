package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.VersionedStore
import graft.streaming.VersionedIngest

/** Exactly-once streaming ingest into the versioned store: the batch-id
  * marker rides INSIDE the manifest, so "data visible" and "batch
  * recorded" are one atomic commit — a replayed micro-batch skips, a
  * batch that crashed pre-manifest re-applies cleanly, and no side
  * ledger or recover verb exists anywhere in the loop.
  */
class VersionedIngestSpec extends SparkSuite {

  import spark.implicits._

  private def docs(ids: Long*): DataFrame =
    ids.toDF("doc_id").withColumn("text", concat(lit("doc-"), col("doc_id")))

  private def idsAt(path: String): Seq[Long] =
    VersionedStore.read(spark, path, "docs")
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted

  test("batches apply once and a REPLAYED batch id skips without touching " +
    "the store") {
    val path = tmpDir("vingest") + "/s"
    VersionedIngest.bootstrap(docs(1, 2), path)
    assert(VersionedStore.batchMarker(spark, path).contains(-1L))
    assert(VersionedIngest.ingestBatch(docs(3), 0L, path))
    assert(VersionedIngest.ingestBatch(docs(4), 1L, path))
    assert(idsAt(path) == Seq(1, 2, 3, 4))
    val revBefore = VersionedStore.currentVersion(spark, path)
    // the crash-replay path: Structured Streaming re-runs batch 1
    assert(!VersionedIngest.ingestBatch(docs(4), 1L, path),
      "replayed batch must report skipped")
    assert(VersionedStore.currentVersion(spark, path) == revBefore,
      "a skipped replay must not commit a revision")
    assert(idsAt(path) == Seq(1, 2, 3, 4))
    assert(VersionedStore.batchMarker(spark, path).contains(1L))
  }

  test("a batch that crashed BEFORE its manifest landed re-applies on " +
    "replay — no double rows, no recover step") {
    val path = tmpDir("vingest-crash") + "/s"
    VersionedIngest.bootstrap(docs(1), path)
    VersionedIngest.ingestBatch(docs(2), 0L, path)
    // simulate: batch 1 wrote its delta dir, died before the commit
    VersionedStore.writeDataDir(docs(3), path, 3L, "data", "docs")
    assert(idsAt(path) == Seq(1, 2), "uncommitted batch must be invisible")
    assert(VersionedIngest.ingestBatch(docs(3), 1L, path),
      "replay of the crashed batch must apply")
    assert(idsAt(path) == Seq(1, 2, 3))
  }

  test("empty batches advance the marker (their replay skips) and compact " +
    "preserves it") {
    val path = tmpDir("vingest-empty") + "/s"
    VersionedIngest.bootstrap(docs(1), path)
    assert(VersionedIngest.ingestBatch(docs().limit(0), 0L, path))
    assert(VersionedStore.batchMarker(spark, path).contains(0L))
    assert(!VersionedIngest.ingestBatch(docs().limit(0), 0L, path))
    VersionedStore.compact(spark, path)
    assert(VersionedStore.batchMarker(spark, path).contains(0L),
      "compaction must not forget the applied-batch marker")
    assert(!VersionedIngest.ingestBatch(docs(9), 0L, path),
      "post-compact replay of an applied batch must still skip")
    assert(idsAt(path) == Seq(1))
  }

  test("end-to-end through Structured Streaming: foreachBatch commits one " +
    "marked revision per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = tmpDir("vingest-e2e")
    val path = s"$base/s"
    VersionedIngest.bootstrap(docs(1, 2), path)
    val input = MemoryStream[Long](spark)
    val q = VersionedIngest.start(
      input.toDF().toDF("doc_id")
        .withColumn("text", concat(lit("doc-"), col("doc_id"))),
      path, s"$base/ckpt")
    try {
      input.addData(3L, 4L)
      q.processAllAvailable()
      assert(idsAt(path) == Seq(1, 2, 3, 4))
      assert(VersionedStore.batchMarker(spark, path).contains(0L))
      input.addData(5L)
      q.processAllAvailable()
      assert(idsAt(path) == Seq(1, 2, 3, 4, 5))
      assert(VersionedStore.batchMarker(spark, path).contains(1L))
      // every micro-batch is a time-travelable revision
      assert(VersionedStore.read(spark, path, "docs", Some(1L)).count() == 2)
      assert(VersionedStore.read(spark, path, "docs", Some(2L)).count() == 4)
    } finally q.stop()
  }

  // ----------------------------------------------------------------
  // Materialized-view maintenance: the q181 corpus card kept fresh by
  // the ingest loop itself, with the partials committing in the SAME
  // revision as the data.
  // ----------------------------------------------------------------

  import graft.queries.GovernanceQueries.{corpusCardPartials, corpusCardMerge}

  private def sdocs(ids: Long*): DataFrame =
    ids.toDF("doc_id")
      .withColumn("text", concat(lit("doc-"), col("doc_id")))
      .withColumn("source",
        when(col("doc_id") % 2 === 0, "even").otherwise("odd"))

  private def cardAt(path: String,
      asOf: Option[Long] = None): Set[(String, Long, Long, Long)] =
    corpusCardMerge(VersionedStore.read(spark, path, "card", asOf))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  /** The from-scratch report over the surviving corpus at a revision —
    * what the maintained card must always equal.
    */
  private def scratchCard(path: String,
      asOf: Option[Long] = None): Set[(String, Long, Long, Long)] =
    corpusCardPartials(VersionedStore.read(spark, path, "docs", asOf))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("view partials ride the data's revision: a replay skips both, and " +
    "the card equals the from-scratch report at EVERY retained revision") {
    val path = tmpDir("vingest-view") + "/s"
    VersionedIngest.bootstrapWithView(sdocs(1, 2), path, corpusCardPartials(_))
    assert(VersionedIngest.ingestBatchWithView(
      sdocs(3, 4), 0L, path, corpusCardPartials(_)))
    assert(VersionedIngest.ingestBatchWithView(
      sdocs(5), 1L, path, corpusCardPartials(_)))
    val revBefore = VersionedStore.currentVersion(spark, path)
    assert(!VersionedIngest.ingestBatchWithView(
      sdocs(5), 1L, path, corpusCardPartials(_)),
      "replayed batch must skip data AND view")
    assert(VersionedStore.currentVersion(spark, path) == revBefore)
    // corpus and card share the manifest, so they can never be observed
    // at different batch states — at any time-traveled revision either
    assert(VersionedStore.listVersions(spark, path).nonEmpty)
    VersionedStore.listVersions(spark, path).foreach { v =>
      assert(cardAt(path, Some(v)) == scratchCard(path, Some(v)),
        s"card out of step with corpus at revision $v")
    }
  }

  test("a pre-manifest crash leaves corpus and card unchanged TOGETHER; " +
    "the replay applies both") {
    val path = tmpDir("vingest-view-crash") + "/s"
    VersionedIngest.bootstrapWithView(sdocs(1), path, corpusCardPartials(_))
    VersionedIngest.ingestBatchWithView(sdocs(2), 0L, path,
      corpusCardPartials(_))
    // crash: batch 1 wrote BOTH its dirs, died before the one manifest
    val next = VersionedStore.currentVersion(spark, path).get + 1L
    VersionedStore.writeDataDir(sdocs(3), path, next, "data", "docs")
    VersionedStore.writeDataDir(corpusCardPartials(sdocs(3)), path, next,
      "data", "card")
    assert(idsAt(path) == Seq(1, 2), "uncommitted data must be invisible")
    assert(cardAt(path) == scratchCard(path),
      "uncommitted partials must be invisible")
    assert(VersionedIngest.ingestBatchWithView(
      sdocs(3), 1L, path, corpusCardPartials(_)))
    assert(idsAt(path) == Seq(1, 2, 3))
    assert(cardAt(path) == scratchCard(path))
  }

  test("deleteWithView commits tombstones and retraction as ONE revision, " +
    "elides fully-retracted sources, and a driver retry retracts nothing") {
    val path = tmpDir("vingest-view-del") + "/s"
    VersionedIngest.bootstrapWithView(sdocs(1, 2, 3, 4), path,
      corpusCardPartials(_))
    val rev = VersionedIngest.deleteWithView(Seq(2L, 4L).toDF("doc_id"),
      path, corpusCardPartials(_, negate = true))
    assert(idsAt(path) == Seq(1, 3))
    val card = cardAt(path)
    assert(card == scratchCard(path))
    assert(!card.exists(_._1 == "even"),
      "a fully-retracted source must disappear (zero-group elision)")
    // the pre-delete revision still shows both, consistently
    assert(cardAt(path, Some(rev - 1)) == scratchCard(path, Some(rev - 1)))
    assert(cardAt(path, Some(rev - 1)).exists(_._1 == "even"))
    // idempotent without a marker: the retry's doomed set is empty, so
    // its retraction is empty — no double-negation
    VersionedIngest.deleteWithView(Seq(2L, 4L).toDF("doc_id"), path,
      corpusCardPartials(_, negate = true))
    assert(cardAt(path) == scratchCard(path))
  }

  test("foldView shrinks the partials chain without changing the folded " +
    "card, preserves the batch marker, and keeps composing with ingest") {
    val path = tmpDir("vingest-view-fold") + "/s"
    VersionedIngest.bootstrapWithView(sdocs(1, 2), path, corpusCardPartials(_))
    VersionedIngest.ingestBatchWithView(sdocs(3, 4), 0L, path,
      corpusCardPartials(_))
    VersionedIngest.ingestBatchWithView(sdocs(5), 1L, path,
      corpusCardPartials(_))
    val before = VersionedStore.read(spark, path, "card").count()
    val rev = VersionedIngest.foldView(spark, path, corpusCardMerge(_))
    assert(VersionedStore.read(spark, path, "card").count() < before,
      "fold must shrink the chain to merged rows")
    assert(cardAt(path) == scratchCard(path))
    // prior revisions still time-travel to the unfolded chain
    assert(VersionedStore.read(spark, path, "card", Some(rev - 1))
      .count() == before)
    // the exactly-once marker survives the fold: a replay still skips
    assert(VersionedStore.batchMarker(spark, path).contains(1L))
    assert(!VersionedIngest.ingestBatchWithView(
      sdocs(5), 1L, path, corpusCardPartials(_)))
    // the folded relation is itself a valid partials relation
    assert(VersionedIngest.ingestBatchWithView(
      sdocs(6), 2L, path, corpusCardPartials(_)))
    assert(cardAt(path) == scratchCard(path))
  }

  test("end-to-end with view through Structured Streaming: each " +
    "micro-batch commits data + partials as one marked revision") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = tmpDir("vingest-view-e2e")
    val path = s"$base/s"
    VersionedIngest.bootstrapWithView(sdocs(1, 2), path, corpusCardPartials(_))
    val input = MemoryStream[Long](spark)
    val q = VersionedIngest.startWithView(
      input.toDF().toDF("doc_id")
        .withColumn("text", concat(lit("doc-"), col("doc_id")))
        .withColumn("source",
          when(col("doc_id") % 2 === 0, "even").otherwise("odd")),
      path, s"$base/ckpt", corpusCardPartials(_))
    try {
      input.addData(3L, 4L)
      q.processAllAvailable()
      assert(idsAt(path) == Seq(1, 2, 3, 4))
      assert(cardAt(path) == scratchCard(path))
      input.addData(5L)
      q.processAllAvailable()
      assert(idsAt(path) == Seq(1, 2, 3, 4, 5))
      assert(cardAt(path) == scratchCard(path))
      // the card is time-travelable alongside the corpus
      assert(cardAt(path, Some(1L)) == scratchCard(path, Some(1L)))
    } finally q.stop()
  }
}
