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
}
