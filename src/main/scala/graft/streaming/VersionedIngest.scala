package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.VersionedStore

/** Streaming ingest into a [[VersionedStore]] — exactly-once from the
  * commit protocol itself, with NO side ledger and NO rename.
  *
  * The other ingest loops ([[IngestPipeline]], [[TextIngest]]) get
  * exactly-once from idempotent append verbs (the store is probed for
  * already-present doc_ids) plus crash-recovery markers. The versioned
  * store gets it more cheaply: each micro-batch commits one revision
  * whose manifest carries the batch id as a `meta` entry, so "data
  * visible" and "batch recorded" are ONE atomic object PUT. A replayed
  * batch (Structured Streaming re-runs the last uncommitted batch after
  * a crash) finds its id at or below the store's recorded marker and
  * skips — no probe of the data, no anti-join, an O(1) manifest read.
  * A batch that crashed BEFORE its manifest landed left only invisible
  * data dirs; the replay overwrites them and commits. Every crash
  * instant therefore lands in exactly one of: not applied (replay
  * applies it) or fully applied (replay skips it).
  *
  * At 100 TB: per batch this writes increment-sized parquet plus one
  * small manifest; the corpus is never read, listed, or rewritten.
  * Periodic [[VersionedStore.compact]]/[[VersionedStore.vacuum]] (which
  * PRESERVE the batch marker) bound manifest length and dir count.
  */
object VersionedIngest {

  /** Create the store from a pre-stream corpus (run once, before the
    * stream). The marker is -1: the stream's own batches start at 0,
    * and all of them must apply on top of the bootstrap.
    */
  def bootstrap(initial: DataFrame, path: String, rel: String = "docs",
      batchId: Long = -1L): Unit =
    VersionedStore.save(Map(rel -> initial), path, marker = Some(batchId))

  /** One micro-batch: append under the batch-id marker, or skip if this
    * id is already recorded (the replay path). Returns true when the
    * batch was applied. An empty batch still commits (an empty dir +
    * manifest) so the marker advances and a later replay of it skips —
    * cheaper than special-casing emptiness into the ledger.
    */
  def ingestBatch(batch: DataFrame, batchId: Long, path: String,
      rel: String = "docs"): Boolean = {
    val spark = batch.sparkSession
    val applied = VersionedStore.batchMarker(spark, path)
    if (applied.exists(_ >= batchId)) false
    else {
      VersionedStore.append(Map(rel -> batch), path, marker = Some(batchId))
      true
    }
  }

  /** Bind the loop to a document stream. */
  def start(docs: DataFrame, path: String, checkpoint: String,
      rel: String = "docs"): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) => {
        ingestBatch(b, id, path, rel); ()
      })
      .start()
}
