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
    *
    * `retain` is the CORPUS-side retention knob (the sync verbs'
    * `retain`, applied to the store this loop grows): a streaming loop
    * commits one revision per micro-batch FOREVER — a year of minutely
    * batches is half a million manifests — so `retain = Some(n)`
    * vacuums the store to its newest n revisions after each applied
    * batch. The batch marker rides the newest manifest and survives
    * every vacuum (exactly-once is untouched); time travel below the
    * floor refuses thereafter, and a derived index synced on an
    * independent schedule must not lag more than n-1 revisions or its
    * next CDC window refuses against the floor (use
    * [[ingestBatchWithSync]], which vacuums AFTER the sync) — the
    * documented trades.
    */
  def ingestBatch(batch: DataFrame, batchId: Long, path: String,
      rel: String = "docs", retain: Option[Int] = None): Boolean = {
    val spark = batch.sparkSession
    val applied = VersionedStore.batchMarker(spark, path)
    if (applied.exists(_ >= batchId)) false
    else {
      VersionedStore.append(Map(rel -> batch), path, marker = Some(batchId))
      retain.foreach(n => VersionedStore.vacuum(spark, path, keep = n))
      true
    }
  }

  /** Bind the loop to a document stream. */
  def start(docs: DataFrame, path: String, checkpoint: String,
      rel: String = "docs", retain: Option[Int] = None): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) => {
        ingestBatch(b, id, path, rel, retain); ()
      })
      .start()

  // ------------------------------------------------------------------
  // Corpus-plus-derived-index composition: the first-class streaming
  // loop for a manifest-committed DERIVED index (text/signature/winnow/
  // vector families). Per micro-batch: (1) the batch lands in the
  // versioned corpus store under its batch-id marker (exactly-once from
  // the manifest protocol — a replay skips), then (2) the family's
  // ARGUMENT-FREE sync verb absorbs whatever revision window the index
  // is behind by (bootstrap on first call, O(delta) catch-up after,
  // no-op when current). Crash anywhere between (1) and (2) converges:
  // the next batch's sync absorbs both windows at once; a replayed
  // batch's ingest no-ops and its sync finds the index current. The
  // index may even be synced by an INDEPENDENT schedule — the loop's
  // sync is just "at least once per batch".
  // ------------------------------------------------------------------

  /** One micro-batch of the composed loop; `sync` is the family's
    * argument-free sync thunk (e.g.
    * `textIndexSyncVersionedWithStore(spark, store, rel, idx)`).
    * Returns whether the corpus ingest applied (a replay returns false
    * but still runs the sync — the index may be behind for OTHER
    * reasons, e.g. a crash after last batch's ingest).
    */
  def ingestBatchWithSync(batch: DataFrame, batchId: Long, path: String,
      rel: String = "docs", retain: Option[Int] = None)(
      sync: => Unit): Boolean = {
    val spark = batch.sparkSession
    // ORDER MATTERS: the vacuum runs AFTER the sync, never inside the
    // ingest — the sync's CDC window reads the manifest of the LAST
    // ABSORBED revision (the index's `_synced_rev`), which an eager
    // corpus vacuum in the same batch would have just reclaimed.
    val applied = ingestBatch(batch, batchId, path, rel, retain = None)
    sync
    retain.foreach(n => VersionedStore.vacuum(spark, path, keep = n))
    applied
  }

  /** Bind the composed corpus-ingest + index-sync loop to a stream.
    * `retain` bounds the CORPUS store's revisions (the family sync's
    * own `retain` bounds the index side — pass it inside the thunk),
    * vacuuming AFTER the sync so the window's manifests are always
    * retained. Because this loop syncs every batch, the index can lag
    * by at most the one in-flight revision and any `retain >= 1` is
    * safe; an index synced on an INDEPENDENT slower schedule instead
    * needs `retain > ` its maximum lag in revisions, or its next
    * window refuses against the vacuumed floor (the standalone
    * [[ingestBatch]]'s documented trade).
    */
  def startWithSync(docs: DataFrame, path: String, checkpoint: String,
      rel: String = "docs", retain: Option[Int] = None)(
      sync: => Unit): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) => {
        ingestBatchWithSync(b, id, path, rel, retain)(sync); ()
      })
      .start()

  // ------------------------------------------------------------------
  // Materialized-view maintenance (q181's discipline, made streaming).
  // `partialsOf` maps an increment of `rel` to its partial-aggregate
  // contribution to the view (invertible aggregates — counts and long
  // sums); `retractionOf` maps deleted ROWS to their negated partials.
  // Because the view's partials commit in the SAME revision as the data
  // (one manifest PUT), corpus and view can never be seen at different
  // batch states — the view inherits exactly-once from the data's
  // commit protocol instead of needing its own ledger.
  // ------------------------------------------------------------------

  /** Bootstrap corpus + view together (one revision, marker -1). */
  def bootstrapWithView(initial: DataFrame, path: String,
      partialsOf: DataFrame => DataFrame, rel: String = "docs",
      view: String = "card"): Unit =
    VersionedStore.save(Map(rel -> initial, view -> partialsOf(initial)),
      path, marker = Some(-1L))

  /** One micro-batch, data and view partials in one revision. A replay
    * skips BOTH (they share the marker); a pre-manifest crash left both
    * invisible. The view is therefore exactly as fresh as the corpus at
    * every revision — including time-traveled ones.
    */
  def ingestBatchWithView(batch: DataFrame, batchId: Long, path: String,
      partialsOf: DataFrame => DataFrame, rel: String = "docs",
      view: String = "card"): Boolean = {
    val spark = batch.sparkSession
    val applied = VersionedStore.batchMarker(spark, path)
    if (applied.exists(_ >= batchId)) false
    else {
      VersionedStore.append(
        Map(rel -> batch, view -> partialsOf(batch)), path,
        marker = Some(batchId))
      true
    }
  }

  /** Delete by key with an atomic view retraction: tombstones for `rel`
    * and the doomed rows' negated partials commit as ONE revision
    * ([[VersionedStore.commitDelta]]). Idempotent WITHOUT a marker, by
    * construction: the doomed set is the CURRENT read semi-joined with
    * `keys`, so a driver retry after a successful commit finds the rows
    * already tombstoned and retracts nothing, while a retry after a
    * pre-manifest crash finds them all still visible. Cost: one
    * semi-join scan of `rel` (delete verbs are rare; the corpus is
    * read, never rewritten).
    */
  def deleteWithView(keys: DataFrame, path: String,
      retractionOf: DataFrame => DataFrame, rel: String = "docs",
      view: String = "card"): Long = {
    val spark = keys.sparkSession
    val doomed = VersionedStore.read(spark, path, rel)
      .join(keys, keys.columns.toSeq, "left_semi")
    VersionedStore.commitDelta(
      appends = Map(view -> retractionOf(doomed)),
      deletes = Map(rel -> keys), path)
  }

  /** Bind the view-maintaining loop to a document stream. */
  def startWithView(docs: DataFrame, path: String, checkpoint: String,
      partialsOf: DataFrame => DataFrame, rel: String = "docs",
      view: String = "card"): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) => {
        ingestBatchWithView(b, id, path, partialsOf, rel, view); ()
      })
      .start()

  /** Fold the view's partials chain back to merged rows (layout
    * maintenance — the folded relation is itself a valid partials
    * relation, so ingest/delete keep composing afterwards). One new
    * revision via [[VersionedStore.replaceRelation]]; the corpus
    * relation is untouched and prior revisions still time-travel to
    * the unfolded chain.
    */
  def foldView(spark: org.apache.spark.sql.SparkSession, path: String,
      mergeOf: DataFrame => DataFrame, view: String = "card"): Long =
    VersionedStore.replaceRelation(
      mergeOf(VersionedStore.read(spark, path, view)), view, path)
}
