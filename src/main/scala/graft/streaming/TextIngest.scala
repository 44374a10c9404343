package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.queries.SearchQueries

/** Streaming ingest loop for the persisted inverted (BM25) text index —
  * the 8th store family's twin of [[IngestPipeline]]/[[VectorIngestPipeline]]:
  * documents arrive as a stream, each micro-batch appends to the index,
  * and search serves off the store at any moment.
  *
  * Exactly-once discipline, in this family's own terms: the append verb
  * is already idempotent (the raw-docstats anti-join probe drops
  * already-indexed doc_ids, so a REPLAYED batch is a no-op), and every
  * possible crash point inside an append has a unique on-disk signature
  * that [[SearchQueries.textIndexRecover]] repairs — run here before
  * every batch, exactly like StoreRewrite.recover's
  * heal-at-the-next-write design. A crash prefix therefore converges:
  * recover rolls a half-applied append back (or finishes its meta), and
  * the replay re-applies it whole. No epoch ledger is needed because
  * the store itself is the commit marker (docstats membership).
  */
object TextIngest {

  /** Build and persist the initial index (run once, before the stream).
    * The corpus may not be empty — the family refuses empty stores.
    * `withPositions` opts the store into the positional relation; the
    * ingest loop then maintains it per micro-batch automatically (the
    * append verb probes the store, not a flag).
    */
  def bootstrap(initial: DataFrame, path: String,
      withPositions: Boolean = false): Unit = {
    val (p, ds) = SearchQueries.textIndexBuild(initial)
    SearchQueries.textIndexSave(p, ds, path,
      if (withPositions) Some(SearchQueries.positionalPostings(initial))
      else None)
  }

  /** One micro-batch: heal crash residue IF the `_inflight` intent
    * marker says the previous mutation died mid-write (an O(1) file
    * probe — running recover's O(store) consistency scans before every
    * batch would dwarf the appends at scale), then append. The heal
    * runs BEFORE the empty-batch early return: after a crash, the
    * store must become loadable on the NEXT batch regardless of its
    * size — an empty-batch run that skipped recovery would leave
    * searches failing across any run of empty micro-batches. Exposed
    * for direct testing and batch-mode backfills.
    */
  def ingestBatch(batch: DataFrame, path: String): Unit = {
    val spark = batch.sparkSession
    if (SearchQueries.textIndexInflight(spark, path))
      SearchQueries.textIndexRecover(spark, path)
    if (batch.isEmpty) return
    SearchQueries.textIndexAppend(batch.select("doc_id", "text"), path)
  }

  /** Bind the loop to a document stream (doc_id, text, ...). */
  def start(docs: DataFrame, path: String, checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, _: Long) => ingestBatch(b, path))
      .start()

  /** One micro-batch of the FULLY-VERSIONED loop: documents land in the
    * manifest-committed corpus store under the batch-id marker
    * (exactly-once — a replayed batch skips), then the manifest-
    * committed text index syncs its revision window (bootstrap on the
    * first call, O(delta) after, each window ONE mixed commit). Nothing
    * here needs the rename protocol's `_inflight`/recover machinery:
    * both stores commit by manifest PUT and every crash instant
    * converges on the next call (the sync marker lags, never leads).
    */
  def ingestBatchVersioned(batch: DataFrame, batchId: Long,
      storePath: String, idxPath: String, rel: String = "docs",
      withPositions: Boolean = false,
      corpusRetain: Option[Int] = None,
      indexRetain: Option[Int] = None): Boolean =
    VersionedIngest.ingestBatchWithSync(batch, batchId, storePath, rel,
      corpusRetain)(
      SearchQueries.textIndexSyncVersionedWithStore(batch.sparkSession,
        storePath, rel, idxPath, withPositions, retain = indexRetain))

  /** Bind the fully-versioned corpus + text-index loop to a document
    * stream (doc_id, text). Bootstrap the corpus store first
    * ([[VersionedIngest.bootstrap]]); the index bootstraps itself on
    * the first batch's sync.
    */
  def startVersioned(docs: DataFrame, storePath: String, idxPath: String,
      checkpoint: String, rel: String = "docs",
      withPositions: Boolean = false,
      corpusRetain: Option[Int] = None,
      indexRetain: Option[Int] = None): StreamingQuery =
    VersionedIngest.startWithSync(docs, storePath, checkpoint, rel,
      corpusRetain)(
      SearchQueries.textIndexSyncVersionedWithStore(docs.sparkSession,
        storePath, rel, idxPath, withPositions, retain = indexRetain))

  /** Bootstrap the SHARDED index (run once, before the stream) — the
    * federated family's initial build: one tokenization, hash-routed
    * shard saves, router committed last.
    */
  def bootstrapSharded(initial: DataFrame, root: String, nShards: Int,
      withPositions: Boolean = false): Unit = {
    val (p, ds) = SearchQueries.textIndexBuild(initial)
    SearchQueries.textIndexSaveSharded(p, ds, root, nShards,
      if (withPositions) Some(SearchQueries.positionalPostings(initial))
      else None)
  }

  /** One micro-batch against the sharded index: heal any shard whose
    * previous mutation died mid-write (shards crash INDEPENDENTLY — a
    * broken shard-2 must not leave shard-0's appends blocked, and the
    * healing must run before the empty-batch early return for the same
    * reason as the single-store loop), then route the batch through
    * the shard appends. Idempotence is per shard: a replayed batch's
    * slices all hit their shard's anti-join probe and no-op.
    */
  def ingestBatchSharded(batch: DataFrame, root: String): Unit = {
    val spark = batch.sparkSession
    if (SearchQueries.textIndexInflightSharded(spark, root))
      SearchQueries.textIndexRecoverSharded(spark, root)
    if (batch.isEmpty) return
    SearchQueries.textIndexAppendSharded(batch.select("doc_id", "text"), root)
  }

  /** Bind the loop to a document stream over the sharded index. */
  def startSharded(docs: DataFrame, root: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, _: Long) => ingestBatchSharded(b, root))
      .start()
}
