package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.queries.SimilarityQueries

/** The ANN-side twin of [[IngestPipeline]]: a continuously-arriving
  * embedding stream is near-dup-gated against the persisted binary code
  * store, admitted vectors land in the vector store, and the code store
  * grows — per micro-batch, with increment-bounded work plus ONE scan of
  * the 16-byte code store for the gate (the store-backed form of
  * [[CorpusStreams.embeddingNearDupGate]], which instead freezes the
  * codes into the filter expression and is honestly bounded to ~10M
  * vectors; this form has no such bound because the codes stay a scanned
  * relation).
  *
  * Exactly-once: foreachBatch may replay a batch, so every write is
  * idempotent and the CODE STORE is the commit marker —
  *  - a vector that reached step 3 is skipped wholesale on replay (its
  *    vec_id is in the raw code store);
  *  - the vector-store append anti-joins on vec_id;
  *  - [[SimilarityQueries.binAppendCodes]] anti-joins the raw store.
  * Any crash prefix converges to the final state (VectorIngestSpec runs
  * the same batch through the core twice and diffs).
  *
  * FORGET here is a REWRITE of both stores (the [[IngestPipeline.forget]]
  * discipline), NOT a tombstone: tombstones ([[SimilarityQueries
  * .binDeleteVectors]]) are the cheap DSAR path for search-time masking,
  * but they deliberately leave the raw code rows in place — and the
  * append verb's idempotence probe reads the RAW store, so a tombstoned
  * vec_id would be silently skipped on re-submission FOREVER (the
  * over-forgetting bug the signature-side forget fixed, now on the
  * vector side; VectorIngestSpec pins both behaviors side by side).
  * Re-admission after a tombstone-only delete requires the next full
  * save (the documented compaction point).
  */
object VectorIngestPipeline {

  /** Bootstrap the two stores from an initial vector corpus (must be
    * non-empty — the binary store refuses empty saves). Run once before
    * the stream starts. `initial`: (vec_id, v: array&lt;double&gt;).
    */
  def bootstrap(initial: DataFrame, indexPath: String,
      vecPath: String): Unit = {
    SimilarityQueries.binSaveIndex(SimilarityQueries.binCodes(initial),
      indexPath)
    initial.write.mode("overwrite").parquet(vecPath)
  }

  /** One micro-batch: gate → admit → commit. `batch`(vec_id, v).
    *
    * The gate: an arriving vector whose Hamming distance to ANY stored
    * (un-tombstoned) code is <= `radius` is rejected — the crawl
    * front-end near-dup semantics of q82 applied in sign-code space
    * (radius 0 = exact sign-pattern duplicates only). In-batch near-dups
    * are both admitted (rejection is against the EXISTING corpus, the
    * q82 convention). One scan of the code store per batch, the small
    * batch broadcast against it; nothing corpus-sized shuffles.
    */
  def ingestBatch(batch: DataFrame, indexPath: String, vecPath: String,
      radius: Int = 0): Unit = {
    val spark = batch.sparkSession
    // finish any rewrite a prior FORGET crashed inside of before the
    // store reads below (the crashed-rename state would fail the read
    // and wedge the loop; atomicOverwrite's own recover runs too late)
    Seq(s"$indexPath/codes", s"$indexPath/tombstones", vecPath)
      .foreach(p => graft.operators.StoreRewrite.recover(spark, p))
    val b = batch.localCheckpoint(true)
    if (b.isEmpty) return
    // 1. near-dup gate against the LOADED (tombstone-masked) store: a
    //    forgotten vector must not reject its own fresh copy
    val stored = SimilarityQueries.binLoadIndex(spark, indexPath)
    val newCodes = SimilarityQueries.binCodes(b)
      .select(col("vec_id").as("nid"), col("w0").as("nw0"),
        col("w1").as("nw1"))
    val rejected = stored
      .join(broadcast(newCodes), col("vec_id") =!= col("nid"))
      .filter(expr("bit_count(w0 ^ nw0) + bit_count(w1 ^ nw1)")
        <= lit(radius))
      .select(col("nid").as("vec_id")).distinct()
    val admitted = b.join(rejected, Seq("vec_id"), "left_anti")
    // 2. commit marker: the RAW code store — vec_ids already there
    //    finished a previous (possibly crashed-after-commit) run
    val pending = admitted.join(
        spark.read.parquet(s"$indexPath/codes").select("vec_id"),
        Seq("vec_id"), "left_anti")
      .localCheckpoint(true)
    if (pending.isEmpty) return
    // 3. vector store — idempotent on vec_id
    val novel = pending.join(
      spark.read.parquet(vecPath).select("vec_id"), Seq("vec_id"),
      "left_anti")
    novel.write.mode("append").parquet(vecPath)
    // 4. code growth — the commit: from here on, replays skip the vector
    SimilarityQueries.binAppendCodes(pending, indexPath)
  }

  /** The FORGET verb: rewrite both stores without `del`(vec_id), so the
    * next batch can RE-ADMIT a vector whose only prior copy was
    * forgotten. Tombstones for OTHER ids are preserved (they mask
    * vectors deleted cheaply via [[SimilarityQueries.binDeleteVectors]]
    * and still awaiting compaction); tombstones for the rewritten ids
    * are dropped, or the re-admitted copy would load masked.
    *
    * Order: codes first (the gate + commit marker — once the code is
    * gone, the vector can neither reject a resubmission nor be skipped
    * by the marker), then the vector store; a crash between the two
    * leaves at worst an orphan vector row that the next forget of the
    * same ids clears, and never a resurrected search result.
    */
  def forget(spark: SparkSession, del: DataFrame, indexPath: String,
      vecPath: String): Unit = {
    // Each store rewrite goes through StoreRewrite.atomicOverwrite:
    // the filtered relation lands completely at a sibling temp path
    // before the old directory is touched, so a failure INSIDE one
    // rewrite (not just between stores) can no longer destroy a store —
    // the cross-store ordering note below is about which store to
    // rewrite first, this is about surviving a crash within any one.
    // A PRIOR forget's crashed rename is finished before the reads —
    // atomicOverwrite's built-in recover runs after its input was read.
    Seq(s"$indexPath/codes", s"$indexPath/tombstones", vecPath)
      .foreach(p => graft.operators.StoreRewrite.recover(spark, p))
    val ids = del.select("vec_id").localCheckpoint(true)
    // refuse BEFORE touching the stores (textIndexForget's rule): an
    // all-forgotten code store would be rejected by binLoadIndex as
    // interrupted, wedging every later batch's gate
    val remaining = spark.read.parquet(s"$indexPath/codes")
      .join(ids, Seq("vec_id"), "left_anti").count()
    require(remaining > 0,
      "VectorIngestPipeline.forget: forgetting the ENTIRE vector corpus " +
        "leaves an empty code store — delete the index directory instead")
    graft.operators.StoreRewrite.atomicOverwrite(
      spark.read.parquet(s"$indexPath/codes")
        .join(ids, Seq("vec_id"), "left_anti"),
      s"$indexPath/codes")
    val tombPath = new org.apache.hadoop.fs.Path(s"$indexPath/tombstones")
    val fs = tombPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(tombPath)) {
      val rest = spark.read.parquet(s"$indexPath/tombstones")
        .join(ids, Seq("vec_id"), "left_anti").localCheckpoint(true)
      if (rest.isEmpty) fs.delete(tombPath, true)
      else graft.operators.StoreRewrite.atomicOverwrite(
        rest, s"$indexPath/tombstones")
    }
    graft.operators.StoreRewrite.atomicOverwrite(
      spark.read.parquet(vecPath).join(ids, Seq("vec_id"), "left_anti"),
      vecPath)
  }

  /** Start the streaming ingest: each micro-batch of `vectors`
    * (vec_id, v) runs [[ingestBatch]]. State lives in the two stores;
    * the checkpoint tracks source offsets only, so restarts resume and
    * replays converge.
    */
  def start(vectors: DataFrame, indexPath: String, vecPath: String,
      checkpoint: String, radius: Int = 0,
      queryName: String = "graft_vector_ingest"): StreamingQuery =
    vectors.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch, indexPath, vecPath, radius)
      }
      .start()

  // ------------------------------------------------------------------
  // The FULLY-VERSIONED loop (round 14) — this pipeline on the manifest
  // protocol, completing the versioned streaming quadrangle (text r13,
  // signature/winnow federations r13, vectors here). The vector corpus
  // is a VersionedStore relation (exactly-once via the batch-id
  // marker), the binary code store is its manifest-committed DERIVED
  // index maintained by the family's argument-free CDC sync, and the
  // Hamming near-dup gate reads the code store's visible revision. No
  // rename, no `_inflight`, no StoreRewrite.recover preamble: every
  // commit on either side is ONE manifest PUT.
  // ------------------------------------------------------------------

  /** One micro-batch of the versioned loop: catch the index up to every
    * COMMITTED corpus revision first (the first call BOOTSTRAPS the
    * code store from the corpus's current revision — so the bootstrap
    * corpus gates batch 1; later calls no-op when current, and the
    * crash window where a prior batch's ingest landed but its sync
    * didn't is closed before the gate reads), gate the batch against
    * the synced code store, then run the corpus ingest + index sync
    * composition. Replay safety is the marker's: a replayed batch's
    * gate may compute a DIFFERENT admitted set (its own vectors are now
    * stored), but the set is never evaluated —
    * [[VersionedIngest.ingestBatch]] checks the marker before touching
    * the lazy plan, and the trailing sync no-ops. The corpus bootstrap
    * must be NON-EMPTY ([[bootstrap]]'s rule on the rename loop — the
    * code store refuses empty saves).
    */
  def ingestBatchVersioned(batch: DataFrame, batchId: Long,
      storePath: String, idxPath: String, rel: String = "emb",
      radius: Int = 0, corpusRetain: Option[Int] = None,
      indexRetain: Option[Int] = None): Boolean = {
    val spark = batch.sparkSession
    SimilarityQueries.binSyncVersionedWithStore(spark, storePath, rel,
      idxPath, retain = indexRetain)
    val b = batch.localCheckpoint(true)
    // the gate, verbatim from [[ingestBatch]]: reject an arrival whose
    // Hamming distance to ANY stored (tombstone-masked) code is <=
    // radius; in-batch near-dups are both admitted (rejection is
    // against the EXISTING corpus, the q82 convention)
    val stored = SimilarityQueries.binLoadIndexVersioned(spark, idxPath)
    val newCodes = SimilarityQueries.binCodes(b)
      .select(col("vec_id").as("nid"), col("w0").as("nw0"),
        col("w1").as("nw1"))
    val rejected = stored
      .join(broadcast(newCodes), col("vec_id") =!= col("nid"))
      .filter(expr("bit_count(w0 ^ nw0) + bit_count(w1 ^ nw1)")
        <= lit(radius))
      .select(col("nid").as("vec_id")).distinct()
    val admitted = b.join(rejected, Seq("vec_id"), "left_anti")
    VersionedIngest.ingestBatchWithSync(admitted, batchId, storePath, rel,
      corpusRetain)(
      SimilarityQueries.binSyncVersionedWithStore(spark, storePath, rel,
        idxPath, retain = indexRetain))
  }

  /** Bind the versioned loop to a vector stream (vec_id, v). Bootstrap
    * the corpus store first ([[VersionedIngest.bootstrap]] with the
    * initial vectors under `rel`); the code store bootstraps itself on
    * the first batch's sync.
    */
  def startVersioned(vectors: DataFrame, storePath: String,
      idxPath: String, checkpoint: String, rel: String = "emb",
      radius: Int = 0, corpusRetain: Option[Int] = None,
      indexRetain: Option[Int] = None,
      queryName: String = "graft_vector_ingest_versioned"): StreamingQuery =
    vectors.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ingestBatchVersioned(batch, id, storePath, idxPath, rel, radius,
          corpusRetain, indexRetain)
        ()
      }
      .start()

  /** The versioned loop's FORGET — re-admission-correct on the manifest
    * protocol. A plain [[graft.operators.VersionedStore.delete]] cannot
    * be it: manifest tombstones are STICKY (a re-appended same key
    * stays masked until compact), so a forgotten vector's resubmission
    * would land in the corpus invisible forever — the over-forgetting
    * bug the rename loop's forget fixed, in versioned clothes. Instead
    * both sides are ONE [[graft.operators.VersionedStore.replaceRelation]]
    * each (physical removal + the relation's sticky-tombstone reset,
    * batch marker preserved — replays after a forget still skip):
    *
    *  1. the CODE STORE first (the rename forget's order: once the code
    *     is gone the vector can neither reject a resubmission nor serve
    *     a search; a crash here leaves at worst an orphan corpus row a
    *     re-run clears) — its new content is `binCodes` of the
    *     POST-FORGET CORPUS, i.e. a fresh build, so the verb is exact
    *     even when the index was LAGGING the corpus (a lagging window
    *     can never be absorbed afterwards: the marker bump in step 3
    *     freezes it);
    *  2. the CORPUS relation;
    *  3. the index's `_synced_rev` checkpoint is re-pointed AT the
    *     corpus's replace revision — step 1 made the index exactly the
    *     post-forget build, and the CDC window algebra refuses to cross
    *     a replace, so leaving the old marker would wedge the next sync.
    *
    * Crash between 2 and 3 wedges the next sync with the changes()
    * refusal — RE-RUN THE FORGET: every step is idempotent on the same
    * `del` (step 1 recomputes the same codes, step 2 commits the same
    * content again) and step 3 heals the marker. Prior revisions still
    * time-travel to the pre-forget content until vacuum — run one with
    * `retain` if the forget must also be a physical erasure of history.
    */
  def forgetVersioned(spark: SparkSession, del: DataFrame,
      storePath: String, idxPath: String, rel: String = "emb"): Unit = {
    import graft.operators.{VersionedStore, RevisionSync}
    val ids = del.select("vec_id").localCheckpoint(true)
    val remaining = VersionedStore.read(spark, storePath, rel)
      .join(ids, Seq("vec_id"), "left_anti").localCheckpoint(true)
    require(!remaining.isEmpty,
      "VectorIngestPipeline.forgetVersioned: forgetting the ENTIRE " +
        "vector corpus leaves an empty code store — delete both store " +
        "directories instead")
    if (VersionedStore.currentVersion(spark, idxPath).isEmpty) {
      // pre-first-sync forget: only the corpus exists; the index will
      // bootstrap from the post-forget content on its first sync
      VersionedStore.replaceRelation(remaining, rel, storePath)
    } else {
      VersionedStore.replaceRelation(
        SimilarityQueries.binCodes(remaining).localCheckpoint(true),
        "codes", idxPath)
      val rev = VersionedStore.replaceRelation(remaining, rel, storePath)
      RevisionSync.setSyncedRev(spark, idxPath, storePath, rev)
    }
  }
}
