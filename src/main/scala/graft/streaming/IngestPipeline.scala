package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.queries.DedupQueries

/** The streaming form of the full incremental-ingest lifecycle — the
  * composition of q82's probe, the persisted signature index, and q139's
  * cluster-label merge, run per micro-batch: every arriving document is
  * checked against the EXISTING corpus (reject near-dups), admitted
  * documents land in the corpus store, the signature index grows, and
  * the q74 cluster-label map stays current — all with increment-bounded
  * work per batch (the crawl-ingest loop a production corpus runs
  * continuously).
  *
  * Exactly-once discipline: foreachBatch may REPLAY a batch after a
  * crash, so instead of an epoch ledger (the IdempotentSink form for
  * sinks we can't make idempotent) every write here is IDEMPOTENT BY
  * CONSTRUCTION and the replayed batch converges to the same state in
  * any crash prefix:
  *  - the admitted-corpus append anti-joins the store on doc_id
  *    (re-admitting an already-landed doc is a no-op);
  *  - the label overwrite is a pure function of (index, labels,
  *    admitted) and [[DedupQueries.incrementalClusters]] of an
  *    empty/already-merged increment is the identity;
  *  - the index append anti-joins the index on doc_id (the
  *    appendSignatureIndex idempotence probe).
  * A crashed-and-replayed batch therefore re-runs some reads but never
  * duplicates a row, double-merges a label, or loses an admission —
  * asserted by running the same batch through the core twice in
  * IncrementalIngestSpec.
  */
object IngestPipeline {

  /** One micro-batch of the ingest loop (exposed for direct testing and
    * for batch-mode backfills — the foreachBatch wrapper below just
    * binds the paths). `batch` must carry (doc_id, text); extra columns
    * ride along into the admitted store. In-batch near-dups (two new
    * docs duplicating each other) are both admitted and land in ONE
    * cluster — rejection is against the EXISTING corpus (q82
    * semantics); the label map records the in-batch relation.
    *
    * Crash-replay safety: the INDEX is the commit marker. A doc that
    * reached step 4 self-matches the probe on replay (jaccard 1.0) and
    * is skipped wholesale; a doc that didn't is re-processed, with each
    * step idempotent — the admitted append anti-joins the store, the
    * label merge first drops the increment's own (possibly partially
    * merged) rows and re-merges against representatives that are stable
    * under partial merges (a half-updated old label is still its
    * cluster's post-merge minimum), and the index append anti-joins the
    * index. Every crash prefix converges to the same final state.
    */
  def ingestBatch(batch: DataFrame, indexPath: String, labelsPath: String,
      admittedPath: String, threshold: Double = 0.5): Unit = {
    val spark = batch.sparkSession
    // finish any rewrite a prior FORGET crashed inside of BEFORE the
    // reads below — StoreRewrite.recover only runs at the start of a
    // rewrite of the same path, and a crashed-rename store (target
    // absent, full data at the sibling tmp) would otherwise fail the
    // parquet read here and wedge the pipeline until a manual recover
    Seq(indexPath, labelsPath, admittedPath)
      .foreach(p => graft.operators.StoreRewrite.recover(spark, p))
    val b = batch.localCheckpoint(true)
    if (b.isEmpty) return
    // 1. probe: near-dups of the EXISTING corpus are rejected (their
    //    best match and score are in the probe output; a DLQ write could
    //    hang off it — the admitted side is what this pipeline owns)
    val rejects = DedupQueries.probeSignatureIndex(spark, b, indexPath,
      threshold = threshold)
    val admitted = b.join(rejects.select(col("new_id").as("doc_id")),
      Seq("doc_id"), "left_anti")
    // the index is the commit marker: docs already in it finished a
    // previous (possibly crashed-after-commit) run of this very batch
    val oldSig = spark.read.parquet(indexPath).localCheckpoint(true)
    val pending = admitted.join(oldSig.select("doc_id"), Seq("doc_id"),
      "left_anti").localCheckpoint(true)
    if (pending.isEmpty) return
    // 2. admitted corpus rows — idempotent on doc_id
    val fs = new org.apache.hadoop.fs.Path(admittedPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val novel =
      if (fs.exists(new org.apache.hadoop.fs.Path(admittedPath)))
        pending.join(spark.read.parquet(admittedPath).select("doc_id"),
          Seq("doc_id"), "left_anti")
      else pending
    novel.write.mode("append").parquet(admittedPath)
    // 3. cluster-label merge against the pre-commit index snapshot.
    //    The stored labels may already carry a PARTIAL merge of this
    //    increment (crash between 3 and 4): drop the increment's own
    //    rows and re-merge — old-doc labels updated by the partial
    //    merge are still valid representatives, so the re-merge lands
    //    on the same fixpoint. Eagerly materialized before the
    //    overwrite so the read never races its own target.
    val labelsBase = spark.read.parquet(labelsPath)
      .join(pending.select("doc_id"), Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    val merged = DedupQueries
      .incrementalClusters(oldSig, labelsBase, pending)
      .localCheckpoint(true)
    merged.write.mode("overwrite").parquet(labelsPath)
    // 4. index growth — the commit: from here on, replays skip the doc
    DedupQueries.appendSignatureIndex(pending, indexPath)
  }

  /** Bootstrap the persisted state from an initial corpus (possibly
    * empty): signature index + cluster-label map. Run once before the
    * stream starts.
    */
  def bootstrap(initial: DataFrame, indexPath: String,
      labelsPath: String): Unit = {
    DedupQueries.buildSignatureIndex(initial, indexPath)
    DedupQueries.connectedComponents(DedupQueries.lshBucketStars(initial))
      .write.mode("overwrite").parquet(labelsPath)
  }

  /** The FORGET verb of the ingest lifecycle (the q138 cascade shipped
    * as one call, not a spec recipe): given `del`(doc_id), rewrite the
    * admitted corpus without the forgotten rows, re-elect the cluster
    * labels through [[DedupQueries.deletionCascade]]'s re-election (a
    * forgotten survivor's cluster keeps its remaining members), and
    * rewrite the signature index without the forgotten signatures — so
    * the NEXT ingest batch can re-admit a document whose only prior
    * copy was forgotten (leaving the signature would silently reject
    * it forever, an over-forgetting bug). ANN stores over derived
    * embeddings are deleted separately via their families' tombstone
    * verbs (`sqDeleteVectors` etc.) — they key on vec_id, which only
    * the caller can map to doc_id.
    *
    * Order matters for crash safety: labels first (recomputable from
    * index+labels, idempotent), then index, then the corpus store —
    * a crash mid-way leaves the forgotten docs at worst still in the
    * corpus file (re-run to finish) and never resurrects them in
    * search/dedup state.
    */
  def forget(spark: SparkSession, del: DataFrame, indexPath: String,
      labelsPath: String, admittedPath: String): Unit = {
    // Every rewrite goes through StoreRewrite.atomicOverwrite: the new
    // store lands completely at a sibling temp path before the old one
    // is replaced, so a crash INSIDE a rewrite leaves the old (or at
    // worst the fully-written new) store on disk, never neither. But
    // the READS below run before any rewrite, so a PRIOR forget's
    // crashed rename (target gone, data at the tmp) must be finished
    // here first — atomicOverwrite's own recover comes too late.
    Seq(labelsPath, indexPath, admittedPath)
      .foreach(p => graft.operators.StoreRewrite.recover(spark, p))
    val ids = del.select("doc_id").localCheckpoint(true)
    // 1. labels: re-election over the EXISTING label map
    val labels = spark.read.parquet(labelsPath).localCheckpoint(true)
    val rl = labels.join(ids, Seq("doc_id"), "left_anti")
    val nr = rl.groupBy("cluster_id")
      .agg(org.apache.spark.sql.functions.min("doc_id").as("rep"))
    val relabeled = rl.join(nr, "cluster_id")
      .select(col("doc_id"), col("rep").as("cluster_id"))
    graft.operators.StoreRewrite.atomicOverwrite(relabeled, labelsPath)
    // 2. signature index: drop the forgotten signatures so a future
    //    re-submission is judged on the REMAINING corpus only
    graft.operators.StoreRewrite.atomicOverwrite(
      spark.read.parquet(indexPath).join(ids, Seq("doc_id"), "left_anti"),
      indexPath)
    // 3. corpus store — absent until the first post-bootstrap admission
    //    (forgetting an initial-corpus doc before any batch ran is legal:
    //    steps 1-2 already dropped its label and signature)
    val ap = new org.apache.hadoop.fs.Path(admittedPath)
    if (ap.getFileSystem(spark.sessionState.newHadoopConf()).exists(ap))
      graft.operators.StoreRewrite.atomicOverwrite(
        spark.read.parquet(admittedPath)
          .join(ids, Seq("doc_id"), "left_anti"),
        admittedPath)
  }

  /** One micro-batch of the FULLY-VERSIONED dedup-federation loop —
    * [[graft.streaming.TextIngest.ingestBatchVersioned]]'s twin for the
    * sharded signature index: the batch lands in the manifest-committed
    * corpus store (exactly-once via the batch marker), then the
    * versioned signature federation syncs its revision window
    * (bootstrap on first call — `nShards` consulted only then).
    */
  def ingestBatchVersionedSharded(batch: DataFrame, batchId: Long,
      storePath: String, idxRoot: String, rel: String = "docs",
      nShards: Int = 3, corpusRetain: Option[Int] = None,
      indexRetain: Option[Int] = None): Boolean =
    VersionedIngest.ingestBatchWithSync(batch, batchId, storePath, rel,
      corpusRetain)(
      DedupQueries.syncSignatureIndexShardedVersionedWithStore(
        batch.sparkSession, storePath, rel, idxRoot, nShards,
        retain = indexRetain))

  /** Bind the fully-versioned corpus + sharded-signature loop to a
    * document stream. Bootstrap the corpus store first
    * ([[VersionedIngest.bootstrap]]); the federation bootstraps itself
    * on the first batch's sync.
    */
  def startVersionedSharded(docs: DataFrame, storePath: String,
      idxRoot: String, checkpoint: String, rel: String = "docs",
      nShards: Int = 3, corpusRetain: Option[Int] = None,
      indexRetain: Option[Int] = None): StreamingQuery =
    VersionedIngest.startWithSync(docs, storePath, checkpoint, rel,
      corpusRetain)(
      DedupQueries.syncSignatureIndexShardedVersionedWithStore(
        docs.sparkSession, storePath, rel, idxRoot, nShards,
        retain = indexRetain))

  /** The winnow federation's versioned streaming twin — same
    * composition, the exact-substring fingerprint index as the derived
    * side ((k, w) consulted only at the bootstrap build).
    */
  def startVersionedWinnowSharded(docs: DataFrame, storePath: String,
      idxRoot: String, checkpoint: String, rel: String = "docs",
      nShards: Int = 3, k: Int = 4, w: Int = 5,
      corpusRetain: Option[Int] = None,
      indexRetain: Option[Int] = None): StreamingQuery =
    VersionedIngest.startWithSync(docs, storePath, checkpoint, rel,
      corpusRetain)(
      DedupQueries.syncWinnowIndexShardedVersionedWithStore(
        docs.sparkSession, storePath, rel, idxRoot, nShards, k, w,
        retain = indexRetain))

  /** Start the streaming ingest: each micro-batch of `docs` (doc_id,
    * text, …) runs [[ingestBatch]]. State lives in the three parquet
    * stores; the checkpoint only tracks source offsets, so a restart
    * resumes from the last unprocessed batch and any replayed batch
    * converges (see the idempotence contract above).
    */
  def start(docs: DataFrame, indexPath: String, labelsPath: String,
      admittedPath: String, checkpoint: String,
      threshold: Double = 0.5, queryName: String = "graft_ingest")
      : StreamingQuery =
    docs.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch, indexPath, labelsPath, admittedPath, threshold)
      }
      .start()
}
