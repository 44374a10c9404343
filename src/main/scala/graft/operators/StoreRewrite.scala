package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-durable in-place rewrite of a parquet store.
  *
  * `mode("overwrite")` onto the path being rewritten deletes the target
  * BEFORE the new files commit, so a failure mid-write (lost executor,
  * checkpoint blocks evicted at cluster scale) destroys the store with no
  * recovery path. The FORGET verbs of the ingest pipelines rewrite up to
  * three stores each this way; this helper closes that window:
  *
  *   1. the rewritten relation is written COMPLETELY to a sibling temp
  *      directory (`<path>__rewrite_tmp`) — the only long-running step,
  *      and the old store is untouched throughout;
  *   2. the old directory is deleted and the temp renamed over it — two
  *      metadata operations (rename is atomic on HDFS/posix), so the
  *      exposure window shrinks from the whole recompute+write to
  *      microseconds, and even a crash inside it loses NOTHING: the full
  *      rewritten store survives at the temp path and [[recover]] (called
  *      automatically at the start of every rewrite of the same path)
  *      finishes the rename.
  *
  * Writing to a sibling path also removes the read-from/write-to overlap,
  * so callers no longer need an eager `localCheckpoint` materialization
  * of the filtered relation before overwriting — one write instead of
  * checkpoint-then-write.
  */
object StoreRewrite {

  val TmpSuffix = "__rewrite_tmp"

  /** Rewrite `path` to hold exactly `df` (which may read from `path`
    * itself). Durable at every instant: the old store survives until the
    * new one is fully written; after that the new one survives any crash.
    */
  def atomicOverwrite(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    recover(spark, path)
    val tmp = new Path(path + TmpSuffix)
    // a stale temp dir here means a PRIOR rewrite crashed mid-write
    // (target still intact, temp incomplete): discard and start clean
    if (fs.exists(tmp)) fs.delete(tmp, true)
    df.write.mode("overwrite").parquet(tmp.toString)
    // A CDC-synced MONOLITHIC store keeps its RevisionSync checkpoint
    // INSIDE the store dir (`_synced_rev` — underscore-prefixed, so
    // parquet reads never see it). A whole-dir rewrite (forget/compact)
    // must carry it into the new layout or the sync discipline is
    // silently un-bootstrapped. COPY rather than move: every crash
    // window then leaves at least one intact marker — before the delete
    // the old dir still holds it, after the delete the complete temp
    // holds the copy and [[recover]] finishes the rename.
    val marker = new Path(target, "_synced_rev")
    if (fs.exists(marker))
      org.apache.hadoop.fs.FileUtil.copy(fs, marker, fs,
        new Path(tmp, "_synced_rev"), false,
        spark.sessionState.newHadoopConf())
    if (fs.exists(target)) fs.delete(target, true)
    require(fs.rename(tmp, target),
      s"StoreRewrite: rename $tmp -> $target failed; the rewritten " +
        s"store is intact at $tmp — rename it manually or re-run")
  }

  /** Finish a rewrite that crashed between delete and rename (target
    * absent, complete temp present). Returns true if a recovery was
    * performed. Safe to call any time; a no-op in every other state.
    */
  def recover(spark: SparkSession, path: String): Boolean = {
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(path + TmpSuffix)
    if (!fs.exists(target) && fs.exists(tmp)) {
      require(fs.rename(tmp, target),
        s"StoreRewrite: recovery rename $tmp -> $target failed")
      true
    } else false
  }
}
