package graft.operators

import org.apache.spark.sql.SparkSession

/** The revision checkpoint a CDC-SYNCED derived index keeps inside its
  * own store: a one-row `_synced_rev` relation naming the corpus store
  * it tracks and the last revision it has absorbed. This is what turns
  * the maintain-from-store bridges (q189/q192-q194) into a
  * bookkeeping-free `sync` verb — the CALLER never tracks revision
  * numbers; the index knows how far behind it is.
  *
  * Write ordering is the whole design: sync runs the (idempotent)
  * maintenance FIRST and bumps the marker LAST, so a crash between the
  * two leaves a marker that lags reality — and the next sync simply
  * replays a window whose deletes are idempotent and whose appends are
  * replay-guarded. The marker may lag, never lead. The store path is
  * recorded and checked so an index synced against one corpus can never
  * silently absorb another's revisions (same fail-loud discipline as
  * the family fingerprints).
  */
object RevisionSync {

  private def markerPath(idxPath: String) = s"$idxPath/_synced_rev"

  /** The recorded (storePath, revision), if this index has ever been
    * synced. Recovers a crashed marker rewrite first — the marker is
    * maintained through [[StoreRewrite.atomicOverwrite]], so a torn
    * bump heals to one side or the other, both of which re-sync
    * correctly (lag replays, completion is a no-op).
    */
  def syncedRev(spark: SparkSession, idxPath: String): Option[(String, Long)] = {
    StoreRewrite.recover(spark, markerPath(idxPath))
    val p = new org.apache.hadoop.fs.Path(markerPath(idxPath))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val rows = spark.read.parquet(markerPath(idxPath)).collect()
      require(rows.length == 1,
        s"RevisionSync: marker at ${markerPath(idxPath)} has " +
          s"${rows.length} rows — corrupt; rebuild the index")
      Some((rows(0).getAs[String]("store_path"), rows(0).getAs[Long]("rev")))
    }
  }

  /** READ-ONLY probe of the checkpoint — no recover, no rename: the
    * variant a diagnostic scan must use (StoreDoctor's contract is
    * report-only; healing a torn marker mid-forensics would mutate the
    * very state an operator is inspecting). A marker caught mid-rewrite
    * (tmp present, target absent) reads as None here; the next SYNC
    * heals it.
    */
  def peekSyncedRev(spark: SparkSession,
      idxPath: String): Option[(String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(markerPath(idxPath))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else spark.read.parquet(markerPath(idxPath)).collect() match {
      case Array(r) =>
        Some((r.getAs[String]("store_path"), r.getAs[Long]("rev")))
      case _ => None
    }
  }

  /** Bump the checkpoint — called only AFTER the window's maintenance
    * completed (the lag-never-lead rule). Rev -1 is the BOOTSTRAP
    * SENTINEL ([[CdcBridge.sync]]): written before a bootstrap build so
    * a crash mid-build re-bootstraps instead of reading as a hand-built
    * index.
    */
  def setSyncedRev(spark: SparkSession, idxPath: String, storePath: String,
      rev: Long): Unit = {
    import spark.implicits._
    StoreRewrite.atomicOverwrite(
      Seq((storePath, rev)).toDF("store_path", "rev").coalesce(1),
      markerPath(idxPath))
  }

  /** Carry a CDC sync checkpoint across a PROTOCOL MIGRATION (shared by
    * the per-family migrate-to-versioned verbs): present → copied
    * verbatim to the migrated index (it holds exactly the content of
    * the absorbed corpus revisions, so it may keep syncing from the
    * same store), absent → nothing to carry, bootstrap sentinel (-1) →
    * refuse (a sync bootstrap crashed mid-build there; the source's
    * content is not authoritative and must not be migrated).
    */
  def migrateMarker(spark: SparkSession, src: String, dst: String,
      verb: String): Unit =
    syncedRev(spark, src).foreach {
      case (_, -1L) => throw new IllegalArgumentException(
        s"$verb: index at $src carries the bootstrap sentinel (-1) — a " +
          "sync bootstrap crashed mid-build and the content is not " +
          "authoritative; re-run the sync verb there first")
      case (storePath, rev) => setSyncedRev(spark, dst, storePath, rev)
    }

  /** Shared guard for every family's sync verb: resolve the window
    * (marker → current), refusing a marker that tracks a different
    * store. Returns None when the index is already current.
    */
  def window(spark: SparkSession, idxPath: String,
      storePath: String): Option[(Long, Long)] = {
    val cur = VersionedStore.currentVersion(spark, storePath).getOrElse(
      throw new IllegalArgumentException(
        s"RevisionSync: no versioned store at $storePath"))
    syncedRev(spark, idxPath) match {
      case None => throw new IllegalStateException(
        s"RevisionSync: index at $idxPath carries no _synced_rev marker")
      case Some((sp, from)) =>
        require(sp == storePath,
          s"RevisionSync: index at $idxPath tracks store '$sp', not " +
            s"'$storePath' — refusing to mix corpora")
        require(from >= 0,
          s"RevisionSync: marker at $idxPath is the bootstrap sentinel " +
            "(-1) — a bootstrap crashed mid-build; re-run the sync verb " +
            "to rebuild")
        require(from <= cur,
          s"RevisionSync: marker rev $from is AHEAD of the store's " +
            s"current revision $cur — the store was rebuilt or vacuumed " +
            "past the index; rebuild the index")
        if (from == cur) None else Some((from, cur))
    }
  }
}
