package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The ONE body behind the four maintain-from-store bridges and the
  * four sync verbs (text q189/q195, vector q192, signature q193,
  * winnow q194): families differ only in their key column, the columns
  * an insert needs, and which delete/append/build verbs apply — the
  * window algebra, the deletes-first ordering, the netting contract,
  * and the sync checkpoint dance are family-independent and live here
  * exactly once, so a fix lands everywhere at once instead of drifting
  * across four copies.
  */
object CdcBridge {

  /** Apply one revision window to a derived index: deleted keys run
    * `onDelete` FIRST (a delete-then-reappend window stays invisible on
    * both sides — the store's sticky-tombstone view), then the netted
    * insert rows ride `onInsert` (the store's `changes` already nets
    * rows appended-then-tombstoned inside the window, so the index
    * never even encodes them).
    */
  def maintain(spark: SparkSession, storePath: String, rel: String,
      fromRev: Long, toRev: Long, keyCol: String, insertCols: Seq[String],
      verb: String)(onDelete: DataFrame => Unit)(
      onInsert: DataFrame => Unit): Unit =
    maintainAtomic(spark, storePath, rel, fromRev, toRev, keyCol,
      insertCols, verb) { (del, ins) =>
      del.foreach(onDelete)
      ins.foreach(onInsert)
    }

  /** The window algebra with BOTH sides handed to one callback: a
    * manifest-committed index applies the deletes and the netted
    * inserts in ONE revision ([[VersionedStore.commitMixed]]), so no
    * reader ever sees the half-applied window the rename families'
    * two-step (tombstones first, inserts second) briefly exposes.
    * `apply(deletedKeys, insertedRows)` — either side is None when the
    * window carries nothing for it; the deletes-first contract becomes
    * the callee's (a single mixed commit satisfies it vacuously: both
    * land at the same instant, and the store's `changes` has already
    * netted rows appended-then-tombstoned inside the window).
    */
  def maintainAtomic(spark: SparkSession, storePath: String, rel: String,
      fromRev: Long, toRev: Long, keyCol: String, insertCols: Seq[String],
      verb: String)(
      apply: (Option[DataFrame], Option[DataFrame]) => Unit): Unit = {
    val (inserted, deletedKeys) =
      VersionedStore.changes(spark, storePath, fromRev, toRev, rel)
    val del =
      if (deletedKeys.columns.isEmpty) None
      else {
        require(deletedKeys.columns.contains(keyCol),
          s"$verb: '$rel' tombstones carry no $keyCol column (found " +
            s"${deletedKeys.columns.mkString(", ")}) — the index is keyed " +
            s"by $keyCol")
        Some(deletedKeys.select(keyCol)).filterNot(_.isEmpty)
      }
    require(insertCols.forall(inserted.columns.contains),
      s"$verb: relation '$rel' must carry (${insertCols.mkString(", ")}) " +
        s"— found (${inserted.columns.mkString(", ")})")
    val ins = Some(inserted.select(insertCols.map(col): _*))
      .filterNot(_.isEmpty)
    if (del.isDefined || ins.isDefined) apply(del, ins)
  }

  /** The bookkeeping-free sync driver: resolve the index's
    * [[RevisionSync]] checkpoint against the store's current revision
    * and bootstrap / catch up / no-op accordingly.
    *
    * Bootstrap is crash-safe through a SENTINEL revision: the marker is
    * written as rev -1 ("bootstrap in flight") BEFORE the build and
    * bumped to the real revision after, so a crash anywhere inside the
    * build leaves a sentinel that the next sync recognizes and
    * re-bootstraps from the store's then-current revision (every
    * family's build verb overwrites its own relations). Without the
    * sentinel, a half-built index would be indistinguishable from a
    * hand-built one and sync would refuse forever. The maintain path
    * keeps the lag-never-lead rule: maintenance commits BEFORE the
    * bump, and the bridges replay idempotently.
    *
    * `indexExists` distinguishes a genuinely hand-built index (present,
    * no marker at all — refuse, its maintenance history is unknowable)
    * from a fresh path (bootstrap).
    *
    * `retain` is the RETENTION knob for manifest-committed indexes: a
    * sync loop adds one revision per absorbed window forever, so a year
    * of daily syncs retains 365 manifests and every superseded head —
    * `retain = Some(n)` vacuums the index to its newest n revisions
    * AFTER each successful marker bump (never before: a vacuum racing
    * an unfinished window could reclaim dirs the replay still needs).
    * Time travel below the retained floor refuses thereafter — the
    * documented vacuum trade. `retainPaths` overrides WHICH stores are
    * vacuumed (a federation vacuums each shard and its router; default
    * = the index path itself), evaluated lazily so a bootstrap can
    * create the stores first. Refused for a non-versioned index — a
    * rename-family store has no revisions to retain.
    */
  def sync(spark: SparkSession, storePath: String, idxPath: String,
      verb: String, retain: Option[Int] = None,
      retainPaths: () => Seq[String] = () => Seq.empty)(
      indexExists: => Boolean)(bootstrap: Long => Unit)(
      maintainWindow: (Long, Long) => Unit): Option[(Long, Long)] = {
    val cur = VersionedStore.currentVersion(spark, storePath).getOrElse(
      throw new IllegalArgumentException(
        s"$verb: no versioned store at $storePath"))
    def applyRetention(): Unit = retain.foreach { n =>
      require(n >= 1, s"$verb: retain must be >= 1, got $n")
      val targets = retainPaths() match {
        case Seq() => Seq(idxPath)
        case ps    => ps
      }
      targets.foreach { p =>
        require(VersionedStore.currentVersion(spark, p).isDefined,
          s"$verb: retain is only meaningful for a manifest-committed " +
            s"index — $p holds no versioned store (rename-family " +
            "indexes keep no revision history to bound)")
        VersionedStore.vacuum(spark, p, keep = n)
      }
    }
    def runBootstrap(): Option[(Long, Long)] = {
      RevisionSync.setSyncedRev(spark, idxPath, storePath, -1L)
      bootstrap(cur)
      RevisionSync.setSyncedRev(spark, idxPath, storePath, cur)
      applyRetention()
      Some((cur, cur))
    }
    RevisionSync.syncedRev(spark, idxPath) match {
      case None =>
        require(!indexExists,
          s"$verb: index at $idxPath exists but carries no _synced_rev " +
            "marker — it predates the sync discipline or was maintained " +
            "by hand; delete the index dir and re-run sync to rebuild, " +
            "or keep driving it with the explicit-window maintain verb")
        runBootstrap()
      case Some((sp, -1L)) =>
        require(sp == storePath,
          s"$verb: index at $idxPath tracks store '$sp', not " +
            s"'$storePath' — refusing to mix corpora")
        // a bootstrap crashed mid-build: rebuild from the current
        // revision (the build verbs overwrite their own relations)
        runBootstrap()
      case Some(_) =>
        RevisionSync.window(spark, idxPath, storePath) match {
          case None =>
            // already current — retention still applies (an operator
            // may dial retain down on a quiet index)
            applyRetention()
            None
          case Some((from, to)) =>
            maintainWindow(from, to)
            RevisionSync.setSyncedRev(spark, idxPath, storePath, to)
            applyRetention()
            Some((from, to))
        }
    }
  }
}
