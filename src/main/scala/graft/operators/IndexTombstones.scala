package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The shared DELETE half of every persisted index family's lifecycle
  * (SQ8, PQ, IVF, residual, binary, LSH, kNN lists) — the q138 right-to-be-forgotten
  * cascade applied to ANN stores.
  *
  * Design: deletion is a tombstone APPEND under the store root, masked
  * out at LOAD — every consumer of a loaded store honors deletions with
  * zero per-verb bookkeeping, and the store itself is never rewritten
  * (at 100 TB rewriting a code store per DSAR batch is the non-starter;
  * the mask is tombstone-list-sized and broadcast into the anti join).
  * Deletion is STICKY: the append verbs probe the RAW store for
  * idempotence, so a replayed ingest of a forgotten vector neither
  * duplicates rows nor resurrects it — forgetting survives ingest
  * replay, the IdempotentSink rationale applied to un-ingestion. A full
  * save is the compaction and re-admission point: the fresh code set is
  * authoritative, so pending tombstones are cleared.
  */
object IndexTombstones {

  private def tomb(path: String) = new org.apache.hadoop.fs.Path(s"$path/tombstones")

  private def fs(spark: SparkSession, path: String) =
    tomb(path).getFileSystem(spark.sessionState.newHadoopConf())

  /** Record `ids`(vec_id) as deleted under the store at `path`. Callers
    * validate store existence/provenance first (each family's delete
    * verb does); re-deleting is a no-op at read time (distinct).
    */
  def append(ids: DataFrame, path: String): Unit =
    ids.select(col("vec_id").cast("long").as("vec_id"))
      .write.mode("append").parquet(s"$path/tombstones")

  /** Mask tombstoned vec_ids out of a store relation at load. */
  def mask(rows: DataFrame, path: String): DataFrame =
    maskOn(rows, path, Seq("vec_id"))

  /** [[mask]] generalized to relations that reference a vector id under
    * several columns (a GRAPH store: a deleted node must vanish both as
    * an anchor and as someone else's neighbor) — one anti join per id
    * column, each against the same broadcast-sized tombstone set.
    */
  def maskOn(rows: DataFrame, path: String, idCols: Seq[String]): DataFrame =
    tombstoneSet(rows.sparkSession, path) match {
      case Some(t) => maskWith(rows, t, idCols)
      case None => rows
    }

  /** The store's tombstone id set, read ONCE — loaders masking several
    * relations of one store (postings + docstats, postings + positions)
    * share the read instead of paying a parquet footer job per maskOn.
    */
  def tombstoneSet(spark: SparkSession, path: String): Option[DataFrame] =
    if (fs(spark, path).exists(tomb(path)))
      Some(spark.read.parquet(s"$path/tombstones")
        .select("vec_id").distinct())
    else None

  /** Apply an already-read tombstone set (see [[tombstoneSet]]). */
  def maskWith(rows: DataFrame, t: DataFrame, idCols: Seq[String]): DataFrame =
    idCols.foldLeft(rows)((r, c) =>
      r.join(t.select(col("vec_id").as(c)), Seq(c), "left_anti"))

  /** Drop the tombstone set — called by every family's full-save verb
    * (the compaction point).
    */
  def clear(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    if (f.exists(tomb(path))) f.delete(tomb(path), true)
  }

  /** Remove ONLY `ids`(vec_id) from the tombstone set — the FORGET
    * verbs' tombstone semantics: the forgotten ids' physical rows are
    * gone (so their tombstones must go, or a re-submitted copy would
    * silently never re-admit), but every OTHER deletion's rows are
    * still physically present in the rewritten stores — clearing the
    * whole set there would resurrect them. Only a full SAVE (where the
    * caller supplies the complete authoritative corpus) may clear.
    */
  def remove(ids: DataFrame, path: String): Unit = {
    val spark = ids.sparkSession
    val f = fs(spark, path)
    if (f.exists(tomb(path))) {
      val rest = spark.read.parquet(s"$path/tombstones")
        .join(ids.select(col("vec_id")), Seq("vec_id"), "left_anti")
        .localCheckpoint(true)
      if (rest.isEmpty) f.delete(tomb(path), true)
      else StoreRewrite.atomicOverwrite(rest, s"$path/tombstones")
    }
  }
}
