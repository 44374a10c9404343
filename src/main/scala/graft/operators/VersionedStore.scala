package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Rename-free versioned store: manifest-committed revisions with
  * time-travel reads and vacuum — the object-store-safe commit protocol.
  *
  * Every other crash verb in this engine ([[StoreRewrite]], the text
  * index's `_inflight`/`_forget_intent` discipline) leans on one
  * primitive: ATOMIC DIRECTORY RENAME. That primitive exists on
  * HDFS/POSIX and does not exist on object stores — S3 "rename" is a
  * copy-then-delete per object, non-atomic and O(bytes). At 100 TB the
  * store families live on exactly such storage, so the production-grade
  * answer is the log-structured protocol every table format converges
  * on (Iceberg/Delta-style, from public designs): data files are
  * IMMUTABLE and only ever ADDED; a revision is a small MANIFEST file
  * enumerating the directories that compose it; the commit point is the
  * creation of that one small file. Object PUTs are atomic (and S3 has
  * been strongly consistent since 2020), so no rename is ever needed —
  * and unlike the rename-based verbs there is NO recover verb at all: a
  * crash at ANY instant leaves either the old current revision (data
  * dirs written but unreferenced are invisible) or the new one
  * (manifest landed). Debris from crashed attempts is reclaimed by
  * [[vacuum]], never by a repair step.
  *
  * Layout under a store root:
  * {{{
  *   d<rev>__data__<rel>/...parquet   immutable data directory
  *   d<rev>__del__<rel>/...parquet    tombstone keys for <rel>
  *   _versions/v<rev>                 manifest: the commit record
  * }}}
  *
  * A manifest is a text file: a header line, one `kind TAB rel TAB dir`
  * line per referenced directory, and a `#commit` footer. The footer is
  * the torn-write guard for filesystems where file CREATION is visible
  * before the content flush (local/HDFS): a manifest without the footer
  * is treated as never committed, so `current` falls back to the newest
  * valid revision. On an object store the whole file appears atomically
  * and the footer is simply always present.
  *
  * Concurrency: single writer by discipline (as for every store family
  * here), with the manifest create (`overwrite = false`) as the
  * optimistic backstop — a second writer racing to the same revision
  * number loses loudly at the commit point, after which it must re-read
  * `current` and retry on top of the winner.
  *
  * Verbs: [[save]] (full snapshot — new revision references ONLY the
  * new dirs), [[append]] (delta — new revision references the previous
  * revision's dirs plus the delta dirs, so an append writes the
  * increment and one small file, never the corpus), [[delete]]
  * (tombstone dir; reads anti-join it), [[compact]] (fold a revision's
  * dir chain and tombstones into one dir per relation — layout
  * maintenance, content-identical), [[read]] (at `current` or any
  * retained revision — time travel), [[vacuum]] (drop old revisions and
  * every data dir no retained revision references, including crashed
  * attempts' debris).
  */
object VersionedStore {

  /** One column's zone map on one directory: [lo, hi] of `col` over the
    * dir's rows, with `typ` naming the comparison domain — "long"
    * (integral columns, numeric compare) or "string" (strings AND dates:
    * dates are recorded as ISO `yyyy-MM-dd` strings, which compare
    * lexicographically exactly as they compare temporally). Values are
    * stored in the manifest percent-encoded so a tab or newline inside a
    * string bound can never tear the line format.
    */
  final case class ColStat(col: String, typ: String, lo: String, hi: String) {
    /** Can [lo, hi] intersect the query window [qlo, qhi] (same domain)? */
    def intersects(qlo: String, qhi: String): Boolean = typ match {
      case "long" => hi.toLong >= qlo.toLong && lo.toLong <= qhi.toLong
      case _      => hi >= qlo && lo <= qhi
    }
  }

  /** One manifest line. `stats` carries the directory's zone maps — the
    * Iceberg-style per-column min/max pruning record (Iceberg keeps
    * lower/upper bounds per column for all comparable types; same idea
    * here for long-like, string, and date columns): a pruned read skips
    * every dir where ANY queried column's [min, max] cannot intersect
    * its window, WITHOUT listing or opening the dir.
    */
  final case class Entry(kind: String, rel: String, dir: String,
      stats: Seq[ColStat] = Nil)

  private val Header = "graft-versioned-manifest v1"
  private val Footer = "#commit"

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  private def versionsDir(path: String) = new Path(path, "_versions")

  private def manifestPath(path: String, rev: Long) =
    new Path(versionsDir(path), f"v$rev%09d")

  private def dataDirName(rev: Long, kind: String, rel: String) =
    f"d$rev%09d__${kind}__$rel"

  private def checkRel(rel: String): Unit =
    require(rel.nonEmpty && rel.matches("[A-Za-z0-9_]+") && !rel.contains("__"),
      s"VersionedStore: illegal relation name '$rel' (letters/digits/single " +
        "underscores only — '__' is the layout separator)")

  /** Parse a manifest file; None if absent or not validly committed
    * (missing footer = torn write of a crashed commit).
    */
  private def readManifestFile(fs: FileSystem, mp: Path): Option[Seq[Entry]] = {
    if (!fs.exists(mp)) return None
    val in = fs.open(mp)
    val bytes =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        var n = in.read(tmp)
        while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        buf.toByteArray
      } finally in.close()
    val lines = new String(bytes, StandardCharsets.UTF_8).split("\n", -1)
      .toSeq.filter(_.nonEmpty)
    if (lines.headOption.contains(Header) && lines.lastOption.contains(Footer))
      Some(lines.drop(1).dropRight(1).map { l =>
        val p = l.split("\t", -1)
        // 3 fields = no stats; 6 = the v1 single-long-column form
        // (col, lo, hi — still readable so pre-upgrade manifests keep
        // pruning); 3 + 4k = the multi-column form, 4 fields per stat
        // (col, typ, lo, hi; values percent-encoded)
        require(p.length == 3 || p.length == 6 ||
            (p.length > 3 && (p.length - 3) % 4 == 0),
          s"VersionedStore: corrupt manifest line '$l' in $mp")
        if (p.length == 3) Entry(p(0), p(1), p(2))
        else if (p.length == 6)
          Entry(p(0), p(1), p(2), Seq(ColStat(p(3), "long", p(4), p(5))))
        else Entry(p(0), p(1), p(2),
          p.drop(3).grouped(4).map(g =>
            ColStat(dec(g(0)), g(1), dec(g(2)), dec(g(3)))).toSeq)
      })
    else None // torn write: never committed
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, StandardCharsets.UTF_8)
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, StandardCharsets.UTF_8)

  /** All validly committed revision numbers, ascending. */
  def listVersions(spark: SparkSession, path: String): Seq[Long] = {
    val fs = fsOf(spark, path)
    val vd = versionsDir(path)
    if (!fs.exists(vd)) return Seq.empty
    fs.listStatus(vd).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("v"))
      .flatMap(p => p.getName.drop(1).toLongOption.map(r => (r, p)))
      .filter { case (_, p) => readManifestFile(fs, p).isDefined }
      .map(_._1).sorted
  }

  /** Newest committed revision, if any. */
  def currentVersion(spark: SparkSession, path: String): Option[Long] =
    listVersions(spark, path).lastOption

  private def manifestAt(spark: SparkSession, path: String,
      asOf: Option[Long]): (Long, Seq[Entry]) = {
    val fs = fsOf(spark, path)
    val rev = asOf.getOrElse(currentVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"VersionedStore: no committed revision at $path")))
    readManifestFile(fs, manifestPath(path, rev)) match {
      case Some(es) => (rev, es)
      case None => throw new IllegalArgumentException(
        s"VersionedStore: revision $rev at $path does not exist or was " +
          "vacuumed — time travel reaches only retained revisions " +
          s"(${listVersions(spark, path).mkString(", ")})")
    }
  }

  /** Relations visible at a revision (tombstone-only relations excluded). */
  def relations(spark: SparkSession, path: String,
      asOf: Option[Long] = None): Seq[String] =
    manifestAt(spark, path, asOf)._2.filter(_.kind == "data")
      .map(_.rel).distinct.sorted

  /** Write one immutable data/tombstone directory for a future revision.
    * Uncommitted (no manifest references it) — invisible to every
    * reader until [[commitManifest]] lands; overwrite is safe because
    * only a crashed attempt at the SAME revision can have left the dir.
    */
  private[graft] def writeDataDir(df: DataFrame, path: String, rev: Long,
      kind: String, rel: String, statsCols: Seq[String] = Nil): Entry = {
    val dir = dataDirName(rev, kind, rel)
    val full = new Path(path, dir).toString
    df.write.mode("overwrite").parquet(full)
    // zone maps computed over the WRITTEN files in ONE aggregate job
    // (two values per mapped column — exact post-write, increment-sized
    // scan); an empty dir, an all-null column, and a column of an
    // uncomparable type get no stats and are simply never skipped.
    // Requested columns absent from this relation are skipped too — one
    // statsCols list serves a multi-relation commit where only some
    // relations carry the column.
    val stats =
      if (statsCols.isEmpty) Nil
      else {
        import org.apache.spark.sql.functions.{min => fmin, max => fmax, col}
        import org.apache.spark.sql.types._
        val written = df.sparkSession.read.parquet(full)
        val fields = written.schema.fields.map(f => f.name -> f.dataType).toMap
        // min/max run in each column's NATIVE domain (a long min over
        // stringified values would order "10" before "9"); the bounds
        // are rendered to strings only for the manifest record
        val typed = statsCols.distinct.flatMap { c =>
          fields.get(c).flatMap {
            case ByteType | ShortType | IntegerType | LongType =>
              Some((c, "long", col(c).cast("long")))
            case StringType => Some((c, "string", col(c)))
            // ISO yyyy-MM-dd: lexicographic order == temporal order
            case DateType => Some((c, "string", col(c).cast("string")))
            case _ => None // float/binary/nested: no sound total order here
          }
        }
        if (typed.isEmpty) Nil
        else {
          val aggs = typed.flatMap { case (c, _, e) =>
            Seq(fmin(e).as(s"lo_$c"), fmax(e).as(s"hi_$c"))
          }
          val r = written.agg(aggs.head, aggs.tail: _*).head()
          def render(i: Int, t: String): String =
            if (t == "long") r.getLong(i).toString else r.getString(i)
          typed.zipWithIndex.flatMap { case ((c, t, _), i) =>
            if (r.isNullAt(2 * i)) None
            else Some(ColStat(c, t, render(2 * i, t), render(2 * i + 1, t)))
          }
        }
      }
    Entry(kind, rel, dir, stats)
  }

  /** The commit point: create `_versions/v<rev>` with the entry list.
    * `create(overwrite = false)` refuses an existing VALID manifest
    * (optimistic-concurrency backstop); an existing INVALID one is a
    * prior torn write of this same revision — never committed, safe to
    * replace.
    */
  private[graft] def commitManifest(spark: SparkSession, path: String,
      rev: Long, entries: Seq[Entry]): Unit = {
    val fs = fsOf(spark, path)
    val mp = manifestPath(path, rev)
    fs.mkdirs(versionsDir(path))
    if (fs.exists(mp)) {
      require(readManifestFile(fs, mp).isEmpty,
        s"VersionedStore: concurrent commit — revision $rev at $path was " +
          "committed by another writer; re-read currentVersion and retry")
      fs.delete(mp, false) // torn debris of a crashed attempt at this rev
    }
    val body = (Header +: entries.map { e =>
      val statFields = e.stats.flatMap(s =>
        Seq(enc(s.col), s.typ, enc(s.lo), enc(s.hi)))
      (Seq(e.kind, e.rel, e.dir) ++ statFields).mkString("\t")
    } :+ Footer).mkString("\n") + "\n"
    val out = fs.create(mp, false)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Per-relation schema record: a `schema`-kind manifest entry whose
    * `dir` field carries the StructType's canonical JSON
    * (percent-encoded). This is what makes append-time drift REFUSABLE
    * instead of a latent read corruption: [[read]]'s multi-dir scan
    * takes one file's footer as the relation schema, so a delta that
    * gained a column would be silently null-filled or dropped depending
    * on which footer wins — Iceberg/Delta both version schemas for
    * exactly this reason. v1 manifests carry no schema entries; they
    * stay readable, and [[append]] falls back to the first data dir's
    * parquet footer as the recorded schema (upgrading the manifest on
    * its next commit).
    */
  private def schemaEntry(rel: String,
      s: org.apache.spark.sql.types.StructType): Entry =
    Entry("schema", rel, enc(s.json))

  private def recordedSchema(spark: SparkSession, path: String,
      entries: Seq[Entry], rel: String)
      : Option[org.apache.spark.sql.types.StructType] =
    entries.find(e => e.kind == "schema" && e.rel == rel)
      .map(e => org.apache.spark.sql.types.DataType.fromJson(dec(e.dir))
        .asInstanceOf[org.apache.spark.sql.types.StructType])
      .orElse(entries.find(e => e.kind == "data" && e.rel == rel)
        .map(e => spark.read.parquet(new Path(path, e.dir).toString).schema))

  /** Check an appended delta against the relation's recorded schema:
    * same column set and types (nullability and field order aside) is
    * REQUIRED; a pure reordering is normalized to the recorded order
    * (so every data dir of a relation lays out identically); anything
    * else refuses loudly with the drift spelled out. Schema evolution
    * is a [[save]] — a full snapshot legitimately commits a new
    * lineage, and the recorded schema follows it.
    */
  private def conformed(df: DataFrame,
      rec: org.apache.spark.sql.types.StructType, rel: String): DataFrame = {
    def sig(f: org.apache.spark.sql.types.StructField) =
      (f.name, f.dataType.catalogString)
    val recSig = rec.fields.map(sig).toSeq
    val inSig = df.schema.fields.map(sig).toSeq
    if (inSig == recSig) df
    else {
      val recMap = recSig.toMap; val inMap = inSig.toMap
      val added = inMap.keySet -- recMap.keySet
      val missing = recMap.keySet -- inMap.keySet
      val retyped = (recMap.keySet & inMap.keySet)
        .filter(c => recMap(c) != inMap(c))
      require(added.isEmpty && missing.isEmpty && retyped.isEmpty,
        s"VersionedStore.append: schema drift on relation '$rel' — " +
          Seq(
            if (added.nonEmpty)
              Some(s"column(s) ${added.toSeq.sorted.mkString(", ")} not in " +
                "the recorded schema") else None,
            if (missing.nonEmpty)
              Some(s"recorded column(s) ${missing.toSeq.sorted.mkString(", ")} " +
                "missing from the delta") else None,
            if (retyped.nonEmpty)
              Some(retyped.toSeq.sorted.map(c =>
                s"'$c' is ${inMap(c)}, recorded ${recMap(c)}").mkString("; "))
            else None).flatten.mkString("; ") +
          " — an append's rows must match the relation's recorded schema " +
          "(a multi-dir read would silently misalign otherwise); commit " +
          "schema evolution through save(), which records the new schema " +
          "as a new lineage")
      // identical columns and types, different order: normalize so every
      // dir of the relation lays out identically
      df.select(rec.fieldNames.map(col(_)).toSeq: _*)
    }
  }

  /** The streaming-ingest commit record: a `meta`-kind manifest entry
    * carrying the micro-batch id that produced the revision. Because it
    * rides INSIDE the manifest, "this batch's data is visible" and
    * "this batch is recorded as applied" are one atomic PUT — the
    * exactly-once primitive [[graft.streaming.VersionedIngest]] builds
    * on. At most one marker per manifest (writes replace the previous
    * one); readers of data relations never see it.
    */
  private def markerEntry(batchId: Long): Entry =
    Entry("meta", "batch", batchId.toString)

  private def withMarker(entries: Seq[Entry], marker: Option[Long]): Seq[Entry] =
    marker.fold(entries)(b =>
      entries.filterNot(e => e.kind == "meta" && e.rel == "batch") :+
        markerEntry(b))

  /** The current revision's recorded micro-batch id, if any. */
  def batchMarker(spark: SparkSession, path: String): Option[Long] =
    currentVersion(spark, path).flatMap(v =>
      manifestAt(spark, path, Some(v))._2
        .find(e => e.kind == "meta" && e.rel == "batch")
        .flatMap(_.dir.toLongOption))

  /** Full snapshot: the new revision references ONLY the freshly
    * written dirs (prior revisions stay readable until vacuumed).
    */
  def save(snapshot: Map[String, DataFrame], path: String,
      marker: Option[Long] = None,
      statsCols: Seq[String] = Nil): Long = {
    require(snapshot.nonEmpty, "VersionedStore.save: empty snapshot")
    snapshot.keys.foreach(checkRel)
    val spark = snapshot.head._2.sparkSession
    val rev = currentVersion(spark, path).getOrElse(0L) + 1L
    val entries = snapshot.toSeq.sortBy(_._1).map { case (rel, df) =>
      writeDataDir(df, path, rev, "data", rel, statsCols)
    }
    val schemas = snapshot.toSeq.sortBy(_._1).map { case (rel, df) =>
      schemaEntry(rel, df.schema)
    }
    commitManifest(spark, path, rev, withMarker(entries ++ schemas, marker))
    rev
  }

  /** Delta append: write ONLY the increment dirs; the new manifest is
    * the previous revision's entries plus the new dirs. Cost at 100 TB:
    * the increment's bytes plus one small file — the corpus is never
    * rewritten or even read.
    */
  def append(delta: Map[String, DataFrame], path: String,
      marker: Option[Long] = None,
      statsCols: Seq[String] = Nil): Long = {
    require(delta.nonEmpty, "VersionedStore.append: empty delta")
    delta.keys.foreach(checkRel)
    val spark = delta.head._2.sparkSession
    val (cur, prev) = manifestAt(spark, path, None)
    val rev = cur + 1L
    // drift gate BEFORE any dir is written: a refused append leaves no
    // debris. Existing relations conform (or refuse) against their
    // recorded schema; new relations record theirs.
    val checked = delta.toSeq.sortBy(_._1).map { case (rel, df) =>
      recordedSchema(spark, path, prev, rel) match {
        case Some(rec) => (rel, conformed(df, rec, rel), rec)
        case None => (rel, df, df.schema)
      }
    }
    val added = checked.map { case (rel, df, _) =>
      writeDataDir(df, path, rev, "data", rel, statsCols)
    }
    val prevKept = prev.filterNot(e =>
      e.kind == "schema" && delta.contains(e.rel))
    val schemas = checked.map { case (rel, _, rec) => schemaEntry(rel, rec) }
    commitManifest(spark, path, rev,
      withMarker(prevKept ++ added ++ schemas, marker))
    rev
  }

  /** Tombstone delete: `keys`' columns name the join key(s); reads of
    * `rel` anti-join every tombstone dir. Physical reclaim happens at
    * [[compact]], the usual deferred-delete trade.
    */
  def delete(keys: DataFrame, rel: String, path: String): Long = {
    checkRel(rel)
    val spark = keys.sparkSession
    val (cur, prev) = manifestAt(spark, path, None)
    require(prev.exists(e => e.kind == "data" && e.rel == rel),
      s"VersionedStore.delete: no relation '$rel' at $path")
    val rev = cur + 1L
    val added = writeDataDir(keys, path, rev, "del", rel)
    commitManifest(spark, path, rev, prev :+ added)
    rev
  }

  /** Mixed commit: ONE revision that both appends increments and
    * tombstones keys. This is the atomicity primitive for derived
    * relations ([[graft.streaming.VersionedIngest.deleteWithView]]):
    * a delete whose retraction rows ride in the SAME manifest as its
    * tombstones can never expose a corpus/view torn state — every
    * crash instant shows either both or neither. Appended dirs are
    * written eagerly BEFORE the manifest, so an `appends` frame that
    * reads this store computes against the pre-commit revision (the
    * tombstones it is committed with are not yet visible to it).
    */
  def commitDelta(appends: Map[String, DataFrame],
      deletes: Map[String, DataFrame], path: String,
      marker: Option[Long] = None,
      statsCols: Seq[String] = Nil): Long =
    commitMixed(appends, deletes, Map.empty, path, marker, statsCols)

  /** The FULL commit algebra in one revision: append increments,
    * tombstone keys, and REPLACE whole relations — all visible in one
    * manifest PUT. This is what a multi-relation DERIVED store needs
    * for maintenance: the text index's append must land new postings
    * and docstats dirs AND swap in re-elected champion heads in the
    * same instant, or a reader between two commits scores candidates
    * from heads elected under the previous corpus statistics. Appends
    * and replaces are drift-gated against the recorded schemas BEFORE
    * any dir is written (a refused commit leaves no debris); a replaced
    * relation drops its accumulated tombstones ([[replaceRelation]]'s
    * contract) and may not also be appended or tombstoned in the same
    * commit (ambiguous ordering — refused); a replace of a relation the
    * store does not hold yet simply creates it (first election). Every
    * passed DataFrame computes against the PRE-commit revision: the
    * dirs written here are referenced by no manifest until the final
    * PUT, so a replace that reads the relations it rides with sees
    * their state as of the previous revision.
    */
  def commitMixed(appends: Map[String, DataFrame],
      deletes: Map[String, DataFrame],
      replaces: Map[String, DataFrame], path: String,
      marker: Option[Long] = None,
      statsCols: Seq[String] = Nil): Long = {
    require(appends.nonEmpty || deletes.nonEmpty || replaces.nonEmpty,
      "VersionedStore.commitMixed: empty commit")
    val overlap = replaces.keySet & (appends.keySet ++ deletes.keySet)
    require(overlap.isEmpty,
      "VersionedStore.commitMixed: relation(s) " +
        s"${overlap.toSeq.sorted.mkString(", ")} both replaced and " +
        "appended/tombstoned in one commit — the replacement is " +
        "authoritative, fold the delta into it instead")
    (appends.keys ++ deletes.keys ++ replaces.keys).foreach(checkRel)
    val spark = (appends ++ deletes ++ replaces).head._2.sparkSession
    val (cur, prev) = manifestAt(spark, path, None)
    deletes.keys.foreach(rel =>
      require(prev.exists(e => e.kind == "data" && e.rel == rel),
        s"VersionedStore.commitMixed: no relation '$rel' at $path"))
    val rev = cur + 1L
    // drift gates run over ALL incoming frames before the first write
    def checked(m: Map[String, DataFrame]) =
      m.toSeq.sortBy(_._1).map { case (rel, df) =>
        recordedSchema(spark, path, prev, rel) match {
          case Some(rec) => (rel, conformed(df, rec, rel), rec)
          case None => (rel, df, df.schema)
        }
      }
    val checkedApp = checked(appends)
    val checkedRep = checked(replaces)
    val added =
      checkedApp.map { case (rel, df, _) =>
        writeDataDir(df, path, rev, "data", rel, statsCols)
      } ++ deletes.toSeq.sortBy(_._1).map { case (rel, df) =>
        writeDataDir(df, path, rev, "del", rel)
      } ++ checkedRep.map { case (rel, df, _) =>
        writeDataDir(df, path, rev, "data", rel, statsCols)
      }
    val prevKept = prev.filterNot(e =>
      (e.kind == "schema" &&
        (appends.contains(e.rel) || replaces.contains(e.rel))) ||
        ((e.kind == "data" || e.kind == "del") && replaces.contains(e.rel)))
    val schemas = (checkedApp ++ checkedRep).map { case (rel, _, rec) =>
      schemaEntry(rel, rec)
    }
    commitManifest(spark, path, rev,
      withMarker(prevKept ++ added ++ schemas, marker))
    rev
  }

  /** Replace ONE relation's content in a new revision; every other
    * relation's dirs carry over untouched. The single-relation compact:
    * [[graft.streaming.VersionedIngest.foldView]] uses it to fold a
    * materialized view's partials chain back to merged rows without
    * touching the corpus relation. `df` is materialized BEFORE the old
    * dirs leave the manifest, so it may read the relation it replaces
    * (the usual fold shape). The new content is authoritative: the
    * relation's accumulated tombstones are dropped (as [[compact]]
    * does), so sticky-tombstone semantics reset for `rel` only.
    */
  def replaceRelation(df: DataFrame, rel: String, path: String,
      statsCols: Seq[String] = Nil): Long = {
    checkRel(rel)
    val spark = df.sparkSession
    val (cur, prev) = manifestAt(spark, path, None)
    require(prev.exists(e => e.kind == "data" && e.rel == rel),
      s"VersionedStore.replaceRelation: no relation '$rel' at $path")
    val rev = cur + 1L
    val added = writeDataDir(df, path, rev, "data", rel, statsCols)
    val kept = prev.filterNot(e =>
      (e.kind == "data" || e.kind == "del") && e.rel == rel)
    commitManifest(spark, path, rev, kept :+ added)
    rev
  }

  /** Read `rel` at `asOf` (default: current): one multi-dir parquet
    * scan over the revision's data dirs (a single scan relation —
    * filters and pruning push into all of them), anti-joined against
    * the revision's tombstones for the relation, if any.
    */
  def read(spark: SparkSession, path: String, rel: String,
      asOf: Option[Long] = None): DataFrame = {
    checkRel(rel)
    val (_, entries) = manifestAt(spark, path, asOf)
    val dataDirs = entries.filter(e => e.kind == "data" && e.rel == rel)
      .map(e => new Path(path, e.dir).toString)
    require(dataDirs.nonEmpty,
      s"VersionedStore.read: no relation '$rel' at $path" +
        asOf.fold("")(r => s" as of revision $r"))
    val base = spark.read.parquet(dataDirs: _*)
    val delDirs = entries.filter(e => e.kind == "del" && e.rel == rel)
      .map(e => new Path(path, e.dir).toString)
    if (delDirs.isEmpty) base
    else {
      val dels = spark.read.parquet(delDirs: _*).distinct()
      base.join(dels, dels.columns.toSeq, "left_anti")
    }
  }

  /** Range read with DIR-LEVEL pruning off the manifest's zone maps:
    * data dirs whose recorded [min, max] on `keyCol` cannot intersect
    * [lo, hi] are dropped BEFORE the scan relation is even built — at
    * 100 TB of time-ordered appends a recent-window query opens the
    * last few dirs instead of years of them, with zero file listing of
    * the skipped ones (the manifest IS the listing). Dirs without
    * stats on `keyCol` are kept (conservative), the precise predicate
    * is always applied after the scan, and tombstones always apply —
    * pruning can only skip IO, never change the result.
    */
  def readRange(spark: SparkSession, path: String, rel: String,
      keyCol: String, lo: Long, hi: Long,
      asOf: Option[Long] = None): DataFrame =
    readPruned(spark, path, rel, Map(keyCol -> (lo, hi)), asOf)

  /** The multi-column form of [[readRange]]: `bounds` maps column names
    * to inclusive [lo, hi] windows — Long (or Int) bounds for "long"
    * zone maps, String bounds for "string"/date maps — and a dir is
    * skipped when ANY bounded column's recorded [min, max] cannot
    * intersect its window (the windows conjoin, so one disjoint column
    * disqualifies the whole dir). Real lake queries prune on several
    * columns at once — a time window AND a source — and on strings as
    * often as on numbers; single-column pruning forfeits most of the
    * skipping. Dirs without stats on a bounded column are kept
    * (conservative), every precise predicate is applied after the scan,
    * and tombstones always apply — pruning can only skip IO, never
    * change the result. A Long bound against a "string" map (or vice
    * versa) refuses loudly rather than comparing across domains.
    */
  def readPruned(spark: SparkSession, path: String, rel: String,
      bounds: Map[String, (Any, Any)],
      asOf: Option[Long] = None): DataFrame = {
    checkRel(rel)
    require(bounds.nonEmpty, "VersionedStore.readPruned: empty bounds")
    val (_, entries) = manifestAt(spark, path, asOf)
    val all = entries.filter(e => e.kind == "data" && e.rel == rel)
    require(all.nonEmpty,
      s"VersionedStore.readPruned: no relation '$rel' at $path")
    def domain(v: Any): String = v match {
      case _: Long | _: Int | _: Short | _: Byte => "long"
      case _: String => "string"
      case other => throw new IllegalArgumentException(
        s"VersionedStore.readPruned: unsupported bound type " +
          s"${other.getClass.getSimpleName} — use Long for long-mapped " +
          "columns, String for string/date-mapped ones")
    }
    val kept = all.filter { e =>
      bounds.forall { case (c, (qlo, qhi)) =>
        e.stats.find(_.col == c) match {
          case Some(st) =>
            require(st.typ == domain(qlo) && st.typ == domain(qhi),
              s"VersionedStore.readPruned: bound for '$c' is a " +
                s"${domain(qlo)} but the zone map is ${st.typ} — " +
                "cross-domain comparisons would prune wrongly")
            st.intersects(qlo.toString, qhi.toString)
          case None => true // no zone map on this column: cannot skip
        }
      }
    }
    val pred = bounds.map { case (c, (qlo, qhi)) =>
      if (domain(qlo) == "long")
        col(c).cast("long").between(qlo.toString.toLong, qhi.toString.toLong)
      else col(c).cast("string").between(qlo.toString, qhi.toString)
    }.reduce(_ && _)
    if (kept.isEmpty)
      // every dir skipped: an empty relation with the right schema
      return spark.read.parquet(new Path(path, all.head.dir).toString)
        .filter(lit(false))
    val base = spark.read
      .parquet(kept.map(e => new Path(path, e.dir).toString): _*)
      .filter(pred)
    val delDirs = entries.filter(e => e.kind == "del" && e.rel == rel)
      .map(e => new Path(path, e.dir).toString)
    if (delDirs.isEmpty) base
    else {
      val dels = spark.read.parquet(delDirs: _*).distinct()
      base.join(dels, dels.columns.toSeq, "left_anti")
    }
  }

  /** O(delta) CDC between two retained revisions of `rel`: returns
    * (inserted rows, deleted keys) computed ONLY from the directories
    * the window added — never a corpus-sized diff join (q162's digest
    * outer join costs the corpus; this costs the increment, because
    * under append/delete the manifest delta IS the change log).
    * Applying the changeset to the `from` content reproduces the `to`
    * content exactly:
    * `content(from) ANTI-JOIN deletedKeys UNION inserted == content(to)`
    * — the q166 invariant, gated by q180's oracle. Refuses a window
    * that crosses a full save or compact (those REPLACE dirs; the
    * delta algebra needs `from`'s dirs to survive into `to`).
    */
  def changes(spark: SparkSession, path: String, fromRev: Long,
      toRev: Long, rel: String): (DataFrame, DataFrame) = {
    require(fromRev < toRev,
      s"VersionedStore.changes: fromRev $fromRev must precede toRev $toRev")
    // data/del dirs only: schema records are not directories, and an
    // append that merely UPGRADED a v1 manifest with a schema entry
    // must not read as a replaced dir
    def windowEntries(r: Long) = manifestAt(spark, path, Some(r))._2
      .filter(e => e.rel == rel && (e.kind == "data" || e.kind == "del"))
    val from = windowEntries(fromRev)
    val to = windowEntries(toRev)
    val toDirs = to.map(_.dir).toSet
    val missing = from.filterNot(e => toDirs.contains(e.dir))
    require(missing.isEmpty,
      s"VersionedStore.changes: revision window $fromRev -> $toRev crosses " +
        s"a save/compact (dir(s) ${missing.map(_.dir).mkString(", ")} were " +
        "replaced) — delta CDC applies only across append/delete revisions; " +
        "diff the two reads instead")
    val fromDirs = from.map(_.dir).toSet
    val addedData = to.filter(e => e.kind == "data" && !fromDirs.contains(e.dir))
      .map(e => new Path(path, e.dir).toString)
    val addedDel = to.filter(e => e.kind == "del" && !fromDirs.contains(e.dir))
      .map(e => new Path(path, e.dir).toString)
    val allDel = to.filter(_.kind == "del")
      .map(e => new Path(path, e.dir).toString)
    val sample = to.find(_.kind == "data").getOrElse(throw
      new IllegalArgumentException(
        s"VersionedStore.changes: no relation '$rel' at $path"))
    def emptyLike(p: String) =
      spark.read.parquet(p).filter(lit(false))
    val inserted0 =
      if (addedData.isEmpty)
        emptyLike(new Path(path, sample.dir).toString)
      else spark.read.parquet(addedData: _*)
    // rows appended then tombstoned inside the window net out (the
    // roundtrip invariant needs the TO revision's view)
    val inserted =
      if (allDel.isEmpty) inserted0
      else {
        val dels = spark.read.parquet(allDel: _*).distinct()
        inserted0.join(dels, dels.columns.toSeq, "left_anti")
      }
    val deletedKeys =
      if (addedDel.nonEmpty) spark.read.parquet(addedDel: _*).distinct()
      else if (allDel.nonEmpty) emptyLike(allDel.head)
      // no tombstones anywhere in `to`: the key schema is unknowable —
      // callers skip the anti join when there are no columns
      else spark.emptyDataFrame
    (inserted, deletedKeys)
  }

  /** Layout maintenance: fold each relation's dir chain and tombstones
    * into ONE fresh data dir, commit a revision referencing only those.
    * Content-identical to the pre-compact current revision; tombstoned
    * rows are physically reclaimed (so a later time-travel read of the
    * PRE-compact revision still sees them via the old dirs, until
    * vacuum). Zone maps are recomputed for the folded dirs on the union
    * of columns each relation's dirs previously mapped.
    */
  def compact(spark: SparkSession, path: String): Long = {
    val (cur, prev) = manifestAt(spark, path, None)
    val rev = cur + 1L
    val entries = relations(spark, path).map { rel =>
      // re-map the union of columns any of the folded dirs carried
      val sc = prev.filter(e => e.kind == "data" && e.rel == rel)
        .flatMap(_.stats.map(_.col)).distinct
      writeDataDir(read(spark, path, rel), path, rev, "data", rel, sc)
    }
    // meta entries (the streaming batch marker) survive compaction —
    // dropping them would let a replayed micro-batch double-apply — and
    // so do the schema records (compaction is layout maintenance, never
    // schema evolution)
    commitManifest(spark, path, rev,
      entries ++ prev.filter(e => e.kind == "meta" || e.kind == "schema"))
    rev
  }

  /** The data/tombstone directory names the current (or `asOf`)
    * revision references — the `stamps`-level existence check's input
    * ([[StoreDoctor]]): a referenced dir that is GONE means data was
    * deleted out from under a committed manifest, the one corruption
    * the protocol itself cannot mask. No directory is opened here.
    */
  def referencedDirs(spark: SparkSession, path: String,
      asOf: Option[Long] = None): Seq[String] =
    manifestAt(spark, path, asOf)._2
      .filter(e => e.kind == "data" || e.kind == "del").map(_.dir).distinct

  /** Ops report, no mutation: the data dirs at or below the current
    * revision that NO committed revision references — crashed attempts'
    * residue (dirs written, manifest never landed) that only [[vacuum]]
    * reclaims. Dirs referenced solely by OLD revisions are not debris:
    * they are live time-travel data until vacuumed. Dirs numbered above
    * current are excluded (possibly an in-flight writer's), exactly as
    * vacuum excludes them.
    */
  def debris(spark: SparkSession, path: String): Seq[String] = {
    val fs = fsOf(spark, path)
    val versions = listVersions(spark, path)
    if (versions.isEmpty) return Seq.empty
    val cur = versions.last
    val referenced = versions.flatMap(r =>
      readManifestFile(fs, manifestPath(path, r)).get.map(_.dir)).toSet
    fs.listStatus(new Path(path)).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("d") && p.getName.contains("__"))
      .filter { p =>
        val rev = p.getName.drop(1).takeWhile(_.isDigit).toLongOption
        rev.exists(_ <= cur) && !referenced.contains(p.getName)
      }.map(_.getName).sorted
  }

  /** Reclaim: retain the newest `keep` committed revisions; delete
    * older manifests, every data dir referenced by NO retained
    * manifest, and torn/crashed debris at or below the current
    * revision. Dirs and manifests numbered ABOVE current are preserved
    * — they may belong to an in-flight writer. Returns
    * (data dirs deleted, manifests deleted).
    */
  def vacuum(spark: SparkSession, path: String, keep: Int = 2): (Int, Int) = {
    require(keep >= 1, "VersionedStore.vacuum: keep must be >= 1")
    val fs = fsOf(spark, path)
    val versions = listVersions(spark, path)
    if (versions.isEmpty) return (0, 0)
    val cur = versions.last
    val retained = versions.takeRight(keep)
    val referenced = retained.flatMap(r =>
      readManifestFile(fs, manifestPath(path, r)).get.map(_.dir)).toSet
    val dirGone = fs.listStatus(new Path(path)).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("d") && p.getName.contains("__"))
      .filter { p =>
        val rev = p.getName.drop(1).takeWhile(_.isDigit).toLongOption
        rev.exists(_ <= cur) && !referenced.contains(p.getName)
      }
    dirGone.foreach(p => fs.delete(p, true))
    val manGone = fs.listStatus(versionsDir(path)).toSeq.map(_.getPath)
      .filter { p =>
        val rev = p.getName.drop(1).toLongOption
        rev.exists(r => r <= cur && !retained.contains(r)) ||
          // torn debris at or below current: never committed, reclaim
          (rev.exists(_ <= cur) && readManifestFile(fs, p).isEmpty)
      }
    manGone.foreach(p => fs.delete(p, false))
    (dirGone.size, manGone.size)
  }
}
