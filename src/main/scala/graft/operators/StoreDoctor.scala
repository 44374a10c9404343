package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lake-root triage: identify every persisted store directly under a root
  * by its on-disk layout signature and verify each one loads through its
  * own family's verifying loader (stamp checks and all). The operational
  * question at 100 TB is rarely "is this store healthy?" — it is "WHICH of
  * the hundreds of stores under this prefix are unhealthy, and what did
  * their loaders say?", answered here with one bounded scan: directory
  * listings plus per-store meta/manifest reads (the loaders' own checks
  * are aggregate scans of the small relations, never the corpus).
  *
  * Two scan levels, because even "small relations" add up across a lake:
  * the default `deep` level runs each family's verifying loader
  * (fingerprint recompute over codes/postings — the same gates the search
  * verbs run), while `stamps` reads ONLY the commit metadata — manifests,
  * 1-row meta/router/family markers, intent files — and checks every
  * referenced data directory EXISTS without opening one. A healthy store
  * costs a few file reads at `stamps` where `deep` costs per-store
  * aggregate scans; torn intent markers, crashed renames, manifest-
  * referenced dirs that are gone, and empty/multi-row marker relations
  * all still flag. Content corruption INSIDE a data relation (a spliced
  * code set, an edited parameter row) is exactly what `stamps` trades
  * away — run `deep` on the stores a `stamps` sweep leaves suspect, or
  * on a schedule.
  */
object StoreDoctor {

  def scan(spark: SparkSession, root: String,
      level: String = "deep"): DataFrame = {
    require(level == "deep" || level == "stamps",
      s"StoreDoctor.scan: unknown level '$level' (deep or stamps)")
    val deep = level == "deep"
    import spark.implicits._
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val kids = fs.listStatus(new Path(root)).filter(_.isDirectory)
      .map(_.getPath).toSeq
    kids.map { p =>
      // a `<store>__rewrite_tmp` sibling at the lake root is a
      // StoreRewrite in one of two states, both worth a row of their
      // own (identify would read it as an unknown layout): target
      // ABSENT = a rewrite died between delete and rename (the
      // complete store is HERE — recover finishes it); target PRESENT
      // = a prior rewrite crashed mid-write and left stale debris the
      // next rewrite will discard. Neither state should triage as the
      // family it almost is.
      if (p.getName.endsWith(StoreRewrite.TmpSuffix)) {
        val target = new Path(p.getParent,
          p.getName.dropRight(StoreRewrite.TmpSuffix.length))
        val (healthy, detail) =
          if (fs.exists(target))
            (true, s"stale rewrite debris of ${target.getName} (a crashed " +
              "attempt's partial write; the next rewrite discards it)")
          else
            (false, s"torn rewrite of ${target.getName} — the complete " +
              "store is here; run StoreRewrite.recover")
        (p.getName, "rewrite-tmp", healthy, detail)
      } else {
      val subs = fs.listStatus(p).filter(_.isDirectory)
        .map(_.getPath.getName).toSet
      val (family, err) = identify(spark, p.toString, subs, deep)
      // a healthy versioned store still has an ops story worth one scan
      // line: how many revisions it retains (vacuum pressure) and how
      // many unreferenced crashed-attempt dirs await reclaim — debris is
      // invisible to readers, so NOTHING else ever surfaces it
      val detail = err.getOrElse(
        if (family.startsWith("versioned"))
          attemptE {
            val revs = VersionedStore.listVersions(spark, p.toString).size
            val deb = VersionedStore.debris(spark, p.toString).size
            // a versioned DERIVED index may carry a sync checkpoint too
            // (read-only peek, same contract as the rename families)
            val sync = RevisionSync.peekSyncedRev(spark, p.toString)
              .map { case (sp, rev) => s", synced rev=$rev of $sp" }
              .getOrElse("")
            s"ok (revisions=$revs, debris_dirs=$deb$sync)"
          }.fold(identity, identity)
        else
          // a CDC-synced index carries its revision checkpoint — the
          // one ops fact a lake scan should surface (how fresh is this
          // index, and against WHICH corpus store). The READ-ONLY peek,
          // never syncedRev: scan is a diagnostic and must not repair a
          // torn marker under an operator mid-forensics
          attemptE(RevisionSync.peekSyncedRev(spark, p.toString)) match {
            case Right(Some((sp, rev))) => s"ok (synced rev=$rev of $sp)"
            case _                      => "ok"
          })
      (p.getName, family, err.isEmpty, detail)
      }
    }.toDF("store", "family", "healthy", "detail").orderBy("store")
  }

  /** First line of a throwable's message, never itself throwing — an
    * empty or null message falls back to the class name (triage must
    * always complete).
    */
  private def firstLine(e: Throwable): String =
    Option(e.getMessage).filter(_.nonEmpty)
      .flatMap(_.linesIterator.toSeq.headOption)
      .getOrElse(e.getClass.getName)

  private def attempt(body: => Any): Option[String] =
    try { body; None } catch { case e: Throwable => Some(firstLine(e)) }

  /** Evaluate once, keeping the value on success (no double reads). */
  private def attemptE[A](body: => A): Either[String, A] =
    try Right(body) catch { case e: Throwable => Left(firstLine(e)) }

  /** The `stamps`-level checks shared by every RENAME-protocol store:
    * a crashed rewrite's torn window (target gone, complete store at
    * the sibling tmp) and a mutation's live `_inflight` intent marker
    * both flag — the exact states whose healing verbs exist. Both are
    * O(1) existence probes.
    */
  private def renameTornCheck(fs: org.apache.hadoop.fs.FileSystem,
      path: String, rels: Seq[String]): Option[String] = {
    val torn = rels.filter { r =>
      val sub = if (r.isEmpty) path else s"$path/$r"
      !fs.exists(new Path(sub)) &&
        fs.exists(new Path(sub + StoreRewrite.TmpSuffix))
    }
    val inflight = fs.exists(new Path(s"$path/_inflight"))
    if (torn.nonEmpty)
      Some(s"rewrite of ${torn.mkString(", ")} crashed between delete " +
        "and rename — run StoreRewrite.recover")
    else if (inflight)
      Some("_inflight intent marker present — a mutation died mid-write; " +
        "run the family's recover verb")
    else None
  }

  /** The `stamps`-level check of a versioned store: every directory the
    * current manifest references must EXIST (a reclaimed-but-referenced
    * dir means someone deleted data out from under the manifest — the
    * one corruption the protocol itself cannot mask), checked without
    * opening any of them. Torn manifests need no check: an uncommitted
    * manifest is invisible by construction.
    */
  private def versionedStampsCheck(spark: SparkSession,
      path: String): Option[String] =
    attemptE {
      val fs = new Path(path)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val rels = VersionedStore.relations(spark, path)
      require(rels.nonEmpty, "manifest lists no data relations")
      val missing = VersionedStore.referencedDirs(spark, path)
        .filterNot(d => fs.exists(new Path(path, d)))
      require(missing.isEmpty,
        s"manifest references missing dir(s) ${missing.mkString(", ")} — " +
          "data was deleted out from under the committed revision")
    }.left.toOption

  /** Read a 1-row marker/meta relation and require exactly one row —
    * the `stamps`-level integrity a marker can offer without its
    * family's content gates.
    */
  private def oneRow(spark: SparkSession, dir: String,
      what: String): Option[String] =
    attemptE {
      val n = spark.read.parquet(dir).count()
      require(n == 1, s"$what has $n rows — interrupted save or corrupt")
    }.left.toOption

  private def identify(spark: SparkSession, path: String,
      subs: Set[String], deep: Boolean): (String, Option[String]) = {
    import graft.queries.{SearchQueries, SimilarityQueries, QuantQueries}
    val hfs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    if (subs("router")) {
      // all four sharded roots carry router/: the text router has a
      // `tag` column, the signature router a `sig_tag`, the winnow
      // router its fingerprint knobs (k, w), the vector router a
      // `family` column. A manifest-protocol federation's router is
      // itself a versioned store (and its shards are versioned too —
      // builds are uniform), so the protocol is detected ONCE here and
      // the shard checks read through the matching form.
      val versioned =
        VersionedStore.currentVersion(spark, s"$path/router").isDefined
      val pre = if (versioned) "versioned:" else ""
      def shardRel(i: Int, rel: String): org.apache.spark.sql.DataFrame =
        if (versioned)
          VersionedStore.read(spark, s"$path/shard-$i", rel)
        else spark.read.parquet(s"$path/shard-$i")
      // a RENAME-protocol federation's forget persists ONE root-level
      // `_forget_intent` and then rewrites every shard — a crash
      // mid-loop leaves the intent live while each shard dir looks
      // internally consistent, so the root probe is the only stamps-
      // level signal that the federation is mid-mutation (versioned
      // federations need none: their forgets are idempotent per-shard
      // tombstone PUTs with no intent machinery)
      def rootIntentCheck(): Option[String] =
        if (!versioned && hfs.exists(new Path(s"$path/_forget_intent")))
          Some("live _forget_intent at the federation root — a sharded " +
            "forget died mid-loop; run the family's recover verb")
        else None
      def shardStamps(n: Int): Option[String] =
        rootIntentCheck().orElse((0 until n).flatMap { i =>
          if (versioned) versionedStampsCheck(spark, s"$path/shard-$i")
            .map(e => s"shard $i: $e")
          else renameTornCheck(hfs, s"$path/shard-$i", Seq(""))
            .map(e => s"shard $i: $e")
        }.headOption)
      attemptE {
        if (versioned)
          VersionedStore.read(spark, s"$path/router", "router").columns
        else spark.read.parquet(s"$path/router").columns
      } match {
        case Left(err) => ("sharded", Some(err))
        case Right(cols) if cols.contains("sig_tag") =>
          (pre + "signature-sharded", attempt {
            val n = graft.queries.DedupQueries.signatureShardCount(spark, path)
            if (deep)
              (0 until n).foreach { i =>
                val c = shardRel(i, "sig").columns.toSet
                require(c("doc_id") && (0 until 8).forall(j => c(s"h$j")),
                  s"shard $i has unexpected columns [${c.toSeq.sorted.mkString(",")}]")
              }
            else shardStamps(n).foreach(e => throw
              new IllegalStateException(e))
          })
        case Right(cols) if cols.contains("k") && cols.contains("w") =>
          (pre + "winnow-sharded", attempt {
            val (n, _, _) = graft.queries.DedupQueries.winnowShardInfo(spark, path)
            if (deep)
              (0 until n).foreach { i =>
                val c = shardRel(i, "fp").columns.toSet
                require(c == Set("doc_id", "fp_pos", "fp_hash"),
                  s"shard $i has unexpected columns [${c.toSeq.sorted.mkString(",")}]")
              }
            else shardStamps(n).foreach(e => throw
              new IllegalStateException(e))
          })
        case Right(cols) if cols.contains("tag") =>
          (pre + "text-sharded", attempt {
            val n = SearchQueries.textIndexShardCount(spark, path)
            if (deep)
              (0 until n).foreach { i =>
                if (versioned) {
                  VersionedStore.read(spark, s"$path/shard-$i", "postings")
                  VersionedStore.read(spark, s"$path/shard-$i", "docstats")
                } else SearchQueries.textIndexLoad(spark, s"$path/shard-$i")
              }
            else {
              val err = rootIntentCheck().orElse((0 until n).flatMap { i =>
                if (versioned)
                  versionedStampsCheck(spark, s"$path/shard-$i")
                    .map(e => s"shard $i: $e")
                else renameTornCheck(hfs, s"$path/shard-$i",
                  Seq("postings", "docstats", "meta", "positions",
                    "champions"))
                  .map(e => s"shard $i: $e")
                    .orElse(oneRow(spark, s"$path/shard-$i/meta",
                      s"shard $i meta").map(e => s"shard $i: $e"))
              }.headOption)
              err.foreach(e => throw new IllegalStateException(e))
            }
          })
        case Right(_) =>
          attemptE(VectorIndex.shardInfo(spark, path)) match {
            case Left(err) => (pre + "vector-sharded", Some(err))
            case Right((n, f)) =>
              (pre + "vector-sharded:" + f,
                if (deep)
                  (0 until n).flatMap(i =>
                    familyCheck(spark, s"$path/shard-$i", f)).headOption
                else shardStamps(n))
          }
      }
    }
    else if (subs("_versions"))
      // manifest-committed stores: a DERIVED index is recognizable from
      // its relation set and gets its family's own verifying load (the
      // same gates its search verbs run), so a lake scan triages
      // "versioned:sq8 with a spliced meta row" as precisely as it
      // triages the rename families; anything else is a corpus store.
      // At `stamps` level the relation set still names the family (one
      // manifest read) but the only further check is dir existence —
      // no data relation is opened.
      attemptE {
        val rels = VersionedStore.relations(spark, path).toSet
        require(rels.nonEmpty, "manifest lists no data relations")
        // the façade's 1-row family marker is metadata, not identity —
        // a façade-built versioned store triages as its family
        rels - "family"
      } match {
        case Left(e) => ("versioned", Some(e))
        case Right(rels) =>
          val fam =
            if (rels("postings") && rels("docstats")) "versioned:text"
            else if (rels == Set("sig")) "versioned:signature"
            else if (rels == Set("fp", "knobs")) "versioned:winnow"
            else if (rels == Set("codes", "meta")) "versioned:codes-store"
            else if (rels == Set("centroids", "cells", "codebooks",
              "codes", "meta")) "versioned:residual"
            else if (rels == Set("codebooks", "codes")) "versioned:pq"
            else if (rels == Set("centroids", "cells")) "versioned:ivf"
            else if (rels == Set("buckets", "meta")) "versioned:lsh"
            else if (rels("lists") && rels("meta") &&
              (rels - "dead") == Set("lists", "meta")) "versioned:knn"
            else "versioned"
          if (!deep) (fam match {
            case "versioned:codes-store" =>
              // sq8 vs bin needs the meta stamp's prefix — a 1-row
              // read, within the stamps budget
              attemptE {
                val r = VersionedStore.read(spark, path, "meta")
                  .select("fp").take(1)
                require(r.nonEmpty, "meta relation is empty")
                if (r(0).getString(0).startsWith("bin:")) "versioned:bin"
                else "versioned:sq8"
              }.getOrElse(fam)
            case f => f
          }, versionedStampsCheck(spark, path))
          else fam match {
            case "versioned:text" =>
              (fam, attempt {
                rels.foreach(r => VersionedStore.read(spark, path, r))
                if (rels("champions"))
                  VersionedStore.read(spark, path, "champions")
                    .select("m").head.getInt(0)
              })
            case "versioned:signature" =>
              (fam, attempt {
                val c = VersionedStore.read(spark, path, "sig").columns.toSet
                require(c("doc_id") && (0 until 8).forall(j => c(s"h$j")),
                  s"sig has unexpected columns [${c.toSeq.sorted.mkString(",")}]")
              })
            case "versioned:winnow" =>
              (fam, attempt {
                graft.queries.DedupQueries
                  .winnowIndexVersionedKnobs(spark, path)
                val c = VersionedStore.read(spark, path, "fp").columns.toSet
                require(c == Set("doc_id", "fp_pos", "fp_hash"),
                  s"fp has unexpected columns [${c.toSeq.sorted.mkString(",")}]")
              })
            case "versioned:codes-store" =>
              // sq8 and bin share the relation set; the meta stamp's
              // prefix is the family tag (the rename triage's dispatch)
              attemptE {
                val r = VersionedStore.read(spark, path, "meta")
                  .select("fp").take(1)
                require(r.nonEmpty, "meta relation is empty"); r(0).getString(0)
              } match {
                case Left(err) => ("versioned:codes-store", Some(err))
                case Right(v) if v.startsWith("bin:") =>
                  ("versioned:bin", attempt(
                    graft.queries.SimilarityQueries
                      .binLoadIndexVersioned(spark, path)))
                case Right(_) =>
                  ("versioned:sq8",
                    attempt(QuantQueries.sqLoadIndexVersioned(spark, path)))
              }
            case "versioned:residual" =>
              (fam, attempt(graft.queries.SimilarityQueries
                .residualLoadIndexVersioned(spark, path)))
            case "versioned:pq" =>
              (fam, attempt(graft.queries.SimilarityQueries
                .pqLoadIndexVersioned(spark, path)))
            case "versioned:ivf" =>
              (fam, attempt(graft.queries.SimilarityQueries
                .ivfLoadIndexVersioned(spark, path)))
            case "versioned:lsh" =>
              (fam, attempt(graft.queries.SimilarityQueries
                .lshLoadIndexVersioned(spark, path)))
            case "versioned:knn" =>
              (fam, attempt(graft.queries.SimilarityQueries
                .knnLoadListsVersioned(spark, path)))
            case _ =>
              (fam, attempt(
                rels.foreach(r => VersionedStore.read(spark, path, r))))
          }
      }
    else if (subs("family"))
      attemptE(VectorIndex.family(spark, path)) match {
        case Left(err) => ("vector-facade", Some(err))
        case Right(f) =>
          (s"vector-facade:$f",
            if (deep) familyCheck(spark, path, f)
            else shallowFamilyCheck(spark, path, f))
      }
    else if (subs("postings") && subs("docstats"))
      // positions/champions are OPTIONAL relations, but a torn rewrite
      // of one is exactly as real as a torn postings rewrite — the
      // check is absence-safe (a store that never had the relation has
      // neither the dir nor its __rewrite_tmp sibling, so it never
      // flags)
      ("text",
        if (deep) attempt(SearchQueries.textIndexLoad(spark, path))
        else renameTornCheck(hfs, path,
          Seq("postings", "docstats", "meta", "positions", "champions"))
          .orElse(oneRow(spark, s"$path/meta", "meta")))
    else if (subs("codebooks"))
      ("pq",
        if (deep) familyCheck(spark, path, "pq")
        else shallowFamilyCheck(spark, path, "pq"))
    else if (subs("cells"))
      ("ivf",
        if (deep) familyCheck(spark, path, "ivf")
        else shallowFamilyCheck(spark, path, "ivf"))
    else if (subs("lists"))
      ("knn",
        if (deep) familyCheck(spark, path, "knn")
        else shallowFamilyCheck(spark, path, "knn"))
    else if (subs("buckets"))
      ("lsh",
        if (deep) familyCheck(spark, path, "lsh")
        else shallowFamilyCheck(spark, path, "lsh"))
    else if (subs("centroids") && subs("codes"))
      ("residual",
        if (deep) familyCheck(spark, path, "residual")
        else shallowFamilyCheck(spark, path, "residual"))
    else if (subs("codes") && subs("meta")) {
      attemptE {
        val r = spark.read.parquet(s"$path/meta").select("fp").take(1)
        require(r.nonEmpty, "meta is empty"); r(0).getString(0)
      } match {
        case Left(err) => ("codes-store", Some(err))
        case Right(v) =>
          val f = if (v.startsWith("bin:")) "bin" else "sq8"
          (f,
            if (deep) familyCheck(spark, path, f)
            else shallowFamilyCheck(spark, path, f))
      }
    } else {
      // bare parquet relations carry no marker subdirs: the signature
      // index is (doc_id, h0..h7), the winnow-fingerprint index is
      // (doc_id, fp_pos, fp_hash)
      attemptE(spark.read.parquet(path).columns.toSet) match {
        case Right(cols)
            if cols("doc_id") && (0 until 8).forall(i => cols(s"h$i")) =>
          ("signature", None)
        case Right(cols) if cols == Set("doc_id", "fp_pos", "fp_hash") =>
          ("winnow", None)
        case Right(cols) =>
          ("unknown", Some(s"unrecognized layout [${subs.toSeq.sorted
            .mkString(",")}], columns [${cols.toSeq.sorted.mkString(",")}]"))
        case Left(err) =>
          ("unknown", Some(s"unrecognized layout [${subs.toSeq.sorted
            .mkString(",")}]: $err"))
      }
    }
  }

  /** Run family `f`'s own verifying loader against `path`. */
  private def familyCheck(spark: SparkSession, path: String,
      f: String): Option[String] = {
    import graft.queries.{SimilarityQueries => S, QuantQueries => Q}
    // protocol-aware: a manifest-committed store runs its versioned
    // loader's gates (the same dispatch the facade's verbs make)
    val v = VectorIndex.isVersioned(spark, path)
    f match {
      case "bin" => attempt(
        if (v) S.binLoadIndexVersioned(spark, path)
        else S.binLoadIndex(spark, path))
      case "sq8" => attempt(
        if (v) Q.sqLoadIndexVersioned(spark, path)
        else Q.sqLoadIndex(spark, path))
      case "pq" => attempt(
        if (v) S.pqLoadIndexVersioned(spark, path)
        else S.pqLoadIndex(spark, path))
      case "ivf" => attempt(
        if (v) S.ivfLoadIndexVersioned(spark, path)
        else S.ivfLoadIndex(spark, path))
      case "knn" => attempt(
        if (v) S.knnLoadListsVersioned(spark, path)
        else S.knnLoadLists(spark, path))
      case "lsh" => attempt(
        if (v) S.lshLoadIndexVersioned(spark, path)
        else S.lshLoadIndex(spark, path))
      case "residual" => attempt(
        if (v) S.residualLoadIndexVersioned(spark, path)
        else S.residualLoadIndex(spark, path))
      case other => Some(s"no loader for family '$other'")
    }
  }

  /** The `stamps`-level twin of [[familyCheck]]: torn-rename and
    * intent-marker probes plus a 1-row read of the family's meta-like
    * marker relation — never the codes/buckets/cells/lists themselves.
    * Versioned stores run the manifest dir-existence check instead
    * (their markers are manifest-committed relations).
    */
  private def shallowFamilyCheck(spark: SparkSession, path: String,
      f: String): Option[String] = {
    if (VectorIndex.isVersioned(spark, path))
      return versionedStampsCheck(spark, path)
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    val dataRels = f match {
      case "pq" => Seq("codebooks", "codes")
      case "ivf" => Seq("centroids", "cells")
      case "residual" => Seq("centroids", "cells", "codebooks", "codes",
        "meta")
      case "knn" => Seq("lists", "meta")
      case "lsh" => Seq("buckets", "meta")
      case _ => Seq("codes", "meta") // sq8 / bin
    }
    renameTornCheck(fs, path, dataRels)
      .orElse {
        // the 1-row marker relations are the only parquet this level
        // opens: meta for the stamped families, nothing for pq/ivf
        // (their parameter relations are content, checked at deep)
        if (dataRels.contains("meta")) oneRow(spark, s"$path/meta", "meta")
        else None
      }
      .orElse {
        val missing = dataRels.filterNot(r => fs.exists(new Path(path, r)))
        if (missing.isEmpty) None
        else Some(s"missing relation dir(s) ${missing.mkString(", ")}")
      }
  }
}
