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
  * Family signatures (the write-side layouts of the 10+ persisted
  * families): `router/` = sharded root (text, winnow-fingerprint, or
  * vector — the router's columns disambiguate); `_versions/` = versioned
  * store; `family/` = vector-index facade (marker names the inner
  * family); `postings/`+`docstats/` = text index; `codebooks/` = PQ;
  * `cells/` = IVF; `lists/` = kNN graph; `buckets/` = LSH; `centroids/`
  * +`codes/` = residual; `codes/`+`meta/` = bin or SQ8 (meta `fp` prefix
  * disambiguates); a bare parquet dir with h0..h7 columns = signature
  * index, with (fp_pos, fp_hash) = winnow-fingerprint index.
  * Unrecognized layouts report as such rather than failing the
  * scan — triage must always complete.
  */
object StoreDoctor {

  def scan(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val kids = fs.listStatus(new Path(root)).filter(_.isDirectory)
      .map(_.getPath).toSeq
    kids.map { p =>
      val subs = fs.listStatus(p).filter(_.isDirectory)
        .map(_.getPath.getName).toSet
      val (family, err) = identify(spark, p.toString, subs)
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

  private def identify(spark: SparkSession, path: String,
      subs: Set[String]): (String, Option[String]) = {
    import graft.queries.{SearchQueries, SimilarityQueries, QuantQueries}
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
      attemptE {
        if (versioned)
          VersionedStore.read(spark, s"$path/router", "router").columns
        else spark.read.parquet(s"$path/router").columns
      } match {
        case Left(err) => ("sharded", Some(err))
        case Right(cols) if cols.contains("sig_tag") =>
          (pre + "signature-sharded", attempt {
            val n = graft.queries.DedupQueries.signatureShardCount(spark, path)
            (0 until n).foreach { i =>
              val c = shardRel(i, "sig").columns.toSet
              require(c("doc_id") && (0 until 8).forall(j => c(s"h$j")),
                s"shard $i has unexpected columns [${c.toSeq.sorted.mkString(",")}]")
            }
          })
        case Right(cols) if cols.contains("k") && cols.contains("w") =>
          (pre + "winnow-sharded", attempt {
            val (n, _, _) = graft.queries.DedupQueries.winnowShardInfo(spark, path)
            (0 until n).foreach { i =>
              val c = shardRel(i, "fp").columns.toSet
              require(c == Set("doc_id", "fp_pos", "fp_hash"),
                s"shard $i has unexpected columns [${c.toSeq.sorted.mkString(",")}]")
            }
          })
        case Right(cols) if cols.contains("tag") =>
          (pre + "text-sharded", attempt {
            val n = SearchQueries.textIndexShardCount(spark, path)
            (0 until n).foreach { i =>
              if (versioned) {
                VersionedStore.read(spark, s"$path/shard-$i", "postings")
                VersionedStore.read(spark, s"$path/shard-$i", "docstats")
              } else SearchQueries.textIndexLoad(spark, s"$path/shard-$i")
            }
          })
        case Right(_) =>
          attemptE(VectorIndex.shardInfo(spark, path)) match {
            case Left(err) => (pre + "vector-sharded", Some(err))
            case Right((n, f)) =>
              (pre + "vector-sharded:" + f,
                (0 until n).flatMap(i =>
                  familyCheck(spark, s"$path/shard-$i", f)).headOption)
          }
      }
    }
    else if (subs("_versions"))
      // manifest-committed stores: a DERIVED index is recognizable from
      // its relation set and gets its family's own verifying load (the
      // same gates its search verbs run), so a lake scan triages
      // "versioned:sq8 with a spliced meta row" as precisely as it
      // triages the rename families; anything else is a corpus store
      attemptE {
        val rels = VersionedStore.relations(spark, path).toSet
        require(rels.nonEmpty, "manifest lists no data relations")
        // the façade's 1-row family marker is metadata, not identity —
        // a façade-built versioned store triages as its family
        rels - "family"
      } match {
        case Left(e) => ("versioned", Some(e))
        case Right(rels) if rels("postings") && rels("docstats") =>
          ("versioned:text", attempt {
            rels.foreach(r => VersionedStore.read(spark, path, r))
            if (rels("champions"))
              VersionedStore.read(spark, path, "champions")
                .select("m").head.getInt(0)
          })
        case Right(rels) if rels == Set("sig") =>
          ("versioned:signature", attempt {
            val c = VersionedStore.read(spark, path, "sig").columns.toSet
            require(c("doc_id") && (0 until 8).forall(j => c(s"h$j")),
              s"sig has unexpected columns [${c.toSeq.sorted.mkString(",")}]")
          })
        case Right(rels) if rels == Set("fp", "knobs") =>
          ("versioned:winnow", attempt {
            graft.queries.DedupQueries.winnowIndexVersionedKnobs(spark, path)
            val c = VersionedStore.read(spark, path, "fp").columns.toSet
            require(c == Set("doc_id", "fp_pos", "fp_hash"),
              s"fp has unexpected columns [${c.toSeq.sorted.mkString(",")}]")
          })
        case Right(rels) if rels == Set("codes", "meta") =>
          // sq8 and bin share the relation set; the meta stamp's prefix
          // is the family tag (the rename triage's same dispatch)
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
        case Right(rels)
            if rels == Set("centroids", "cells", "codebooks", "codes",
              "meta") =>
          ("versioned:residual", attempt(
            graft.queries.SimilarityQueries
              .residualLoadIndexVersioned(spark, path)))
        case Right(rels) if rels == Set("codebooks", "codes") =>
          ("versioned:pq", attempt(
            graft.queries.SimilarityQueries
              .pqLoadIndexVersioned(spark, path)))
        case Right(rels) if rels == Set("centroids", "cells") =>
          ("versioned:ivf", attempt(
            graft.queries.SimilarityQueries
              .ivfLoadIndexVersioned(spark, path)))
        case Right(rels) if rels == Set("buckets", "meta") =>
          ("versioned:lsh", attempt(
            graft.queries.SimilarityQueries
              .lshLoadIndexVersioned(spark, path)))
        case Right(rels)
            if rels("lists") && rels("meta") &&
              (rels - "dead") == Set("lists", "meta") =>
          ("versioned:knn", attempt(
            graft.queries.SimilarityQueries
              .knnLoadListsVersioned(spark, path)))
        case Right(rels) =>
          ("versioned", attempt(
            rels.foreach(r => VersionedStore.read(spark, path, r))))
      }
    else if (subs("family"))
      attemptE(VectorIndex.family(spark, path)) match {
        case Left(err) => ("vector-facade", Some(err))
        case Right(f)  => (s"vector-facade:$f", familyCheck(spark, path, f))
      }
    else if (subs("postings") && subs("docstats"))
      ("text", attempt(SearchQueries.textIndexLoad(spark, path)))
    else if (subs("codebooks")) ("pq", familyCheck(spark, path, "pq"))
    else if (subs("cells")) ("ivf", familyCheck(spark, path, "ivf"))
    else if (subs("lists")) ("knn", familyCheck(spark, path, "knn"))
    else if (subs("buckets")) ("lsh", familyCheck(spark, path, "lsh"))
    else if (subs("centroids") && subs("codes"))
      ("residual", familyCheck(spark, path, "residual"))
    else if (subs("codes") && subs("meta")) {
      attemptE {
        val r = spark.read.parquet(s"$path/meta").select("fp").take(1)
        require(r.nonEmpty, "meta is empty"); r(0).getString(0)
      } match {
        case Left(err) => ("codes-store", Some(err))
        case Right(v) =>
          if (v.startsWith("bin:")) ("bin", familyCheck(spark, path, "bin"))
          else ("sq8", familyCheck(spark, path, "sq8"))
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
}
