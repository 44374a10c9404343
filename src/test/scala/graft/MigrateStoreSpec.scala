package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.asDouble
import graft.operators.{RevisionSync, StoreRewrite, VectorIndex,
  VersionedStore}
import graft.queries.{DedupQueries, QuantQueries, SearchQueries,
  SimilarityQueries}

/** The rename→manifest MIGRATION verbs: a store built (and mutated)
  * under the rename protocol moves to the manifest-committed form as an
  * O(index) copy — read through the family's verifying loader, pending
  * tombstones applied, one commit PUT — and every downstream verb must
  * be unable to tell the migrated store from (a) the rename original
  * and (b) a fresh versioned build of the same visible content. Torn
  * and in-flight sources refuse; CDC sync checkpoints carry across so a
  * synced index keeps syncing.
  */
class MigrateStoreSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def docs = Tables(spark, dir, "documents")
    .select("doc_id", "text")

  private def emb = Tables(spark, dir, "embeddings")
    .select(col("vec_id"), asDouble(col("embedding")).as("v"))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  // ------------------------------------------------------------ signature

  test("signature: the migrated store's probe is bit-equal to the rename " +
    "original's AND to a fresh versioned build's; the sig relation is " +
    "content-identical") {
    val base = tmpDir("mig-sig")
    val old = docs.filter(col("doc_id") % 5 =!= 0)
    val inc = docs.filter(col("doc_id") % 5 === 0).limit(20)
      .localCheckpoint(true)
    DedupQueries.buildSignatureIndex(old, s"$base/ren")
    val rev = DedupQueries.migrateSignatureIndexToVersioned(spark,
      s"$base/ren", s"$base/ver")
    assert(rev == 1L, "migration commits exactly one revision")
    DedupQueries.buildSignatureIndexVersioned(old, s"$base/fresh")
    assert(rows(VersionedStore.read(spark, s"$base/ver", "sig")) ==
      rows(spark.read.parquet(s"$base/ren")),
      "migrated sig relation == rename store content")
    assert(rows(VersionedStore.read(spark, s"$base/ver", "sig")) ==
      rows(VersionedStore.read(spark, s"$base/fresh", "sig")),
      "migrated sig relation == fresh versioned build")
    val renProbe = rows(DedupQueries.probeSignatureIndex(spark, inc,
      s"$base/ren"))
    assert(rows(DedupQueries.probeSignatureIndexVersioned(spark, inc,
      s"$base/ver")) == renProbe,
      "migrated probe == rename probe")
    // the migrated store joins the versioned lifecycle: append + forget
    DedupQueries.appendSignatureIndexVersioned(inc.limit(5), s"$base/ver")
    DedupQueries.forgetSignatureIndexVersioned(spark,
      old.limit(3).select("doc_id"), s"$base/ver")
    assert(VersionedStore.currentVersion(spark, s"$base/ver")
      .contains(3L))
  }

  test("signature: a torn rename source refuses with recover guidance; " +
    "an occupied target refuses; a foreign layout refuses") {
    val base = tmpDir("mig-sig-refuse")
    val old = docs.limit(30).localCheckpoint(true)
    // torn: complete store at the tmp sibling, target gone
    DedupQueries.buildSignatureIndex(old, s"$base/torn")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.rename(new org.apache.hadoop.fs.Path(s"$base/torn"),
      new org.apache.hadoop.fs.Path(
        s"$base/torn" + StoreRewrite.TmpSuffix))
    val e1 = intercept[IllegalArgumentException] {
      DedupQueries.migrateSignatureIndexToVersioned(spark, s"$base/torn",
        s"$base/t1")
    }
    assert(e1.getMessage.contains("StoreRewrite.recover"))
    // occupied target
    DedupQueries.buildSignatureIndex(old, s"$base/ok")
    VersionedStore.save(Map("sig" -> old.limit(1)), s"$base/occupied")
    val e2 = intercept[IllegalArgumentException] {
      DedupQueries.migrateSignatureIndexToVersioned(spark, s"$base/ok",
        s"$base/occupied")
    }
    assert(e2.getMessage.contains("second lineage"))
    // foreign layout (a docs relation is not a signature index)
    old.write.parquet(s"$base/foreign")
    val e3 = intercept[IllegalArgumentException] {
      DedupQueries.migrateSignatureIndexToVersioned(spark, s"$base/foreign",
        s"$base/t3")
    }
    assert(e3.getMessage.contains("not a signature index"))
  }

  test("signature: a CDC-synced rename index migrates its checkpoint and " +
    "keeps syncing from the same corpus store; a bootstrap sentinel " +
    "refuses") {
    val base = tmpDir("mig-sig-sync")
    val store = s"$base/corpus"
    val boot = docs.filter(col("doc_id") % 3 =!= 0)
    VersionedStore.save(Map("docs" -> boot), store)
    DedupQueries.syncSignatureIndexWithStore(spark, store, "docs",
      s"$base/ren")
    DedupQueries.migrateSignatureIndexToVersioned(spark, s"$base/ren",
      s"$base/ver")
    assert(RevisionSync.syncedRev(spark, s"$base/ver") ==
      Some((store, 1L)), "the sync checkpoint migrated verbatim")
    // the corpus moves on; the MIGRATED index absorbs the window via
    // the versioned family's own sync verb
    VersionedStore.append(
      Map("docs" -> docs.filter(col("doc_id") % 3 === 0)), store)
    assert(DedupQueries.syncSignatureIndexVersionedWithStore(spark, store,
      "docs", s"$base/ver").contains((1L, 2L)))
    DedupQueries.buildSignatureIndexVersioned(
      VersionedStore.read(spark, store, "docs"), s"$base/fresh")
    assert(rows(VersionedStore.read(spark, s"$base/ver", "sig")) ==
      rows(VersionedStore.read(spark, s"$base/fresh", "sig")),
      "post-migration sync == fresh build of the store's current content")
    // sentinel refusal
    DedupQueries.buildSignatureIndex(boot, s"$base/sent")
    RevisionSync.setSyncedRev(spark, s"$base/sent", store, -1L)
    val e = intercept[IllegalArgumentException] {
      DedupQueries.migrateSignatureIndexToVersioned(spark, s"$base/sent",
        s"$base/t")
    }
    assert(e.getMessage.contains("bootstrap sentinel"))
  }

  // ----------------------------------------------------------------- text

  test("text: after a full rename lifecycle (save, append, tombstone " +
    "delete, champions, positions) the migrated store's BM25 / champion " +
    "/ phrase searches are bit-equal to the rename original's") {
    val base = tmpDir("mig-text")
    val old = docs.filter(col("doc_id") % 5 =!= 0).localCheckpoint(true)
    val inc = docs.filter(col("doc_id") % 5 === 0).limit(20)
      .localCheckpoint(true)
    val (p, ds) = SearchQueries.textIndexBuild(old)
    SearchQueries.textIndexSave(p, ds, s"$base/ren",
      Some(SearchQueries.positionalPostings(old)))
    SearchQueries.textIndexAppend(inc, s"$base/ren")
    SearchQueries.textIndexChampionsSave(spark, s"$base/ren", m = 10)
    SearchQueries.textIndexDelete(
      old.filter(col("doc_id") % 7 === 1).select("doc_id"), s"$base/ren")
    val rev = SearchQueries.migrateTextIndexToVersioned(spark,
      s"$base/ren", s"$base/ver")
    assert(rev == 1L)
    assert(rows(SearchQueries.textIndexSearchVersioned(spark, s"$base/ver")) ==
      rows(SearchQueries.textIndexSearch(spark, s"$base/ren")),
      "BM25 search identical across the migration")
    assert(rows(SearchQueries.textIndexChampionSearchVersioned(spark,
        s"$base/ver", m = 10)) ==
      rows(SearchQueries.textIndexChampionSearch(spark, s"$base/ren",
        m = 10)),
      "champion search identical (stored heads migrated masked)")
    val phrase = Seq("the", "quick")
    assert(rows(SearchQueries.textIndexPhraseSearchVersioned(spark,
        s"$base/ver", phrase)) ==
      rows(SearchQueries.textIndexPhraseSearch(spark, s"$base/ren", phrase)),
      "phrase search identical (positions migrated)")
    // an in-flight source refuses
    new java.io.File(s"$base/ren/_inflight").createNewFile()
    val e = intercept[IllegalArgumentException] {
      SearchQueries.migrateTextIndexToVersioned(spark, s"$base/ren",
        s"$base/t")
    }
    assert(e.getMessage.contains("_inflight"))
  }

  // --------------------------------------------------------------- façade

  test("façade: every family migrates — revision 1 carries data AND the " +
    "family marker, searches are bit-equal to the rename original, and " +
    "the migrated store joins the routed versioned lifecycle") {
    val base = tmpDir("mig-fac")
    val boot = emb.filter(col("vec_id") % 4 =!= 3)
    val inc = emb.filter(col("vec_id") % 4 === 3)
    val doomed = emb.filter(col("vec_id") % 8 === 1).select("vec_id")
      .localCheckpoint(true)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    for (fam <- Seq("sq8", "pq", "bin", "lsh", "ivf", "residual")) {
      val ren = s"$base/$fam-ren"; val ver = s"$base/$fam-ver"
      VectorIndex.build(boot, fam, ren, protocol = "rename")
      VectorIndex.append(inc, ren)
      VectorIndex.delete(doomed, ren)
      val rev = VectorIndex.migrateToVersioned(spark, ren, ver)
      assert(rev == 1L, s"$fam: data + marker in ONE revision")
      assert(VectorIndex.family(spark, ver) == fam)
      assert(rows(VectorIndex.search(emb, queries, ver, k = 5)) ==
        rows(VectorIndex.search(emb, queries, ren, k = 5)),
        s"$fam: migrated search == rename search")
      // routed lifecycle continues on the migrated store
      VectorIndex.delete(emb.filter(col("vec_id") % 8 === 2)
        .select("vec_id"), ver)
      assert(VersionedStore.currentVersion(spark, ver).contains(2L),
        s"$fam: the migrated store mutates by manifest commits")
    }
  }

  // --------------------------------------------------------------- winnow

  test("winnow: the migrated store's probe (knobs recorded at migrate " +
    "time) is bit-equal to the rename probe and a fresh versioned build") {
    val base = tmpDir("mig-win")
    val old = docs.filter(col("doc_id") % 5 =!= 0).localCheckpoint(true)
    val inc = docs.filter(col("doc_id") % 5 === 0).limit(20)
      .localCheckpoint(true)
    DedupQueries.buildWinnowIndex(old, s"$base/ren", k = 4, w = 5)
    assert(DedupQueries.migrateWinnowIndexToVersioned(spark, s"$base/ren",
      s"$base/ver", k = 4, w = 5) == 1L)
    DedupQueries.buildWinnowIndexVersioned(old, s"$base/fresh", 4, 5)
    assert(rows(VersionedStore.read(spark, s"$base/ver", "fp")) ==
      rows(VersionedStore.read(spark, s"$base/fresh", "fp")))
    assert(DedupQueries.winnowIndexVersionedKnobs(spark, s"$base/ver") ==
      ((4, 5)), "the declared knobs are recorded")
    assert(rows(DedupQueries.probeWinnowIndexVersioned(spark, inc,
        s"$base/ver", minShared = 1)) ==
      rows(DedupQueries.probeWinnowIndex(spark, inc, s"$base/ren",
        k = 4, w = 5, minShared = 1)),
      "migrated probe == rename probe")
  }

  // ---------------------------------------------------------- federations

  test("sharded signature: the migrated federation probes bit-equal to " +
    "the rename federation; a crash mid-migration (no router) re-runs " +
    "to completion; a live _forget_intent refuses") {
    val base = tmpDir("mig-sigsh")
    val old = docs.filter(col("doc_id") % 5 =!= 0).localCheckpoint(true)
    val inc = docs.filter(col("doc_id") % 5 === 0).limit(20)
      .localCheckpoint(true)
    DedupQueries.buildSignatureIndexSharded(old, s"$base/ren", 3)
    // crash simulation: one shard migrated, then death — the target has
    // no router, so every versioned verb refuses and a re-run completes
    DedupQueries.migrateSignatureIndexToVersioned(spark,
      s"$base/ren/shard-0", s"$base/ver/shard-0")
    intercept[IllegalArgumentException] {
      DedupQueries.probeSignatureIndexShardedVersioned(spark, inc,
        s"$base/ver")
    }
    DedupQueries.migrateSignatureIndexShardedToVersioned(spark,
      s"$base/ren", s"$base/ver")
    assert(rows(DedupQueries.probeSignatureIndexShardedVersioned(spark,
        inc, s"$base/ver")) ==
      rows(DedupQueries.probeSignatureIndexSharded(spark, inc,
        s"$base/ren")),
      "migrated federated probe == rename federated probe")
    // intent refusal
    new java.io.File(s"$base/ren/_forget_intent").mkdirs()
    val e = intercept[IllegalArgumentException] {
      DedupQueries.migrateSignatureIndexShardedToVersioned(spark,
        s"$base/ren", s"$base/t")
    }
    assert(e.getMessage.contains("recoverSignatureIndexSharded"))
  }

  test("sharded winnow and sharded text federations migrate: probes and " +
    "searches (BM25 + root champions) bit-equal to the rename " +
    "federations") {
    val base = tmpDir("mig-fedsh")
    val old = docs.filter(col("doc_id") % 5 =!= 0).localCheckpoint(true)
    val inc = docs.filter(col("doc_id") % 5 === 0).limit(20)
      .localCheckpoint(true)
    // winnow
    DedupQueries.buildWinnowIndexSharded(old, s"$base/wren", 3, k = 4,
      w = 5)
    DedupQueries.migrateWinnowIndexShardedToVersioned(spark,
      s"$base/wren", s"$base/wver")
    assert(rows(DedupQueries.probeWinnowIndexShardedVersioned(spark, inc,
        s"$base/wver", minShared = 1)) ==
      rows(DedupQueries.probeWinnowIndexSharded(spark, inc, s"$base/wren",
        minShared = 1)),
      "migrated winnow federation == rename federation")
    // text, with root champions and a forget so tombstones are live
    val (p, ds) = SearchQueries.textIndexBuild(old)
    SearchQueries.textIndexSaveSharded(p, ds, s"$base/tren", 3)
    SearchQueries.textIndexChampionsSaveSharded(spark, s"$base/tren",
      m = 10)
    SearchQueries.textIndexDeleteSharded(
      old.filter(col("doc_id") % 7 === 1).select("doc_id"), s"$base/tren")
    SearchQueries.migrateTextIndexShardedToVersioned(spark, s"$base/tren",
      s"$base/tver")
    assert(rows(SearchQueries.textIndexSearchShardedVersioned(spark,
        s"$base/tver")) ==
      rows(SearchQueries.textIndexSearchSharded(spark, s"$base/tren")),
      "migrated federated BM25 == rename federated BM25")
    assert(rows(SearchQueries.textIndexChampionSearchShardedVersioned(
        spark, s"$base/tver", m = 10)) ==
      rows(SearchQueries.textIndexChampionSearchSharded(spark,
        s"$base/tren", m = 10)),
      "migrated root-champion search == rename root-champion search")
  }

  test("sharded vector federation migrates: per-shard marker + data in " +
    "one PUT each, router versioned, federated search bit-equal") {
    val base = tmpDir("mig-vecsh")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    VectorIndex.buildSharded(emb, "sq8", s"$base/ren", 3, protocol = "rename")
    VectorIndex.deleteSharded(
      emb.filter(col("vec_id") % 8 === 1).select("vec_id"), s"$base/ren")
    VectorIndex.migrateShardedToVersioned(spark, s"$base/ren",
      s"$base/ver")
    assert(VersionedStore.currentVersion(spark, s"$base/ver/router")
      .contains(1L), "the router is a versioned store")
    (0 until 3).foreach { i =>
      assert(VersionedStore.currentVersion(spark, s"$base/ver/shard-$i")
        .contains(1L), s"shard $i: data + marker in one PUT")
      assert(VectorIndex.family(spark, s"$base/ver/shard-$i") == "sq8")
    }
    assert(rows(VectorIndex.searchSharded(queries, s"$base/ver", k = 5)) ==
      rows(VectorIndex.searchSharded(queries, s"$base/ren", k = 5)),
      "migrated federated search == rename federated search")
  }

  test("façade: knn lists migrate (marker + masked lists); a raw-verb " +
    "store migrates under a declared family; a declared mismatch refuses") {
    val base = tmpDir("mig-knn")
    val e100 = emb.filter(col("vec_id") < 100).localCheckpoint(true)
    VectorIndex.build(e100, "knn", s"$base/ren", protocol = "rename")
    VectorIndex.delete(e100.filter(col("vec_id") === 0).select("vec_id"),
      s"$base/ren")
    assert(VectorIndex.migrateToVersioned(spark, s"$base/ren",
      s"$base/ver") == 1L)
    val (lists, k) = SimilarityQueries.knnLoadListsVersioned(spark,
      s"$base/ver")
    val (listsR, kR) = SimilarityQueries.knnLoadLists(spark, s"$base/ren")
    // the rename loader's tombstone anti-join reorders columns; compare
    // content, not layout
    val cols = Seq("aid", "bid", "sim", "rn")
    assert(k == kR && rows(lists.select(cols.map(col): _*)) ==
        rows(listsR.select(cols.map(col): _*)),
      "migrated lists == rename store's masked lists")
    // raw-verb store (no façade marker): declared family routes it
    val params = QuantQueries.sqTrain(e100).localCheckpoint(true)
    QuantQueries.sqSaveIndex(params, QuantQueries.sqCodes(params, e100),
      s"$base/raw")
    assert(VectorIndex.migrateToVersioned(spark, s"$base/raw",
      s"$base/rawver", declared = Some("sq8")) == 1L)
    assert(VectorIndex.family(spark, s"$base/rawver") == "sq8",
      "the migrated store gains the façade marker")
    // declared vs marker mismatch refuses
    val ex = intercept[IllegalArgumentException] {
      VectorIndex.migrateToVersioned(spark, s"$base/ren", s"$base/t",
        declared = Some("sq8"))
    }
    assert(ex.getMessage.contains("'knn'"))
  }

  // ------------------------------------------- randomized round-trip (r14)

  /** The interleaving production migrations actually look like: a
    * random RENAME-protocol lifecycle prefix (appends + physical
    * forgets), migration at an arbitrary point, then a random VERSIONED
    * lifecycle suffix (appends, sticky tombstones, re-appends of
    * tombstoned ids, compacts) — with the probe pinned after EVERY
    * post-migration verb against a reference versioned store built
    * fresh from the migration-point corpus and driven by the identical
    * suffix. The straight-line bit-equality tests above pin one point
    * of this space; this pins 3 seeded paths through it.
    *
    * The prefix deliberately never RE-appends a forgotten id: the two
    * protocols' forget semantics differ exactly there (rename forget is
    * physical — re-admission works; the manifest tombstone is sticky
    * until compact), so a cross-protocol equality over re-append
    * prefixes would be pinning a contract that intentionally does not
    * hold. Post-migration both sides are versioned and every verb —
    * including re-append-tombstoned — must agree.
    */
  test("randomized rename-lifecycle -> migrate -> versioned-lifecycle: " +
    "the migrated store probes identically to a fresh versioned twin " +
    "driven by the same verb suffix, after every verb") {
    def textOf(id: Long): String =
      (0 until 12).map(j => s"tok${(id * 7 + j * 3) % 11}").mkString(" ") +
        s" doc$id common trailing words shared by every document"
    def mkDocs(ids: Seq[Long]) =
      ids.distinct.sorted.map(i => (i, textOf(i))).toDF("doc_id", "text")
    val probeDocs = mkDocs(900L to 905L).localCheckpoint(true)

    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(471100L + seed)
      val base = tmpDir(s"mig-rt$seed")
      val (ren, ver, ref) = (s"$base/ren", s"$base/ver", s"$base/ref")
      var live = (0L to 5L).toSet // rename store: physical membership
      var nextId = 100L
      DedupQueries.buildSignatureIndex(mkDocs(live.toSeq), ren)

      // rename prefix: appends + physical forgets, no re-appends
      (0 until rnd.nextInt(5)).foreach { _ =>
        if (rnd.nextBoolean() || live.size <= 2) {
          val ids = (0 until 1 + rnd.nextInt(3)).map(i => nextId + i)
          nextId += ids.size
          DedupQueries.appendSignatureIndex(mkDocs(ids), ren)
          live ++= ids
        } else {
          val id = live.toSeq.sorted.apply(rnd.nextInt(live.size))
          DedupQueries.forgetSignatureIndex(spark,
            Seq(id).toDF("doc_id"), ren)
          live -= id
        }
      }

      DedupQueries.migrateSignatureIndexToVersioned(spark, ren, ver)
      DedupQueries.buildSignatureIndexVersioned(mkDocs(live.toSeq), ref)

      // versioned suffix, driven against BOTH stores verbatim
      var tombs = Set.empty[Long]
      (1 to 8).foreach { step =>
        rnd.nextInt(5) match {
          case 0 | 1 =>
            val ids = (0 until 1 + rnd.nextInt(3)).map(i => nextId + i)
            nextId += ids.size
            Seq(ver, ref).foreach(p =>
              DedupQueries.appendSignatureIndexVersioned(mkDocs(ids), p))
            live ++= ids
          case 2 =>
            val pool = live.toSeq.sorted :+ (nextId + 500)
            val id = pool(rnd.nextInt(pool.size))
            Seq(ver, ref).foreach(p =>
              DedupQueries.forgetSignatureIndexVersioned(spark,
                Seq(id).toDF("doc_id"), p))
            tombs += id
          case 3 => // re-append a tombstoned id: masked on BOTH sides
            if (tombs.nonEmpty) {
              val id = tombs.toSeq.sorted.head
              Seq(ver, ref).foreach(p =>
                DedupQueries.appendSignatureIndexVersioned(
                  mkDocs(Seq(id)), p))
              live += id
            }
          case 4 =>
            Seq(ver, ref).foreach(p => VersionedStore.compact(spark, p))
            live --= tombs
            tombs = Set.empty
        }
        assert(rows(VersionedStore.read(spark, ver, "sig")) ==
          rows(VersionedStore.read(spark, ref, "sig")),
          s"seed=$seed step=$step: migrated sig relation diverged")
        assert(rows(DedupQueries.probeSignatureIndexVersioned(spark,
            probeDocs, ver)) ==
          rows(DedupQueries.probeSignatureIndexVersioned(spark,
            probeDocs, ref)),
          s"seed=$seed step=$step: migrated probe diverged")
      }
    }
  }
}
