package graft

import org.apache.spark.sql.functions._
import graft.operators.{StoreDoctor, VersionedStore}
import graft.queries.{SearchQueries, SimilarityQueries}

/** Lake-root triage (StoreDoctor.scan): family identification by layout
  * signature, loader-backed health verdicts, and the always-completes
  * contract (a corrupted or foreign dir yields a row, not an exception).
  */
class StoreDoctorSpec extends SparkSuite {
  import spark.implicits._

  private def mkDocs(ids: Range) =
    ids.map(i => (i.toLong, s"common words doc$i body token t${i % 3}"))
      .toDF("doc_id", "text")

  test("a mixed root identifies every family, flags the corrupted store " +
    "with its loader's message, and labels foreign dirs unknown") {
    val root = tmpDir("doctor")

    // healthy text index
    val (p, d) = SearchQueries.textIndexBuild(mkDocs(1 to 10))
    SearchQueries.textIndexSave(p, d, s"$root/text_ok")

    // corrupted text index: docstats truncated AFTER save (stamp must fire)
    SearchQueries.textIndexSave(p, d, s"$root/text_bad")
    val ds = spark.read.parquet(s"$root/text_bad/docstats")
      .filter(col("doc_id") =!= 1L).localCheckpoint(true)
    graft.operators.StoreRewrite.atomicOverwrite(ds, s"$root/text_bad/docstats")

    // versioned store with one crashed append's residue: a rev-2 data
    // dir for a relation the later SUCCESSFUL rev-2 commit does not
    // reference — reader-invisible debris only vacuum reclaims, and
    // exactly what an ops scan must surface (a crashed dir ABOVE the
    // current revision is excluded as possibly in-flight, so the scan
    // counts it only once a later commit supersedes its number)
    VersionedStore.save(Map("docs" -> mkDocs(1 to 5)), s"$root/vstore")
    VersionedStore.writeDataDir(mkDocs(6 to 8), s"$root/vstore", 2L,
      "data", "scratch")
    VersionedStore.append(Map("docs" -> mkDocs(6 to 8)), s"$root/vstore")

    // binary vector index over the fixture embeddings
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
      .filter(col("vec_id") < 30)
    SimilarityQueries.binSaveIndex(SimilarityQueries.binCodes(emb),
      s"$root/bin_idx")

    // signature index and winnow index (bare parquet relations,
    // disambiguated by schema)
    graft.queries.DedupQueries.buildSignatureIndex(mkDocs(1 to 10),
      s"$root/sig_idx")
    graft.queries.DedupQueries.buildWinnowIndex(mkDocs(1 to 10),
      s"$root/win_idx")

    // sharded text root and sharded vector root (both carry router/)
    SearchQueries.textIndexSaveSharded(p, d, s"$root/text_sharded", 2)
    graft.operators.VectorIndex.buildSharded(emb, "sq8",
      s"$root/vec_sharded", 2, protocol = "rename")

    // a foreign directory
    Seq((1, "x")).toDF("a", "b").write.parquet(s"$root/misc/stuff")

    val rows = StoreDoctor.scan(spark, root).collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getBoolean(2), r.getString(3))).toMap

    assert(rows("text_ok") == (("text", true, "ok")))
    assert(rows("vstore") ==
      (("versioned", true, "ok (revisions=2, debris_dirs=1)")),
      rows("vstore").toString)
    assert(rows("bin_idx") == (("bin", true, "ok")))
    assert(rows("sig_idx") == (("signature", true, "ok")))
    val (famBad, okBad, detailBad) = rows("text_bad")
    assert(famBad == "text" && !okBad, rows("text_bad").toString)
    assert(detailBad.contains("stamp") || detailBad.contains("meta"),
      s"loader message expected, got: $detailBad")
    assert(rows("win_idx") == (("winnow", true, "ok")))
    assert(rows("text_sharded") == (("text-sharded", true, "ok")))
    assert(rows("vec_sharded") == (("vector-sharded:sq8", true, "ok")))
    val (famMisc, okMisc, _) = rows("misc")
    assert(famMisc == "unknown" && !okMisc)
    assert(rows.size == 9)
  }

  test("a CDC-synced index surfaces its revision checkpoint in the scan " +
    "detail: which corpus store it tracks and how far it has absorbed") {
    val root = tmpDir("doctor-sync")
    val store = s"$root/corpus"
    VersionedStore.save(Map("docs" -> mkDocs(1 to 10)), store)
    SearchQueries.textIndexSyncWithStore(spark, store, "docs",
      s"$root/text_synced")
    val rows = StoreDoctor.scan(spark, root).collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getBoolean(2), r.getString(3))).toMap
    val (fam, ok, detail) = rows("text_synced")
    assert(fam == "text" && ok, rows("text_synced").toString)
    assert(detail == s"ok (synced rev=1 of $store)", detail)
  }

  test("manifest-committed derived indexes identify by their relation " +
    "set, run their family's own gates, and surface revisions + debris " +
    "+ the sync checkpoint in one detail line") {
    val root = tmpDir("doctor-ver")
    val store = s"$root/corpus"
    VersionedStore.save(Map("docs" -> mkDocs(1 to 10)), store)

    // text: driven by sync so the scan shows the checkpoint too
    SearchQueries.textIndexSyncVersionedWithStore(spark, store, "docs",
      s"$root/vtext")
    graft.queries.DedupQueries.buildSignatureIndexVersioned(mkDocs(1 to 10),
      s"$root/vsig")
    graft.queries.DedupQueries.buildWinnowIndexVersioned(mkDocs(1 to 10),
      s"$root/vwin")

    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
      .filter(col("vec_id") < 30)
    val params = graft.queries.QuantQueries.sqTrain(emb).localCheckpoint(true)
    graft.queries.QuantQueries.sqSaveIndexVersioned(params,
      graft.queries.QuantQueries.sqCodes(params, emb), s"$root/vsq8")

    // corrupt sq8 twin: meta spliced to foreign arrays under the stored
    // fingerprint — the scan must run sqLoadIndexVersioned's recompute
    graft.queries.QuantQueries.sqSaveIndexVersioned(params,
      graft.queries.QuantQueries.sqCodes(params, emb), s"$root/vsq8_bad")
    val foreign = graft.queries.QuantQueries.sqTrain(
      emb.withColumn("v", expr("transform(v, x -> x * 2.0D)")))
      .localCheckpoint(true)
    val storedFp = VersionedStore.read(spark, s"$root/vsq8_bad", "meta")
      .select("fp").head().getString(0)
    VersionedStore.commitMixed(Map.empty, Map.empty,
      Map("meta" -> foreign.select(col("mn"), col("mx"),
        lit(storedFp).as("fp"), lit(64).as("dims"), lit(256).as("levels"))),
      s"$root/vsq8_bad")

    val rows = StoreDoctor.scan(spark, root).collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getBoolean(2), r.getString(3))).toMap

    assert(rows("corpus") ==
      (("versioned", true, "ok (revisions=1, debris_dirs=0)")),
      rows("corpus").toString)
    val (ft, okT, dT) = rows("vtext")
    assert(ft == "versioned:text" && okT, rows("vtext").toString)
    assert(dT == s"ok (revisions=1, debris_dirs=0, synced rev=1 of $store)",
      dT)
    assert(rows("vsig") ==
      (("versioned:signature", true, "ok (revisions=1, debris_dirs=0)")),
      rows("vsig").toString)
    assert(rows("vwin") ==
      (("versioned:winnow", true, "ok (revisions=1, debris_dirs=0)")),
      rows("vwin").toString)
    assert(rows("vsq8") ==
      (("versioned:sq8", true, "ok (revisions=1, debris_dirs=0)")),
      rows("vsq8").toString)
    val (fb, okB, dB) = rows("vsq8_bad")
    assert(fb == "versioned:sq8" && !okB, rows("vsq8_bad").toString)
    assert(dB.contains("does not match the stored parameter"), dB)
  }

  test("the r12 versioned vector families identify and gate-check: pq, " +
    "bin (disambiguated from sq8 by the meta stamp prefix), lsh, ivf, " +
    "knn (dead relation tolerated), and the five-relation composed " +
    "residual") {
    import graft.queries.{SimilarityQueries => S}
    val root = tmpDir("doctor-vver")
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
      .filter(col("vec_id") < 40)
    val index = S.pqTrain(emb)
    S.pqSaveIndexVersioned(index, S.pqCodes(index, emb), s"$root/vpq")
    S.binSaveIndexVersioned(S.binCodes(emb), s"$root/vbin")
    S.lshSaveIndexVersioned(S.lshBuckets(emb), 4, 6, s"$root/vlsh")
    val (cents, cells0) = S.ivfTrain(emb)
    val cells = cells0.localCheckpoint(true)
    S.ivfSaveIndexVersioned(cents, cells, s"$root/vivf")
    val rv = S.ivfResiduals(emb, cents, cells).select("vec_id", "v")
      .localCheckpoint(true)
    val rIndex = S.pqTrain(rv)
    S.residualSaveIndexVersioned(cents, cells, rIndex,
      S.pqCodes(rIndex, rv), s"$root/vres")
    S.knnSaveListsVersioned(S.bruteTopLists(emb, 3), 3, "brute-cos",
      s"$root/vknn")
    // a dead relation must not change the knn identification
    S.knnDeleteNodesVersioned(
      emb.filter(col("vec_id") === 0).select("vec_id"), s"$root/vknn")

    val rows = StoreDoctor.scan(spark, root).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getBoolean(2))).toMap
    assert(rows("vpq") == (("versioned:pq", true)), rows("vpq").toString)
    assert(rows("vbin") == (("versioned:bin", true)), rows("vbin").toString)
    assert(rows("vlsh") == (("versioned:lsh", true)), rows("vlsh").toString)
    assert(rows("vivf") == (("versioned:ivf", true)), rows("vivf").toString)
    assert(rows("vres") == (("versioned:residual", true)),
      rows("vres").toString)
    assert(rows("vknn") == (("versioned:knn", true)), rows("vknn").toString)
  }

  test("stamps-level scan: never opens a data relation (content splices " +
    "read healthy — the documented trade), yet flags torn renames, live " +
    "_inflight markers, and manifest-referenced dirs that are gone") {
    val root = tmpDir("doctor-stamps")
    val (p, d) = SearchQueries.textIndexBuild(mkDocs(1 to 10))

    // 1. CONTENT-corrupted text index: docstats truncated post-save.
    //    deep flags it (stamp recompute); stamps must NOT (it never
    //    opens docstats) — the proof the shallow level reads no data.
    SearchQueries.textIndexSave(p, d, s"$root/spliced")
    graft.operators.StoreRewrite.atomicOverwrite(
      spark.read.parquet(s"$root/spliced/docstats")
        .filter(col("doc_id") =!= 1L).localCheckpoint(true),
      s"$root/spliced/docstats")

    // 2. live _inflight intent marker: a mutation died mid-write —
    //    stamps flags it (deep's loader can't see intent markers)
    SearchQueries.textIndexSave(p, d, s"$root/inflight")
    new java.io.File(s"$root/inflight/_inflight").createNewFile()

    // 3. torn rename: meta fully rewritten at the tmp sibling, target
    //    deleted — the crash window StoreRewrite.recover heals
    SearchQueries.textIndexSave(p, d, s"$root/torn")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.rename(new org.apache.hadoop.fs.Path(s"$root/torn/meta"),
      new org.apache.hadoop.fs.Path(s"$root/torn/meta" +
        graft.operators.StoreRewrite.TmpSuffix))

    // 4. versioned store whose committed data dir was deleted out from
    //    under the manifest — the one corruption the protocol cannot
    //    mask; stamps flags it WITHOUT opening anything
    VersionedStore.save(Map("docs" -> mkDocs(1 to 5)), s"$root/vgone")
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$root/vgone/" + VersionedStore.referencedDirs(spark,
        s"$root/vgone").head), true)

    // 5. versioned sq8 with a SPLICED meta row (content corruption):
    //    deep's fingerprint recompute flags it; stamps reads only the
    //    1-row fp string for family dispatch and reads healthy
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
      .filter(col("vec_id") < 30)
    val params = graft.queries.QuantQueries.sqTrain(emb)
      .localCheckpoint(true)
    graft.queries.QuantQueries.sqSaveIndexVersioned(params,
      graft.queries.QuantQueries.sqCodes(params, emb), s"$root/vsq8_bad")
    val foreign = graft.queries.QuantQueries.sqTrain(
      emb.withColumn("v", expr("transform(v, x -> x * 2.0D)")))
      .localCheckpoint(true)
    val storedFp = VersionedStore.read(spark, s"$root/vsq8_bad", "meta")
      .select("fp").head().getString(0)
    VersionedStore.commitMixed(Map.empty, Map.empty,
      Map("meta" -> foreign.select(col("mn"), col("mx"),
        lit(storedFp).as("fp"), lit(64).as("dims"), lit(256).as("levels"))),
      s"$root/vsq8_bad")

    // 6. sharded signature federation whose forget died mid-loop: the
    //    live root _forget_intent is the ONLY stamps-level evidence
    //    (every shard dir reads internally consistent) — the r13-advice
    //    gap, now probed
    graft.queries.DedupQueries.buildSignatureIndexSharded(
      mkDocs(1 to 12), s"$root/fedintent", nShards = 2)
    graft.operators.StoreRewrite.atomicOverwrite(
      mkDocs(1 to 2).select("doc_id"), s"$root/fedintent/_forget_intent")

    // 7. torn POSITIONS rewrite on a monolithic text store: the
    //    optional relation's rename window flags exactly like postings'
    //    (and its absence on stores that never had positions must not)
    SearchQueries.textIndexSave(p, d, s"$root/tornpos")
    val tornPosTmp = new org.apache.hadoop.fs.Path(
      s"$root/tornpos/positions" + graft.operators.StoreRewrite.TmpSuffix)
    mkDocs(1 to 3).select(col("text").as("term"), col("doc_id"),
        lit(1).as("pos"))
      .write.parquet(tornPosTmp.toString)

    def scanMap(level: String) =
      StoreDoctor.scan(spark, root, level).collect()
        .map(r => r.getString(0) ->
          (r.getString(1), r.getBoolean(2), r.getString(3))).toMap
    val deep = scanMap("deep")
    val stamps = scanMap("stamps")

    assert(!stamps("fedintent")._2 &&
      stamps("fedintent")._3.contains("_forget_intent"),
      stamps("fedintent").toString)
    assert(!stamps("tornpos")._2 &&
      stamps("tornpos")._3.contains("positions"),
      stamps("tornpos").toString)
    // the healthy text store (scenario 1's layout, no positions ever)
    // must NOT flag on the widened relation list — absence-safety
    assert(stamps("inflight")._1 == "text", stamps("inflight").toString)

    // the shallow trade, both directions
    assert(!deep("spliced")._2, deep("spliced").toString)
    assert(stamps("spliced") == (("text", true, "ok")),
      "stamps never opened docstats: " + stamps("spliced").toString)
    assert(!deep("vsq8_bad")._2, deep("vsq8_bad").toString)
    assert(stamps("vsq8_bad")._1 == "versioned:sq8" &&
      stamps("vsq8_bad")._2, stamps("vsq8_bad").toString)

    // what stamps catches
    assert(!stamps("inflight")._2 &&
      stamps("inflight")._3.contains("_inflight"),
      stamps("inflight").toString)
    assert(!stamps("torn")._2 &&
      stamps("torn")._3.contains("StoreRewrite.recover"),
      stamps("torn").toString)
    assert(!stamps("vgone")._2 &&
      stamps("vgone")._3.contains("missing dir"),
      stamps("vgone").toString)
    // deep catches the missing dir too (its reads fail)
    assert(!deep("vgone")._2, deep("vgone").toString)
  }

  test("a lake-root __rewrite_tmp sibling triages as its own row: torn " +
    "(target gone -> unhealthy, recover named) vs stale debris (target " +
    "present -> informational)") {
    val root = tmpDir("doctor-tmp")
    // torn: a bare signature store whose rewrite died between delete
    // and rename — only the tmp sibling survives
    graft.queries.DedupQueries.buildSignatureIndex(mkDocs(1 to 10),
      s"$root/sig_torn")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.rename(new org.apache.hadoop.fs.Path(s"$root/sig_torn"),
      new org.apache.hadoop.fs.Path(s"$root/sig_torn" +
        graft.operators.StoreRewrite.TmpSuffix))
    // stale: target intact, tmp left by a crashed mid-write attempt
    graft.queries.DedupQueries.buildSignatureIndex(mkDocs(1 to 10),
      s"$root/sig_ok")
    mkDocs(1 to 3).write.parquet(s"$root/sig_ok" +
      graft.operators.StoreRewrite.TmpSuffix)
    for (level <- Seq("deep", "stamps")) {
      val rows = StoreDoctor.scan(spark, root, level).collect()
        .map(r => r.getString(0) ->
          (r.getString(1), r.getBoolean(2), r.getString(3))).toMap
      val torn = rows("sig_torn" + graft.operators.StoreRewrite.TmpSuffix)
      assert(torn._1 == "rewrite-tmp" && !torn._2 &&
        torn._3.contains("StoreRewrite.recover"), s"$level: $torn")
      val stale = rows("sig_ok" + graft.operators.StoreRewrite.TmpSuffix)
      assert(stale._1 == "rewrite-tmp" && stale._2 &&
        stale._3.contains("stale"), s"$level: $stale")
      assert(rows("sig_ok") == (("signature", true, "ok")), s"$level")
    }
  }

  test("manifest-protocol FEDERATION roots identify with the versioned: " +
    "prefix and their shard checks read through the manifests") {
    import graft.queries.{DedupQueries => D, SearchQueries => SQ}
    val root = tmpDir("doctor-vfed")
    // real documents: winnow fingerprinting needs full-length texts
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 60).select("doc_id", "text")
      .localCheckpoint(true)
    D.buildSignatureIndexShardedVersioned(docs, s"$root/sig", 2)
    D.buildWinnowIndexShardedVersioned(docs, s"$root/win", 2)
    val (p, ds) = SQ.textIndexBuild(docs)
    SQ.textIndexSaveShardedVersioned(p.localCheckpoint(true),
      ds.localCheckpoint(true), s"$root/text", 2)
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
      .filter(col("vec_id") < 60)
    graft.operators.VectorIndex.buildSharded(emb, "sq8", s"$root/vec", 2,
      protocol = "manifest")
    val rows = StoreDoctor.scan(spark, root).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getBoolean(2))).toMap
    assert(rows("sig") == (("versioned:signature-sharded", true)),
      rows("sig").toString)
    assert(rows("win") == (("versioned:winnow-sharded", true)),
      rows("win").toString)
    assert(rows("text") == (("versioned:text-sharded", true)),
      rows("text").toString)
    assert(rows("vec") == (("versioned:vector-sharded:sq8", true)),
      rows("vec").toString)
  }
}
