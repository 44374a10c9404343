package graft

import graft.queries.DedupQueries

/** The persisted signature-index lifecycle behind incremental dedup (the
  * production form of q82): build the MinHash signature index ONCE from the
  * corpus, probe daily increments against the stored index without ever
  * re-reading the old corpus's text, and append admitted increments so the
  * next probe sees them.
  */
class SignatureIndexSpec extends SparkSuite {

  private def oldDocs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "how vexingly quick daft zebras jump today"),
      (4L, "sphinx of black quartz judge my vow now"),
      (5L, "jackdaws love my big sphinx of quartz too")
    ).toDF("doc_id", "text")
  }

  /** doc 101 duplicates old doc 3 (identical text -> jaccard_est 1.0);
    * doc 102 is genuinely new.
    */
  private def increment = {
    import spark.implicits._
    Seq(
      (101L, "how vexingly quick daft zebras jump today"),
      (102L, "an entirely fresh document with brand new content words")
    ).toDF("doc_id", "text")
  }

  test("probe against the stored index equals the full in-memory recompute") {
    val idx = tmpDir("sigidx") + "/sig_index_store"
    DedupQueries.buildSignatureIndex(oldDocs, idx)
    val got = DedupQueries.probeSignatureIndex(spark, increment, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = DedupQueries.incrementalReject(
        DedupQueries.minhashSigs(oldDocs), DedupQueries.minhashSigs(increment))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
    assert(got == Set((101L, 3L, 1.0))) // dup rejected, fresh doc admitted
  }

  test("probe plan scans ONLY the index and the increment — the old corpus text is never re-read") {
    val dir = tmpDir("sigidx")
    val corpusPath = s"$dir/raw_corpus_docs"
    oldDocs.write.parquet(corpusPath)
    val idx = s"$dir/sig_index_store"
    DedupQueries.buildSignatureIndex(spark.read.parquet(corpusPath), idx)
    val probe = DedupQueries.probeSignatureIndex(spark, increment, idx)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("sig_index_store"),
      s"probe plan must scan the signature index:\n$plan")
    assert(!plan.contains("raw_corpus_docs"),
      s"probe plan must NOT re-scan the old corpus's documents:\n$plan")
  }

  test("bloom-pruned probe is row-identical to the plain probe, carries " +
    "the bloom predicate in its plan, and handles the empty increment") {
    val idx = tmpDir("sigidx") + "/sig_index_store"
    DedupQueries.buildSignatureIndex(oldDocs, idx)
    val pruned = DedupQueries.probeSignatureIndexPruned(spark, increment, idx)
    val plain = DedupQueries.probeSignatureIndex(spark, increment, idx)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows(pruned) == rows(plain))
    assert(rows(pruned) == Set((101L, 3L, 1.0)))
    // the prune is IN the plan, map-side on the index scan: Spark's
    // codegen'd bloom probe, not a join
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"pruned probe plan must filter the index side through the bloom:\n$plan")
    // empty increment: the empty bloom rejects every index row — zero
    // candidates, zero rejects, no failure
    val empty = increment.limit(0)
    assert(DedupQueries.probeSignatureIndexPruned(spark, empty, idx).count() == 0)
  }

  test("scoring stage probes the stored index with ZERO exchanges on the " +
    "index side (broadcast candidates), in both the plain and pruned probes") {
    val idx = tmpDir("sigidx") + "/sig_index_store"
    DedupQueries.buildSignatureIndex(oldDocs, idx)
    PlanChecks.assertStoredSideExchangeFree(
      DedupQueries.probeSignatureIndex(spark, increment, idx),
      "sig_index_store")
    PlanChecks.assertStoredSideExchangeFree(
      DedupQueries.probeSignatureIndexPruned(spark, increment, idx),
      "sig_index_store")
  }

  test("a candidate set over maxCandidates refuses loudly instead of " +
    "silently building an unbounded broadcast") {
    val idx = tmpDir("sigidx") + "/sig_index_store"
    DedupQueries.buildSignatureIndex(oldDocs, idx)
    val e = intercept[IllegalArgumentException] {
      DedupQueries.probeSignatureIndex(spark, increment, idx,
        maxCandidates = 0L)
    }
    assert(e.getMessage.contains("maxCandidates"))
  }

  test("append makes yesterday's admitted increment visible to today's probe") {
    val idx = tmpDir("sigidx") + "/sig_index_store"
    DedupQueries.buildSignatureIndex(oldDocs, idx)
    DedupQueries.appendSignatureIndex(increment, idx)
    import spark.implicits._
    val day2 = Seq(
      (201L, "an entirely fresh document with brand new content words")
    ).toDF("doc_id", "text")
    val rejects = DedupQueries.probeSignatureIndex(spark, day2, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // 201 duplicates day-1's doc 102, found ONLY via the appended index rows
    assert(rejects == Set((201L, 102L, 1.0)))
  }

  test("monolithic sync: bootstrap builds and checkpoints; one call " +
    "absorbs an append+delete window row-equal to a fresh build; no-op " +
    "when current; forget's whole-dir rewrite PRESERVES the marker") {
    import spark.implicits._
    import graft.operators.{RevisionSync, VersionedStore}
    val base = tmpDir("sigmono")
    val store = s"$base/docs"; val idx = s"$base/sig"
    def sigRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.toSeq.toList).toSet
    val r1 = VersionedStore.save(Map("docs" -> oldDocs), store)
    assert(DedupQueries.syncSignatureIndexWithStore(spark, store, "docs",
      idx) == Some((r1, r1)))
    assert(sigRows(spark.read.parquet(idx)) ==
      sigRows(DedupQueries.minhashSigs(oldDocs)))
    VersionedStore.append(Map("docs" -> increment), store)
    val r3 = VersionedStore.delete(Seq(2L).toDF("doc_id"), "docs", store)
    assert(DedupQueries.syncSignatureIndexWithStore(spark, store, "docs",
      idx) == Some((r1, r3)))
    assert(sigRows(spark.read.parquet(idx)) == sigRows(
      DedupQueries.minhashSigs(
        VersionedStore.read(spark, store, "docs", None))),
      "synced index must hold exactly the visible corpus's signatures")
    assert(DedupQueries.syncSignatureIndexWithStore(spark, store, "docs",
      idx).isEmpty, "sync against an absorbed store must be a no-op")
    // the forget verb rewrites the WHOLE relation dir; the sync marker
    // must ride across (StoreRewrite's _synced_rev preservation)
    DedupQueries.forgetSignatureIndex(spark, Seq(101L).toDF("doc_id"), idx)
    assert(RevisionSync.syncedRev(spark, idx) == Some((store, r3)),
      "a whole-dir forget rewrite must not orphan the sync checkpoint")
    // a hand-built index (no marker) refuses sync with guidance
    val hand = s"$base/hand"
    DedupQueries.buildSignatureIndex(oldDocs, hand)
    val e = intercept[IllegalArgumentException] {
      DedupQueries.syncSignatureIndexWithStore(spark, store, "docs", hand)
    }
    assert(e.getMessage.contains("_synced_rev"))
  }
}
