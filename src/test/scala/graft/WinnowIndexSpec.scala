package graft

import org.apache.spark.sql.functions._
import graft.queries.DedupQueries.{buildWinnowIndex, probeWinnowIndex,
  appendWinnowIndex}

/** Persisted winnow-fingerprint index (q187): probe detection, the
  * stored-side df-cap, the append lifecycle, and the store discipline's
  * core claim — the probe never re-reads the old corpus.
  */
class WinnowIndexSpec extends SparkSuite {
  import spark.implicits._

  private val shared = "alpha beta gamma delta epsilon zeta eta theta"

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("probe detects a stored verbatim overlap, ignores fresh content, " +
    "and its only file scan is the index — never the old corpus") {
    val path = tmpDir("winx") + "/fp"
    buildWinnowIndex(docs(
      1L -> s"one two three $shared four five six",
      2L -> "totally different stored content goes here now ok fine"), path)
    val inc = docs(
      10L -> s"aa bb cc $shared dd",
      11L -> "brand new unrelated words nothing shared at all here")
    val probe = probeWinnowIndex(spark, inc, path, minShared = 1)
    val rows = probe.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((10L, 1L)), rows.toString)
    val files = probe.inputFiles.mkString("\n")
    assert(files.nonEmpty && files.linesIterator.forall(_.contains("/fp")),
      s"probe must scan ONLY the index:\n$files")
  }

  test("append makes the admitted increment visible to the NEXT probe, " +
    "and the stored-side df-cap silences a boilerplate fingerprint") {
    val path = tmpDir("winx2") + "/fp"
    buildWinnowIndex(docs(1L -> s"one two three $shared four five six"), path)
    appendWinnowIndex(docs(2L -> s"stored later but contains $shared too"), path)
    val inc = docs(10L -> s"probe doc with $shared inside")
    val got = probeWinnowIndex(spark, inc, path, minShared = 1)
      .select("old_doc").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L), got.toString)
    // with dfCap = 1 the shared fingerprint (df = 2 in the store) drops
    val capped = probeWinnowIndex(spark, inc, path, dfCap = 1, minShared = 1)
    assert(capped.count() == 0)
  }

  test("the bloom-pruned probe is row-identical to the unpruned one — " +
    "including the df-cap decisions, which are computed POST-prune yet " +
    "stay exact because the bloom predicate is a function of fp_hash " +
    "alone (hash groups survive or die whole) — and the bloom predicate " +
    "sits in the probe plan as a map-side filter") {
    import graft.queries.DedupQueries.probeWinnowIndex
    val path = tmpDir("winp") + "/fp"
    // doc 1 and 2 both carry the shared span -> its fingerprints have
    // stored df = 2; with dfCap = 1 they must be capped identically in
    // the pruned and unpruned paths (the increment DOES carry them, so
    // their groups survive the bloom and the post-prune df is exact)
    buildWinnowIndex(docs(
      1L -> s"one two three $shared four five six",
      2L -> s"stored sibling also contains $shared today",
      3L -> "completely unrelated stored content nothing shared here at all"),
      path)
    val inc = docs(
      10L -> s"aa bb cc $shared dd",
      11L -> "fresh words that match nothing stored anywhere at all today")
    for (cap <- Seq(1, 300); ms <- Seq(1, 2)) {
      val pruned = probeWinnowIndex(spark, inc, path, dfCap = cap,
        minShared = ms).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val plain = probeWinnowIndex(spark, inc, path, dfCap = cap,
        minShared = ms, prune = false).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(pruned == plain, s"dfCap=$cap minShared=$ms: $pruned != $plain")
    }
    val plan = probeWinnowIndex(spark, inc, path, minShared = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"the bloom predicate must prune the stored side map-side:\n$plan")
    assert(!probeWinnowIndex(spark, inc, path, minShared = 1, prune = false)
      .queryExecution.executedPlan.toString.contains("might_contain"))
  }

  test("compact heals a doubled append's duplicate rows ON DISK, keeps " +
    "content identity (probe unchanged), and a rewrite crashed inside " +
    "the rename window recovers") {
    import graft.queries.DedupQueries.compactWinnowIndex
    val path = tmpDir("winc") + "/fp"
    buildWinnowIndex(docs(
      1L -> s"one two three $shared four five six",
      2L -> "other stored content with its own vocabulary here now"), path)
    appendWinnowIndex(docs(3L -> s"re-stored $shared holder"), path)
    appendWinnowIndex(docs(3L -> s"re-stored $shared holder"), path) // replay
    val before = spark.read.parquet(path).distinct().collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val rowsBefore = spark.read.parquet(path).count()
    assert(rowsBefore > before.size, "the replay should have doubled rows")
    val inc = docs(10L -> s"probe doc with $shared inside")
    val probeBefore = probeWinnowIndex(spark, inc, path, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    compactWinnowIndex(spark, path)
    assert(spark.read.parquet(path).count() == before.size,
      "compact must fold the doubled rows away")
    assert(spark.read.parquet(path).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet == before)
    assert(probeWinnowIndex(spark, inc, path, minShared = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet == probeBefore)
    // crash inside the rename window: target gone, complete tmp present —
    // the next verb's recover finishes the rename
    val f = new java.io.File(path)
    val tmp = new java.io.File(path + graft.operators.StoreRewrite.TmpSuffix)
    assert(f.renameTo(tmp))
    compactWinnowIndex(spark, path) // recover() inside completes, then folds
    assert(probeWinnowIndex(spark, inc, path, minShared = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet == probeBefore)
  }

  test("forget physically removes the ids (a re-submitted copy probes " +
    "clean), and a replayed append's doubled rows change nothing") {
    import graft.queries.DedupQueries.forgetWinnowIndex
    val path = tmpDir("winx3") + "/fp"
    buildWinnowIndex(docs(
      1L -> s"one two three $shared four five six",
      2L -> "other stored content with its own vocabulary here now"), path)
    val inc = docs(10L -> s"probe doc with $shared inside")
    assert(probeWinnowIndex(spark, inc, path, minShared = 1).count() == 1)
    forgetWinnowIndex(spark, Seq(1L).toDF("doc_id"), path)
    assert(probeWinnowIndex(spark, inc, path, minShared = 1).count() == 0,
      "a fully forgotten document must not reject its fresh copy")
    // replayed append: rows double on disk, probe results do not
    appendWinnowIndex(docs(3L -> s"re-stored $shared holder"), path)
    appendWinnowIndex(docs(3L -> s"re-stored $shared holder"), path)
    val again = probeWinnowIndex(spark, inc, path, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == Seq((10L, 3L, 1L)), again.toSeq.toString)
    // whole-corpus forget refuses (the family rule), store untouched
    intercept[IllegalArgumentException] {
      forgetWinnowIndex(spark, Seq(2L, 3L).toDF("doc_id"), path)
    }
    assert(probeWinnowIndex(spark, inc, path, minShared = 1).count() == 1)
  }

  test("monolithic sync: bootstrap builds and checkpoints; one call " +
    "absorbs an append+delete window with probe results equal to a " +
    "fresh build of read(toRev); no-op when current; compact's whole-dir " +
    "rewrite preserves the marker") {
    import graft.operators.{RevisionSync, VersionedStore}
    import graft.queries.DedupQueries.{compactWinnowIndex, syncWinnowIndexWithStore}
    val base = tmpDir("winmono")
    val store = s"$base/docs"; val idx = s"$base/fp"
    val corpus = docs(
      1L -> s"one two three $shared four five six",
      2L -> "totally different stored content goes here now ok fine")
    val r1 = VersionedStore.save(Map("docs" -> corpus), store)
    assert(syncWinnowIndexWithStore(spark, store, "docs", idx)
      == Some((r1, r1)))
    val inc = docs(10L -> s"probe doc with $shared inside")
    assert(probeWinnowIndex(spark, inc, idx, minShared = 1)
      .select("old_doc").collect().map(_.getLong(0)).toSet == Set(1L))
    // window: append a second shared-span holder, delete the original
    VersionedStore.append(
      Map("docs" -> docs(3L -> s"late arrival carrying $shared too")), store)
    val r3 = VersionedStore.delete(
      { import spark.implicits._; Seq(1L).toDF("doc_id") }, "docs", store)
    assert(syncWinnowIndexWithStore(spark, store, "docs", idx)
      == Some((r1, r3)))
    assert(probeWinnowIndex(spark, inc, idx, minShared = 1)
      .select("old_doc").collect().map(_.getLong(0)).toSet == Set(3L),
      "after the window the forgotten doc must not match; the appended one must")
    // probe-equality with a fresh build of the visible corpus
    val fresh = s"$base/fresh"
    buildWinnowIndex(VersionedStore.read(spark, store, "docs", None), fresh)
    assert(probeWinnowIndex(spark, inc, idx, minShared = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      == probeWinnowIndex(spark, inc, fresh, minShared = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
    assert(syncWinnowIndexWithStore(spark, store, "docs", idx).isEmpty,
      "sync against an absorbed store must be a no-op")
    compactWinnowIndex(spark, idx)
    assert(RevisionSync.syncedRev(spark, idx) == Some((store, r3)),
      "a whole-dir compact rewrite must not orphan the sync checkpoint")
  }
}
