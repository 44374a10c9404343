package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedStore
import graft.queries.SimilarityQueries
import graft.streaming.{VectorIngestPipeline, VersionedIngest}

/** The VECTOR ingest pipeline on the MANIFEST protocol (round 14) —
  * [[VectorIngestSpec]]'s contract re-pinned for the versioned loop:
  * streaming equals a fresh build of the final corpus, replayed batches
  * no-op on BOTH stores, a crash between the corpus commit and the
  * index sync converges on the next call, and FORGET re-admits — which
  * on this protocol specifically means the forget verb must NOT be a
  * sticky manifest tombstone (the spec pins the contrast).
  */
class VersionedVectorIngestSpec extends SparkSuite {

  import spark.implicits._

  private def vec(seed: Int): Seq[Double] =
    Seq.tabulate(64)(j =>
      if ((((seed * 2654435761L) >> (j % 31)) & 1L) == 1L) 1.0 else -1.0)

  private def flipOne(seed: Int): Seq[Double] = {
    val v = vec(seed).toArray; v(0) = -v(0); v.toSeq
  }

  private def df(rows: (Long, Seq[Double])*) =
    rows.toDF("vec_id", "v")

  private def initial = df(1L -> vec(1), 2L -> vec(2), 3L -> vec(3))

  private def corpusIds(store: String): Set[Long] =
    VersionedStore.read(spark, store, "emb").select("vec_id")
      .collect().map(_.getLong(0)).toSet

  private def codeIds(idx: String): Set[Long] =
    SimilarityQueries.binLoadIndexVersioned(spark, idx).select("vec_id")
      .collect().map(_.getLong(0)).toSet

  test("streaming e2e: the gate rejects stored sign-dups, admits novel " +
    "vectors, the synced code store gates the next batch, and the end " +
    "state equals a fresh build of the final corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = tmpDir("vvingest-e2e")
    val (store, idx) = (s"$base/emb", s"$base/idx")
    VersionedIngest.bootstrap(initial, store, rel = "emb")

    val input = MemoryStream[(Long, Seq[Double])](spark)
    val q = VectorIngestPipeline.startVersioned(
      input.toDF().toDF("vec_id", "v"), store, idx, s"$base/ckpt")
    try {
      input.addData(10L -> vec(1), 11L -> vec(11)) // 10 dups stored 1
      q.processAllAvailable()
      assert(corpusIds(store) == Set(1L, 2L, 3L, 11L),
        s"batch 1 admissions wrong: ${corpusIds(store)}")
      assert(codeIds(idx) == Set(1L, 2L, 3L, 11L),
        "the sync must land batch 1 in the code store")
      input.addData(20L -> vec(11), 21L -> vec(21)) // 20 dups FRESH 11
      q.processAllAvailable()
      assert(corpusIds(store) == Set(1L, 2L, 3L, 11L, 21L),
        s"batch 2 admissions wrong: ${corpusIds(store)}")
    } finally q.stop()
    assert(codeIds(idx) == Set(1L, 2L, 3L, 11L, 21L))

    // streaming equals batch: a from-scratch versioned build of the
    // final visible corpus holds bit-identical code rows
    val fresh = s"$base/fresh"
    SimilarityQueries.binSaveIndexVersioned(
      SimilarityQueries.binCodes(VersionedStore.read(spark, store, "emb")),
      fresh)
    val a = SimilarityQueries.binLoadIndexVersioned(spark, idx)
      .orderBy("vec_id").collect().toSeq
    val b = SimilarityQueries.binLoadIndexVersioned(spark, fresh)
      .orderBy("vec_id").collect().toSeq
    assert(a == b, "streamed code store != fresh build of final corpus")

    // radius widens the gate exactly as on the rename loop
    VectorIngestPipeline.ingestBatchVersioned(df(30L -> flipOne(21)), 100L,
      store, idx, radius = 1)
    assert(!corpusIds(store).contains(30L),
      "radius-1 gate must reject the one-bit near-copy")
    VectorIngestPipeline.ingestBatchVersioned(df(30L -> flipOne(21)), 101L,
      store, idx, radius = 0)
    assert(corpusIds(store).contains(30L),
      "radius-0 gate must admit the one-bit near-copy")
  }

  test("replay no-ops on BOTH stores; a crash between the corpus commit " +
    "and the index sync converges on the next batch") {
    val base = tmpDir("vvingest-replay")
    val (store, idx) = (s"$base/emb", s"$base/idx")
    VersionedIngest.bootstrap(initial, store, rel = "emb")
    val batch = df(10L -> vec(10), 11L -> vec(11))
    assert(VectorIngestPipeline.ingestBatchVersioned(batch, 0L, store, idx))
    val (sRev, iRev) = (VersionedStore.currentVersion(spark, store).get,
      VersionedStore.currentVersion(spark, idx).get)
    // full replay: marker skip, sync no-op — NO new revision anywhere
    assert(!VectorIngestPipeline.ingestBatchVersioned(batch, 0L, store, idx))
    assert(VersionedStore.currentVersion(spark, store).get == sRev,
      "replayed batch committed a corpus revision")
    assert(VersionedStore.currentVersion(spark, idx).get == iRev,
      "replayed batch committed an index revision")

    // crash between stores: batch 1's corpus ingest landed, its sync
    // did not (simulated by the corpus-only primitive). The NEXT batch
    // must first catch the index up — its gate then rejects a dup of
    // the UNSYNCED batch's vector — and the end state equals the
    // two-batch composition.
    VersionedIngest.ingestBatch(df(12L -> vec(12)), 1L, store, rel = "emb")
    VectorIngestPipeline.ingestBatchVersioned(
      df(13L -> vec(12), 14L -> vec(14)), 2L, store, idx)
    assert(corpusIds(store) == Set(1L, 2L, 3L, 10L, 11L, 12L, 14L),
      s"13 must be gated off the caught-up store: ${corpusIds(store)}")
    assert(codeIds(idx) == corpusIds(store),
      "the sync must have absorbed BOTH pending windows")
  }

  test("FORGET re-admits (same id and same pattern), preserves the batch " +
    "marker, wedges loudly if interrupted before the marker bump, and a " +
    "re-run heals; the sticky-tombstone contrast never re-admits") {
    val base = tmpDir("vvingest-forget")
    val (store, idx) = (s"$base/emb", s"$base/idx")
    VersionedIngest.bootstrap(initial, store, rel = "emb")
    assert(VectorIngestPipeline.ingestBatchVersioned(
      df(30L -> vec(30)), 0L, store, idx))

    VectorIngestPipeline.forgetVersioned(spark, Seq(30L).toDF("vec_id"),
      store, idx)
    assert(!corpusIds(store).contains(30L))
    assert(!codeIds(idx).contains(30L),
      "forget must remove the code row (gate + search)")
    // replay of the pre-forget batch still skips: the marker survived
    // the replaceRelation commits
    assert(!VectorIngestPipeline.ingestBatchVersioned(
      df(30L -> vec(30)), 0L, store, idx),
      "forget dropped the batch marker — replays would re-apply")
    // same pattern under a NEW id and the SAME id both re-admit
    assert(VectorIngestPipeline.ingestBatchVersioned(
      df(31L -> vec(30)), 1L, store, idx))
    assert(corpusIds(store).contains(31L), "fresh copy must re-admit")
    assert(VectorIngestPipeline.ingestBatchVersioned(
      df(30L -> vec(77)), 2L, store, idx))
    assert(corpusIds(store).contains(30L), "same id must re-admit")
    assert(codeIds(idx) == corpusIds(store))

    // the CONTRAST: a plain manifest tombstone on the corpus is sticky —
    // a re-appended same key stays invisible, which is exactly why
    // forgetVersioned is a replaceRelation, not a delete
    VersionedStore.delete(Seq(31L).toDF("vec_id"), "emb", store)
    VersionedStore.append(Map("emb" -> df(31L -> vec(31))), store)
    assert(!corpusIds(store).contains(31L),
      "sticky tombstone semantics changed — revisit forgetVersioned")

    // interrupted forget: corpus replaced, marker bump crashed. The
    // next sync refuses (window crosses a replace); re-running the
    // forget heals and the loop continues.
    VersionedStore.replaceRelation(
      VersionedStore.read(spark, store, "emb")
        .filter(col("vec_id") =!= 30L).localCheckpoint(true), "emb", store)
    intercept[Exception] {
      VectorIngestPipeline.ingestBatchVersioned(
        df(40L -> vec(40)), 3L, store, idx)
    }
    VectorIngestPipeline.forgetVersioned(spark, Seq(30L).toDF("vec_id"),
      store, idx)
    assert(VectorIngestPipeline.ingestBatchVersioned(
      df(40L -> vec(40)), 4L, store, idx))
    assert(corpusIds(store).contains(40L) && codeIds(idx) == corpusIds(store),
      "the re-run forget must unwedge the loop")
  }
}
