package graft

import org.apache.spark.sql.functions._
import graft.queries.SimilarityQueries
import graft.streaming.VectorIngestPipeline

/** The ANN-side ingest lifecycle: gate → admit → commit per micro-batch
  * over the persisted binary code store, with the replay-convergence
  * contract and BOTH deletion semantics pinned side by side — forget
  * (store rewrite, re-admission works) vs tombstone (cheap mask, same
  * vec_id silently never re-admits until compaction).
  */
class VectorIngestSpec extends SparkSuite {

  import spark.implicits._

  // deterministic 64-dim sign patterns: distinct seeds give distinct
  // sign vectors (the gate at radius 0 rejects only identical patterns)
  private def vec(seed: Int): Seq[Double] =
    Seq.tabulate(64)(j =>
      if ((((seed * 2654435761L) >> (j % 31)) & 1L) == 1L) 1.0 else -1.0)

  private def flipOne(seed: Int): Seq[Double] = {
    val v = vec(seed).toArray; v(0) = -v(0); v.toSeq
  }

  private def df(rows: (Long, Seq[Double])*) =
    rows.toDF("vec_id", "v")

  private def initial = df(1L -> vec(1), 2L -> vec(2), 3L -> vec(3))

  private def storedIds(path: String): Set[Long] =
    spark.read.parquet(path).select("vec_id")
      .collect().map(_.getLong(0)).toSet

  test("streaming e2e: exact sign-dups of the existing corpus are " +
    "rejected, novel vectors admitted, the grown store gates the next " +
    "batch, and a radius widens the gate to near-dups") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = tmpDir("vingest-e2e")
    val (idx, vp) = (s"$base/idx", s"$base/vec")
    VectorIngestPipeline.bootstrap(initial, idx, vp)

    val input = MemoryStream[(Long, Seq[Double])](spark)
    val q = VectorIngestPipeline.start(input.toDF().toDF("vec_id", "v"),
      idx, vp, s"$base/ckpt")
    try {
      // 10 duplicates pattern 1 -> rejected; 11 is novel -> admitted
      input.addData(10L -> vec(1), 11L -> vec(11))
      q.processAllAvailable()
      assert(storedIds(vp) == Set(1L, 2L, 3L, 11L),
        s"batch 1 admissions wrong: ${storedIds(vp)}")
      // 20 duplicates the JUST-ADMITTED 11 -> rejected against the
      // grown store; 21 novel
      input.addData(20L -> vec(11), 21L -> vec(21))
      q.processAllAvailable()
      assert(storedIds(vp) == Set(1L, 2L, 3L, 11L, 21L),
        s"batch 2 admissions wrong: ${storedIds(vp)}")
    } finally q.stop()
    assert(storedIds(s"$idx/codes") == Set(1L, 2L, 3L, 11L, 21L),
      "code store must commit exactly the admitted set")
    // loaded search sees the increments
    val hits = SimilarityQueries.binHammingSearch(
        SimilarityQueries.binLoadIndex(spark, idx),
        df(-1L -> vec(21)).select(col("vec_id").as("qid"),
          col("v").as("qv")), topR = 1)
      .collect()
    assert(hits.length == 1 && hits.head.getAs[Long]("vec_id") == 21L)

    // radius 1: a one-bit-flipped near-copy is rejected too
    VectorIngestPipeline.ingestBatch(df(30L -> flipOne(21)), idx, vp,
      radius = 1)
    assert(!storedIds(vp).contains(30L),
      "radius-1 gate must reject the one-bit near-copy")
    VectorIngestPipeline.ingestBatch(df(30L -> flipOne(21)), idx, vp,
      radius = 0)
    assert(storedIds(vp).contains(30L),
      "radius-0 gate must admit the one-bit near-copy")
  }

  test("replay convergence: a re-run committed batch is a no-op, and a " +
    "crash after the vector append but before the code commit converges") {
    val base = tmpDir("vingest-replay")
    val (idx, vp) = (s"$base/idx", s"$base/vec")
    VectorIngestPipeline.bootstrap(initial, idx, vp)
    val batch = df(10L -> vec(10), 11L -> vec(11))
    VectorIngestPipeline.ingestBatch(batch, idx, vp)
    val vecCount = spark.read.parquet(vp).count()
    val codeCount = spark.read.parquet(s"$idx/codes").count()
    // full replay
    VectorIngestPipeline.ingestBatch(batch, idx, vp)
    assert(spark.read.parquet(vp).count() == vecCount,
      "replayed batch must not duplicate vector rows")
    assert(spark.read.parquet(s"$idx/codes").count() == codeCount,
      "replayed batch must not duplicate code rows")
    // crash prefix: vector row landed (step 3), code commit (step 4)
    // did not — simulate by appending the vector row raw, then replay
    df(12L -> vec(12)).write.mode("append").parquet(vp)
    VectorIngestPipeline.ingestBatch(df(12L -> vec(12)), idx, vp)
    assert(spark.read.parquet(vp).filter(col("vec_id") === 12L).count() == 1,
      "crash-prefix replay must not duplicate the landed vector row")
    assert(storedIds(s"$idx/codes").contains(12L),
      "crash-prefix replay must finish the code commit")
  }

  test("forget rewrites the stores so a forgotten pattern RE-ADMITS; a " +
    "tombstone-only delete leaves the raw code behind and the same " +
    "vec_id silently never re-admits (the over-forgetting contrast)") {
    val base = tmpDir("vingest-forget")
    val (idx, vp) = (s"$base/idx", s"$base/vec")
    VectorIngestPipeline.bootstrap(initial, idx, vp)
    VectorIngestPipeline.ingestBatch(df(30L -> vec(30)), idx, vp)
    assert(storedIds(vp).contains(30L))

    // FORGET: both stores rewritten; a fresh copy of the same pattern
    // under a NEW id re-admits, and the SAME id re-admits too
    VectorIngestPipeline.forget(spark, Seq(30L).toDF("vec_id"), idx, vp)
    assert(!storedIds(vp).contains(30L))
    assert(!storedIds(s"$idx/codes").contains(30L),
      "forget must remove the raw code row (gate + commit marker)")
    VectorIngestPipeline.ingestBatch(df(31L -> vec(30)), idx, vp)
    assert(storedIds(vp).contains(31L),
      "a forgotten pattern's fresh copy must re-admit")
    VectorIngestPipeline.forget(spark, Seq(31L).toDF("vec_id"), idx, vp)
    VectorIngestPipeline.ingestBatch(df(30L -> vec(30)), idx, vp)
    assert(storedIds(vp).contains(30L),
      "the forgotten vec_id itself must re-admit after forget")

    // TOMBSTONE contrast: delete 30 the cheap way; search stops seeing
    // it, but its raw code row remains, so re-submitting vec_id 30 is
    // silently skipped by the commit marker and stays masked — the
    // documented compaction-needed semantics, NOT a forget
    VectorIngestPipeline.forget(spark, Seq(30L).toDF("vec_id"), idx, vp)
    VectorIngestPipeline.ingestBatch(df(30L -> vec(30)), idx, vp)
    SimilarityQueries.binDeleteVectors(Seq(30L).toDF("vec_id"), idx)
    assert(!storedIds(vp).contains(30L) ||
      SimilarityQueries.binLoadIndex(spark, idx)
        .filter(col("vec_id") === 30L).count() == 0,
      "tombstoned vector must vanish from the loaded store")
    VectorIngestPipeline.ingestBatch(df(30L -> vec(30)), idx, vp)
    assert(SimilarityQueries.binLoadIndex(spark, idx)
      .filter(col("vec_id") === 30L).count() == 0,
      "re-submission of a tombstoned vec_id must stay masked (raw-store " +
        "idempotence probe skips it) until compaction")
  }
}
