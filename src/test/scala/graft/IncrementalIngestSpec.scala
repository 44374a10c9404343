package graft

import org.apache.spark.sql.functions._
import graft.queries.DedupQueries
import graft.streaming.IngestPipeline

/** The streaming incremental-ingest composite: probe → admit → label
  * merge → index commit per micro-batch, with the replay-convergence
  * contract exercised directly — a re-run batch and a crash between the
  * label merge and the index commit must both land on the same state as
  * a clean run.
  */
class IncrementalIngestSpec extends SparkSuite {

  import spark.implicits._

  // engineered texts (verified against the signature scheme): the bridge
  // shares a band bucket with A AND with B (so it MERGES their clusters)
  // while its MinHash jaccard estimate stays BELOW the 0.5 rejection bar
  // against both (0.25 vs A, 0.375 vs B) — a weak bridge that the probe
  // admits but the cluster merge must still connect. A/B share no bands.
  private val tA = "tok63 tok175 tok71 tok278 tok66 tok65 tok180 tok5 " +
    "tok32 tok97 tok281 tok137"
  private val tB = "tok6 tok155 tok149 tok95 tok257 tok222 tok12 tok181 " +
    "tok210 tok190 tok224 tok172"
  private val tBridge = "tok63 tok175 tok71 tok278 tok66 tok65 tok180 " +
    "tok5 tok217 tok72 tok251 tok276 tok8 tok191 tok243 tok48 tok106 " +
    "tok114 tok6 tok155 tok149 tok95 tok257 tok222 tok12 tok181 tok210"
  private val tD = "delta epsilon zeta eta theta iota kappa"
  private val tC = "unique solitary text with no relatives anywhere here"
  private val tE = "wholly fresh prose sharing nothing with any corpus member"

  private def initial = Seq((1L, tA), (2L, tA), (3L, tB), (4L, tB), (5L, tD))
    .toDF("doc_id", "text")

  private def labelsOf(path: String): Map[Long, Long] =
    spark.read.parquet(path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap

  private def fullLabels(docs: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    DedupQueries.connectedComponents(DedupQueries.lshBucketStars(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("streaming ingest end-to-end: rejects near-dups of the existing " +
    "corpus, admits and labels the rest, and the label map tracks the " +
    "full recompute across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = tmpDir("ingest-e2e")
    val (idx, lab, adm) = (s"$base/idx", s"$base/lab", s"$base/adm")
    IngestPipeline.bootstrap(initial, idx, lab)

    val input = MemoryStream[(Long, String)](spark)
    val q = IngestPipeline.start(input.toDF().toDF("doc_id", "text"),
      idx, lab, adm, s"$base/ckpt")
    try {
      // 13 duplicates an existing doc -> rejected; the rest admitted
      input.addData((10L, tBridge), (11L, tC), (13L, tA))
      q.processAllAvailable()
      val admitted1 = spark.read.parquet(adm).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(admitted1 == Set(10L, 11L),
        s"batch 1 admissions wrong: $admitted1 (13 duplicates doc 1)")
      assert(labelsOf(lab) == fullLabels(
        initial.unionByName(Seq((10L, tBridge), (11L, tC))
          .toDF("doc_id", "text"))),
        "labels after batch 1 must equal the full recompute")

      // batch 2: 20 duplicates the now-admitted 11 -> rejected against
      // the GROWN index; 21 is novel
      input.addData((20L, tC), (21L, tE))
      q.processAllAvailable()
      val admitted2 = spark.read.parquet(adm).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(admitted2 == Set(10L, 11L, 21L),
        s"batch 2 admissions wrong: $admitted2 (20 duplicates admitted 11)")
    } finally q.stop()
    // the index committed exactly the initial + admitted docs
    val indexed = spark.read.parquet(idx).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(indexed == Set(1L, 2L, 3L, 4L, 5L, 10L, 11L, 21L))
  }

  test("replay convergence: re-running an already-committed batch is a " +
    "no-op, and a crash between the label merge and the index commit " +
    "re-merges to the same fixpoint") {
    val base = tmpDir("ingest-replay")
    val (idx, lab, adm) = (s"$base/idx", s"$base/lab", s"$base/adm")
    IngestPipeline.bootstrap(initial, idx, lab)
    val batch = Seq((10L, tBridge), (12L, tE)).toDF("doc_id", "text")

    IngestPipeline.ingestBatch(batch, idx, lab, adm)
    val cleanLabels = labelsOf(lab)
    val cleanAdmitted = spark.read.parquet(adm).count()
    val cleanIndexed = spark.read.parquet(idx).count()
    // full replay of the committed batch: every store unchanged
    IngestPipeline.ingestBatch(batch, idx, lab, adm)
    assert(labelsOf(lab) == cleanLabels, "replay changed the label map")
    assert(spark.read.parquet(adm).count() == cleanAdmitted,
      "replay duplicated admitted rows")
    assert(spark.read.parquet(idx).count() == cleanIndexed,
      "replay duplicated index rows")

    // crash prefix: labels already merged, index NOT yet committed —
    // stage the exact state step 3 leaves behind, then run the batch
    val base2 = tmpDir("ingest-crash")
    val (idx2, lab2, adm2) = (s"$base2/idx", s"$base2/lab", s"$base2/adm")
    IngestPipeline.bootstrap(initial, idx2, lab2)
    val oldSig = DedupQueries.minhashSigs(initial).localCheckpoint(true)
    val partial = DedupQueries.incrementalClusters(oldSig,
        spark.read.parquet(lab2).localCheckpoint(true), batch)
      .localCheckpoint(true)
    partial.write.mode("overwrite").parquet(lab2)
    IngestPipeline.ingestBatch(batch, idx2, lab2, adm2)
    assert(labelsOf(lab2) == cleanLabels,
      "re-merge after a step-3 crash must land on the clean fixpoint")
    assert(spark.read.parquet(adm2).select("doc_id").collect()
      .map(_.getLong(0)).toSet == Set(10L, 12L))
    assert(spark.read.parquet(idx2).count() == cleanIndexed)
  }

  test("the forget verb: labels re-elect, the corpus and index shed the " +
    "forgotten rows, and a document whose ONLY copies were forgotten is " +
    "re-admitted (no over-forgetting)") {
    val base = tmpDir("ingest-forget")
    val (idx, lab, adm) = (s"$base/idx", s"$base/lab", s"$base/adm")
    IngestPipeline.bootstrap(initial, idx, lab)
    initial.write.mode("overwrite").parquet(adm)

    // forget the {1,2} cluster's SURVIVOR: remaining member re-elects
    IngestPipeline.forget(spark, Seq(1L).toDF("doc_id"), idx, lab, adm)
    val l1 = labelsOf(lab)
    assert(l1 == Map(2L -> 2L, 3L -> 3L, 4L -> 3L),
      s"labels after forgetting the survivor: $l1")
    assert(spark.read.parquet(adm).count() == 4)
    // a new copy of A is STILL rejected — doc 2 remains in the corpus
    IngestPipeline.ingestBatch(Seq((11L, tA)).toDF("doc_id", "text"),
      idx, lab, adm)
    assert(!spark.read.parquet(adm).collect().map(_.getLong(0))
      .contains(11L), "near-dup of a REMAINING doc must stay rejected")

    // forget BOTH B copies: the content has no remaining copy, so a
    // fresh submission must be admitted — keeping the forgotten
    // signatures would silently reject it forever
    IngestPipeline.forget(spark, Seq(3L, 4L).toDF("doc_id"), idx, lab, adm)
    IngestPipeline.ingestBatch(Seq((12L, tB)).toDF("doc_id", "text"),
      idx, lab, adm)
    val docs = spark.read.parquet(adm).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(docs.contains(12L),
      s"a fully-forgotten content's fresh copy must be re-admitted: $docs")
    assert(!docs.contains(3L) && !docs.contains(4L))
  }
}
