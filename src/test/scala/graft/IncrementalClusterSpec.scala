package graft

import org.apache.spark.sql.functions._
import graft.queries.DedupQueries

/** Incremental cluster maintenance (q139's verb): the merge graph built
  * from an increment plus old cluster REPRESENTATIVES must reproduce the
  * from-scratch clustering exactly — pinned on a hand-built fixture
  * covering the three sharp cases (a bridge doc MERGING two old
  * clusters, a previously-unpaired old doc pulled into a cluster, and
  * untouched clusters passing through), then asserted as a property on
  * the real corpus across several increment choices.
  */
class IncrementalClusterSpec extends SparkSuite {

  import spark.implicits._

  // texts with engineered band-bucket behavior (verified against the
  // signature scheme: bridge shares >=1 band with A and with B; A and B
  // share none): identical texts always share ALL buckets
  private val tA = "tok66 tok187 tok101 tok193 tok111 tok121 tok13 tok2 " +
    "tok64 tok44 tok136 tok170"
  private val tB = "tok128 tok76 tok158 tok167 tok45 tok130 tok30 tok3 " +
    "tok159 tok15 tok42 tok126"
  private val tBridge = tA + " qq " + tB
  private val tD = "delta epsilon zeta eta theta iota kappa"
  private val tC = "unique solitary text with no relatives anywhere here"

  test("bridge fixture: a new doc merges two old clusters under the old " +
    "minimum; an old singleton is pulled in; unpaired new docs stay " +
    "unlabeled") {
    val oldDocs = Seq((1L, tA), (2L, tA), (3L, tB), (4L, tB), (5L, tD))
      .toDF("doc_id", "text")
    val oldSig = DedupQueries.minhashSigs(oldDocs).localCheckpoint(true)
    val oldLabels = DedupQueries.connectedComponents(
      DedupQueries.lshBucketStarsFromSigs(oldSig))
    // preconditions the fixture engineering promises
    val pre = oldLabels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(pre == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L),
      s"old clusters not as engineered: $pre (5 must be an unpaired singleton)")

    val inc = Seq((10L, tBridge), (11L, tC), (12L, tD))
      .toDF("doc_id", "text")
    val got = DedupQueries.incrementalClusters(oldSig, oldLabels, inc)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 1L, // bridge merge
      5L -> 5L, 12L -> 5L),                               // singleton pull-in
      s"unexpected merged labels: $got (11 must stay unlabeled)")

    // the theorem the verb rests on: identical to the full recompute
    val full = DedupQueries.connectedComponents(
        DedupQueries.lshBucketStars(oldDocs.unionByName(inc)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == full, s"incremental $got != full recompute $full")
  }

  test("property on the real corpus: for several increment choices the " +
    "incremental merge equals the from-scratch clustering exactly") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val full = DedupQueries.connectedComponents(
        DedupQueries.lshBucketStars(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Seq("src5", "src13").foreach { src =>
      val oldSig = DedupQueries.minhashSigs(
        docs.filter(col("source") =!= src)).localCheckpoint(true)
      val oldLabels = DedupQueries.connectedComponents(
        DedupQueries.lshBucketStarsFromSigs(oldSig))
      val got = DedupQueries.incrementalClusters(oldSig, oldLabels,
          docs.filter(col("source") === src))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == full,
        s"incremental merge with increment=$src diverges from the full " +
          s"recompute (${(got diff full).size} extra, ${(full diff got).size} missing)")
    }
  }
}
