package graft

import graft.queries.DedupQueries

/** The q33 document-frequency cap on a skewed corpus: a token hot within a
  * block (df > cap) must be pruned BEFORE the token self-join — that prune is
  * what bounds intersect-join fan-out to dfCap × |token rows| (linear in
  * corpus size) instead of ~n² per hot token.
  */
class DedupCapSpec extends SparkSuite {

  private def docs = {
    import spark.implicits._
    // one block; "common" appears in all 6 docs (hot), the rest are rare
    Seq(
      (1L, "s1", "common alpha beta gamma"),
      (2L, "s1", "common alpha beta gamma delta"),
      (3L, "s1", "common"),
      (4L, "s1", "common"),
      (5L, "s1", "common"),
      (6L, "s1", "common")
    ).toDF("doc_id", "source", "text")
  }

  test("df-cap prunes hot tokens: near-dups still found via rare tokens") {
    val pairs = DedupQueries.jaccardPairs(docs, dfCap = 3, threshold = 0.5)
      .collect()
    // docs 1,2 share {alpha,beta,gamma} of union {alpha,beta,gamma,delta}
    // once "common" (df=6 > 3) is pruned -> jaccard 0.75
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(math.abs(pairs.head.getDouble(2) - 0.75) < 1e-12)
  }

  test("without the cap the hot token pairs every doc in the block (the n² blow-up)") {
    val pairs = DedupQueries.jaccardPairs(docs, dfCap = 1000, threshold = 0.5)
      .collect()
    // the 4 "common"-only docs are all mutually identical -> C(4,2)=6 pairs,
    // plus (1,2): the fan-out the cap exists to prevent
    assert(pairs.length == 7)
  }

  test("capped pair generation is bounded by dfCap per (token, doc) row") {
    // with dfCap=3 no token row can match more than 3 partners; the capped
    // join row count here is exactly the 3 rare-token matches of (1,2)
    val capped = DedupQueries.jaccardPairs(docs, dfCap = 3, threshold = 0.0)
      .collect()
    assert(capped.length == 1) // only (1,2) survives — hot-only docs have empty sets
  }

  // --- LSH band-bucket cap (the q32/q72/q82 scoring-path analogue of the
  // df-cap): a boilerplate-heavy bucket must not make pair scoring
  // quadratic, while the (linear) cluster path still absorbs it. ---

  /** 500 copies of one boilerplate doc (identical text -> identical
    * signature -> one 500-member bucket in every band), plus a genuine
    * near-dup pair (1, 2) and a singleton.
    */
  private def skewedDocs = {
    import spark.implicits._
    val boiler = (100L until 600L).map(
      (_, "this licence header is reproduced verbatim on every page all rights reserved"))
    (boiler ++ Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel"),
      (2L, "alpha bravo charlie delta echo foxtrot golf hotel"),
      (3L, "a completely unrelated singleton document about something else")
    )).toDF("doc_id", "text")
  }

  test("hot LSH buckets (500-copy boilerplate) are dropped from pair scoring") {
    val pairs = DedupQueries.lshCandidatePairs(skewedDocs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the boilerplate bucket (500 > cap 200) contributes NO pairs; the
    // real near-dup pair is still found via its own (small) buckets
    assert(pairs == Set((1L, 2L)))
  }

  test("without the cap the boilerplate bucket pairs quadratically (the blow-up the cap prevents)") {
    val n = DedupQueries.lshCandidatePairs(skewedDocs, bucketCap = Int.MaxValue)
      .count()
    assert(n == 500L * 499L / 2 + 1) // C(500,2) boilerplate pairs + (1,2)
  }

  test("the cluster path stays uncapped: boilerplate still collapses to ONE cluster via linear star edges") {
    val labels = DedupQueries.connectedComponents(
        DedupQueries.lshBucketStars(skewedDocs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((100L until 600L).forall(labels(_) == 100L))
    assert(labels(1L) == 1L && labels(2L) == 1L)
    assert(!labels.contains(3L)) // singleton never enters the candidate graph
    // and the star edge count is LINEAR in the bucket: 499 + 1, not 124,750
    assert(DedupQueries.lshBucketStars(skewedDocs).count() == 500L)
  }

  // --- inBucketPairs: the r14 single-aggregation pair kernel must be
  // row-identical (multiset!) to the self-join formulation it replaced,
  // including duplicate ids and duplicate (bucket, id) rows. ---

  test("inBucketPairs equals the bucket self-join, multiplicities included") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // bucket b1: ids {1,2,2,5} — the duplicate 2 must pair 1 and 5 TWICE
    // and never emit (2,2); bucket b2: singleton (no pairs); bucket b3:
    // {3,4} across two rows of the same bucket key
    val rel = Seq(
      ("b1", 2L), ("b1", 1L), ("b1", 5L), ("b1", 2L),
      ("b2", 9L),
      ("b3", 4L), ("b3", 3L)
    ).toDF("k", "doc_id")
    val kernel = DedupQueries.inBucketPairs(rel, Seq("k"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val a = rel.as("a"); val b = rel.as("b")
    val joined = a.join(b, col("a.k") === col("b.k")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(kernel == joined)
    assert(kernel == Seq((1L, 2L), (1L, 2L), (1L, 5L), (2L, 5L), (2L, 5L),
      (3L, 4L)))
  }
}
