package graft

import graft.queries.DedupQueries

/** Invariants of the quality-aware survivor election (q145) and the dedup
  * threshold operating curve (q146) beyond the value-level oracle: the
  * election can never do worse than min-id election, survivors are real
  * cluster members, and the curve is monotone and consistent with q72.
  */
class QualitySurvivorSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  private lazy val q145 = run("q145_quality_survivor_election").collect()

  test("q145: election never loses to min-id election (q_elected >= q_minid)") {
    assert(q145.nonEmpty)
    q145.foreach { r =>
      val e = r.getAs[Double]("q_elected"); val m = r.getAs[Double]("q_minid")
      assert(e >= m, s"cluster ${r.getAs[Long]("cluster_id")}: $e < $m")
    }
    // and on this corpus the election must actually CHANGE something, or
    // the operator is vacuous on its own test data
    assert(q145.exists(r =>
      r.getAs[Long]("survivor_doc_id") != r.getAs[Long]("cluster_id")))
  }

  test("q145: every survivor is a member of its cluster and clusters are " +
    "real dup groups (n_members >= 2)") {
    val docs = Tables(spark, dir, "documents")
    val labels = DedupQueries.connectedComponents(
      DedupQueries.lshBucketStars(docs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    q145.foreach { r =>
      val c = r.getAs[Long]("cluster_id")
      val s = r.getAs[Long]("survivor_doc_id")
      assert(labels.get(s).contains(c), s"survivor $s not labeled $c")
      assert(r.getAs[Long]("n_members") >= 2L)
    }
    // one row per cluster, exactly the label map's cluster set
    assert(q145.map(_.getAs[Long]("cluster_id")).toSet == labels.values.toSet)
    assert(q145.length == labels.values.toSet.size)
  }

  test("q146: five monotone rows, and the 0.5 point equals q72's pair count") {
    val curve = run("q146_dedup_threshold_curve").collect()
    assert(curve.map(_.getAs[Double]("threshold")).toSeq ==
      Seq(0.5, 0.6, 0.7, 0.8, 0.9))
    val pairs = curve.map(_.getAs[Long]("n_pairs")).toSeq
    val docsN = curve.map(_.getAs[Long]("n_docs_affected")).toSeq
    assert(pairs == pairs.sorted.reverse, s"n_pairs not non-increasing: $pairs")
    assert(docsN == docsN.sorted.reverse,
      s"n_docs_affected not non-increasing: $docsN")
    assert(pairs.head > 0L)
    val q72n = run("q72_minhash_jaccard_estimate").count()
    assert(pairs.head == q72n,
      s"curve@0.5 (${pairs.head}) != q72 pair count ($q72n)")
  }
}
