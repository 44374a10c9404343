package graft

import org.apache.spark.sql.functions._
import graft.queries.SimilarityQueries

/** The q101 cell cap under adversarial skew — the embedding-space twin of
  * DedupCapSpec's LSH bucket cap: a dense mode (boilerplate embeddings
  * collapsing onto one centroid) must NOT make pair scoring quadratic; it
  * is reported capped and skipped, while normal-sized cells still dedup.
  */
class SemanticDedupCapSpec extends SparkSuite {

  test("an over-cap cell skips pair scoring (capped=true, 0 dropped); " +
    "a small identical-mode cell still dedups to one survivor") {
    import spark.implicits._
    // mode A: 150 IDENTICAL vectors — ties on every centroid, so the cid
    // tiebreak sends all of them to ONE cell, which exceeds the cap.
    // mode B: 30 identical vectors orthogonal-ish to A — a cell under the
    // cap whose dominance prune must drop all but the first.
    val a = (0L until 150L).map(i => (i, Array.fill(8)(1.0)))
    val b = (150L until 180L).map(i =>
      (i, Array.tabulate(8)(j => if (j % 2 == 0) 1.0 else -1.0)))
    val e = (a ++ b).toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    val out = SimilarityQueries.semanticDedup(e, tau = 0.9, cellCap = 100L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))

    assert(out.map(_._2).sum == 180, "every vector in exactly one cell")
    val capped = out.filter(_._5)
    assert(capped.map(_._2).sum == 150, "the dense mode trips the cap")
    capped.foreach { c =>
      assert(c._3 == 0, s"capped cell $c must skip pair scoring")
      assert(c._4 == c._2, "capped cells keep every member (flagged)")
    }
    val bCell = out.filter(c => !c._5 && c._2 == 30)
    assert(bCell.length == 1, s"mode B forms one under-cap cell: ${out.toSeq}")
    assert(bCell.head._3 == 29 && bCell.head._4 == 1,
      s"identical under-cap mode dedups to one survivor: ${bCell.head}")
  }
}
