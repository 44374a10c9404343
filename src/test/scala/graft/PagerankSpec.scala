package graft

import org.apache.spark.sql.functions._
import graft.queries.DedupQueries

/** Integer-exact PageRank: centrality ordering on enumerable graphs,
  * mass conservation bounds, and determinism — the properties the
  * PR-canonical survivor selection (q141) rests on.
  */
class PagerankSpec extends SparkSuite {

  import spark.implicits._

  private def ranks(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    DedupQueries.pagerank(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("a star graph's hub outranks every leaf; a path graph's center " +
    "outranks its endpoints") {
    val star = ranks(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)))
    assert((2L to 5L).forall(l => star(1L) > star(l)),
      s"hub must dominate: $star")
    assert((2L to 5L).map(star).distinct.size == 1,
      s"symmetric leaves must tie exactly (integer arithmetic): $star")

    val path = ranks(Seq((1L, 2L), (2L, 3L)))
    assert(path(2L) > path(1L) && path(2L) > path(3L),
      s"path center must dominate: $path")
    assert(path(1L) == path(3L), s"symmetric endpoints must tie: $path")
  }

  test("total rank mass stays below the fixed-point scale (floor " +
    "division only loses mass) and every rank is at least the teleport " +
    "share") {
    val r = ranks(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (2L, 4L)))
    val scale = 1000000000L
    assert(r.values.sum <= scale, s"mass created from nothing: $r")
    val teleport = (15L * scale) / (100L * r.size)
    assert(r.values.forall(_ >= teleport),
      s"every node keeps at least the teleport share: $r")
  }

  test("deterministic: two runs produce identical ranks bit-for-bit") {
    val pairs = (1L to 40L).flatMap(a =>
      Seq((a, a % 7 + 100L), (a, a % 11 + 200L)))
    assert(ranks(pairs) == ranks(pairs))
  }
}
