package graft

import org.apache.spark.sql.functions._
import graft.queries.SearchQueries._

/** The cross-doc positional phrase matcher: join-chain results equal the
  * map-side array scan for 2- and 3-word phrases, occurrences counted
  * per start position, and the plan is equality joins over term-filtered
  * postings — never a nested loop.
  */
class PhraseSpec extends SparkSuite {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val docs = Tables(spark, dir, "documents")
  private lazy val pos = positionalPostings(docs).localCheckpoint(true)

  /** Map-side truth: count phrase starts by scanning each token array. */
  private def naive(phrase: Seq[String]): Map[Long, Long] = {
    val toks = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col("text")).as("tk"))
      .as[(Long, Seq[String])].collect()
    toks.map { case (id, tk) =>
      id -> tk.indices.count(i =>
        i + phrase.length <= tk.length &&
          phrase.indices.forall(j => tk(i + j) == phrase(j))).toLong
    }.filter(_._2 > 0).toMap
  }

  test("join-chain phrase matching equals the map-side scan for 2- and " +
    "3-word phrases (per-doc occurrence counts)") {
    for (phrase <- Seq(Seq("data", "line"), Seq("the", "fast", "key"),
      Seq("window", "window"))) {
      val got = phraseMatches(pos, phrase)
        .groupBy("doc_id").agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
      assert(got == naive(phrase), s"phrase $phrase mismatch")
      assert(got.nonEmpty, s"phrase $phrase never occurs — pick another fixture")
    }
  }

  test("a single-word phrase degenerates to the term's postings") {
    val got = phraseMatches(pos, Seq("data")).count()
    val want = pos.filter(col("term") === "data").count()
    assert(got == want && got > 0)
  }

  test("the chain plans as equality joins on (doc_id, pos) — no " +
    "BroadcastNestedLoopJoin / cartesian") {
    val plan = phraseMatches(pos, Seq("data", "line", "merge"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"non-equality join in:\n$plan")
  }
}
