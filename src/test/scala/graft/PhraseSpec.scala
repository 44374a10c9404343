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

  // ---- the PERSISTED positional store (9th family) ----

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft-phrase").toString + "/idx"

  private def saveWithPositions(d: org.apache.spark.sql.DataFrame,
      path: String): Unit = {
    val (p, ds) = textIndexBuild(d)
    textIndexSave(p, ds, path, Some(positionalPostings(d)))
  }

  private def starts(df: org.apache.spark.sql.DataFrame): Set[(Long, Int)] =
    df.select("doc_id", "pos").as[(Long, Int)].collect().toSet

  private val phrase = Seq("data", "line")

  test("store-served phrase search equals the in-memory join chain; " +
    "half-save + append equals the full save (the positions relation " +
    "is maintained by the SAME append verb)") {
    val full = freshPath(); val half = freshPath()
    saveWithPositions(docs, full)
    assert(starts(textIndexPhraseSearch(spark, full, phrase)) ==
      starts(phraseMatches(pos, phrase)))
    saveWithPositions(docs.filter(col("doc_id") % 2 === 0), half)
    textIndexAppend(docs.filter(col("doc_id") % 2 =!= 0), half)
    assert(starts(textIndexPhraseSearch(spark, half, phrase)) ==
      starts(textIndexPhraseSearch(spark, full, phrase)))
    // replayed append: no-op, store still loads and matches
    textIndexAppend(docs, half)
    assert(starts(textIndexPhraseSearch(spark, half, phrase)) ==
      starts(textIndexPhraseSearch(spark, full, phrase)))
  }

  test("delete masks a doc's phrase matches (sticky); forget removes " +
    "them physically and a fresh copy re-admits") {
    import spark.implicits._
    val path = freshPath()
    saveWithPositions(docs, path)
    val all = starts(textIndexPhraseSearch(spark, path, phrase))
    val victim = all.head._1
    textIndexDelete(Seq(victim).toDF("doc_id"), path)
    assert(starts(textIndexPhraseSearch(spark, path, phrase)) ==
      all.filterNot(_._1 == victim))
    // sticky across a replayed append
    textIndexAppend(docs.filter(col("doc_id") === victim), path)
    assert(!starts(textIndexPhraseSearch(spark, path, phrase))
      .exists(_._1 == victim))
    // forget on a second doc: physical removal, then re-admission
    val v2 = all.map(_._1).filterNot(_ == victim).head
    textIndexForget(Seq(v2).toDF("doc_id"), path)
    assert(!starts(textIndexPhraseSearch(spark, path, phrase))
      .exists(_._1 == v2))
    textIndexAppend(docs.filter(col("doc_id") === v2), path)
    assert(starts(textIndexPhraseSearch(spark, path, phrase)) ==
      all.filterNot(_._1 == victim))
  }

  test("a store saved WITHOUT positions refuses phrase search with the " +
    "opt-in hint; a re-save without positions removes the stale " +
    "positional relation; a mis-paired positions relation refuses at " +
    "save; a truncated one fails at load") {
    val path = freshPath()
    val (p, ds) = textIndexBuild(docs)
    textIndexSave(p, ds, path)
    val e1 = intercept[IllegalArgumentException] {
      textIndexPhraseSearch(spark, path, phrase)
    }
    assert(e1.getMessage.contains("NO positional"))
    // opt in, then re-save without: the stale relation must NOT survive
    // to answer phrase queries from a superseded corpus
    saveWithPositions(docs, path)
    textIndexPhraseSearch(spark, path, phrase).count()
    textIndexSave(p, ds, path)
    assert(intercept[IllegalArgumentException] {
      textIndexPhraseSearch(spark, path, phrase)
    }.getMessage.contains("NO positional"))
    // mis-paired: positions from a different corpus
    val e2 = intercept[IllegalArgumentException] {
      textIndexSave(p, ds, path,
        Some(positionalPostings(docs.filter(col("doc_id") < 100))))
    }
    assert(e2.getMessage.contains("positional relation is not the same"))
    // truncated positions fail the stamp at load
    saveWithPositions(docs, path)
    val truncated = spark.read.parquet(s"$path/positions")
      .filter(col("doc_id") % 3 =!= 0).localCheckpoint(true)
    truncated.write.mode("overwrite").parquet(s"$path/positions")
    val e3 = intercept[IllegalArgumentException] {
      textIndexPhraseSearch(spark, path, phrase).count()
    }
    assert(e3.getMessage.contains("positions"))
  }

  test("proximity matching equals the naive per-doc position scan at " +
    "several windows, the window boundary is exact (distance == w " +
    "matches, w+1 does not), and same-term queries refuse") {
    import spark.implicits._
    def naiveNear(a: String, b: String, w: Int): Set[(Long, Int)] = {
      val toks = docs.select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("tk"))
        .as[(Long, Seq[String])].collect()
      toks.flatMap { case (id, tk) =>
        tk.indices.filter(i => tk(i) == a &&
          tk.indices.exists(j => tk(j) == b && math.abs(i - j) <= w))
          .map(i => (id, i))
      }.toSet
    }
    for (w <- Seq(1, 5, 20)) {
      val got = proximityMatches(pos, "data", "merge", w)
        .as[(Long, Int)].collect().toSet
      assert(got == naiveNear("data", "merge", w), s"window $w mismatch")
      assert(got.nonEmpty, s"window $w never matches — pick another fixture")
    }
    // boundary exactness on a hand-built relation: b at distance w and
    // w+1 from the anchor — only the former qualifies
    val hand = Seq(("x", 10L, 0), ("y", 10L, 5), ("y", 10L, 6))
      .toDF("term", "doc_id", "pos")
    assert(proximityMatches(hand, "x", "y", 5)
      .as[(Long, Int)].collect().toSet == Set((10L, 0)))
    assert(proximityMatches(hand, "x", "y", 6)
      .as[(Long, Int)].collect().toSet == Set((10L, 0)))
    assert(proximityMatches(hand, "x", "y", 4).count() == 0)
    val e = intercept[IllegalArgumentException] {
      proximityMatches(pos, "data", "data", 5)
    }
    assert(e.getMessage.contains("termA == termB"))
  }

  test("store-served proximity equals the in-memory form, is term-pushed " +
    "into the positions scan, and plans as a SEMI join — one surviving " +
    "row per anchor however many nearby matches") {
    val path = freshPath()
    saveWithPositions(docs, path)
    val fromStore = textIndexProximitySearch(spark, path, "data", "merge", 5)
    assert(starts(fromStore) ==
      starts(proximityMatches(pos, "data", "merge", 5)))
    val plan = fromStore.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"proximity did not plan as semi:\n$plan")
    assert(plan.contains("EqualTo(term,data)") &&
      plan.contains("EqualTo(term,merge)"),
      s"term filters not pushed into the positions scan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"non-equality join in:\n$plan")
  }

  test("the store-served chain pushes each term into the positions " +
    "scan and stays equality-join-only") {
    val path = freshPath()
    saveWithPositions(docs, path)
    val plan = textIndexPhraseSearch(spark, path, phrase)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(term), EqualTo(term,data)") ||
      plan.contains("EqualTo(term,data)"),
      s"term filter not pushed into the positions scan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"non-equality join in:\n$plan")
  }
}
