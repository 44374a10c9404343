package graft

import org.apache.spark.sql.functions._
import graft.queries.DedupQueries.winnowFingerprints

/** Winnowing fingerprint selection (q183): pins the MOSS guarantees on
  * constructed fixtures — the shared-substring detection guarantee, the
  * density bound, the rightmost-min tie rule, and the full-window boundary.
  */
class WinnowSpec extends SparkSuite {
  import spark.implicits._

  private val K = 4
  private val W = 5

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  private def fps(rows: (Long, String)*): Map[Long, Set[(Int, String)]] =
    winnowFingerprints(docs(rows: _*), K, W)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (d, rs) =>
        d -> rs.map(r => (r.getInt(1), r.getString(2))).toSet
      }

  test("guarantee: two documents sharing a >= w+k-1 token substring share " +
    "at least one fingerprint hash") {
    // 8 shared tokens (= W + K - 1) embedded at different offsets in
    // otherwise disjoint vocabulary.
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val m = fps(
      1L -> s"one two three $shared four five six",
      2L -> s"aa bb cc dd ee ff $shared gg hh")
    val h1 = m(1L).map(_._2); val h2 = m(2L).map(_._2)
    assert((h1 & h2).nonEmpty,
      s"shared 8-token substring must yield a shared hash: $h1 vs $h2")
  }

  test("disjoint-vocabulary documents share no fingerprint hash") {
    val m = fps(
      1L -> "one two three four five six seven eight nine ten",
      2L -> "aa bb cc dd ee ff gg hh ii jj")
    assert((m(1L).map(_._2) & m(2L).map(_._2)).isEmpty)
  }

  test("density: consecutive selected positions are at most w apart and " +
    "every selection is a full-window start's minimum") {
    val text = (1 to 60).map(i => s"tok$i").mkString(" ")
    val sel = fps(1L -> text)(1L).map(_._1).toSeq.sorted
    assert(sel.nonEmpty)
    // winnowing selects >= 1 fingerprint per window, and consecutive
    // selections can be at most w positions apart (each window of w gram
    // starts contains a selection).
    sel.sliding(2).foreach {
      case Seq(a, b) => assert(b - a <= W, s"gap $a -> $b exceeds w=$W")
      case _         =>
    }
    // positions are gram starts inside the full-window range
    val nGrams = 60 - K + 1
    assert(sel.head >= 1 && sel.last <= nGrams)
  }

  test("selection matches the first-principles (hash asc, pos desc) rule — " +
    "including the rightmost tie when a gram repeats inside one window") {
    // 8 tokens => exactly one window of w=5 gram starts; gram(1) == gram(5)
    // ("x y z x"), so if that hash is the window minimum the tie MUST
    // resolve to pos 5 (robust winnowing). Expected selection computed from
    // first principles with the same md5-prefix hash.
    val toks = "x y z x x y z x".split(" ")
    def h16(g: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
    val grams = (1 to 5).map(p => (p, h16(toks.slice(p - 1, p + 3).mkString(" "))))
    assert(grams(0)._2 == grams(4)._2, "fixture must contain the tie")
    val expected = grams.minBy { case (p, h) => (h, -p) }
    val sel = fps(1L -> "x y z x x y z x")(1L)
    assert(sel == Set((expected._1, expected._2)))
    if (expected._2 == grams(0)._2)
      assert(expected._1 == 5, "tie must resolve rightmost")
  }

  test("documents shorter than w+k-1 tokens produce no fingerprints " +
    "(no partial windows)") {
    val res = winnowFingerprints(docs(1L -> "a b c d e f g"), K, W) // 7 toks
    assert(res.count() == 0)
  }
}

/** Maximal repeated spans (q182): the gaps-and-islands merge must report
  * ONE maximal span, not a 5-gram fragment per duplicated window.
  */
class RepeatedSpanSpec extends SparkSuite {
  import spark.implicits._
  import graft.queries.DedupQueries.repeatedSpans

  test("an 8-token span shared by two documents reports as ONE maximal " +
    "span of length 8 with n_occ=2, n_docs=2") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"aa bb cc dd ee ff $shared gg hh")).toDF("doc_id", "text")
    val rows = repeatedSpans(docs).collect()
    assert(rows.length == 1, s"one maximal span expected: ${rows.toSeq}")
    val r = rows.head
    assert(r.getString(0) == shared)
    assert(r.getLong(1) == 8L && r.getLong(2) == 2L && r.getLong(3) == 2L)
  }

  test("a doc repeating its own span twice counts n_occ=2 but n_docs=1, " +
    "and disjoint docs report nothing") {
    val sp = "p q r s t"
    val docs = Seq(
      (1L, s"a1 b1 $sp c1 d1 e1 f1 $sp g1"),
      (2L, "m n o u v w x y z")).toDF("doc_id", "text")
    val rows = repeatedSpans(docs).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == sp && r.getLong(1) == 5L
      && r.getLong(2) == 2L && r.getLong(3) == 1L)
  }

  test("winnowCandidatePairs detects docs sharing a long substring and " +
    "drops fingerprints hotter than the df-cap") {
    import graft.queries.DedupQueries.winnowCandidatePairs
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"aa bb cc dd ee ff $shared gg hh"),
      (3L, "completely different vocabulary in this document here now ok"))
      .toDF("doc_id", "text")
    val pairs = winnowCandidatePairs(docs, 4, 5, dfCap = 300, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
    // cap: the same corpus with dfCap = 1 drops every shared hash
    // (each shared fingerprint lives in 2 docs > 1), so no pairs survive
    val capped = winnowCandidatePairs(docs, 4, 5, dfCap = 1, minShared = 1)
    assert(capped.count() == 0)
  }

  test("sharedSpanExplain reports the longest shared span with exact " +
    "offsets and text") {
    import graft.queries.DedupQueries.sharedSpanExplain
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"one two three $shared four five six"),      // span starts at 4
      (2L, s"aa bb cc dd ee ff $shared gg hh"))          // span starts at 7
      .toDF("doc_id", "text")
    val rows = sharedSpanExplain(docs, 4, 5, 300, 1).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getInt(2) == 10, s"span_len: ${r.getInt(2)}")
    assert(r.getInt(3) == 4 && r.getInt(4) == 7)
    assert(r.getString(5) == shared)
  }

  test("crossSpanEvidence reports train/eval overlaps at or above the " +
    "winnowing guarantee floor and drops shorter accidental overlaps") {
    import graft.queries.DedupQueries.crossSpanEvidence
    val long = "alpha beta gamma delta epsilon zeta eta theta"   // 8 tokens
    val short = "p q r s t u v"                                  // 7 tokens
    val train = Seq(
      (1L, s"one two $long three four"),
      (2L, s"aa bb $short cc dd")).toDF("doc_id", "text")
    val eval_ = Seq(
      (10L, s"x y z $long w"),
      (11L, s"mm nn $short oo pp")).toDF("doc_id", "text")
    val rows = crossSpanEvidence(train, eval_).collect()
    // only the >= w+k-1 = 8-token overlap survives the guarantee floor
    assert(rows.length == 1, rows.toSeq.toString)
    val r = rows.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 10L)
    assert(r.getInt(2) == 8 && r.getString(5) == long)
  }

  test("plan shape: equality joins only — no cartesian product, no " +
    "broadcast nested loop (q182-q185 all)") {
    import graft.queries.DedupQueries.{winnowFingerprints,
      winnowCandidatePairs, sharedSpanExplain}
    val docs = Seq((1L, "a b c d e f g h i j"),
      (2L, "a b c d e f z y x w")).toDF("doc_id", "text")
    for (df <- Seq(repeatedSpans(docs), winnowFingerprints(docs, 4, 5),
        winnowCandidatePairs(docs, 4, 5, 300, 1),
        sharedSpanExplain(docs, 4, 5, 300, 1))) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoop"), p)
    }
  }
}
