package graft

import org.apache.spark.sql.functions._
import graft.queries.TextQueries

/** The BPE tokenizer (train + encode): hand-checkable merge sequences,
  * greedy-fold semantics on the overlap edge case, lossless
  * segmentation, and coverage of unseen words — the contracts that make
  * it a tokenizer rather than a hash.
  */
class BpeSpec extends SparkSuite {

  import spark.implicits._

  test("training learns the classic merge sequence on a hand-computed " +
    "corpus and ties break lexicographically") {
    // "aaab" x3: pairs (a,a)=6, (a,b)=3 -> first merge (a,a);
    // then (aa,a)=3, (a,b)=3 -> tie breaks to ('a','b') lexicographically
    val merges = TextQueries.bpeTrain(Seq(("aaab", 3L)), 2)
    assert(merges == Seq(("a", "a"), ("a", "b")),
      s"unexpected merge sequence: $merges")
  }

  test("the greedy left fold handles overlapping pairs exactly: 'aaa' " +
    "under merge (a,a) becomes [aa, a] in trainer AND encoder") {
    val merges = Seq(("a", "a"))
    val enc = TextQueries.bpeEncodeWords(Seq("aaa", "aaaa").toDF("w"), merges)
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toList)).toMap
    assert(enc("aaa") == List("aa", "a"), s"overlap fold wrong: $enc")
    assert(enc("aaaa") == List("aa", "aa"), s"overlap fold wrong: $enc")
  }

  test("segmentation is lossless and covers words unseen in training " +
    "(char fallback + applicable merges)") {
    val words = Seq(("lower", 5L), ("lowest", 3L), ("newest", 2L))
    val merges = TextQueries.bpeTrain(words, 6)
    val enc = TextQueries.bpeEncodeWords(
        Seq("lower", "lowest", "newest", "slowest", "zq").toDF("w"), merges)
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toList)).toMap
    enc.foreach { case (w, toks) =>
      assert(toks.mkString == w, s"lossy segmentation of $w: $toks")
    }
    // the trained 'est'/'west'-ish merges apply inside the UNSEEN word
    assert(enc("slowest").length < "slowest".length,
      s"no trained merge applied to an unseen word: ${enc("slowest")}")
    assert(enc("zq") == List("z", "q"),
      s"fully-unseen word must fall back to chars: ${enc("zq")}")
  }

  test("q143 output is internally consistent: encoded tokens rebuild " +
    "the word and n_tokens matches") {
    val got = SparkEntry.queries("q143_bpe_encode")(
      spark, "/root/testdata/sf0.001").collect()
    assert(got.length > 10)
    got.foreach { r =>
      val (w, enc, n) = (r.getString(0), r.getString(1), r.getInt(2))
      assert(enc.split(" ").mkString == w, s"lossy: $w -> $enc")
      assert(enc.split(" ").length == n, s"count mismatch: $w -> $enc ($n)")
    }
    // 12 merges must compress the BULK of the frequent vocabulary (not
    // necessarily every word — merge budget allocates by pair count)
    val compressed = got.count(r => r.getInt(2) < r.getString(0).length)
    assert(compressed * 2 >= got.length,
      s"only $compressed of ${got.length} frequent words compressed")
  }

  test("training-vocab cap: the driver collect is top-N deterministic, " +
    "cap-insensitive when the vocab fits, and plan-bounded when it " +
    "doesn't") {
    val words = Seq(("lower", 50L), ("lowest", 30L), ("newest", 20L),
      ("widest", 10L), ("zz", 1L)).toDF("w", "wn")
    // default cap (1M) >> the fixture vocab: sample == full vocab, so
    // the trained merges are IDENTICAL to uncapped training — the
    // guarantee CORRECTNESS relies on at every test SF
    val full = words.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
      .sortBy { case (w, n) => (-n, w) }
    assert(TextQueries.bpeTrainSample(words) == full,
      "default cap must pass the whole fixture vocabulary through")
    assert(TextQueries.bpeTrain(TextQueries.bpeTrainSample(words), 6) ==
      TextQueries.bpeTrain(full, 6),
      "capped training must equal uncapped training when vocab < cap")
    // tight cap: exactly the top-N by (count DESC, word ASC), so the
    // Zipf tail is what gets dropped — and ONLY N rows reach the driver
    val top3 = TextQueries.bpeTrainSample(words, cap = 3)
    assert(top3 == full.take(3), s"top-N order violated: $top3")
    // ties break on the word: same-count words keep a total order
    val tied = Seq(("bb", 5L), ("aa", 5L), ("cc", 5L)).toDF("w", "wn")
    assert(TextQueries.bpeTrainSample(tied, cap = 2) ==
      Seq(("aa", 5L), ("bb", 5L)),
      "equal counts must order lexicographically for determinism")
  }

  test("tokenizer lifecycle: save → load round-trips the merge sequence, " +
    "a tampered store fails the recomputed fingerprint, continued " +
    "training equals straight training, and extend preserves prefixes") {
    val wc = Seq(("aaab", 5L), ("abab", 3L), ("baaa", 2L), ("bbab", 1L))
    val merges = TextQueries.bpeTrain(wc, 6)
    val base = tmpDir("bpe-store")

    TextQueries.bpeSaveTokenizer(spark, merges, s"$base/tok")
    assert(TextQueries.bpeLoadTokenizer(spark, s"$base/tok") == merges)

    // continued training is the same as training straight through
    val first4 = merges.take(4)
    assert(TextQueries.bpeTrainFrom(wc, first4, 2) == merges,
      "continuation must land on the straight-through merge sequence")

    // extend: loaded prefix preserved, new merges appended
    TextQueries.bpeSaveTokenizer(spark, first4, s"$base/tok2")
    TextQueries.bpeExtendTokenizer(spark, wc, 2, s"$base/tok2")
    assert(TextQueries.bpeLoadTokenizer(spark, s"$base/tok2") == merges,
      "extend must preserve existing positions and append the new tail")

    // tamper: swap one merge row's content — the recomputed stamp
    // catches it even though meta is untouched
    import spark.implicits._
    val fp = TextQueries.bpeFingerprint(merges)
    val bad = merges.zipWithIndex.map { case ((a, b), i) =>
      if (i == 2) (i, a + "x", b, fp) else (i, a, b, fp) }
    bad.toDF("ord", "a", "b", "fp")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/tok/merges")
    val ex = intercept[IllegalArgumentException] {
      TextQueries.bpeLoadTokenizer(spark, s"$base/tok")
    }
    assert(ex.getMessage.contains("fingerprint"),
      s"expected the stamp check, got: ${ex.getMessage}")

    // empty save refused
    intercept[IllegalArgumentException] {
      TextQueries.bpeSaveTokenizer(spark, Seq.empty, s"$base/empty")
    }
  }

  test("fingerprint separates pair boundaries: same-length merge lists " +
    "whose concatenation collides get distinct stamps") {
    // under the old delimiter-free serialization both lists rendered as
    // "a bcd e" and shared a stamp — character shifts across pair
    // boundaries passed the load check
    val m1 = Seq(("a", "b"), ("cd", "e"))
    val m2 = Seq(("a", "bc"), ("d", "e"))
    assert(TextQueries.bpeFingerprint(m1) != TextQueries.bpeFingerprint(m2),
      "pair-boundary shifts must change the fingerprint")
    assert(TextQueries.bpeFingerprint(m1).startsWith("bpe2:"),
      "stamp scheme must be versioned so old stores fail loudly at load")
  }
}
