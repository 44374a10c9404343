package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for large-scale training-data pipelines:
  * tokenization, quality metrics, language-ID, fingerprinting. All are pure
  * Catalyst expressions (codegen'd, no UDFs) so they stay inside
  * whole-stage codegen and scale linearly with no shuffle.
  *
  * Cross-engine determinism: everything reduces to string/integer ops plus
  * exact integer arithmetic; ratios are emitted as bigint/bigint double
  * divisions, which are IEEE-identical on any engine.
  */
object TextFunctions {

  /** Word tokens: maximal [a-z0-9]+ runs of the lowercased text. */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** BPE-ish token split: letter runs, digit runs, or single symbols —
    * the shape a byte-pair pretokenizer produces.
    */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Ratio of non-alphanumeric, non-space characters — punctuation load. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(lower(text), "[a-z0-9 ]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Mean token length in characters. */
  def avgTokenLen(text: Column): Column =
    length(regexp_replace(lower(text), "[^a-z0-9]", "")).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "es" -> Seq("el", "los", "las", "y", "es", "un"))

  def stopwordHits(text: Column, lang: String): Column = {
    val set = stopwords(lang).map(lit): Seq[Column]
    size(filter(tokens(text), t => array_contains(array(set: _*), t)))
  }

  /** Stopword ratio against the English list — a quality-score component. */
  def stopwordRatio(text: Column): Column =
    stopwordHits(text, "en").cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")

  /** Deterministic argmax language guess from stopword-hit counts, with a
    * fixed en>de>fr>es tie-break (mirrors a CASE chain the oracle repeats).
    */
  def langGuess(text: Column): Column = {
    val en = stopwordHits(text, "en"); val de = stopwordHits(text, "de")
    val fr = stopwordHits(text, "fr"); val es = stopwordHits(text, "es")
    when(en >= de && en >= fr && en >= es, lit("en"))
      .when(de >= fr && de >= es, lit("de"))
      .when(fr >= es, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Composite quality score in [0,1]: long-enough, low-punctuation,
    * stopword-bearing text scores high. Weights are arbitrary but fixed.
    */
  def qualityScore(text: Column): Column =
    least(tokenCount(text).cast("double") / lit(50.0), lit(1.0)) * lit(0.4) +
      (lit(1.0) - punctRatio(text)) * lit(0.3) +
      least(stopwordRatio(text) * lit(5.0), lit(1.0)) * lit(0.3)

  /** Order-insensitive document fingerprint: md5 of the sorted distinct
    * token set — the classic "bag of words" dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** Exact-content fingerprint: md5 of whitespace-normalized text. */
  def contentHash(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Word n-gram shingles (space-joined), empty below n tokens. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
  }

  /** Position-preserving shingle explode over an EXISTING token-array
    * column (for callers that already tokenized, e.g. to share one
    * checkpointed token relation among consumers): emits (all input
    * columns, `out`, `posOut` = 1-based start position). Same codegen'd
    * position-explode + concat_ws(element_at...) kernel as
    * [[explodeShingles]].
    */
  def explodeShinglesFromTokens(df: org.apache.spark.sql.DataFrame,
      toksCol: Column, n: Int, out: String,
      posOut: String): org.apache.spark.sql.DataFrame = {
    val df2 = df.withColumn("__stoks", toksCol)
      .withColumn("__i", explode(when(size(col("__stoks")) >= n,
        sequence(lit(0), size(col("__stoks")) - n))
        .otherwise(array().cast("array<int>"))))
    val parts = (1 to n).map(k => element_at(col("__stoks"), col("__i") + k))
    df2.withColumn(out, concat_ws(" ", parts: _*))
      .withColumn(posOut, col("__i") + 1)
      .drop("__stoks", "__i")
  }

  /** Explode word n-gram shingles as rows via position-explode +
    * concat_ws(element_at...) — fully codegen'd, measured ~8x faster than
    * transform()-built shingle arrays (HOF lambdas evaluate interpreted).
    * Emits (all input columns, `out`); documents with < n tokens emit no
    * rows. No dedup: downstream MIN/set-aggregates are multiset-safe.
    */
  def explodeShingles(df: org.apache.spark.sql.DataFrame, textCol: Column,
      n: Int, out: String): org.apache.spark.sql.DataFrame =
    explodeShinglesFromTokens(df, tokens(textCol), n, out, "__pos")
      .drop("__pos")

  /** Sign bitmask of a hex digest: bit b set iff hex char b is '0'..'7' —
    * the SimHash sign convention, compiled to ONE codegen'd byte scan (see
    * HexSignMaskExpr) instead of 32 substring+compare projections per row.
    */
  def hexSignMask(h: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(HexSignMaskExpr(expression(h)))
  }

  /** Unicode canonicalization (NFC + accent strip + lowercase + whitespace
    * collapse) as ONE codegen'd expression — see NormalizeTextExpr. The
    * pre-fingerprint normalization step of a corpus-dedup pipeline.
    */
  def normalizeText(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(NormalizeTextExpr(expression(text)))
  }

  /** Parent digest p (0 or 1) for the sliced MinHash scheme: md5 of
    * `p:shingle`. Each 128-bit digest is cut into four 32-bit (8-hex-char)
    * slices, so TWO md5 evaluations per shingle yield EIGHT independent
    * hash components — md5 is the dominant per-shingle cost of MinHash at
    * corpus scale, and this is 4x fewer digests than one per component.
    * Materialize parents as columns BEFORE the aggregate so the projection
    * computes each digest once (codegen CSE), not once per agg expression.
    */
  def minhashParent(shingleCol: Column, p: Int): Column =
    md5(concat(lit(s"$p:"), shingleCol))

  /** MinHash component i (0-7) as an aggregate over parent digests m0/m1:
    * the minimum of the i-th 8-hex-char slice. A fixed-width hex string is
    * order-isomorphic to its numeric value, so `min` over hex == min over
    * the 32-bit hash integers — and md5 hex is identical on every engine.
    */
  def minhashSlice(m0: Column, m1: Column, i: Int): Column =
    min(substring(if (i < 4) m0 else m1, (i % 4) * 8 + 1, 8))
}
