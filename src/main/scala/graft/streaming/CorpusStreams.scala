package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{BloomFunctions, TextFunctions}

/** Streaming corpus curation: the in-flight (crawl front-end) forms of the
  * batch pipeline operators — every transform here is a per-row expression,
  * so the stream needs NO stateful aggregation, no watermark, and no
  * stream-static join. That is the design constraint streaming adds: state
  * is the thing that grows, so the curation gates that can run stateless
  * should (quality scoring, benchmark decontamination); the ones that
  * can't (cross-document dedup) stay batch-side (or use
  * dropDuplicatesWithinWatermark for the bounded-horizon form —
  * EventStreams.dedupedStream).
  */
object CorpusStreams {

  /** Word n-gram shingles as an ARRAY column (never exploded — a streaming
    * probe must stay per-row), built from an ALREADY-BOUND token-array
    * column. Callers must materialize the tokenization into its own
    * projected column first (see decontaminated): inlining tokens(text)
    * here would re-run the full-text regex for every element_at inside the
    * HOF lambda — HOF lambdas evaluate interpreted, with no common-
    * subexpression reuse. Same tokenization and join-with-space as the
    * batch explodeShingles, so a bloom built from batch shingles probes
    * stream shingles correctly.
    */
  def shingleArray(tk: Column, n: Int): Column =
    when(size(tk) >= n,
      transform(sequence(lit(1), size(tk) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(tk, i + lit(k))): _*)))
      .otherwise(array().cast("array<string>"))

  /** Benchmark decontamination for a document STREAM: drop any document
    * one of whose n-gram shingles might be in the benchmark bloom. The
    * bitset is embedded in the filter expression (a binary literal — the
    * broadcast form for a streaming plan), so the probe is map-only and
    * the plan has zero stateful operators. Bloom false positives over-drop
    * at the configured fpp; the batch q91 adds the exact confirm join,
    * which a crawl front-end trades away for bounded per-row cost.
    *
    * The token array is bound as its own projected column so the regex
    * tokenization runs ONCE per row (Catalyst keeps the projection — a
    * non-cheap expression referenced many times is not collapsed into its
    * consumers).
    */
  def decontaminated(docs: DataFrame, bloom: Array[Byte], n: Int = 5): DataFrame = {
    // the projection would silently overwrite-then-drop a caller column
    // of the same name — fail loudly instead of destroying data
    require(!docs.columns.contains("__graft_tk"),
      "decontaminated: input already has a __graft_tk column — rename it; " +
        "this name is reserved for the internal token projection")
    docs
      .withColumn("__graft_tk", TextFunctions.tokens(col("text")))
      .filter(!exists(shingleArray(col("__graft_tk"), n),
        g => BloomFunctions.mightContainLong(bloom, xxhash64(g))))
      .drop("__graft_tk")
  }

  /** The streaming corpus-clean composite (q56 + q91 in-flight): quality
    * gate first (cheap per-row arithmetic prunes before the shingle
    * build), then the bloom decontamination probe.
    */
  def cleaned(docs: DataFrame, bloom: Array[Byte],
      minQuality: Double = 0.5, n: Int = 5): DataFrame =
    decontaminated(
      docs.filter(TextFunctions.qualityScore(col("text")) >= minQuality),
      bloom, n)
}
