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

  /** Streaming EMBEDDING near-dup gate — the bloom-bitset move applied
    * to vectors: drop an incoming row whose 64-bit sign code sits within
    * `maxHamming` of ANY static-corpus code. The corpus representation
    * embedded in the filter is the q128 packed form (two 32-bit lanes,
    * 16 bytes/vector), shipped as two parallel array literals, so the
    * probe is ONE per-row expression — no stream-static join, no state,
    * no watermark, exactly like [[decontaminated]]'s bitset.
    *
    * Size honesty (the q91 trade restated for vectors): an embedded
    * code table is the right shape while 16·n bytes broadcasts — fine
    * to ~10M corpus vectors (~160 MB plan literal is already past
    * comfortable; chunk the corpus into several gates before that).
    * Past that, the batch q38/q128 path with a persisted index is the
    * tool; a crawl front-end gates against the RECENT corpus sketch,
    * not the whole lake. Sign-code Hamming is a recall-bounded proxy
    * for cosine (measured in SCALING.md: Hamming top-25 carries 56%
    * of exact top-5 at 64 bits) — the gate trades exactness for a
    * stateless bounded-cost probe, and the batch dedup behind it stays
    * exact.
    *
    * `v` must be the `dims`-length double array column; the packed
    * lanes are computed per row by the same [[graft.queries
    * .SimilarityQueries.binCodes]] convention (bit j of lane = v[j]>0),
    * so a gate built from a persisted bin store's codes probes
    * consistently.
    */
  def embeddingNearDupGate(rows: DataFrame, corpusW0: Seq[Long],
      corpusW1: Seq[Long], maxHamming: Int, vCol: String = "v"): DataFrame = {
    require(corpusW0.length == corpusW1.length,
      "embeddingNearDupGate: lane arrays must be parallel (same length)")
    require(rows.columns.contains(vCol),
      s"embeddingNearDupGate: input has no '$vCol' column")
    def lane(lo: Int): Column =
      expr(s"aggregate(sequence($lo, ${lo + 31}), 0L, " +
        s"(acc, i) -> acc + IF(element_at($vCol, i + 1) > 0D, " +
        s"shiftleft(1L, i - $lo), 0L))")
    val reserved = Seq("__graft_w0", "__graft_w1")
    require(!reserved.exists(rows.columns.contains),
      "embeddingNearDupGate: input already has a __graft_w0/__graft_w1 " +
        "column — rename it; these names are reserved for the packed lanes")
    rows
      // lanes bound as projected columns so the 64-term aggregate runs
      // once per row, not once per corpus code (the __graft_tk rationale)
      .withColumn("__graft_w0", lane(0))
      .withColumn("__graft_w1", lane(32))
      .filter(!exists(
        arrays_zip(typedLit(corpusW0).as("w0"), typedLit(corpusW1).as("w1")),
        c => (bit_count(col("__graft_w0").bitwiseXOR(c.getField("w0"))) +
          bit_count(col("__graft_w1").bitwiseXOR(c.getField("w1"))))
          <= lit(maxHamming)))
      .drop("__graft_w0", "__graft_w1")
  }
}
