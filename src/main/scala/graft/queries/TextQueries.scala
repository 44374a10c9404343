package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis operators over the `documents` table (beyond-reference
  * surface: language-ID, quality scoring, token counting, fingerprinting).
  * All metrics are codegen'd Catalyst expressions — per-row, shuffle-free,
  * linear at 100 TB.
  *
  * Oracle notes: DuckDB regexp_replace needs the 'g' flag to match Spark's
  * replace-all default; ratios are written as CAST(int AS DOUBLE)/CAST(int
  * AS DOUBLE) in both engines so they are IEEE-identical.
  */
object TextQueries extends QueryModule {

  private val tokSql = "regexp_extract_all(lower(text), '[a-z0-9]+')"
  private val nTokSql = s"len($tokSql)"
  private val punctSql =
    "(CAST(LENGTH(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)" +
      " / CAST(GREATEST(LENGTH(text), 1) AS DOUBLE))"
  private val avgLenSql =
    "(CAST(LENGTH(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS DOUBLE)" +
      s" / CAST(GREATEST($nTokSql, 1) AS DOUBLE))"
  private def hitsSql(words: Seq[String]) =
    s"len(list_filter($tokSql, t -> list_contains([${words.map(w => s"'$w'").mkString(",")}], t)))"
  private val enHits = hitsSql(Seq("the", "a", "of", "and", "to", "in", "is"))
  private val deHits = hitsSql(Seq("der", "die", "das", "und", "ist", "ein"))
  private val frHits = hitsSql(Seq("le", "la", "les", "et", "est", "un"))
  private val esHits = hitsSql(Seq("el", "los", "las", "y", "es", "un"))
  private val stopRatioSql =
    s"(CAST($enHits AS DOUBLE) / CAST(GREATEST($nTokSql, 1) AS DOUBLE))"
  // shared with DedupQueries' q110 mixing report (same formula, one text)
  private[queries] val qualitySql =
    s"""LEAST(CAST($nTokSql AS DOUBLE) / 50.0, 1.0) * 0.4
                      + (1.0 - $punctSql) * 0.3
                      + LEAST($stopRatioSql * 5.0, 1.0) * 0.3"""

  /** Token counting: whitespace-word and BPE-ish tokenizations side by side. */
  private val q25 = QueryDef(
    "q25_token_stats",
    (s, d) => Tables(s, d, "documents")
      .select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        distinctTokenCount(col("text")).as("n_distinct_tokens"),
        size(bpeTokens(col("text"))).as("n_bpe_tokens"),
        length(col("text")).as("char_len"),
        avgTokenLen(col("text")).as("avg_token_len"))
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id,
                    $nTokSql AS n_tokens,
                    len(list_distinct($tokSql)) AS n_distinct_tokens,
                    len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe_tokens,
                    LENGTH(text) AS char_len,
                    $avgLenSql AS avg_token_len
             FROM documents ORDER BY doc_id"""))

  /** Quality scoring: length/punctuation/stopword components + composite. */
  private val q26 = QueryDef(
    "q26_quality_score",
    (s, d) => Tables(s, d, "documents")
      .select(
        col("doc_id"),
        punctRatio(col("text")).as("punct_ratio"),
        stopwordRatio(col("text")).as("stopword_ratio"),
        qualityScore(col("text")).as("quality"))
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id,
                    $punctSql AS punct_ratio,
                    $stopRatioSql AS stopword_ratio,
                    $qualitySql AS quality
             FROM documents ORDER BY doc_id"""))

  /** Language-ID: stopword-hit argmax with fixed tie-break, scored against
    * the labeled `lang` column.
    */
  private val q27 = QueryDef(
    "q27_lang_id",
    (s, d) => Tables(s, d, "documents")
      .select(
        col("doc_id"),
        col("lang"),
        langGuess(col("text")).as("lang_guess"),
        (langGuess(col("text")) === col("lang")).cast("int").as("hit"))
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id, lang,
                    CASE WHEN $enHits >= $deHits AND $enHits >= $frHits AND $enHits >= $esHits THEN 'en'
                         WHEN $deHits >= $frHits AND $deHits >= $esHits THEN 'de'
                         WHEN $frHits >= $esHits THEN 'fr'
                         ELSE 'es' END AS lang_guess,
                    CAST(CASE WHEN $enHits >= $deHits AND $enHits >= $frHits AND $enHits >= $esHits THEN 'en'
                         WHEN $deHits >= $frHits AND $deHits >= $esHits THEN 'de'
                         WHEN $frHits >= $esHits THEN 'fr'
                         ELSE 'es' END = lang AS INT) AS hit
             FROM documents ORDER BY doc_id"""))

  /** Document fingerprinting: exact-content hash + order-insensitive
    * bag-of-words hash (the dedup keys used by DedupQueries).
    */
  private val q28 = QueryDef(
    "q28_fingerprint",
    (s, d) => Tables(s, d, "documents")
      .select(
        col("doc_id"),
        contentHash(col("text")).as("content_hash"),
        fingerprint(col("text")).as("bow_fingerprint"))
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id,
                    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash,
                    md5(array_to_string(list_sort(list_distinct($tokSql)), ' ')) AS bow_fingerprint
             FROM documents ORDER BY doc_id"""))

  /** TF-IDF-style keyword extraction: top-3 distinctive tokens per doc by
    * tf * (N/df). Deliberately log-free — the linear rarity weight keeps
    * the score an exact double expression both engines compute identically
    * (ln() bit-patterns are libm-dependent and would break the hash gate).
    * Shape at scale: tf is one shuffle on (doc,token); df is a tiny
    * aggregate (vocabulary-sized) joined back by broadcast; the corpus size
    * N is a broadcast scalar.
    */
  private val q51 = QueryDef(
    "q51_tfidf_keywords",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, d, "documents")
      val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      // df derives from tf (a (doc, tok) row in tf IS a distinct pair),
      // so the token stream is exploded and aggregated ONCE; tf is
      // checkpointed because it feeds both df and the scoring join
      val tf = tok.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        .localCheckpoint(true)
      val df_ = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("tok").asc)
      tf.join(broadcast(df_), "tok")
        .crossJoin(broadcast(n))
        .withColumn("score", col("tf").cast("double") *
          (col("n_docs").cast("double") / col("df").cast("double")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk"), col("tok"), col("tf"), col("df"),
          col("score"))
        .orderBy("doc_id", "rnk")
    },
    Some(s"""WITH tok AS (SELECT doc_id, unnest($tokSql) AS tok FROM documents),
                  tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY doc_id, tok),
                  dfx AS (SELECT tok, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM tok) GROUP BY tok),
                  scored AS (SELECT doc_id, tok, tf, df,
                               CAST(tf AS DOUBLE) * (CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / CAST(df AS DOUBLE)) AS score
                             FROM tf JOIN dfx USING (tok))
             SELECT doc_id, rnk, tok, tf, df, score FROM (
               SELECT doc_id, tok, tf, df, score,
                      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, tok ASC) AS rnk
               FROM scored) t
             WHERE rnk <= 3 ORDER BY doc_id, rnk"""))

  /** Document chunking for retrieval/context-window ingestion: overlapping
    * token windows (width 20, stride 10) per document, with the chunk text
    * reassembled and counted. Pure array arithmetic — the start offsets
    * are a generated sequence, each window a slice; map-only at any scale
    * (the RAG-ingestion twin of q77's training-batch packing, which groups
    * docs instead of splitting them).
    */
  private val q80 = QueryDef(
    "q80_doc_chunking",
    (s, d) => Tables(s, d, "documents")
      .withColumn("tk", tokens(col("text")))
      .withColumn("n", size(col("tk")))
      // last start is greatest(n-11, 0): a start past that would yield a
      // window wholly contained in the previous one (n <= s+10 means
      // [s+1, n] is a sub-span of [s-9, s+10]) — a 100%-duplicate chunk
      // in the index
      .withColumn("start", explode(expr(
        "CASE WHEN n > 0 THEN sequence(0, greatest(n - 11, 0), 10) ELSE array() END")))
      .select(col("doc_id"),
        expr("start div 10").as("chunk_id"),
        expr("size(slice(tk, start + 1, 20))").as("n_chunk_tokens"),
        expr("array_join(slice(tk, start + 1, 20), ' ')").as("chunk_text"))
      .orderBy("doc_id", "chunk_id"),
    Some(s"""WITH t AS (SELECT doc_id, $tokSql AS tk FROM documents),
                  st AS (SELECT doc_id, tk, unnest(
                           CASE WHEN len(tk) > 0
                                THEN range(0, greatest(len(tk) - 10, 1), 10)
                                ELSE []::BIGINT[] END) AS start
                         FROM t)
             SELECT doc_id,
                    start // 10 AS chunk_id,
                    len(list_slice(tk, start + 1, start + 20)) AS n_chunk_tokens,
                    array_to_string(list_slice(tk, start + 1, start + 20), ' ') AS chunk_text
             FROM st ORDER BY doc_id, chunk_id"""))

  // PII scrub patterns (applied in order: the email/phone shapes must be
  // masked before the bare digit-run rule can eat their digit groups).
  // Identical RE2-compatible syntax on both engines.
  private val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val phoneRe = "[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}"
  private val idRunRe = "[0-9]{4,}"

  /** PII redaction over the customer dimension: mask email-, phone-, and
    * id-shaped substrings, reporting per-row redaction counts. Map-only
    * regex chain — no shuffle, linear at 100 TB; at cluster scale this is
    * the write-side scrub every export runs. (The synthetic names carry id
    * runs; the email/phone patterns are exercised value-level in
    * GraftFunctionsSpec.)
    */
  private val q85 = QueryDef(
    "q85_pii_redaction",
    (s, d) => Tables(s, d, "customer")
      .select(
        col("c_custkey"),
        regexp_replace(regexp_replace(regexp_replace(col("c_name"),
          emailRe, "[EMAIL]"), phoneRe, "[PHONE]"), idRunRe, "[ID]")
          .as("redacted_name"),
        regexp_count(col("c_name"), lit(emailRe)).as("n_emails"),
        regexp_count(col("c_name"), lit(phoneRe)).as("n_phones"),
        regexp_count(col("c_name"), lit(idRunRe)).as("n_ids"))
      .orderBy("c_custkey"),
    Some(s"""SELECT c_custkey,
                    regexp_replace(regexp_replace(regexp_replace(c_name,
                      '$emailRe', '[EMAIL]', 'g'), '$phoneRe', '[PHONE]', 'g'),
                      '$idRunRe', '[ID]', 'g') AS redacted_name,
                    CAST(len(regexp_extract_all(c_name, '$emailRe')) AS INT) AS n_emails,
                    CAST(len(regexp_extract_all(c_name, '$phoneRe')) AS INT) AS n_phones,
                    CAST(len(regexp_extract_all(c_name, '$idRunRe')) AS INT) AS n_ids
             FROM customer ORDER BY c_custkey"""))

  /** Corpus heavy hitters: exact top-20 bigrams by count. The bigram array
    * is built map-side from the token array (no window, no per-token
    * shuffle); the only exchange is the partial-aggregated (bigram, count)
    * shuffle, whose width is the bigram vocabulary — tiny next to the
    * corpus. TopK is a sort of the aggregate output, not the data.
    */
  private val q86 = QueryDef(
    "q86_bigram_heavy_hitters",
    (s, d) => Tables(s, d, "documents")
      .withColumn("tk", tokens(col("text")))
      .withColumn("bigram", explode(expr(
        "CASE WHEN size(tk) >= 2 THEN transform(sequence(1, size(tk) - 1)," +
          " i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1)))" +
          " ELSE array() END")))
      .groupBy("bigram")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(20),
    Some(s"""WITH t AS (SELECT doc_id, $tokSql AS tk FROM documents),
                  bg AS (SELECT unnest(CASE WHEN len(tk) >= 2
                           THEN list_transform(range(len(tk) - 1),
                                  i -> tk[i+1] || ' ' || tk[i+2])
                           ELSE []::VARCHAR[] END) AS bigram FROM t)
             SELECT bigram, COUNT(*) AS n FROM bg
             GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20"""))

  /** Unicode canonicalization via the codegen'd NormalizeTextExpr: NFC,
    * accent strip, lowercase, whitespace collapse — the pre-fingerprint
    * normalization of a dedup pipeline, as one per-row expression. The
    * oracle runs DuckDB's utf8proc equivalents; non-ASCII behavior is
    * value-pinned in GraftFunctionsSpec (the corpus itself is ASCII).
    */
  private val q88 = QueryDef(
    "q88_text_normalize",
    (s, d) => Tables(s, d, "documents")
      .select(
        col("doc_id"),
        normalizeText(col("text")).as("norm_text"),
        md5(normalizeText(col("text"))).as("norm_hash"),
        (normalizeText(col("text")) =!= col("text")).as("changed"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
                   trim(regexp_replace(lower(strip_accents(nfc_normalize(text))), '\s+', ' ', 'g')) AS norm_text,
                   md5(trim(regexp_replace(lower(strip_accents(nfc_normalize(text))), '\s+', ' ', 'g'))) AS norm_hash,
                   trim(regexp_replace(lower(strip_accents(nfc_normalize(text))), '\s+', ' ', 'g')) != text AS changed
            FROM documents ORDER BY doc_id"""))

  /** First BPE merge round: the top adjacent-character pairs over the word
    * VOCABULARY, weighted by word frequency — the argmax a byte-pair
    * tokenizer trainer computes before its first merge. Running the pair
    * expansion over distinct words (not the corpus stream) is the standard
    * trick: corpus scale only affects the word-count aggregation; the
    * quadratic-ish pair work is vocabulary-sized, and vocabularies grow
    * sub-linearly (Heaps' law) while the corpus grows without bound.
    */
  private val q104 = QueryDef(
    "q104_bpe_merge_pairs",
    (s, d) => Tables(s, d, "documents")
      .withColumn("w", explode(tokens(col("text"))))
      .groupBy("w").agg(count(lit(1)).as("wn"))
      .filter(length(col("w")) >= 2)
      .withColumn("i", explode(sequence(lit(1), length(col("w")) - 1)))
      .select(expr("substring(w, i, 2)").as("pair"), col("wn"))
      .groupBy("pair")
      .agg(sum("wn").as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(20),
    Some(s"""WITH wd AS (SELECT unnest($tokSql) AS w FROM documents),
                  words AS (SELECT w, COUNT(*) AS wn FROM wd GROUP BY w),
                  pr AS (SELECT unnest(CASE WHEN len(w) >= 2
                           THEN list_transform(range(len(w) - 1),
                                  i -> substring(w, CAST(i + 1 AS INT), 2))
                           ELSE []::VARCHAR[] END) AS pair, wn
                         FROM words)
             SELECT pair, CAST(SUM(wn) AS BIGINT) AS n
             FROM pr GROUP BY pair ORDER BY n DESC, pair LIMIT 20"""))

  /** Per-source quality pruning (the FineWeb-style curation move): score
    * every document with the q26 composite and keep each source's top
    * half by percent_rank. Pruning WITHIN the source (not globally)
    * preserves the source mix — a global cutoff would silently delete
    * whole low-scoring domains, which is a mixing decision (q78/q103),
    * not a quality one.
    *
    * Determinism: percent_rank is (rank-1)/(n-1) with a doc_id tiebreak —
    * the tiebreak makes the order total, so rank = row_number and the
    * whole thing is exact integer arithmetic into one IEEE division,
    * identical in both engines.
    *
    * Scale shape: a percent_rank window partitioned by `source` puts each
    * source's ENTIRE slice on one task (corpus/#sources rows — terabytes
    * at the 100 TB target), so the rank is computed in the two-pass
    * q106 form instead, sub-bucketed WITHIN each source by a coarse
    * quality range (floor(quality·1024) — a prefix of the ordering key,
    * ties can never cross a bucket boundary because equal quality means
    * equal bucket): pass 1 aggregates per-(source, bucket) counts
    * (#sources × ≤1025 rows) into per-source exclusive offsets ordered
    * by bucket DESC, pass 2 ranks within (source, bucket) and adds the
    * broadcast offset; n per source is a broadcast #sources-row
    * aggregate. Remaining boundary: a single quality VALUE dominating a
    * source still funnels its tie mass to one task — the fundamental
    * limit of exact ranking; past it, switch to an approx-quantile
    * cutoff with documented error.
    */
  private val q105 = QueryDef(
    "q105_quality_prune",
    (s, d) => {
      // materialized once: the regex-heavy quality scoring feeds both
      // passes, and without the checkpoint each consumer re-scores the
      // corpus (the kmeansCentroids move — only (doc_id, source,
      // quality, qb) is kept, the text never materializes)
      val bucketed = Tables(s, d, "documents")
        .select(col("doc_id"), col("source"),
          qualityScore(col("text")).as("quality"))
        .withColumn("qb", floor(col("quality") * lit(1024)).cast("long"))
        .localCheckpoint(true)
      // the two-pass rank (per-source exclusive offsets over quality
      // ranges, rank within each (source, qb) cell) is the shared
      // operators.BucketedRank; per-source n re-aggregates the tiny
      // checkpointed frame
      val ns = bucketed.groupBy("source").agg(count(lit(1)).as("n"))
      graft.operators.BucketedRank.rank(bucketed, Seq("source"), "qb",
          bucketAsc = false, Seq(col("quality").desc, col("doc_id").asc))
        .join(broadcast(ns), "source")
        .withColumn("pr", when(col("n") === 1, lit(0.0))
          .otherwise((col("rank") - 1).cast("double")
            / (col("n") - 1).cast("double")))
        .filter(col("pr") <= 0.5)
        .select(col("doc_id"), col("source"), col("quality"), col("pr"))
        .orderBy("doc_id")
    },
    Some(s"""SELECT doc_id, source, quality, pr FROM (
               SELECT doc_id, source, quality,
                      PERCENT_RANK() OVER (PARTITION BY source
                        ORDER BY quality DESC, doc_id ASC) AS pr
               FROM (SELECT doc_id, source, $qualitySql AS quality
                     FROM documents) t) r
             WHERE pr <= 0.5 ORDER BY doc_id"""))

  /** Corpus-trained bigram coherence score (the CCNet-style statistical
    * quality filter, without a log): every bigram occurrence is scored by
    * how often its first word is followed by its second across the corpus
    * — affinity = (10⁶·count(w1,w2)) div count(w1·), an INTEGER in
    * [0, 10⁶] — and a document's coherence is the mean affinity of its
    * bigrams. Word salad scores low (its bigrams never repeat), natural
    * phrasing scores high. Integer affinities make the per-doc SUM
    * order-independent (a float sum across a shuffle would not be), so
    * the score survives the cross-engine hash gate; the single division
    * happens once at the end.
    *
    * Scale shape: COUNT windows keyed on w1/(w1,w2) would shuffle the
    * full bigram stream on Zipfian keys — every occurrence of a stopword
    * head ("the" alone is a measurable fraction of English) lands on ONE
    * task — so the affinity is built as a TABLE instead: one aggregation
    * with map-side partial combine collapses the stream to distinct
    * (w1, w2) counts (vocabulary-sized by Heaps' law, and skew-free:
    * post-combine each key is one row per input partition), a second
    * vocabulary-sized aggregate gives the w1 marginals, and the integer
    * affinity is broadcast-joined back to the bigram stream — the score
    * becomes map-side. The corpus is scanned twice (table build + score),
    * the standard trade against shuffling it. The broadcast() hint is the
    * vocabulary-fits dial, and it is a HINT with no automatic fallback:
    * above broadcast memory, drop the hint so the rejoin plans as a
    * shuffle join on (w1, w2) — tolerable there because the two-column
    * bigram key splinters each stopword head across its continuations
    * and AQE's skew split handles the residual hot pairs. Per-doc reduce
    * is one doc_id shuffle.
    */
  private val q109 = QueryDef(
    "q109_bigram_coherence",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      val bg = docs.withColumn("tk", tokens(col("text")))
        .withColumn("i", explode(expr(
          "CASE WHEN size(tk) >= 2 THEN sequence(1, size(tk) - 1)" +
            " ELSE CAST(array() AS ARRAY<INT>) END")))
        .select(col("doc_id"),
          expr("element_at(tk, i)").as("w1"),
          expr("element_at(tk, i + 1)").as("w2"))
      // the affinity TABLE: vocabulary-sized, integer-valued
      val ab = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      val au = ab.groupBy("w1").agg(sum("cb").as("cu"))
      val aff = ab.join(au, "w1")
        .select(col("w1"), col("w2"),
          expr("(1000000 * cb) div cu").as("aff"))
      val per = bg.join(broadcast(aff), Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum("aff").as("sc"))
      docs.select("doc_id").join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          (coalesce(col("sc"), lit(0L)).cast("double") /
            (greatest(coalesce(col("n_bigrams"), lit(0L)), lit(1L)).cast("double")
              * lit(1000000.0))).as("coherence"))
        .orderBy("doc_id")
    },
    Some(s"""WITH t AS (SELECT doc_id, $tokSql AS tk FROM documents),
                  bg AS (SELECT doc_id,
                           unnest(CASE WHEN len(tk) >= 2 THEN tk[1:len(tk)-1]
                                  ELSE []::VARCHAR[] END) AS w1,
                           unnest(CASE WHEN len(tk) >= 2 THEN tk[2:len(tk)]
                                  ELSE []::VARCHAR[] END) AS w2
                         FROM t),
                  per AS (SELECT doc_id, COUNT(*) AS n_bigrams,
                                 CAST(SUM(aff) AS BIGINT) AS sc
                          FROM (SELECT doc_id,
                                  (1000000 * COUNT(*) OVER (PARTITION BY w1, w2))
                                    // COUNT(*) OVER (PARTITION BY w1) AS aff
                                FROM bg) x
                          GROUP BY doc_id)
             SELECT d.doc_id,
                    COALESCE(n_bigrams, 0) AS n_bigrams,
                    CAST(COALESCE(sc, 0) AS DOUBLE)
                      / (CAST(GREATEST(COALESCE(n_bigrams, 0), 1) AS DOUBLE) * 1000000.0)
                      AS coherence
             FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
             ORDER BY d.doc_id"""))

  /** Curriculum schedule: the corpus cut into 10 training stages by
    * GLOBAL quality rank (stage 0 = the highest-quality decile — the
    * easy/clean warm-up slice; stage 9 = the tail), reported as the
    * per-stage doc count, token mass, and quality bounds a curriculum
    * dataloader consumes. Stage membership is exact and deterministic:
    * stage = ((rank−1)·10) div n over the total (quality DESC, doc_id)
    * order — integer arithmetic, no ntile, no randomness.
    *
    * Scale shape: q105's two-pass rank globalized — scores checkpoint
    * once (regex scoring is the expensive map), pass 1 counts per
    * quality-range bucket (1025 tiny rows → exclusive offsets in
    * quality-DESC order), pass 2 ranks within each bucket and adds the
    * broadcast offset; a global `Window.orderBy` would serialize the
    * corpus through one task. The report is a 10-row aggregate.
    */
  private val q120 = QueryDef(
    "q120_curriculum_stages",
    (s, d) => {
      val bucketed = Tables(s, d, "documents")
        .select(col("doc_id"), col("n_chars"),
          qualityScore(col("text")).as("quality"))
        .withColumn("qb", floor(col("quality") * lit(1024)).cast("long"))
        .localCheckpoint(true)
      val n = bucketed.agg(count(lit(1)).as("n"))
      graft.operators.BucketedRank.rank(bucketed, Seq.empty, "qb",
          bucketAsc = false, Seq(col("quality").desc, col("doc_id").asc))
        .crossJoin(broadcast(n))
        .withColumn("stage", expr("((rank - 1) * 10) div n"))
        .groupBy("stage")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("stage_tokens"),
          min("quality").as("min_quality"),
          max("quality").as("max_quality"))
        .orderBy("stage")
    },
    Some(s"""WITH t AS (SELECT doc_id, n_chars, $qualitySql AS quality
                        FROM documents),
                  r AS (SELECT doc_id, n_chars, quality,
                          ROW_NUMBER() OVER (ORDER BY quality DESC,
                            doc_id ASC) AS rank,
                          COUNT(*) OVER () AS n
                        FROM t)
             SELECT ((rank - 1) * 10) // n AS stage, COUNT(*) AS n_docs,
                    CAST(SUM(n_chars) AS BIGINT) AS stage_tokens,
                    MIN(quality) AS min_quality, MAX(quality) AS max_quality
             FROM r GROUP BY stage ORDER BY stage"""))

  /** Quality-distribution drift per source: the L1 (total-variation × 2)
    * distance between each source's quality histogram (10 fixed bins)
    * and the global histogram — the dataset-governance check that flags
    * a source whose quality profile diverges from the corpus (a crawl
    * gone bad, a source switching boilerplate style) before it skews a
    * mix. PSI would need ln() (libm-dependent, the q51/q92 rationale);
    * L1 over fixed bins carries the same signal deterministically.
    *
    * Scale shape: ONE corpus scan aggregates 11 conditional counts per
    * source (map-side combine, #sources rows); the global histogram is
    * that tiny frame re-aggregated to one broadcast row. The L1 sum is
    * a FIXED-ORDER chain over the 10 bin columns (the q92/q108
    * fixed-order-sum discipline — an aggregate over bin rows would sum
    * doubles in engine-chosen order), so both engines match
    * bit-for-bit. Nothing corpus-sized past the first aggregate.
    */
  private val q121 = QueryDef(
    "q121_quality_drift",
    (s, d) => {
      val bins = 10
      val qb = least(floor(qualityScore(col("text")) * lit(bins)).cast("long"),
        lit((bins - 1).toLong))
      // materialized once (#sources tiny rows): the global histogram
      // re-aggregates perSrc AND the probe side joins it — without the
      // checkpoint the regex-heavy quality scan would appear twice in
      // the plan (the q105/q120 one-relation-many-consumers discipline)
      val perSrc = Tables(s, d, "documents")
        .select(col("source"), qb.as("qb"))
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          (0 until bins).map(b =>
            sum(when(col("qb") === b, 1L).otherwise(0L)).as(s"c$b")): _*)
        .localCheckpoint(true)
      val glob = perSrc.agg(sum("n").as("gn"),
        (0 until bins).map(b => sum(s"c$b").as(s"g$b")): _*)
      val l1 = (0 until bins).map { b =>
        abs(col(s"c$b").cast("double") / col("n").cast("double") -
          col(s"g$b").cast("double") / col("gn").cast("double"))
      }.reduce(_ + _)
      perSrc.crossJoin(broadcast(glob))
        .select(col("source"), col("n").as("n_docs"), l1.as("l1_drift"))
        .orderBy("source")
    },
    Some {
      val bins = 10
      val qbSql = s"LEAST(CAST(FLOOR(($qualitySql) * $bins) AS BIGINT), ${bins - 1})"
      val cDefs = (0 until bins).map(b =>
        s"CAST(SUM(CASE WHEN qb = $b THEN 1 ELSE 0 END) AS BIGINT) AS c$b")
        .mkString(", ")
      val gDefs = (0 until bins).map(b =>
        s"CAST(SUM(c$b) AS BIGINT) AS g$b").mkString(", ")
      val l1Sql = (0 until bins).map(b =>
        s"abs(CAST(c$b AS DOUBLE) / CAST(n AS DOUBLE) - " +
          s"CAST(g$b AS DOUBLE) / CAST(gn AS DOUBLE))")
        .mkString("\n                      + ")
      s"""WITH t AS (SELECT source, $qbSql AS qb FROM documents),
              per AS (SELECT source, COUNT(*) AS n, $cDefs
                      FROM t GROUP BY source),
              gtot AS (SELECT CAST(SUM(n) AS BIGINT) AS gn, $gDefs FROM per)
          SELECT source, n AS n_docs,
                 $l1Sql AS l1_drift
          FROM per CROSS JOIN gtot
          ORDER BY source"""
    })

  /** Vocabulary coverage / OOV report: the deterministic top-1000 token
    * vocabulary by global frequency (count DESC, token ASC — a total
    * order, so the cut is reproducible in any engine), then each source's
    * out-of-vocabulary token-occurrence rate. The tokenizer-design twin of
    * q104's BPE pairs: a source with a high OOV rate against the planned
    * vocabulary will fragment into long byte-level token sequences and
    * deserves either vocab budget or exclusion.
    *
    * Scale shape: one corpus scan into a (source, token) counted
    * aggregate — Zipf-head tokens are absorbed by map-side partial
    * aggregation (the q109 lesson: hot keys are safe in aggregates,
    * fatal in windows). The vocabulary is a top-k over the
    * vocabulary-sized (Heaps' law) token rollup of that frame, and joins
    * back BROADCAST onto the vocab×sources-sized aggregate — never the
    * corpus token stream. The final rollup is #sources rows.
    */
  private val q125 = QueryDef(
    "q125_vocab_oov",
    (s, d) => {
      // checkpointed: st feeds the vocabulary rollup AND the final OOV
      // join, so the tokenizing aggregate ran twice; the relation is
      // (source x vocabulary)-sized (Heaps' law), far below the stream
      val st = Tables(s, d, "documents")
        .select(col("source"), explode(tokens(col("text"))).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
        .localCheckpoint(true)
      val vocab = st.groupBy("tok").agg(sum("c").as("n"))
        .orderBy(col("n").desc, col("tok").asc)
        .limit(1000)
        .select(col("tok"), lit(1).as("iv"))
      st.join(broadcast(vocab), Seq("tok"), "left")
        .groupBy("source")
        .agg(sum("c").as("n_tokens"),
          sum(when(col("iv").isNull, col("c")).otherwise(0L)).as("n_oov"))
        .select(col("source"),
          col("n_tokens").cast("long").as("n_tokens"),
          col("n_oov").cast("long").as("n_oov"),
          (col("n_oov").cast("double") / col("n_tokens").cast("double"))
            .as("oov_rate"))
        .orderBy("source")
    },
    Some(s"""WITH tok AS (SELECT source, unnest($tokSql) AS tok FROM documents),
                  st AS (SELECT source, tok, COUNT(*) AS c FROM tok
                         GROUP BY source, tok),
                  vocab AS (SELECT tok, 1 AS iv FROM (
                              SELECT tok, CAST(SUM(c) AS BIGINT) AS n
                              FROM st GROUP BY tok
                              ORDER BY n DESC, tok ASC LIMIT 1000)),
                  j AS (SELECT st.source, st.c, vocab.iv
                        FROM st LEFT JOIN vocab ON st.tok = vocab.tok)
             SELECT source,
                    CAST(SUM(c) AS BIGINT) AS n_tokens,
                    CAST(SUM(CASE WHEN iv IS NULL THEN c ELSE 0 END) AS BIGINT) AS n_oov,
                    CAST(SUM(CASE WHEN iv IS NULL THEN c ELSE 0 END) AS DOUBLE)
                      / CAST(SUM(c) AS DOUBLE) AS oov_rate
             FROM j GROUP BY source ORDER BY source"""))

  /** Statistical-LM fluency filter (the CCNet/KenLM perplexity-filter
    * shape): train a unigram LM on the in-domain slice (lang = 'en'),
    * score EVERY document by how improbable its tokens are under that
    * model, and flag high-OOV documents for removal. The classic score
    * is mean log-probability (perplexity); this ships the ln-free twin —
    * the arithmetic mean of per-token INVERSE probability
    * (N + V + 1) / (cnt + 1) — because ln() bit-patterns are
    * libm-dependent and would break the hash gate (the q51/q92
    * rationale). Same ranking intent: fluent in-domain text scores low,
    * out-of-domain and rare-token text scores high, OOV tokens dominate
    * exactly as unk-penalties do in the real filter. Each ratio is ONE
    * IEEE division of exact integers (correctly rounded, bit-identical
    * across engines), snapped to 4 decimals and summed as DECIMAL.
    *
    * Scale design: the trained artifact is the top-V vocabulary —
    * TakeOrdered (parallel, the q92 move), bounded at V=2000, broadcast.
    * The scoring pass is one corpus scan: explode, broadcast-hash-join
    * the vocab, per-doc aggregate with map-side partials (a document's
    * tokens never leave their input partition before partial agg). The
    * train-side count is a vocabulary-keyed shuffle with partial
    * aggregation absorbing the Zipf head (the q109 argument). No
    * windows anywhere.
    */
  /** The q129 scoring subplan, shared with the tercile bucketing (q135):
    * per-document (doc_id, lang, n_toks, n_oov, improb) under the
    * en-trained top-V unigram LM. Documents with ZERO tokens produce no
    * exploded rows and are absent from the result — a tokenless payload
    * has no fluency to score.
    */
  private def fluencyScored(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val v = 2000
    // ONE en-side tokenization feeds both trained artifacts (the q132
    // tokStats move): vocab is the count relation's top-v head and the
    // token total its sum, so the train-side explode runs once instead
    // of twice. Vocabulary-sized, checkpointed.
    val cnts = docs.filter(col("lang") === "en")
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val vocab = cnts.orderBy(col("cnt").desc, col("tok").asc).limit(v)
    val totals = cnts.agg(coalesce(sum("cnt"), lit(0L)).as("n_train"))
    docs.select(col("doc_id"), col("lang"),
        explode(tokens(col("text"))).as("tok"))
      .join(broadcast(vocab), Seq("tok"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("ratio",
        (col("n_train") + lit(v + 1)).cast("double") /
          (coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double"))
      .withColumn("oov", when(col("cnt").isNull, 1L).otherwise(0L))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_toks"), sum(col("oov")).as("n_oov"),
        Exact.davg(col("ratio")).as("improb"))
  }

  private val q129 = QueryDef(
    "q129_lm_fluency_score",
    (s, d) => fluencyScored(Tables(s, d, "documents"))
      .withColumn("keep", col("n_oov") * lit(5) <= col("n_toks"))
      .orderBy("doc_id"),
    Some(s"""WITH tok AS (SELECT doc_id, lang, unnest($tokSql) AS tok
                          FROM documents),
                  ttok AS (SELECT unnest($tokSql) AS tok FROM documents
                           WHERE lang = 'en'),
                  cnts AS (SELECT tok, COUNT(*) AS cnt FROM ttok GROUP BY tok),
                  vocab AS (SELECT tok, cnt FROM cnts
                            ORDER BY cnt DESC, tok ASC LIMIT 2000),
                  tot AS (SELECT COUNT(*) AS n_train FROM ttok),
                  scored AS (SELECT doc_id, lang,
                               CAST(n_train + 2001 AS DOUBLE)
                                 / CAST(COALESCE(cnt, 0) + 1 AS DOUBLE) AS ratio,
                               CASE WHEN cnt IS NULL THEN 1 ELSE 0 END AS oov
                             FROM tok LEFT JOIN vocab USING (tok)
                                      CROSS JOIN tot)
             SELECT doc_id, lang, COUNT(*) AS n_toks,
                    CAST(SUM(oov) AS BIGINT) AS n_oov,
                    ${Exact.sqlDavg("ratio")} AS improb,
                    (5 * SUM(oov) <= COUNT(*)) AS keep
             FROM scored GROUP BY doc_id, lang ORDER BY doc_id"""))

  /** CCNet-style per-source fluency terciles: rank every scored document
    * within its source by LM improbability (q129's score — low = fluent)
    * and cut each source into exact thirds — head/middle/tail, the
    * bucketing CCNet uses per language to keep the fluent head, sample
    * the middle, and drop the tail. The report is (source, bucket,
    * count, score range) — the calibration table a curation run reads
    * to set per-domain thresholds instead of one global cutoff (a
    * global cutoff keeps the easy domains whole and guts the hard
    * ones; per-source terciles adapt automatically).
    *
    * Exactness: tercile assignment is INTEGER rank arithmetic —
    * (3·(rank−1)) div n — not interpolated quantiles, so there is no
    * cross-engine floating-point boundary to disagree on; ranks agree
    * because the order (improb, doc_id) is deterministic and improb is
    * hash-identical to the oracle's (q129's gate). Scale: the rank runs
    * through the exact two-pass [[graft.operators.BucketedRank]] on
    * improb-range buckets — a rank window partitioned on source alone
    * would funnel whole sources through single tasks (the q105 trap);
    * per-source sizes are a #sources-row broadcast; the report is
    * #sources×3 rows.
    */
  private val q135 = QueryDef(
    "q135_ccnet_buckets",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      // the regex/LM scoring feeds both rank passes — materialize once,
      // 3 small columns only (the q105 move)
      val base = fluencyScored(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select(col("doc_id"), col("source"), col("improb"))
        .withColumn("ib", floor(col("improb") * lit(16)).cast("long"))
        .localCheckpoint(true)
      val ns = base.groupBy("source").agg(count(lit(1)).as("n"))
      graft.operators.BucketedRank.rank(base, Seq("source"), "ib",
          bucketAsc = true, Seq(col("improb").asc, col("doc_id").asc))
        .join(broadcast(ns), "source")
        .withColumn("bucket", expr("(3 * (rank - 1)) div n"))
        .groupBy("source", "bucket")
        .agg(count(lit(1)).as("n_docs"),
          min(col("improb")).as("min_improb"),
          max(col("improb")).as("max_improb"))
        .withColumn("bucket_name",
          when(col("bucket") === 0, lit("head"))
            .when(col("bucket") === 1, lit("middle"))
            .otherwise(lit("tail")))
        .select("source", "bucket", "bucket_name", "n_docs",
          "min_improb", "max_improb")
        .orderBy("source", "bucket")
    },
    Some(s"""WITH tok AS (SELECT doc_id, unnest($tokSql) AS tok
                          FROM documents),
                  ttok AS (SELECT unnest($tokSql) AS tok FROM documents
                           WHERE lang = 'en'),
                  cnts AS (SELECT tok, COUNT(*) AS cnt FROM ttok GROUP BY tok),
                  vocab AS (SELECT tok, cnt FROM cnts
                            ORDER BY cnt DESC, tok ASC LIMIT 2000),
                  tot AS (SELECT COUNT(*) AS n_train FROM ttok),
                  scored AS (SELECT doc_id,
                               ${Exact.sqlDavg("ratio")} AS improb
                             FROM (SELECT doc_id,
                                     CAST(n_train + 2001 AS DOUBLE)
                                       / CAST(COALESCE(cnt, 0) + 1 AS DOUBLE)
                                       AS ratio
                                   FROM tok LEFT JOIN vocab USING (tok)
                                        CROSS JOIN tot) t
                             GROUP BY doc_id),
                  j AS (SELECT s.doc_id, d.source, s.improb
                        FROM scored s JOIN documents d ON s.doc_id = d.doc_id),
                  r AS (SELECT doc_id, source, improb,
                          ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY improb ASC, doc_id ASC) AS rnk,
                          COUNT(*) OVER (PARTITION BY source) AS n
                        FROM j),
                  b AS (SELECT source, (3 * (rnk - 1)) // n AS bucket, improb
                        FROM r)
             SELECT source, bucket,
                    CASE bucket WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
                         ELSE 'tail' END AS bucket_name,
                    COUNT(*) AS n_docs,
                    MIN(improb) AS min_improb,
                    MAX(improb) AS max_improb
             FROM b GROUP BY source, bucket
             ORDER BY source, bucket"""))

  // ------------------------------------------------------------------
  // BPE tokenizer: q104 counts the FIRST merge round; this is the rest
  // of the tokenizer — a trained merge SEQUENCE and the corpus encoder.
  // ------------------------------------------------------------------

  /** Classic BPE training over a word-count table: start from character
    * sequences, repeatedly merge the most frequent adjacent token pair
    * (count-weighted by word frequency; ties broken by lexicographic
    * (a, b) — a total order, so the merge sequence is deterministic on
    * any engine), re-tokenizing the vocabulary after each merge.
    * Driver-side on the word-count artifact by design — the vocabulary
    * is the k-sized trained object here (the PCA covariance argument);
    * at 100 TB train on the top-V words (Zipf makes the tail
    * irrelevant to merge counts) and the encoder below still covers
    * every word. Returns the ordered merge list.
    */
  def bpeTrain(wordCounts: Seq[(String, Long)],
      merges: Int): Seq[(String, String)] =
    bpeTrainFrom(wordCounts, Seq.empty, merges)

  /** Hard cap on the word-count rows collected to the driver for BPE
    * training. On a 100 TB web corpus the DISTINCT-word relation runs to
    * 10^8-10^9 rows — an uncapped `collect()` kills the driver — while
    * merge-pair counts are Zipf-dominated by the head: frequency-
    * truncated training is the industry norm and the tail contributes
    * O(tail-mass) to every pair count. 1M rows ≈ tens of MB on the
    * driver, far above any real tokenizer's training vocabulary, and
    * >> every test SF's distinct-word count (so trained merges are
    * IDENTICAL to uncapped training at every verified scale —
    * BpeSpec pins cap-insensitivity on the fixture).
    */
  val BpeTrainVocabCap = 1000000

  /** The one sanctioned driver-side step of the tokenizer lifecycle:
    * deterministic top-[[BpeTrainVocabCap]] word counts by
    * (count DESC, word ASC) — a total order, so the sample (and thus
    * the trained merges) is engine- and partitioning-independent. The
    * cap sits IN the plan (TakeOrderedAndProject: per-partition top-N,
    * only N rows ever reach the driver), not as a post-collect trim.
    */
  def bpeTrainSample(words: org.apache.spark.sql.DataFrame,
      cap: Int = BpeTrainVocabCap): Seq[(String, Long)] =
    words.orderBy(col("wn").desc, col("w").asc).limit(cap)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** [[bpeTrain]] CONTINUED from an existing merge sequence: the initial
    * merges are replayed onto the fresh character state (the same greedy
    * fold the encoder uses), then training proceeds for `extra` more
    * rounds. Deterministic continuation: training 8 merges then 4 more
    * equals training 12 straight (BpeSpec pins this), which is what
    * makes a PERSISTED tokenizer extensible instead of frozen.
    * Returns initial ++ new merges.
    */
  def bpeTrainFrom(wordCounts: Seq[(String, Long)],
      initial: Seq[(String, String)], extra: Int): Seq[(String, String)] = {
    var state: Map[String, Vector[String]] =
      wordCounts.map { case (w, _) => w -> w.map(_.toString).toVector }.toMap
    initial.foreach { case (a, b) =>
      state = state.map { case (w, toks) =>
        val outToks = scala.collection.mutable.ArrayBuffer.empty[String]
        toks.foreach { t =>
          if (outToks.nonEmpty && outToks.last == a && t == b)
            outToks(outToks.length - 1) = a + b
          else outToks += t
        }
        w -> outToks.toVector
      }
    }
    val wc = wordCounts.toMap
    val out = Vector.newBuilder[(String, String)]
    out ++= initial
    val merges = initial.length + extra
    var k = initial.length
    var done = false
    while (k < merges && !done) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (w, toks) =>
        var i = 0
        while (i < toks.length - 1) {
          val p = (toks(i), toks(i + 1))
          pc(p) = pc.getOrElse(p, 0L) + wc(w)
          i += 1
        }
      }
      if (pc.isEmpty) done = true
      else {
        val bn = pc.values.max
        val best = pc.collect { case (p, n) if n == bn => p }.toSeq.min
        out += best
        state = state.map { case (w, toks) =>
          // greedy left fold (the one canonical apply — mirrored by the
          // SQL string fold and the encoder expression)
          val outToks = scala.collection.mutable.ArrayBuffer.empty[String]
          toks.foreach { t =>
            if (outToks.nonEmpty && outToks.last == best._1 && t == best._2)
              outToks(outToks.length - 1) = best._1 + best._2
            else outToks += t
          }
          w -> outToks.toVector
        }
        k += 1
      }
    }
    out.result()
  }

  /** Spec identity of a trained merge sequence: length + content hash.
    * A tokenizer is THE most dangerous artifact to silently swap — every
    * token id downstream (packed sequences, token budgets, vocab
    * statistics) changes meaning — so the stamp covers the full ordered
    * merge list, and [[bpeLoadTokenizer]] recomputes it from the loaded
    * rows: a hand-edited, truncated, or spliced store fails at load, the
    * index-family discipline applied to the tokenizer.
    */
  def bpeFingerprint(merges: Seq[(String, String)]): String = {
    // Pairs are joined with '\n' — a character that can never appear in
    // a token ([a-z0-9]+) — so distinct merge lists can never collide:
    // with no delimiter, [("a","b"),("cd","e")] and [("a","bc"),("d","e")]
    // both serialized to "a bcd e" and shared a stamp, letting character
    // shifts across pair boundaries pass the load check. The prefix is
    // bumped bpe: -> bpe2: so stores stamped under the old scheme fail
    // loudly at load instead of being silently re-validated.
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(merges.map { case (a, b) => a + " " + b }.mkString("\n")
        .getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    s"bpe2:merges=${merges.length}:$h"
  }

  /** Persists a trained merge sequence at `path`/meta + `path`/merges
    * (ord, a, b, fp). The tokenizer joins the persisted-artifact
    * lifecycle because production NEVER retrains per job: train once on
    * the word-count artifact, save, and every encoder (batch q143/q144
    * shapes, streaming token gates) loads the same bytes.
    */
  def bpeSaveTokenizer(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)], path: String): Unit = {
    require(merges.nonEmpty,
      "bpeSaveTokenizer: refusing to persist an EMPTY merge sequence — " +
        "train first (an empty store would be rejected at load as " +
        "interrupted)")
    val fp = bpeFingerprint(merges)
    import spark.implicits._
    spark.range(1).select(lit(fp).as("fp"),
        lit(merges.length).as("n_merges"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    merges.zipWithIndex.map { case ((a, b), i) => (i, a, b, fp) }
      .toDF("ord", "a", "b", "fp")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/merges")
  }

  /** Restores a merge sequence. The stamp is RECOMPUTED from the loaded
    * ordered rows and checked against meta — any corruption of content,
    * order, or length fails loudly instead of silently re-tokenizing
    * the corpus differently.
    */
  def bpeLoadTokenizer(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, String)] = {
    val meta = spark.read.parquet(s"$path/meta")
      .select("fp", "n_merges").take(1)
    require(meta.nonEmpty,
      s"bpeLoadTokenizer: meta store at $path/meta is empty — " +
        "interrupted save or wrong path")
    val (fp, n) = (meta(0).getString(0), meta(0).getInt(1))
    val rows = spark.read.parquet(s"$path/merges")
      .orderBy("ord").collect()
    val merges = rows.map(r => (r.getString(1), r.getString(2))).toSeq
    require(merges.length == n,
      s"bpeLoadTokenizer: store carries ${merges.length} merges, meta " +
        s"declares $n — truncated or spliced store")
    require(bpeFingerprint(merges) == fp,
      s"bpeLoadTokenizer: recomputed fingerprint does not match the " +
        s"stored stamp $fp — the merge rows at $path/merges were " +
        "altered; re-save from a trusted training run")
    merges
  }

  /** The EXTEND verb of the tokenizer lifecycle: load, continue training
    * on (possibly newer) word counts, save back — the vocabulary-growth
    * path that preserves every existing token id (old merges keep their
    * positions; new merges only append), so already-encoded corpora
    * remain valid.
    */
  def bpeExtendTokenizer(spark: org.apache.spark.sql.SparkSession,
      wordCounts: Seq[(String, Long)], extra: Int, path: String): Unit = {
    val merges = bpeLoadTokenizer(spark, path)
    bpeSaveTokenizer(spark, bpeTrainFrom(wordCounts, merges, extra), path)
  }

  /** The per-merge apply as a codegen'd expression over a token-array
    * column `tk`: the SAME greedy left fold as [[bpeTrain]] and the
    * DuckDB twin, carried through a '|'-delimited string accumulator
    * (tokens are [a-z0-9]+, so the delimiter can never occur in one).
    */
  private def bpeFoldExpr(a: String, b: String): String =
    s"""filter(split(aggregate(tk, '|', (acc, t) ->
          IF(t = '$b' AND acc LIKE '%|$a|',
             concat(substring(acc, 1, length(acc) - ${a.length + 1}),
               '$a$b', '|'),
             concat(acc, t, '|'))), '[|]'), x -> x <> '')"""

  /** Distributed BPE encoding of a word relation `words`(w, …): apply
    * the trained merges IN ORDER as map-only array folds — no UDF, no
    * shuffle; the relation is vocabulary-sized (encode DISTINCT words,
    * broadcast-join the result back onto the token stream — the
    * standard corpus-encode shape, since Zipf means the distinct-word
    * relation is orders of magnitude smaller than the token stream).
    * Checkpoints every few merges to bound codegen depth.
    */
  def bpeEncodeWords(words: org.apache.spark.sql.DataFrame,
      merges: Seq[(String, String)]): org.apache.spark.sql.DataFrame = {
    var st = words.withColumn("tk",
      expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      st = st.withColumn("tk", expr(bpeFoldExpr(a, b)))
      if (i % 6 == 5) st = st.localCheckpoint(true)
    }
    st
  }

  /** q143: the trained tokenizer applied to the vocabulary — the 20 most
    * frequent multi-character words with their BPE segmentations under a
    * 12-merge vocabulary. The oracle retrains the SAME merge sequence as
    * 12 unrolled SQL rounds (pair counts → deterministic argmax → string-
    * fold apply) and must land on identical segmentations — training AND
    * encoding are both checked.
    */
  private val q143 = QueryDef(
    "q143_bpe_encode",
    (s, d) => {
      val words = Tables(s, d, "documents")
        .select(explode(tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("wn"))
        .localCheckpoint(true)
      val merges = bpeTrain(bpeTrainSample(words), 12)
      bpeEncodeWords(words, merges)
        .filter(length(col("w")) >= 2)
        .orderBy(col("wn").desc, col("w").asc)
        .limit(20)
        .select(col("w"), concat_ws(" ", col("tk")).as("encoded"),
          size(col("tk")).as("n_tokens"))
    },
    Some {
      val rounds = (0 until 12).map { k =>
        s"""pc$k AS MATERIALIZED (
              SELECT tk[CAST(i AS INT)] AS a, tk[CAST(i + 1 AS INT)] AS b,
                     SUM(wn) AS n
              FROM v$k, unnest(range(1, len(tk))) r(i) GROUP BY 1, 2),
            bm$k AS MATERIALIZED (SELECT a, b FROM pc$k
              ORDER BY n DESC, a ASC, b ASC LIMIT 1),
            v${k + 1} AS MATERIALIZED (SELECT w, wn,
              list_filter(string_split(list_reduce(list_prepend('|', tk),
                (acc, t) -> CASE WHEN t = bm$k.b
                       AND acc LIKE '%|' || bm$k.a || '|'
                    THEN substring(acc, 1,
                           length(acc) - length(bm$k.a) - 1)
                         || bm$k.a || bm$k.b || '|'
                    ELSE acc || t || '|' END), '|'), x -> x <> '') AS tk
              FROM v$k, bm$k)"""
      }.mkString(",\n")
      s"""WITH wd AS (SELECT unnest($tokSql) AS w FROM documents),
              words AS (SELECT w, COUNT(*) AS wn FROM wd GROUP BY w),
              v0 AS MATERIALIZED (SELECT w, wn,
                list_transform(range(1, len(w) + 1),
                  i -> substring(w, CAST(i AS INT), 1)) AS tk FROM words),
              $rounds
         SELECT w, array_to_string(tk, ' ') AS encoded,
                CAST(len(tk) AS INT) AS n_tokens
         FROM v12 WHERE len(w) >= 2
         ORDER BY wn DESC, w LIMIT 20"""
    })

  // ------------------------------------------------------------------
  // Feature-hashed document embeddings (the hashing trick): text →
  // fixed-dimension vectors INSIDE the engine, closing the
  // text → embedding → ANN loop without an external model.
  // ------------------------------------------------------------------

  private val fhDims = 64

  /** Per-token hash coordinates from md5 (the engine-portable
    * pseudo-randomness every hashed structure here uses): dimension from
    * the first two hex digits mod dims, sign a fair coin on the third —
    * the signed hashing trick (Weinberger et al.), whose sign bit makes
    * collision noise mean-zero instead of additive.
    */
  private val fhHexpos = "'0123456789abcdef'"
  private def fhDimExpr(tok: String) =
    s"""pmod(16 * (instr($fhHexpos, substring(md5(concat('fh:', $tok)), 1, 1)) - 1)
           + (instr($fhHexpos, substring(md5(concat('fh:', $tok)), 2, 1)) - 1), $fhDims)"""
  private def fhSignExpr(tok: String) =
    s"IF(substring(md5(concat('fh:', $tok)), 3, 1) <= '7', 1L, -1L)"
  private def fhDimSql(tok: String) =
    s"""((16 * (strpos($fhHexpos, substring(md5('fh:' || $tok), 1, 1)) - 1)
           + (strpos($fhHexpos, substring(md5('fh:' || $tok), 2, 1)) - 1)) % $fhDims)"""
  private def fhSignSql(tok: String) =
    s"CASE WHEN substring(md5('fh:' || $tok), 3, 1) <= '7' THEN 1 ELSE -1 END"

  /** Sparse hashed features: (doc_id, dim, val) with val = Σ sign(g)·tf
    * over the document's BIGRAM shingles — EXACT integer arithmetic end
    * to end (signs are ±1, shingle frequencies are counts), so the
    * vectors hash-match any engine with no float discipline at all.
    *
    * Bigrams, not unigrams, deliberately: on a shared-vocabulary corpus
    * unigram profiles give every random pair a high cosine baseline
    * (measured at sf0.001: near-dup mean 0.99 but random-pair mean
    * 0.60), while bigram profiles collapse the baseline to noise
    * (0.98 vs 0.05) — the same reason the MinHash dedup (q31) shingles
    * bigrams. The hashed space therefore RANKS like the near-dup
    * relation it feeds.
    *
    * Scale shape: one tokenize scan (the token array bound once, the
    * CorpusStreams projection rationale), a (doc, shingle) count with
    * map-side partials, a map-only hash projection, and a (doc, dim)
    * sum — ≤ dims rows per document out. No vocabulary artifact, no
    * training, no OOV: the hash IS the vocabulary, which is the entire
    * point of the trick at crawl scale (a top-V vocabulary needs a
    * corpus pass and drops the tail; the hash needs neither).
    */
  def hashedFeatures(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), explode(expr(
        """IF(size(tk) >= 2,
             transform(sequence(1, size(tk) - 1), i ->
               concat(element_at(tk, i), ' ', element_at(tk, i + 1))),
             array())""")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .select(col("doc_id"), expr(fhDimExpr("tok")).as("dim"),
        (expr(fhSignExpr("tok")) * col("tf")).as("contrib"))
      .groupBy("doc_id", "dim").agg(sum("contrib").as("val"))
      .filter(col("val") =!= 0L)

  /** Dense hashed embeddings: (doc_id, v: array<double> of [[fhDims]]) —
    * the zero-filled form the similarity/quantization family consumes
    * (cosine, LSH, SQ8, binary codes all take (vec_id, v)). Exact
    * integers widened to double, so downstream dot products follow the
    * established sequential-fold determinism.
    */
  def hashedEmbeddings(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    hashedFeatures(docs)
      .groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("dim"), col("val"))))
        .as("m"))
      .select(col("doc_id"),
        expr(s"""transform(sequence(0, ${fhDims - 1}), d ->
            CAST(coalesce(element_at(m, d), 0L) AS DOUBLE))""").as("v"))

  /** q140: the sparse hashed features of the first 20 documents — the
    * text-native embedding generator, oracled exactly (all-integer).
    */
  private val q140 = QueryDef(
    "q140_feature_hashing",
    (s, d) => hashedFeatures(
        Tables(s, d, "documents").filter(col("doc_id") < 20))
      .orderBy("doc_id", "dim"),
    Some(s"""WITH tk AS (SELECT doc_id, $tokSql AS tk
                         FROM documents WHERE doc_id < 20),
                  tok AS (SELECT doc_id, unnest(
                            CASE WHEN len(tk) >= 2
                                 THEN list_transform(range(len(tk) - 1),
                                        i -> tk[i+1] || ' ' || tk[i+2])
                                 ELSE []::VARCHAR[] END) AS tok FROM tk),
                  tf AS (SELECT doc_id, tok, COUNT(*) AS tf
                         FROM tok GROUP BY doc_id, tok),
                  proj AS (SELECT doc_id, ${fhDimSql("tok")} AS dim,
                             ${fhSignSql("tok")} * tf AS contrib FROM tf)
             SELECT doc_id, dim, CAST(SUM(contrib) AS BIGINT) AS val
             FROM proj GROUP BY doc_id, dim
             HAVING SUM(contrib) <> 0
             ORDER BY doc_id, dim"""))

  /** Late-interaction retrieval (ColBERT's MaxSim shape, model-free):
    * documents are cut into 16-token chunks, every chunk gets its own
    * hashed bigram vector, and a document's score against the query is
    * the MAXIMUM over its chunks' cosines — so a long document wins on
    * its best PASSAGE, where one whole-document vector (q140/q93's
    * dense side) averages the relevant passage away. The query is doc
    * 0's whole-text vector; output is the top-10 with the winning chunk
    * — per-passage provenance the whole-doc form cannot give.
    *
    * Exactness: everything up to the final division is INTEGER — the
    * hashed contribs are signed counts, so chunk·query dots and both
    * norms are exact BIGINT sums in any order; cosine is then one IEEE
    * division/sqrt on bit-identical operands. No float aggregation
    * discipline needed anywhere (the q140 rationale carried through
    * scoring). Max over chunk cosines is order-insensitive.
    *
    * Scale shape: sparse all the way — no 64-wide dense arrays: chunk
    * vectors stay (doc, chunk, dim, val) rows (≤ bigrams per chunk),
    * the query side is broadcast (≤ dims rows), the dot is one keyed
    * join on dim with map-side partial sums, and per-doc MaxSim + the
    * top-10 are bounded aggregates. Chunking explodes the token array
    * map-side (one scan).
    */
  private val q156 = QueryDef(
    "q156_maxsim_retrieval",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      // Round 14: the chunk-local bigrams came from a nested interpreted
      // HOF (transform(sequence)->slice per chunk, then transform per
      // bigram) over every document — the q168 finding again (HOF
      // lambdas evaluate interpreted; the position-explode kernel is
      // codegen). Same rows, one kernel pass: a bigram starting at
      // 1-based position p lies WITHIN chunk (p-1) div 16 iff p is not
      // the chunk's last slot (p % 16 != 0) — chunk-spanning bigrams
      // drop, exactly what the per-chunk slice produced (a trailing
      // 1-token chunk yields no bigram either way).
      val chunkSparse = explodeShinglesFromTokens(
          docs.select(col("doc_id"), tokens(col("text")).as("tk")),
          col("tk"), 2, "tok", "pos")
        .filter(col("pos") % 16 =!= 0)
        .select(col("doc_id"),
          ((col("pos") - 1) / 16).cast("int").as("chunk"), col("tok"))
        .groupBy("doc_id", "chunk", "tok").agg(count(lit(1)).as("tf"))
        .select(col("doc_id"), col("chunk"),
          expr(fhDimExpr("tok")).as("dim"),
          (expr(fhSignExpr("tok")) * col("tf")).as("contrib"))
        .groupBy("doc_id", "chunk", "dim").agg(sum("contrib").as("val"))
        .filter(col("val") =!= 0L)
        // single consumer since the r15 one-pass score aggregate — the
        // r14 checkpoint (dot join + norm aggregate both read this) is
        // gone with the second reader
      val qSparse = hashedFeatures(docs.filter(col("doc_id") === 0))
        .select(col("dim"), col("val").as("qval"))
      val qq = qSparse.agg(sum(col("qval") * col("qval")).as("qq"))
      // r15 (guide §2.3/§2.4): dot and chunk norm in ONE aggregate off a
      // broadcast LEFT join — the r14 shape read chunkSparse twice (an
      // inner-join dot aggregate AND a separate norm aggregate) and then
      // re-joined the two on (doc_id, chunk). sum() ignores the nulls the
      // left join leaves on non-query dims, so dot is NULL exactly when
      // the old inner join produced no row — the same coalesce(0) case —
      // and cc is untouched by qval. One exchange instead of two, no
      // norm⋈dot join (plans/r15/q156 before/after).
      val scored = chunkSparse.join(broadcast(qSparse), Seq("dim"), "left")
        .groupBy("doc_id", "chunk")
        .agg(sum(col("val") * col("qval")).as("dot"),
          sum(col("val") * col("val")).as("cc"))
        .crossJoin(broadcast(qq))
        .filter(col("doc_id") =!= 0L)
        .select(col("doc_id"), col("chunk"),
          (coalesce(col("dot"), lit(0L)).cast("double") /
            (sqrt(col("cc").cast("double")) * sqrt(col("qq").cast("double"))))
            .as("sim"))
      val perDoc = scored.groupBy("doc_id")
        .agg(max(struct(col("sim").as("sim"), negate(col("chunk")).as("nc")))
          .as("best"))
        .select(col("doc_id"), negate(col("best.nc")).as("best_chunk"),
          col("best.sim").as("maxsim"))
      perDoc.orderBy(col("maxsim").desc, col("doc_id").asc).limit(10)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("maxsim").desc, col("doc_id").asc)))
        .select("rank", "doc_id", "best_chunk", "maxsim")
        .orderBy("rank")
    },
    Some(s"""WITH tk AS (SELECT doc_id, $tokSql AS tk FROM documents),
                  ch AS (SELECT doc_id, CAST(c AS INT) AS chunk,
                           list_slice(tk, c * 16 + 1, c * 16 + 16) AS ctk
                         FROM tk, unnest(CASE WHEN len(tk) >= 2
                                 THEN range(CAST(ceil(len(tk) / 16.0) AS BIGINT))
                                 ELSE []::BIGINT[] END) u(c)),
                  chv AS (SELECT doc_id, chunk, ctk FROM ch
                          WHERE len(ctk) >= 2),
                  tok AS (SELECT doc_id, chunk, unnest(
                            list_transform(range(len(ctk) - 1),
                              i -> ctk[i+1] || ' ' || ctk[i+2])) AS tok
                          FROM chv),
                  tf AS (SELECT doc_id, chunk, tok, COUNT(*) AS tf
                         FROM tok GROUP BY doc_id, chunk, tok),
                  sp AS (SELECT doc_id, chunk, dim,
                           CAST(SUM(contrib) AS BIGINT) AS val FROM (
                             SELECT doc_id, chunk, ${fhDimSql("tok")} AS dim,
                                    ${fhSignSql("tok")} * tf AS contrib
                             FROM tf) p
                         GROUP BY doc_id, chunk, dim
                         HAVING SUM(contrib) <> 0),
                  qtk AS (SELECT doc_id, tk FROM tk WHERE doc_id = 0),
                  qtok AS (SELECT unnest(list_transform(range(len(tk) - 1),
                             i -> tk[i+1] || ' ' || tk[i+2])) AS tok
                           FROM qtk),
                  qtf AS (SELECT tok, COUNT(*) AS tf FROM qtok GROUP BY tok),
                  qsp AS (SELECT dim, CAST(SUM(contrib) AS BIGINT) AS qval
                          FROM (SELECT ${fhDimSql("tok")} AS dim,
                                       ${fhSignSql("tok")} * tf AS contrib
                                FROM qtf) p
                          GROUP BY dim HAVING SUM(contrib) <> 0),
                  qq AS (SELECT CAST(SUM(qval * qval) AS BIGINT) AS qq
                         FROM qsp),
                  dots AS (SELECT doc_id, chunk,
                             CAST(SUM(val * qval) AS BIGINT) AS dot
                           FROM sp JOIN qsp USING (dim)
                           GROUP BY doc_id, chunk),
                  norms AS (SELECT doc_id, chunk,
                              CAST(SUM(val * val) AS BIGINT) AS cc
                            FROM sp GROUP BY doc_id, chunk),
                  scored AS (SELECT norms.doc_id, norms.chunk,
                               CAST(COALESCE(dot, 0) AS DOUBLE)
                                 / (sqrt(CAST(cc AS DOUBLE))
                                    * sqrt(CAST(qq AS DOUBLE))) AS sim
                             FROM norms
                             LEFT JOIN dots ON norms.doc_id = dots.doc_id
                               AND norms.chunk = dots.chunk
                             CROSS JOIN qq
                             WHERE norms.doc_id <> 0),
                  per AS (SELECT doc_id, chunk AS best_chunk, sim AS maxsim
                          FROM (SELECT doc_id, chunk, sim,
                                  ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY sim DESC, chunk ASC) AS rn
                                FROM scored) t WHERE rn = 1)
             SELECT rank, doc_id, best_chunk, maxsim FROM (
               SELECT doc_id, best_chunk, maxsim,
                      ROW_NUMBER() OVER (ORDER BY maxsim DESC, doc_id ASC)
                        AS rank
               FROM per) r
             WHERE rank <= 10 ORDER BY rank"""))

  override def defs: Seq[QueryDef] =
    Seq(q25, q26, q27, q28, q51, q80, q85, q86, q88, q104, q105, q109,
      q120, q121, q125, q129, q135, q140, q143, q156)
}
