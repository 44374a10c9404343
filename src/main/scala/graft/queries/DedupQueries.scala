package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Deduplication operators (beyond-reference surface): exact hash dedup,
  * deterministic keep-first keyed dedup, MinHash signatures, MinHash-LSH
  * candidate pairs, n-gram Jaccard, and SimHash.
  *
  * Scale design: every pipeline is shuffle-bounded by (doc, token/shingle)
  * cardinality — no cross joins. LSH banding turns the quadratic pair
  * problem into equality joins on band keys (the only sound way to near-dup
  * 100 TB); Jaccard scoring joins only within bounded blocks.
  */
object DedupQueries extends QueryModule {

  private val tokSql = "regexp_extract_all(lower(text), '[a-z0-9]+')"

  /** 32-bit SimHash signatures for documents(doc_id, text): term-frequency
    * weighted, per-(token,bit) sign taken from nibble b of md5(token).
    * Computed as 32 aggregate columns over the (doc, token, weight) rows —
    * ONE shuffle of the token rows instead of exploding 32 bit-rows per
    * token (32x the shuffle volume), and ONE md5 per distinct token
    * occurrence instead of 32 (each of md5's 32 hex nibbles supplies an
    * independent sign bit) — md5 is the dominant per-row cost of this
    * operator at corpus scale. Identical math to the oracle's exploded
    * formulation.
    */
  def simhash32(documents: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val tw = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("w"))
      .withColumn("mask", hexSignMask(md5(col("tok"))))
    val bitSums = (0 until 32).map { b =>
      sum(when(shiftright(col("mask"), b).bitwiseAND(lit(1L)) === 1L,
        col("w")).otherwise(-col("w"))).as(s"s$b")
    }
    tw.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 32).map(b =>
          when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Exact dedup by content hash: one survivor (min doc_id) per distinct
    * normalized text; copies counted. Pure hash-groupBy — one shuffle.
    */
  private val q29 = QueryDef(
    "q29_dedup_exact",
    (s, d) => Tables(s, d, "documents")
      .withColumn("content_hash", contentHash(col("text")))
      .groupBy("content_hash")
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "content_hash", "n_copies")
      .orderBy("doc_id"),
    Some(s"""SELECT min(doc_id) AS doc_id,
                    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash,
                    COUNT(*) AS n_copies
             FROM documents
             GROUP BY content_hash ORDER BY doc_id"""))

  /** Deterministic keyed dedup (dropDuplicates made reproducible): first
    * lineitem per order in (linenumber) order — row_number window, keep 1.
    */
  private val q30 = QueryDef(
    "q30_dedup_keyed",
    (s, d) => {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber").asc, col("l_partkey").asc, col("l_suppkey").asc)
      Tables(s, d, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .orderBy("l_orderkey")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM (
              SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
                     ROW_NUMBER() OVER (PARTITION BY l_orderkey
                       ORDER BY l_linenumber ASC, l_partkey ASC, l_suppkey ASC) rn
              FROM lineitem) t
            WHERE rn = 1 ORDER BY l_orderkey"""))

  /** MinHash signatures over word-trigram shingles: 8 components sliced
    * from TWO parent md5 digests per shingle (four 32-bit slices each — see
    * minhashParent/minhashSlice). Fixed-width hex min == numeric min, and
    * md5 agrees across engines. One shuffle on doc_id; shingles explode via
    * the codegen'd position form (8x the HOF-array form, see
    * explodeShingles), and the 8-char components shrink signature shuffle
    * bytes 4x vs full digests.
    */
  private val q31 = QueryDef(
    "q31_minhash_signature",
    (s, d) => explodeShingles(
        Tables(s, d, "documents").select("doc_id", "text"),
        col("text"), 3, "sh")
      .withColumn("m0", minhashParent(col("sh"), 0))
      .withColumn("m1", minhashParent(col("sh"), 1))
      .groupBy("doc_id")
      .agg(
        minhashSlice(col("m0"), col("m1"), 0).as("h0"),
        minhashSlice(col("m0"), col("m1"), 1).as("h1"),
        minhashSlice(col("m0"), col("m1"), 2).as("h2"),
        minhashSlice(col("m0"), col("m1"), 3).as("h3"),
        minhashSlice(col("m0"), col("m1"), 4).as("h4"),
        minhashSlice(col("m0"), col("m1"), 5).as("h5"),
        minhashSlice(col("m0"), col("m1"), 6).as("h6"),
        minhashSlice(col("m0"), col("m1"), 7).as("h7"))
      .orderBy("doc_id"),
    Some(s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
                  sh AS (SELECT doc_id, unnest(list_distinct(
                           CASE WHEN len(t) >= 3
                                THEN list_transform(range(len(t) - 2),
                                       i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
                                ELSE []::VARCHAR[] END)) AS s
                         FROM toks)
             SELECT doc_id,
                    min(substring(md5('0:' || s), 1, 8)) AS h0,
                    min(substring(md5('0:' || s), 9, 8)) AS h1,
                    min(substring(md5('0:' || s), 17, 8)) AS h2,
                    min(substring(md5('0:' || s), 25, 8)) AS h3,
                    min(substring(md5('1:' || s), 1, 8)) AS h4,
                    min(substring(md5('1:' || s), 9, 8)) AS h5,
                    min(substring(md5('1:' || s), 17, 8)) AS h6,
                    min(substring(md5('1:' || s), 25, 8)) AS h7
             FROM sh GROUP BY doc_id ORDER BY doc_id"""))

  /** 8-component MinHash signature over bigram shingles — the shared
    * signature used by the LSH pair generator (q32), the Jaccard estimator
    * (q72), and the cluster/survivor pipeline (q74/q75).
    */
  def minhashSigs(documents: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    explodeShingles(documents.select("doc_id", "text"), col("text"), 2, "tok")
      .withColumn("m0", minhashParent(col("tok"), 0))
      .withColumn("m1", minhashParent(col("tok"), 1))
      .groupBy("doc_id")
      .agg(minhashSlice(col("m0"), col("m1"), 0).as("h0"),
        (1 until 8).map(i => minhashSlice(col("m0"), col("m1"), i).as(s"h$i")): _*)

  /** (doc_id, band, key) bucket membership rows from a minhashSigs
    * relation: 4 bands of 2 components each.
    */
  private def bandsFromSigs(sig: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    sig.select(col("doc_id"), explode(array(
      (0 until 4).map(b => struct(lit(b).as("band"),
        md5(concat(col(s"h${2 * b}"), col(s"h${2 * b + 1}"))).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))

  private def lshBands(documents: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    bandsFromSigs(minhashSigs(documents))

  /** Default band-bucket size cap for the pair-SCORING path (q32/q72/q82
    * and the signature-index probe). In-bucket pairs are quadratic in
    * bucket size, and one boilerplate-heavy bucket (empty docs, licence
    * headers, templated pages — routine in web crawls) makes the scoring
    * join quadratic at scale. Buckets above the cap are dropped before the
    * pair join — the df-cap move q33 makes for tokens, applied to band
    * keys. The CLUSTER path (q74/q75) is deliberately NOT capped: it runs
    * on bucket-star edges, which are linear in bucket size, so hot buckets
    * still cluster (and a 500-copy boilerplate bucket still collapses to
    * one survivor) while pair scoring stays bounded.
    */
  val defaultBucketCap = 200

  /** Drops (band, key) buckets with more than `cap` members. The hot-bucket
    * list is tiny by construction (only boilerplate keys exceed the cap) and
    * broadcast, so the prune is a map-side anti join — no extra shuffle of
    * the bands.
    */
  private def dropHotBuckets(bands: org.apache.spark.sql.DataFrame,
      cap: Int): org.apache.spark.sql.DataFrame = {
    val hot = bands.groupBy("band", "key")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > cap)
      .select("band", "key")
    bands.join(broadcast(hot), Seq("band", "key"), "left_anti")
  }

  /** Ordered in-bucket id pairs — (doc_a, doc_b), doc_a < doc_b, one row
    * per co-occurrence — generated with ONE aggregation instead of the
    * bucket-key self-join: collect each bucket's (pre-capped, so bounded)
    * id list, sort it, and explode the upper triangle via posexplode +
    * slice, all codegen-friendly built-ins. Versus the self-join this
    * drops both SMJ sorts and the join probe while shuffling the bucket
    * relation ONCE (the self-join's reused exchange fed two sorted
    * replays); pair multiplicity is identical (sorted duplicates of a
    * value pair exactly like the join's m×n, and the strict doc_a <
    * doc_b filter removes the equal-value combos the join's `<` never
    * produced).
    *
    * CALLER CONTRACT: `rel` must be bucket-capped FIRST (dropHotBuckets /
    * a df-cap anti join) — the collect_list buffer holds one bucket, so
    * an uncapped boilerplate bucket would materialize in one aggregation
    * buffer. Every caller in this file caps before calling, and passes
    * its cap as `maxBucket` where one exists (r14 advice): the guard is
    * one size() comparison per BUCKET (post-aggregation, so it cannot
    * prevent the buffer itself — it turns a silently-wrong uncapped
    * caller into a loud plan error on the first over-cap bucket, long
    * before the 100 TB case OOMs).
    */
  private[graft] def inBucketPairs(rel: org.apache.spark.sql.DataFrame,
      bucketCols: Seq[String], idCol: String,
      maxBucket: Option[Int] = None): org.apache.spark.sql.DataFrame = {
    val agg = rel.groupBy(bucketCols.map(col): _*)
      .agg(sort_array(collect_list(col(idCol))).as("_ds"))
    val guarded = maxBucket match {
      // assert_true returns NULL when the predicate holds, so the filter
      // keeps every row; an over-cap bucket raises with the sizes named.
      // A filter (not an unused projected column) so column pruning can
      // never drop the check.
      case Some(cap) => agg.filter(assert_true(
        size(col("_ds")) <= lit(cap),
        concat(lit("inBucketPairs: a bucket holds "),
          size(col("_ds")).cast("string"),
          lit(s" members > the caller's declared cap $cap — cap buckets " +
            "(dropHotBuckets / df-cap) BEFORE pair generation"))).isNull)
      case None => agg
    }
    guarded
      .select(col("_ds"), posexplode(col("_ds")).as(Seq("_i", "doc_a")))
      .select(col("doc_a"), explode(slice(col("_ds"), col("_i") + lit(2),
        size(col("_ds")) - col("_i") - lit(1))).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
  }

  /** MinHash-LSH candidate pairs (doc_a < doc_b, distinct) from an ALREADY
    * MATERIALIZED minhashSigs relation: in-bucket pair generation over the
    * band keys ([[inBucketPairs]]), hot buckets (> bucketCap members)
    * dropped first so the in-bucket quadratic fan-out is bounded by
    * bucketCap² per bucket. The caller materializes `sig`
    * (checkpoint/stored index) because the band rows feed the hot-bucket
    * aggregate and the pair generator — relying on AQE exchange reuse
    * across the broadcast boundary re-ran the shingle explosion (measured
    * +31% on q32 at sf0.1). Consumers that also SCORE pairs (q72) pass
    * the same materialized sig to both stages, so the signature
    * aggregation runs exactly once per query.
    */
  def lshCandidatePairsFromSigs(sig: org.apache.spark.sql.DataFrame,
      bucketCap: Int = defaultBucketCap): org.apache.spark.sql.DataFrame =
    inBucketPairs(dropHotBuckets(bandsFromSigs(sig), bucketCap),
      Seq("band", "key"), "doc_id", maxBucket = Some(bucketCap))
      .distinct()

  /** [[lshCandidatePairsFromSigs]] from raw documents — computes and
    * materializes the signatures internally.
    */
  def lshCandidatePairs(documents: org.apache.spark.sql.DataFrame,
      bucketCap: Int = defaultBucketCap): org.apache.spark.sql.DataFrame =
    lshCandidatePairsFromSigs(
      minhashSigs(documents).localCheckpoint(true), bucketCap)

  /** Bucket-star spanning edges: every bucket member connects to its
    * bucket's minimum doc_id. An LSH bucket is a clique in the candidate
    * graph, so the stars have EXACTLY the connected components of the full
    * pair set — but edge count is LINEAR in bucket size where pairs are
    * quadratic (a 200-doc hot bucket is 199 star edges vs 19,900 pairs).
    * This is the input the clustering queries feed the component loop at
    * scale; pair generation (q32/q72) still exists for pair SCORING,
    * where each candidate must be looked at individually.
    */
  def lshBucketStars(documents: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    // sig checkpointed (the q141 discipline): the star shape consumes the
    // band relation on two sides (per-bucket min + the attach join) whose
    // exchanges do not canonicalize equal, so an unmaterialized signature
    // aggregation — shingle explode, 2 md5s/shingle, a corpus groupBy —
    // ran TWICE per call; the bands recompute from cached signatures is a
    // cheap map
    lshBucketStarsFromSigs(minhashSigs(documents).localCheckpoint(true))

  /** [[lshBucketStars]] from an ALREADY MATERIALIZED signature relation
    * (the persisted-index / incremental-maintenance entry point — the
    * old corpus's text is never re-read).
    */
  def lshBucketStarsFromSigs(sig: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // One shared bucket-keyed exchange (the CC-round shape, r14): both
    // consumers of the band relation — the per-bucket min and the attach
    // join — read the SAME repartition exchange (canonically equal, so
    // the second is a ReusedExchange) and run exchange-free on its
    // placement; the min side joins back as a shuffle_hash build (one
    // row per bucket per partition, bounded), avoiding the sort-merge
    // default's two full band sorts. Before: the two branches' exchanges
    // did not canonicalize equal, so the signature subtree ran twice and
    // the join sorted both sides.
    val bands = bandsFromSigs(sig).repartition(col("band"), col("key"))
    val mins = bands.groupBy("band", "key").agg(min("doc_id").as("doc_a"))
    bands.join(mins.hint("shuffle_hash"), Seq("band", "key"))
      .filter(col("doc_id") =!= col("doc_a"))
      .select(col("doc_a"), col("doc_id").as("doc_b"))
      .distinct()
  }

  /** Shared DuckDB CTE chain producing the LSH signatures (`sig`), the full
    * band membership (`bands`), the hot-bucket-capped membership (`cbands`,
    * cap hard-coded to 200 = defaultBucketCap) and candidate pairs
    * (`pairs`, built from `cbands`) — the single source of truth for the
    * oracles of q32, q72, q74, q75 and q82 (unused CTEs are pruned by
    * DuckDB, so consumers may reference only the prefix they need),
    * mirroring the shared Spark-side minhashSigs/dropHotBuckets/
    * lshCandidatePairs generators: a divergence between the pair/signature
    * sets those queries check is structurally impossible. The CC oracle
    * (ccCteSql) builds its closure from the UNCAPPED `bands`, mirroring
    * the uncapped bucket-star cluster path.
    */
  private def lshPairsCteSqlFrom(docsRel: String) =
    s"""toks AS (SELECT doc_id, $tokSql AS tk FROM $docsRel),
        tok AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(tk) >= 2
                       THEN list_transform(range(len(tk) - 1),
                              i -> tk[i+1] || ' ' || tk[i+2])
                       ELSE []::VARCHAR[] END)) AS t
                FROM toks),
        sig AS (SELECT doc_id,
                 min(substring(md5('0:' || t), 1, 8)) AS h0,
                 min(substring(md5('0:' || t), 9, 8)) AS h1,
                 min(substring(md5('0:' || t), 17, 8)) AS h2,
                 min(substring(md5('0:' || t), 25, 8)) AS h3,
                 min(substring(md5('1:' || t), 1, 8)) AS h4,
                 min(substring(md5('1:' || t), 9, 8)) AS h5,
                 min(substring(md5('1:' || t), 17, 8)) AS h6,
                 min(substring(md5('1:' || t), 25, 8)) AS h7
                FROM tok GROUP BY doc_id),
        bands AS (
          SELECT doc_id, 0 AS band, md5(h0 || h1) AS key FROM sig UNION ALL
          SELECT doc_id, 1 AS band, md5(h2 || h3) AS key FROM sig UNION ALL
          SELECT doc_id, 2 AS band, md5(h4 || h5) AS key FROM sig UNION ALL
          SELECT doc_id, 3 AS band, md5(h6 || h7) AS key FROM sig),
        hotb AS (SELECT band, key FROM bands
                 GROUP BY band, key HAVING COUNT(*) > 200),
        cbands AS (SELECT bands.doc_id, bands.band, bands.key
                   FROM bands ANTI JOIN hotb
                     ON bands.band = hotb.band AND bands.key = hotb.key),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM cbands a JOIN cbands b
            ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)"""

  private val lshPairsCteSql = lshPairsCteSqlFrom("documents")

  /** Fraction of agreeing signature components — the MinHash Jaccard
    * estimate used by q72 and q82. `a`/`b` are the aliases of two
    * minhashSigs relations.
    */
  def jaccardEstimate(a: String, b: String): org.apache.spark.sql.Column =
    (0 until 8).map(i =>
      when(col(s"$a.h$i") === col(s"$b.h$i"), 1).otherwise(0))
      .reduce(_ + _).cast("double") / 8.0

  /** SQL twin of jaccardEstimate over sig aliases `sa`/`sb`. */
  private def jaccardEstSql(sa: String, sb: String): String =
    "CAST((" + (0 until 8).map(i =>
      s"CASE WHEN $sa.h$i = $sb.h$i THEN 1 ELSE 0 END").mkString(" +\n           ") +
      ") AS DOUBLE) / 8.0"

  /** MinHash-LSH candidate pairs: 8 bigram-shingle minhashes -> 4 bands of
    * 2 -> equality join on band keys. The quadratic all-pairs problem
    * becomes equality joins whose cost is bounded by bucket sizes; shingle
    * order is the collision-rate dial (unigrams over this small vocabulary
    * degenerate to ~24M candidate pairs at sf0.1, bigrams to ~78k — at
    * 100 TB that dial is the difference between feasible and not).
    */
  private val q32 = QueryDef(
    "q32_lsh_candidate_pairs",
    (s, d) => lshCandidatePairs(Tables(s, d, "documents"))
      .orderBy("doc_a", "doc_b"),
    Some(s"""WITH $lshPairsCteSql
             SELECT doc_a, doc_b FROM pairs
             ORDER BY doc_a, doc_b"""))

  /** n-gram (unigram) Jaccard near-dup scoring within source blocks with a
    * document-frequency cap: |A∩B| / |A∪B| as exact integer division over
    * token sets PRUNED of hot tokens (df > dfCap within the block).
    *
    * Scale design: blocking on `source` alone is not enough — one stopword
    * appearing in n docs of a block still fans the token self-join out to
    * ~n² rows. The df-cap is the standard fix: a (token, doc) row can match
    * at most dfCap partners, so intersect-join rows are bounded by
    * dfCap × |token rows| — LINEAR in corpus size, with dfCap the dial.
    * The hot-token list itself is tiny (stopwords) and broadcast, so the
    * prune is a map-side anti join, and sizes are computed from the pruned
    * sets so the score stays a true Jaccard over the capped vocabulary.
    * Exercised with a skewed corpus in DedupCapSpec; at the test SFs no
    * token exceeds the default cap, so results match the uncapped r1 output.
    */
  def jaccardPairs(docs: org.apache.spark.sql.DataFrame, dfCap: Int = 300,
      threshold: Double = 0.8): org.apache.spark.sql.DataFrame = {
    val tok0 = docs.select(col("doc_id"), col("source"),
      explode(array_distinct(tokens(col("text")))).as("tok"))
    val hot = tok0.groupBy("source", "tok")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap)
      .select("source", "tok")
    // the pruned token relation feeds THREE consumers (both self-join
    // sides and the size aggregate), each of which would re-run the
    // regex tokenization + explode + anti join — materialize it once
    // (the q72 one-relation-many-consumers discipline; measured 7.2 →
    // 6.6 s median at sf0.1)
    val tok = tok0.join(broadcast(hot), Seq("source", "tok"), "left_anti")
      .localCheckpoint(true)
    val sizes = tok.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    // in-bucket pair generation over the df-capped (source, tok) buckets
    // (inBucketPairs: one shuffle + bounded collect_list, no SMJ sorts)
    val inter = inBucketPairs(tok, Seq("source", "tok"), "doc_id",
        maxBucket = Some(dfCap))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("sa.sz") + col("sb.sz") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
  }

  private val q33 = QueryDef(
    "q33_jaccard_pairs",
    (s, d) => jaccardPairs(Tables(s, d, "documents")),
    Some(s"""WITH tok0 AS (SELECT doc_id, source, unnest(list_distinct($tokSql)) AS t FROM documents),
                  hot AS (SELECT source, t FROM tok0 GROUP BY source, t HAVING COUNT(*) > 300),
                  tok AS (SELECT tok0.doc_id, tok0.source, tok0.t
                          FROM tok0 ANTI JOIN hot
                            ON tok0.source = hot.source AND tok0.t = hot.t),
                  sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
                  inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
                            FROM tok a JOIN tok b
                              ON a.t = b.t AND a.source = b.source AND a.doc_id < b.doc_id
                            GROUP BY a.doc_id, b.doc_id)
             SELECT doc_a, doc_b,
                    CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) AS jaccard
             FROM inter
             JOIN sizes sa ON doc_a = sa.doc_id
             JOIN sizes sb ON doc_b = sb.doc_id
             WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.8
             ORDER BY doc_a, doc_b"""))

  /** SimHash (32-bit) from token counts: per-(token,bit) pseudo-random sign
    * from md5, weighted by term frequency; bit set iff the signed sum is
    * positive. Integer arithmetic only — engine-independent.
    */
  private val q34 = QueryDef(
    "q34_simhash",
    (s, d) => {
      DedupQueries.simhash32(Tables(s, d, "documents")).orderBy("doc_id")
    },
    Some(s"""WITH tw AS (SELECT doc_id, t AS tok, COUNT(*) AS w
                         FROM (SELECT doc_id, unnest($tokSql) AS t FROM documents)
                         GROUP BY doc_id, t),
                  bits AS (SELECT doc_id, b,
                             SUM(CASE WHEN substring(md5(tok), CAST(b + 1 AS INT), 1) <= '7'
                                      THEN w ELSE -w END) AS s
                           FROM tw, range(32) r(b) GROUP BY doc_id, b)
             SELECT doc_id,
                    CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
             FROM bits GROUP BY doc_id ORDER BY doc_id"""))

  /** SimHash near-dup candidates: band on the 2 16-bit halves of the
    * signature (candidates must agree on a half), then exact hamming via
    * bit_count(xor). 16-bit keys keep buckets small on clustered corpora
    * (8-bit bands here produce 3.7M candidate pairs vs 171k) — at scale,
    * band width is the recall/cost dial.
    */
  private val q35 = QueryDef(
    "q35_simhash_pairs",
    (s, d) => {
      val sig = DedupQueries.simhash32(Tables(s, d, "documents"))
      // r15 (guide §2.5): the 16-bit band buckets are UNCAPPED by the
      // declared semantics, so a degenerate signature mode at scale makes
      // the self-join quadratic in one bucket with no diagnosis. The
      // guard fails loudly naming bucket and size past 50k members
      // (~1.2e9 pairs — the point a task stops straggling and starts
      // dying); result-neutral below it (SkewGuardSpec).
      val bands = graft.operators.SkewGuard.boundedBuckets(
        sig.select(col("doc_id"), col("simhash"),
            explode(sequence(lit(0), lit(1))).as("band"))
          .withColumn("key", expr("(simhash >> (band * 16)) & 65535")),
        Seq("band", "key"), 50000L, "q35_simhash_pairs")
      val a = bands.as("a"); val b = bands.as("b")
      a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key")
          && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 6)
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""WITH tw AS (SELECT doc_id, t AS tok, COUNT(*) AS w
                         FROM (SELECT doc_id, unnest($tokSql) AS t FROM documents)
                         GROUP BY doc_id, t),
                  bits AS (SELECT doc_id, b,
                             SUM(CASE WHEN substring(md5(tok), CAST(b + 1 AS INT), 1) <= '7'
                                      THEN w ELSE -w END) AS s
                           FROM tw, range(32) r(b) GROUP BY doc_id, b),
                  sig AS (SELECT doc_id,
                            CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
                          FROM bits GROUP BY doc_id),
                  bands AS (SELECT doc_id, simhash, b AS band,
                              (simhash >> (b * 16)) & 65535 AS key
                            FROM sig, range(2) r(b))
             SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    bit_count(xor(a.simhash, b.simhash)) AS hamming
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
             WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
             ORDER BY doc_a, doc_b"""))

  /** MinHash Jaccard ESTIMATION over the LSH candidate pairs: the fraction
    * of agreeing signature components estimates the true Jaccard — the
    * step that turns q32's candidates into scored near-dup decisions
    * without touching the documents again. Signature-only scoring: the
    * text never re-enters the pipeline, so the score join is over
    * (pair, 8 small strings), not the corpus.
    */
  private val q72 = QueryDef(
    "q72_minhash_jaccard_estimate",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      // ONE materialized signature relation feeds pair generation AND both
      // scoring sides — the signature aggregation runs once
      val sig = minhashSigs(docs).localCheckpoint(true)
      val pairs = lshCandidatePairsFromSigs(sig)
      val sa = sig.as("sa"); val sb = sig.as("sb")
      pairs
        .join(sa, col("doc_a") === col("sa.doc_id"))
        .join(sb, col("doc_b") === col("sb.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          jaccardEstimate("sa", "sb").as("jaccard_est"))
        .filter(col("jaccard_est") >= 0.5)
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""WITH $lshPairsCteSql
             SELECT doc_a, doc_b,
                    ${jaccardEstSql("sa", "sb")} AS jaccard_est
             FROM pairs
             JOIN sig sa ON doc_a = sa.doc_id
             JOIN sig sb ON doc_b = sb.doc_id
             WHERE ${jaccardEstSql("sa", "sb")} >= 0.5
             ORDER BY doc_a, doc_b"""))

  /** Cross-source near-duplicate matrix — WHICH sources share copied
    * content, the data-governance rollup of the near-dup pipeline: q72's
    * signature-scored pairs (est ≥ 0.5) joined to each side's source and
    * aggregated into an unordered source × source matrix with pair count
    * and mean estimated Jaccard. A licensing/provenance audit reads this
    * to find syndication (src A republishes src B) and self-duplication
    * (the diagonal); the mixture weights (q113) and novelty matrix
    * (q103) answer adjacent questions from token overlap rather than
    * document identity.
    *
    * Scale shape: everything upstream is the q32/q72 machinery (one
    * materialized signature relation, hot-bucket-capped band joins);
    * downstream is a pair-population join against the 2-column
    * (doc_id, source) projection and a #source²-bounded aggregate —
    * nothing new shuffles at corpus scale. The source columns are
    * least/greatest-normalized so the matrix is triangular regardless
    * of doc_id ordering within a pair.
    */
  private val q133 = QueryDef(
    "q133_source_copy_matrix",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      val sig = minhashSigs(docs).localCheckpoint(true)
      val pairs = lshCandidatePairsFromSigs(sig)
      val scored = pairs
        .join(sig.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sig.as("sb"), col("doc_b") === col("sb.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          jaccardEstimate("sa", "sb").as("est"))
        .filter(col("est") >= 0.5)
      val src = docs.select(col("doc_id"), col("source"))
      scored
        .join(src.as("ca"), col("doc_a") === col("ca.doc_id"))
        .join(src.as("cb"), col("doc_b") === col("cb.doc_id"))
        .select(least(col("ca.source"), col("cb.source")).as("source_a"),
          greatest(col("ca.source"), col("cb.source")).as("source_b"),
          col("est"))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("n_pairs"), Exact.davg(col("est")).as("mean_est"))
        .orderBy("source_a", "source_b")
    },
    Some(s"""WITH $lshPairsCteSql,
                  est AS (SELECT * FROM (
                            SELECT doc_a, doc_b,
                                   ${jaccardEstSql("sa", "sb")} AS est
                            FROM pairs
                            JOIN sig sa ON doc_a = sa.doc_id
                            JOIN sig sb ON doc_b = sb.doc_id) t
                          WHERE est >= 0.5),
                  m AS (SELECT LEAST(ca.source, cb.source) AS source_a,
                               GREATEST(ca.source, cb.source) AS source_b,
                               est
                        FROM est JOIN documents ca ON est.doc_a = ca.doc_id
                                 JOIN documents cb ON est.doc_b = cb.doc_id)
             SELECT source_a, source_b, COUNT(*) AS n_pairs,
                    ${Exact.sqlDavg("est")} AS mean_est
             FROM m GROUP BY source_a, source_b
             ORDER BY source_a, source_b"""))

  /** Oracle CTE chain extending the candidate graph to converged connected
    * components: `cc(doc_id, cluster_id)` with cluster_id = min doc_id
    * reachable. The closure runs over `pairs_all` — pairs from the UNCAPPED
    * `bands` — because the Spark cluster path (lshBucketStars) is linear in
    * bucket size and deliberately uncapped: hot boilerplate buckets still
    * collapse into one cluster even though pair SCORING (q32/q72) drops
    * them.
    */
  private val ccCteSql =
    s"""$lshPairsCteSql,
        pairs_all AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
        edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs_all
                  UNION ALL SELECT doc_b, doc_a FROM pairs_all),
        walk(u, v) AS (
          SELECT u, v FROM edges
          UNION
          SELECT w.u, e.v FROM walk w JOIN edges e ON w.v = e.u),
        cc AS (SELECT u AS doc_id, least(u, min(v)) AS cluster_id
               FROM walk GROUP BY u)"""

  /** Connected components over undirected candidate-pair edges via
    * hash-to-min (Rastogi et al., "Finding Connected Components in
    * Map-Reduce in Logarithmic Rounds"): each node keeps a cluster set
    * C(v), initially N(v) ∪ {v}; every round the per-set min is sent to
    * all members and the members are sent to the min. Converges when the
    * row set is stable — min(C(v)) is then the component minimum, the
    * deterministic cluster label.
    *
    * Scale design: O(log d) rounds (measured: 7 at sf0.01 / diameter 17,
    * 6 at sf0.1 with a 4.7k-node component — vs 17 rounds for plain
    * min-label propagation), each round two shuffles (a groupBy-min and a
    * distinct) over the state rows, whose count is bounded by
    * 2·|V| + |components|·max-cluster at convergence and never exceeds
    * the message volume O(Σ|C(v)|). State is eagerly local-checkpointed
    * per round so lineage stays one round deep; a dropped round's blocks
    * are freed by the ContextCleaner once the reference goes (explicit
    * unpersist() does not reach checkpoint blocks). At 100 TB the loop
    * would write reliable checkpoints to the cluster FS and delete the
    * previous round's files explicitly, and the maxIter cap (default 30
    * ≈ 4× the measured need) bounds worst-case cost.
    * Convergence is detected by (row count, xxhash64 row checksum)
    * stability — one cheap aggregate per round, no driver-side collect
    * of the state itself.
    */
  /** One hash-to-min round over a (v, u) state relation that enters
    * hash-placed on v (the keyed checkpoint's guarantee): per-bucket min
    * and the min-attach join run EXCHANGE-FREE on the state's own
    * partitioning (the aggregate fuses partial+final; the join is a
    * hinted shuffle-hash build of the per-key mins — the colocated
    * default would be sort-merge, adding two full state sorts per round;
    * the build side is one row per distinct v per partition, bounded),
    * and the round's ONE exchange is the explicit repartition that
    * re-keys the emitted messages, after which the dedup aggregate is
    * again exchange-free (hash(v) clusters (v, u)). CcLoopPlanSpec pins
    * this shape: exactly one shuffle, zero sorts.
    */
  private[graft] def ccRoundShape(c: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val mins = c.groupBy("v").agg(min("u").as("m"))
    val withMin = c.join(mins.hint("shuffle_hash"), "v")
    withMin.select(col("u").as("v"), col("m").as("u"))
      .union(withMin.select(col("m").as("v"), col("u")))
      .repartition(col("v"))
      .dropDuplicates("v", "u")
  }

  def connectedComponents(pairs: org.apache.spark.sql.DataFrame,
      maxIter: Int = 30): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.GraftCheckpointBridge
    // materialize the pair generation ONCE: the state bootstrap references
    // `pairs` four times (two edge directions x two union arms); AQE
    // exchange reuse already dedupes most of the recompute, but the
    // checkpoint makes the single evaluation structural (measured ~0.4s
    // off q74 at sf0.1) and keeps the loop's lineage rooted in data
    val p = pairs.localCheckpoint(true)
    val edges = p.select(col("doc_a").as("v"), col("doc_b").as("u"))
      .union(p.select(col("doc_b").as("v"), col("doc_a").as("u")))
    // The state is materialized per round to truncate lineage (the next
    // state references the current one 4x — the min join + 2 union arms
    // — so without truncation the plan tree grows 4^rounds and analysis
    // alone exhausts the driver heap; on a cluster this would be a
    // reliable checkpoint to the distributed FS). Round 14: it goes
    // through GraftCheckpointBridge so the state re-enters each round
    // still DECLARED hash-partitioned by v — plain localCheckpoint drops
    // the partitioning under AQE, which made every round re-shuffle state
    // that was already placed: the per-round min and the dedup each paid
    // their own exchange of the full state (3 exchanges/round, one
    // AQE-reused). Shaping each round as repartition(n, v) -> keyed ops
    // leaves exactly ONE exchange per round (plan-asserted in
    // CcLoopPlanSpec); the dedup aggregate, the per-bucket min and the
    // min-attach join run exchange-free on the pre-placed rows.
    // dropDuplicates("v","u") under hashpartitioning(v) is sound: equal
    // (v,u) rows share v, hence a partition. The repartition carries no
    // explicit count: AQE sizes the round's one exchange to the state
    // (guide §2's scale-adaptive partitioning), and the bridge preserves
    // the coalesced hash partitioning it actually produced.
    var c = GraftCheckpointBridge.localCheckpointKeyed(
      edges.union(edges.select(col("v").as("v"), col("v").as("u")))
        .repartition(col("v"))
        .dropDuplicates("v", "u"))
    var prev: Option[(Long, Long)] = None
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // Row-based message generation: a collect_set formulation (one
      // groupBy + map-side explode, one fewer exchange) was rejected
      // because it materializes each cluster as ONE aggregation-buffer
      // array, which a giant component would OOM; rows stream and spill.
      // The set checksum (rows are distinct, so bit_xor of row hashes is
      // an order-insensitive equality witness that cannot overflow)
      // rides the checkpoint materialization via observe() — one Spark
      // job per round.
      val obs = org.apache.spark.sql.Observation()
      val next = GraftCheckpointBridge.localCheckpointKeyed(
        ccRoundShape(c)
          .observe(obs, count(lit(1)).as("n"),
            bit_xor(xxhash64(col("v"), col("u"))).as("x")))
      val m = obs.get
      val sig = (m("n").asInstanceOf[Long],
        Option(m("x")).map(_.asInstanceOf[Long]).getOrElse(0L))
      if (prev.contains(sig)) converged = true
      prev = Some(sig)
      // the dropped round's checkpoint blocks are reclaimed by the
      // ContextCleaner once this reference goes (unpersist() does not
      // reach localCheckpoint storage)
      c = next
      i += 1
    }
    // Exiting via the cap means labels may not be component minima yet —
    // plausible-looking but WRONG clusters. Fail loudly rather than emit
    // them; the cap is sized ~4x the measured need, so hitting it signals
    // an adversarial topology (one long path) that needs a larger cap.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter iterations; " +
        "raise maxIter — emitting unconverged labels would be silently wrong")
    c.groupBy("v").agg(min("u").as("cluster_id"))
      .select(col("v").as("doc_id"), col("cluster_id"))
  }

  /** Dedup last mile, step 1: LSH candidates -> duplicate clusters.
    * Every document that appears in a candidate pair is labeled with its
    * component's minimum doc_id. The component loop runs on bucket-star
    * edges (linear) rather than the quadratic pair set — identical
    * components, verified against the oracle's pair-based transitive
    * closure.
    */
  private val q74 = QueryDef(
    "q74_dedup_clusters",
    (s, d) => connectedComponents(
        lshBucketStars(Tables(s, d, "documents")))
      .orderBy("doc_id"),
    Some(s"""WITH RECURSIVE $ccCteSql
             SELECT doc_id, cluster_id FROM cc ORDER BY doc_id"""))

  /** Dedup last mile, step 2: survivor selection from a cluster-label map.
    * Keeps the minimum doc_id of every duplicate cluster plus all unpaired
    * documents — the corpus with near-dups removed — and reports how many
    * copies each survivor absorbed. The anti join against the (tiny)
    * non-survivor set is the only touch on the full corpus.
    *
    * `labels` is a (doc_id, cluster_id) relation, normally the output of
    * [[connectedComponents]] — in production MATERIALIZED ONCE and fed to
    * both the cluster report and this selection (DedupClusterSpec proves
    * one CC run feeds both), rather than re-running the component loop
    * per consumer the way the per-query harness does.
    */
  def dedupSurvivors(docs: org.apache.spark.sql.DataFrame,
      labels: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sizes = labels.groupBy("cluster_id").agg(count(lit(1)).as("n"))
      .withColumnRenamed("cluster_id", "doc_id")
    val dupes = labels.filter(col("doc_id") =!= col("cluster_id")).select("doc_id")
    docs.join(dupes, Seq("doc_id"), "left_anti")
      .join(sizes, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        (coalesce(col("n"), lit(1L)) - 1L).cast("long").as("n_dupes_removed"))
  }

  private val q75 = QueryDef(
    "q75_dedup_survivors",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      dedupSurvivors(docs, connectedComponents(lshBucketStars(docs)))
        .orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE $ccCteSql,
                  sz AS (SELECT cluster_id, COUNT(*) AS n FROM cc GROUP BY cluster_id),
                  dupes AS (SELECT doc_id FROM cc WHERE doc_id <> cluster_id)
             SELECT d.doc_id, d.source,
                    CAST(COALESCE(sz.n, 1) - 1 AS BIGINT) AS n_dupes_removed
             FROM documents d
             ANTI JOIN dupes ON d.doc_id = dupes.doc_id
             LEFT JOIN sz ON d.doc_id = sz.cluster_id
             ORDER BY d.doc_id"""))

  /** Leakage-safe train/test split: the q66 salted-hash assignment applied
    * to each document's NEAR-DUP GROUP representative instead of the
    * document itself, so every member of a duplicate cluster lands on the
    * same side. A per-document random or hash split leaks near-duplicates
    * across the boundary — the test set then contains paraphrases of
    * training documents and eval scores are inflated; splitting by the
    * connected-component label (singletons are their own group) is the
    * standard dedup-before-split discipline for training corpora.
    *
    * Scale shape: the component loop is q74's linear bucket-star CC; its
    * label map is duplicate-population-sized (far smaller than the
    * corpus), joined to the corpus on doc_id in one keyed shuffle; the
    * hash assignment itself is map-only. Nothing here funnels one task.
    */
  private val q124 = QueryDef(
    "q124_leakage_safe_split",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      val labels = connectedComponents(lshBucketStars(docs))
      docs.join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("group_id"))
        .withColumn("split",
          when(substring(md5(concat(lit("split:"),
              col("group_id").cast("string"))), 1, 2) < "e6",
            lit("train")).otherwise(lit("test")))
        .select("doc_id", "group_id", "split")
        .orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE $ccCteSql
             SELECT d.doc_id,
                    COALESCE(cc.cluster_id, d.doc_id) AS group_id,
                    CASE WHEN substring(md5('split:' ||
                           CAST(COALESCE(cc.cluster_id, d.doc_id) AS VARCHAR)), 1, 2) < 'e6'
                         THEN 'train' ELSE 'test' END AS split
             FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id
             ORDER BY d.doc_id"""))

  /** Split-leakage audit — q124's reason to exist, quantified: score the
    * near-dup pairs (q72's est ≥ 0.5) under BOTH split strategies — the
    * naive per-document hash (q66) and the cluster-aware group hash
    * (q124) — and count pairs whose members land in DIFFERENT splits.
    * Cross-split near-dup pairs are evaluation leakage (the model sees
    * the test document's near-copy in training). The cluster-aware row
    * is provably zero: every LSH candidate pair shares a band bucket,
    * so both members sit in the same uncapped-CC component and inherit
    * ONE group hash — the audit turns that proof into a monitored
    * number, and turns the naive strategy's leakage into a visible one.
    *
    * Scale shape: the scored-pair relation is materialized once and
    * joined twice against 2-column split assignments (map-only hash for
    * naive; q74's linear CC labels for cluster-aware); each audit is a
    * 1-row aggregate. Nothing beyond the existing q72/q74 machinery
    * shuffles.
    */
  private val q134 = QueryDef(
    "q134_split_leakage_audit",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      val sig = minhashSigs(docs).localCheckpoint(true)
      val scored = lshCandidatePairsFromSigs(sig)
        .join(sig.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sig.as("sb"), col("doc_b") === col("sb.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          jaccardEstimate("sa", "sb").as("est"))
        .filter(col("est") >= 0.5)
        .localCheckpoint(true) // pair-population-sized, feeds both audits
      def splitOf(key: org.apache.spark.sql.Column) =
        when(substring(md5(concat(lit("split:"), key.cast("string"))), 1, 2)
          < "e6", lit("train")).otherwise(lit("test"))
      val naive = docs.select(col("doc_id"), splitOf(col("doc_id")).as("split"))
      // the CC path runs off the SAME checkpointed signatures as the
      // scoring path — lshBucketStars(docs) would re-run the whole
      // minhash aggregation a second time (strictly one less corpus
      // aggregation; sf0.1 wall-clock sits inside machine drift, at
      // corpus scale the saved aggregation is the dominant stage)
      val labels = connectedComponents(lshBucketStarsFromSigs(sig))
      val safe = docs.join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"),
          splitOf(coalesce(col("cluster_id"), col("doc_id"))).as("split"))
      def audit(assign: org.apache.spark.sql.DataFrame, name: String) =
        scored
          .join(assign.as("pa"), col("doc_a") === col("pa.doc_id"))
          .join(assign.as("pb"), col("doc_b") === col("pb.doc_id"))
          .agg(count(lit(1)).as("n_neardup_pairs"),
            sum(when(col("pa.split") =!= col("pb.split"), 1L).otherwise(0L))
              .as("n_cross_split"))
          .select(lit(name).as("strategy"), col("n_neardup_pairs"),
            col("n_cross_split").cast("long").as("n_cross_split"))
      audit(naive, "per_doc_hash").unionAll(audit(safe, "cluster_aware"))
        .orderBy("strategy")
    },
    Some(s"""WITH RECURSIVE $ccCteSql,
                  est AS (SELECT * FROM (
                            SELECT doc_a, doc_b,
                                   ${jaccardEstSql("sa", "sb")} AS est
                            FROM pairs
                            JOIN sig sa ON doc_a = sa.doc_id
                            JOIN sig sb ON doc_b = sb.doc_id) t
                          WHERE est >= 0.5),
                  naive AS (SELECT doc_id,
                              CASE WHEN substring(md5('split:' ||
                                     CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                                   THEN 'train' ELSE 'test' END AS split
                            FROM documents),
                  safe AS (SELECT d.doc_id,
                             CASE WHEN substring(md5('split:' ||
                                    CAST(COALESCE(cc.cluster_id, d.doc_id)
                                      AS VARCHAR)), 1, 2) < 'e6'
                                  THEN 'train' ELSE 'test' END AS split
                           FROM documents d
                           LEFT JOIN cc ON d.doc_id = cc.doc_id),
                  a1 AS (SELECT 'per_doc_hash' AS strategy,
                                COUNT(*) AS n_neardup_pairs,
                                CAST(SUM(CASE WHEN pa.split <> pb.split
                                     THEN 1 ELSE 0 END) AS BIGINT)
                                  AS n_cross_split
                         FROM est JOIN naive pa ON est.doc_a = pa.doc_id
                                  JOIN naive pb ON est.doc_b = pb.doc_id),
                  a2 AS (SELECT 'cluster_aware' AS strategy,
                                COUNT(*) AS n_neardup_pairs,
                                CAST(SUM(CASE WHEN pa.split <> pb.split
                                     THEN 1 ELSE 0 END) AS BIGINT)
                                  AS n_cross_split
                         FROM est JOIN safe pa ON est.doc_a = pa.doc_id
                                  JOIN safe pb ON est.doc_b = pb.doc_id)
             SELECT * FROM a1 UNION ALL SELECT * FROM a2
             ORDER BY strategy"""))

  /** The incremental-dedup core shared by q82 and the persisted signature
    * index probe: given the EXISTING corpus's signatures and the
    * increment's signatures, returns the REJECT list — new docs whose best
    * match against the existing corpus clears the near-dup bar, with that
    * best match and its score.
    *
    * Scale shape: the increment's band keys are the SMALL side and are
    * broadcast — the existing corpus is probed by equality join, never
    * re-paired against itself (no old×old work, the whole point of
    * incremental ingestion). Hot buckets are capped over the COMBINED
    * band membership (a boilerplate bucket is hot no matter which side
    * its members land on). Scoring joins fetch only the two signature
    * rows per candidate.
    */
  def incrementalReject(oldSig: org.apache.spark.sql.DataFrame,
      newSig: org.apache.spark.sql.DataFrame,
      bucketCap: Int = defaultBucketCap,
      threshold: Double = 0.5,
      maxCandidates: Long = defaultMaxCandidates): org.apache.spark.sql.DataFrame =
    rejectFromBands(bandsFromSigs(oldSig), bandsFromSigs(newSig),
      oldSig, newSig, bucketCap, threshold, maxCandidates)

  /** Ceiling on the materialized candidate-pair set a reject may
    * broadcast into its scoring join. A candidate row is two ids; the
    * broadcast side carries the increment's 8 signature components per
    * row (~200 B), so the default bounds the broadcast at ~200 MB —
    * raise deliberately if your executors can take a bigger build side,
    * or lower the bucket cap / shard the index instead.
    */
  val defaultMaxCandidates = 1000000L

  /** [[incrementalReject]]'s body, parameterized on the band relations so
    * the bloom-pruned probe can pre-filter the OLD side's bands before
    * anything shuffles. Hot-bucket counts stay exact under that prune
    * because pruning is by whole bucket KEY: a bucket either survives
    * with ALL its members (its combined count is unchanged) or is a
    * bucket the increment never touches (it can produce no candidate, so
    * its hotness is never consulted).
    *
    * Scoring-stage scale shape: the candidate set is bounded by
    * construction (each surviving bucket holds <= bucketCap members, so
    * |cand| <= |newBands| x bucketCap — increment-sized, never
    * index-sized). It is materialized ONCE, require-checked against
    * `maxCandidates`, and BROADCAST into the scoring join, so the stored
    * signature relation — ~4 TB at a 10^11-doc corpus — is probed
    * map-side with ZERO exchanges on the index side (spec-pinned by
    * SignatureIndexSpec/ShardedSignatureSpec). A bloom over the
    * candidates' old_ids additionally prunes the index scan before the
    * join: no false negatives (every scored old row survives), and a
    * false positive meets no candidate in the equality join — exact.
    */
  private def rejectFromBands(oldBands: org.apache.spark.sql.DataFrame,
      newBands: org.apache.spark.sql.DataFrame,
      oldSig: org.apache.spark.sql.DataFrame,
      newSig: org.apache.spark.sql.DataFrame,
      bucketCap: Int, threshold: Double,
      maxCandidates: Long = defaultMaxCandidates): org.apache.spark.sql.DataFrame = {
    val hot = oldBands.select("band", "key")
      .unionAll(newBands.select("band", "key"))
      .groupBy("band", "key").agg(count(lit(1)).as("n"))
      .filter(col("n") > bucketCap)
      .select("band", "key")
    val o = oldBands.join(broadcast(hot), Seq("band", "key"), "left_anti")
    val n = newBands.join(broadcast(hot), Seq("band", "key"), "left_anti")
    val cand = o.as("o").join(broadcast(n.as("n")),
        col("o.band") === col("n.band") && col("o.key") === col("n.key"))
      .select(col("n.doc_id").as("new_id"), col("o.doc_id").as("old_id"))
      .distinct()
      .localCheckpoint(true)
    val nCand = cand.count() // free: checkpointed above
    require(nCand <= maxCandidates,
      s"incrementalReject: $nCand candidate pairs (> maxCandidates=" +
        s"$maxCandidates) — the scoring join broadcasts the candidates " +
        "so the stored index is never shuffled; raise maxCandidates " +
        "deliberately if the broadcast is truly affordable, or lower " +
        "bucketCap / probe smaller increments")
    // no distinct before the bloom build: duplicate ids set the same bits
    // (sizing by nCand >= distinct old_ids only oversizes the bitset),
    // and dropping it removes the distinct's exchange from every probe
    val oldIdBloom = graft.functions.BloomFunctions.buildLongBloom(
      cand.select(xxhash64(col("old_id")).as("h")), col("h"),
      nCand, 0.01)
    val sa = newSig.as("sa")
    val sb = oldSig.filter(graft.functions.BloomFunctions.mightContainLong(
      oldIdBloom, xxhash64(col("doc_id")))).as("sb")
    broadcast(cand.join(sa, col("new_id") === col("sa.doc_id")))
      .join(sb, col("old_id") === col("sb.doc_id"))
      .select(col("new_id"), col("old_id"),
        jaccardEstimate("sa", "sb").as("jaccard_est"))
      .filter(col("jaccard_est") >= threshold)
      .groupBy("new_id")
      .agg(min(struct(negate(col("jaccard_est")).as("neg"),
        col("old_id").as("oid"))).as("best"))
      .select(col("new_id"),
        col("best.oid").as("old_id"),
        negate(col("best.neg")).as("jaccard_est"))
  }

  /** Builds the persisted signature index: the corpus's 8-component MinHash
    * signatures (doc_id, h0..h7) written ONCE to parquet at `path`. This is
    * the build-once side of the production incremental-dedup lifecycle —
    * after this, daily increments are checked via [[probeSignatureIndex]]
    * and admitted docs added via [[appendSignatureIndex]]; the old corpus's
    * TEXT is never read again. The index is ~40 bytes/doc (8 × 8-char hex
    * components), so a 100 TB / 10^11-doc corpus indexes to ~4 TB of
    * parquet — scanned per increment instead of the corpus's 100 TB.
    */
  def buildSignatureIndex(documents: org.apache.spark.sql.DataFrame,
      path: String): Unit =
    minhashSigs(documents).write.mode("overwrite").parquet(path)

  /** Probes the persisted signature index with an increment: computes the
    * increment's signatures from its text, reads the OLD side's signatures
    * from the index (the only touch on the existing corpus), and returns
    * [[incrementalReject]]'s reject list. SignatureIndexSpec asserts the
    * probe plan's file scans are exactly the index plus the increment —
    * no re-scan of the old documents.
    */
  def probeSignatureIndex(spark: org.apache.spark.sql.SparkSession,
      increment: org.apache.spark.sql.DataFrame, path: String,
      bucketCap: Int = defaultBucketCap,
      threshold: Double = 0.5,
      maxCandidates: Long = defaultMaxCandidates): org.apache.spark.sql.DataFrame =
    incrementalReject(spark.read.parquet(path), minhashSigs(increment),
      bucketCap, threshold, maxCandidates)

  /** The bloom-pruned probe: [[probeSignatureIndex]] with the increment's
    * band-key set pushed into the INDEX side as a codegen'd bloom
    * predicate BEFORE anything shuffles.
    *
    * Why: the plain probe's hot-bucket aggregation groups the UNION of
    * both sides' band rows — a shuffle of the corpus-index-sized band
    * relation on every daily probe, even though only buckets the
    * increment touches can ever produce a candidate. A broadcast bitset
    * of the increment's (band, key) hashes (increment-sized — a few MB
    * at 1% fpp even for millions of increment band rows) filters the
    * index's band rows map-side inside whole-stage codegen, so the
    * probe's shuffles are bounded by the increment's bucket membership
    * (plus the fpp-bounded false-positive sliver), not the corpus.
    *
    * EXACTNESS is free, not approximate: blooms have no false negatives,
    * so every truly-touched bucket survives with all its members (hot
    * counts unchanged — see [[rejectFromBands]]); a false-positive
    * bucket has no increment-side band row to meet in the equality join
    * and contributes nothing. SignatureIndexSpec pins row-identity with
    * the unpruned probe and asserts the bloom predicate sits in the
    * probe plan.
    */
  def probeSignatureIndexPruned(spark: org.apache.spark.sql.SparkSession,
      increment: org.apache.spark.sql.DataFrame, path: String,
      bucketCap: Int = defaultBucketCap,
      threshold: Double = 0.5,
      maxCandidates: Long = defaultMaxCandidates): org.apache.spark.sql.DataFrame =
    prunedReject(spark, increment, spark.read.parquet(path), bucketCap,
      threshold, maxCandidates)

  /** The bloom-pruned probe body, parameterized on the stored signature
    * relation so the rename-family probe (a parquet dir) and the
    * manifest-committed probe (a VersionedStore read — multi-dir scan +
    * tombstone anti-join) share one plan. The stored relation is read
    * as a re-scannable PLAN, never materialized: it is touched twice
    * (band side map-side behind the bloom, scoring side map-side behind
    * the candidate broadcast) and both touches are pruned before any
    * shuffle — a checkpoint here would pull the whole index into
    * executor memory for no shuffle saved.
    */
  private def prunedReject(spark: org.apache.spark.sql.SparkSession,
      increment: org.apache.spark.sql.DataFrame,
      oldSig: org.apache.spark.sql.DataFrame,
      bucketCap: Int, threshold: Double,
      maxCandidates: Long): org.apache.spark.sql.DataFrame = {
    // increment-sized: signatures feed bands, the bloom build, and the
    // scoring join — materialize once
    val newSig = minhashSigs(increment).localCheckpoint(true)
    val newBands = bandsFromSigs(newSig).localCheckpoint(true)
    val keyHash = xxhash64(col("band"), col("key"))
    // an empty increment builds the empty filter (rejects every index
    // row — zero candidates), via buildLongBloom's expectedItems<=0 path.
    // No distinct before the build (duplicate keys set the same bits;
    // sizing by the raw band-row count only oversizes the bitset), so
    // the build is one exchange-free aggregate over the checkpointed
    // bands and the sizing count reads cached blocks.
    val bloom = graft.functions.BloomFunctions.buildLongBloom(
      newBands.select(keyHash.as("h")), col("h"), newBands.count(), 0.01)
    val oldBands = bandsFromSigs(oldSig).filter(
      graft.functions.BloomFunctions.mightContainLong(bloom, keyHash))
    rejectFromBands(oldBands, newBands, oldSig, newSig, bucketCap, threshold,
      maxCandidates)
  }

  /** Appends an (admitted) increment's signatures to the index so the next
    * day's probe sees them. Parquet append writes new files only — no
    * rewrite of the existing index.
    */
  def appendSignatureIndex(increment: org.apache.spark.sql.DataFrame,
      path: String): Unit =
    minhashSigs(increment).write.mode("append").parquet(path)

  /** FORGET documents from the monolithic signature index — the
    * right-to-be-forgotten verb, crash-durable through
    * [[graft.operators.StoreRewrite]] (the [[forgetWinnowIndex]]
    * contract): one rewrite without the doomed ids, refused up front if
    * it would empty the index. A replayed append's duplicate rows (the
    * monolithic append is raw — the probe's candidate `.distinct()` and
    * best-match fold make duplicates harmless) are all removed together.
    */
  def forgetSignatureIndex(spark: org.apache.spark.sql.SparkSession,
      del: org.apache.spark.sql.DataFrame, path: String): Unit = {
    graft.operators.StoreRewrite.recover(spark, path)
    val ids = del.select("doc_id").localCheckpoint(true)
    val remaining = spark.read.parquet(path)
      .join(ids, Seq("doc_id"), "left_anti").count()
    require(remaining > 0,
      "forgetSignatureIndex: forgetting the ENTIRE corpus leaves an " +
        "empty index — delete the index directory instead")
    graft.operators.StoreRewrite.atomicOverwrite(
      spark.read.parquet(path).join(ids, Seq("doc_id"), "left_anti"),
      path)
  }

  /** Maintain the MONOLITHIC signature index from a VERSIONED-STORE
    * revision window — verb parity with
    * [[maintainSignatureIndexShardedFromStore]] for the store shape a
    * small corpus starts on (the sharded federation is the scale
    * shape). Same [[graft.operators.CdcBridge]] body: deletes forget
    * first (physical removal — a gone document must stop matching
    * probes), netted inserts append after.
    */
  def maintainSignatureIndexFromStore(
      spark: org.apache.spark.sql.SparkSession, storePath: String,
      rel: String, fromRev: Long, toRev: Long, path: String): Unit =
    graft.operators.CdcBridge.maintain(spark, storePath, rel, fromRev,
      toRev, "doc_id", Seq("doc_id", "text"),
      "maintainSignatureIndexFromStore")(
      del => forgetSignatureIndex(spark, del, path))(
      ins => appendSignatureIndex(ins, path))

  /** SYNC the monolithic signature index with its versioned corpus —
    * [[syncSignatureIndexShardedWithStore]]'s unsharded twin. The
    * monolithic twist: the index IS one parquet relation, so the
    * [[graft.operators.RevisionSync]] checkpoint lives inside it as the
    * underscore-invisible `_synced_rev` sidecar, the bootstrap writes
    * the relation through [[graft.operators.StoreRewrite]] (a plain
    * overwrite would delete the in-flight sentinel marker and a crashed
    * bootstrap could never be told from a hand-built index), and every
    * whole-dir rewrite carries the marker across (StoreRewrite preserves
    * `_synced_rev` — copy-before-delete, so no crash window orphans it).
    */
  def syncSignatureIndexWithStore(spark: org.apache.spark.sql.SparkSession,
      storePath: String, rel: String, path: String): Option[(Long, Long)] =
    graft.operators.CdcBridge.sync(spark, storePath, path,
      "syncSignatureIndexWithStore")({
      // bootstrap-sentinel states leave a dir holding ONLY the marker;
      // the index "exists" only if actual signature parquet is present
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      fs.exists(p) && fs.listStatus(p)
        .exists(s => !s.getPath.getName.startsWith("_"))
    })(cur =>
      graft.operators.StoreRewrite.atomicOverwrite(
        minhashSigs(graft.operators.VersionedStore
          .read(spark, storePath, rel, Some(cur))), path))((from, to) =>
      maintainSignatureIndexFromStore(spark, storePath, rel, from, to,
        path))

  // ------------------------------------------------------------------
  // MANIFEST-COMMITTED signature index — the migration template off the
  // rename-based commit (SCALING.md "commit-protocol fork"): every
  // rename-family verb (StoreRewrite's delete+rename window, parquet
  // append visibility) assumes atomic directory rename, which
  // local/HDFS have and object stores do not. This form keeps the SAME
  // signature relation inside a [[graft.operators.VersionedStore]], so
  // every verb commits by ONE small manifest PUT: build = save, append
  // = delta append (never rewrites), forget = tombstone delete, compact
  // = fold. No recover verb exists or is needed — a crash at any
  // instant leaves the previous revision readable — and the store is
  // object-store-safe end to end. Semantics trade, stated honestly:
  // forget here is a TOMBSTONE, so it masks the doc_id until the next
  // [[graft.operators.VersionedStore.compact]] physically folds it out
  // — re-appending the SAME doc_id before a compact stays masked
  // (sticky), where the rename-family forget physically removes rows
  // and re-admits immediately. Fresh copies arrive under fresh doc_ids
  // in every ingest pipeline here, so the sticky window is inert in
  // practice; the spec pins both behaviors.
  // ------------------------------------------------------------------

  /** Build the manifest-committed signature index: revision 1 = the
    * corpus's signatures. One commit PUT; on S3 this is the safe form
    * of [[buildSignatureIndex]].
    */
  def buildSignatureIndexVersioned(documents: org.apache.spark.sql.DataFrame,
      path: String): Long =
    graft.operators.VersionedStore.save(
      Map("sig" -> minhashSigs(documents)), path)

  /** Probe the manifest-committed index — [[probeSignatureIndexPruned]]'s
    * plan (bloom-pruned bands, broadcast-candidate scoring) over the
    * store's current revision, which is a multi-dir scan anti-joined
    * against the accumulated tombstones (tombstone keys are tiny and
    * broadcast). Row-identical to the rename-family probe on the same
    * visible content, spec-pinned.
    */
  def probeSignatureIndexVersioned(spark: org.apache.spark.sql.SparkSession,
      increment: org.apache.spark.sql.DataFrame, path: String,
      bucketCap: Int = defaultBucketCap,
      threshold: Double = 0.5,
      maxCandidates: Long = defaultMaxCandidates): org.apache.spark.sql.DataFrame =
    prunedReject(spark, increment,
      graft.operators.VersionedStore.read(spark, path, "sig"),
      bucketCap, threshold, maxCandidates)

  /** Append an admitted increment: a delta dir + one manifest PUT — the
    * existing revision's dirs are referenced, never rewritten or read.
    */
  def appendSignatureIndexVersioned(
      increment: org.apache.spark.sql.DataFrame, path: String): Long =
    graft.operators.VersionedStore.append(
      Map("sig" -> minhashSigs(increment)), path)

  /** Forget by tombstone: one tiny keys dir + one manifest PUT; reads
    * anti-join it from then on. Physical reclaim (and tombstone
    * retirement — see the family header's sticky note) happens at
    * [[graft.operators.VersionedStore.compact]].
    */
  def forgetSignatureIndexVersioned(spark: org.apache.spark.sql.SparkSession,
      del: org.apache.spark.sql.DataFrame, path: String): Long =
    graft.operators.VersionedStore.delete(del.select("doc_id"), "sig", path)

  /** SYNC the manifest-committed index with its versioned corpus — the
    * [[syncSignatureIndexWithStore]] contract on the rename-free form.
    * The `_synced_rev` checkpoint lives at the store root beside
    * `_versions` (vacuum touches only `d*__*` dirs and manifests, so
    * the marker is never reclaimed), and no rewrite verb exists that
    * could orphan it — the marker-preservation machinery the rename
    * family needs simply has nothing to do here.
    */
  def syncSignatureIndexVersionedWithStore(
      spark: org.apache.spark.sql.SparkSession, storePath: String,
      rel: String, path: String,
      retain: Option[Int] = None): Option[(Long, Long)] =
    graft.operators.CdcBridge.sync(spark, storePath, path,
      "syncSignatureIndexVersionedWithStore", retain)(
      graft.operators.VersionedStore.currentVersion(spark, path).isDefined)(
      cur => buildSignatureIndexVersioned(
        graft.operators.VersionedStore.read(spark, storePath, rel,
          Some(cur)), path))((from, to) =>
      graft.operators.CdcBridge.maintain(spark, storePath, rel, from, to,
        "doc_id", Seq("doc_id", "text"),
        "syncSignatureIndexVersionedWithStore")(
        del => { forgetSignatureIndexVersioned(spark, del, path); () })(
        ins => { appendSignatureIndexVersioned(ins, path); () }))

  /** MIGRATE a rename-protocol signature index to the manifest-committed
    * form — the template of the family migrations (one relation, column
    * gate): the stored signatures are read whole, gated on the layout
    * the probes rely on (doc_id + h0..h7 — a foreign parquet dir
    * refuses here, never becomes a "signature store"), and committed as
    * revision 1 by ONE manifest PUT. A rewrite that died between
    * delete and rename refuses with the recover verb named (its content
    * is intact at the temp path — healing is the rename protocol's job,
    * not the migration's). A CDC `_synced_rev` checkpoint carries
    * across, so a synced index keeps syncing from the same corpus store
    * under the new protocol. The source is never mutated: migration is
    * a read — at 100 TB an O(index) copy job against a ~4 TB signature
    * relation, where re-building would re-shingle the full corpus text.
    */
  def migrateSignatureIndexToVersioned(
      spark: org.apache.spark.sql.SparkSession, src: String,
      dst: String): Long = {
    val p = new org.apache.hadoop.fs.Path(src)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p) ||
        !fs.exists(new org.apache.hadoop.fs.Path(
          src + graft.operators.StoreRewrite.TmpSuffix)),
      s"migrateSignatureIndexToVersioned: a rewrite of $src crashed " +
        "between delete and rename (the complete store is at " +
        s"$src${graft.operators.StoreRewrite.TmpSuffix}) — run " +
        "StoreRewrite.recover first, then migrate")
    require(graft.operators.VersionedStore
        .currentVersion(spark, dst).isEmpty,
      s"migrateSignatureIndexToVersioned: $dst already holds a " +
        "versioned store — refusing to commit a second lineage over it")
    val sig = spark.read.parquet(src)
    val cols = sig.columns.toSet
    require(cols("doc_id") && (0 until 8).forall(j => cols(s"h$j")),
      s"migrateSignatureIndexToVersioned: $src is not a signature " +
        s"index (columns [${cols.toSeq.sorted.mkString(",")}], need " +
        "doc_id + h0..h7)")
    val rev = graft.operators.VersionedStore.save(Map("sig" -> sig), dst)
    graft.operators.RevisionSync.migrateMarker(spark, src, dst,
      "migrateSignatureIndexToVersioned")
    rev
  }

  /** Incremental-batch dedup: the daily-ingest path. New documents (one
    * source partition standing in for "today's crawl") are checked against
    * the EXISTING corpus via [[incrementalReject]]; everything not listed
    * is safe to ingest. This harness form recomputes both sides'
    * signatures from the documents table so the oracle can mirror it; the
    * PRODUCTION form is [[buildSignatureIndex]]/[[probeSignatureIndex]],
    * where the old side's signatures are a stored parquet index that is
    * probed and appended to without ever re-reading the old corpus's text
    * (SignatureIndexSpec proves the probe plan's only scans are the index
    * and the increment).
    */
  private val q82 = QueryDef(
    "q82_incremental_dedup",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      // the signature aggregation is the expensive stage and feeds FOUR
      // consumers (new/old bands, both score sides) — materialize it once
      // rather than relying on exchange reuse
      val sig = minhashSigs(docs).localCheckpoint(true)
      val newIds = docs.filter(col("source") === "src19").select("doc_id")
      val newSig = sig.join(broadcast(newIds), "doc_id")
      val oldSig = sig.join(broadcast(newIds), Seq("doc_id"), "left_anti")
      incrementalReject(oldSig, newSig).orderBy("new_id")
    },
    Some(incRejectOracleSql))

  /** Shared oracle of q82 and q178: the from-scratch incremental-reject
    * semantics. q178's bloom-pruned store-served path must reproduce it
    * row-for-row — the gate that the bloom prunes WORK, never results.
    */
  private lazy val incRejectOracleSql: String =
    s"""WITH $lshPairsCteSql,
                  new_ids AS (SELECT doc_id FROM documents WHERE source = 'src19'),
                  cand AS (SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
                           FROM cbands n
                           JOIN new_ids ON n.doc_id = new_ids.doc_id
                           JOIN cbands o ON o.band = n.band AND o.key = n.key
                           WHERE o.doc_id NOT IN (SELECT doc_id FROM new_ids)),
                  scored AS (SELECT new_id, old_id,
                               ${jaccardEstSql("sa", "sb")} AS jaccard_est
                             FROM cand
                             JOIN sig sa ON new_id = sa.doc_id
                             JOIN sig sb ON old_id = sb.doc_id)
             SELECT new_id, old_id, jaccard_est FROM (
               SELECT new_id, old_id, jaccard_est,
                      ROW_NUMBER() OVER (PARTITION BY new_id
                        ORDER BY jaccard_est DESC, old_id ASC) AS rn
               FROM scored WHERE jaccard_est >= 0.5) t
             WHERE rn = 1 ORDER BY new_id"""

  /** q178: the daily probe as it runs in PRODUCTION — against the
    * persisted signature index, with the increment's band-key bloom
    * pushed into the index side ([[probeSignatureIndexPruned]]). The
    * full store lifecycle runs in-query (build the old corpus's index,
    * probe with the increment) and the oracle is q82's from-scratch SQL
    * VERBATIM: the bloom must prune shuffled WORK (the probe's
    * aggregation sees increment-touched buckets, not the corpus) while
    * changing NOTHING — no false negatives, fp candidates die in the
    * equality join.
    */
  private val q178 = QueryDef(
    "q178_bloom_pruned_probe",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      val inc = docs.filter(col("source") === "src19")
      val old = docs.filter(col("source") =!= "src19")
      val root = graft.BenchPhases.storeDir("graft-sigx")
      val path = root + "/sig"
      graft.BenchPhases.build { buildSignatureIndex(old, path) }
      val res = probeSignatureIndexPruned(s, inc, path)
        .orderBy("new_id").localCheckpoint(true)
      graft.BenchPhases.discard(s, root)
      res
    },
    Some(incRejectOracleSql))

  /** q191: the SAME daily near-dup probe served from the SHARDED
    * signature index — doc-routed 3-shard build in-query, federated
    * bloom-pruned probe. Its oracle is q82/q178's SQL VERBATIM: the
    * per-shard map-side prunes and the post-union hot-bucket caps must
    * reproduce the from-scratch incremental-reject row for row
    * (ShardedSignatureSpec additionally pins bit-equality with the
    * monolithic pruned STORE probe and the maintenance verbs).
    */
  private val q191 = QueryDef(
    "q191_signature_sharded_probe",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      val inc = docs.filter(col("source") === "src19")
      val old = docs.filter(col("source") =!= "src19")
      if (old.isEmpty || inc.isEmpty)
        // the sharded build refuses an empty corpus (empty shards);
        // either side empty makes the probe vacuously empty
        inc.select(col("doc_id").as("new_id"), col("doc_id").as("old_id"),
          lit(0.0).as("jaccard_est")).limit(0)
      else {
        val root = graft.BenchPhases.storeDir("graft-sigshx")
        val store = root + "/sig"
        graft.BenchPhases.build {
          buildSignatureIndexSharded(old, store, nShards = 3)
        }
        val res = probeSignatureIndexSharded(s, inc, store)
          .orderBy("new_id").localCheckpoint(true)
        graft.BenchPhases.discard(s, root)
        res
      }
    },
    Some(incRejectOracleSql))

  /** q209: q191's federated probe with every shard AND the router
    * manifest-committed — the sharded signature federation on the
    * rename-free protocol (forgets become per-owning-shard tombstone
    * PUTs with no intent/recover machinery). The oracle is q191's SQL
    * VERBATIM: neither sharding nor the commit protocol may change
    * what the probe returns.
    */
  private val q209 = QueryDef(
    "q209_versioned_signature_sharded",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      val inc = docs.filter(col("source") === "src19")
      val old = docs.filter(col("source") =!= "src19")
      if (old.isEmpty || inc.isEmpty)
        inc.select(col("doc_id").as("new_id"), col("doc_id").as("old_id"),
          lit(0.0).as("jaccard_est")).limit(0)
      else {
        val root = graft.BenchPhases.storeDir("graft-sigshv")
        val store = root + "/sig"
        graft.BenchPhases.build {
          buildSignatureIndexShardedVersioned(old, store, nShards = 3)
        }
        val res = probeSignatureIndexShardedVersioned(s, inc, store)
          .orderBy("new_id").localCheckpoint(true)
        graft.BenchPhases.discard(s, root)
        res
      }
    },
    Some(incRejectOracleSql))

  /** q197: the daily probe served from the MANIFEST-COMMITTED signature
    * store ([[probeSignatureIndexVersioned]]) — the object-store-safe
    * commit protocol carrying the q178 probe plan. The full lifecycle
    * runs in-query (save the old corpus's signatures as revision 1,
    * probe the increment against the current revision) and the oracle
    * is q82/q178/q191's SQL VERBATIM: swapping the commit protocol
    * under the index must change NOTHING about what the probe returns.
    */
  private val q197 = QueryDef(
    "q197_versioned_signature_probe",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      val inc = docs.filter(col("source") === "src19")
      val old = docs.filter(col("source") =!= "src19")
      if (old.isEmpty)
        inc.select(col("doc_id").as("new_id"), col("doc_id").as("old_id"),
          lit(0.0).as("jaccard_est")).limit(0)
      else {
        val root = graft.BenchPhases.storeDir("graft-vsigx")
        val path = root + "/sig"
        graft.BenchPhases.build { buildSignatureIndexVersioned(old, path) }
        val res = probeSignatureIndexVersioned(s, inc, path)
          .orderBy("new_id").localCheckpoint(true)
        graft.BenchPhases.discard(s, root)
        res
      }
    },
    Some(incRejectOracleSql))

  /** MIGRATE a rename-protocol winnow-fingerprint index to the
    * manifest-committed form — [[migrateSignatureIndexToVersioned]]'s
    * template with the family's one twist: the rename store records NO
    * knobs (its probes take k/w as arguments), while the versioned
    * store refuses knob-less probes, so the CALLER declares the (k, w)
    * the index was built under and they are recorded as the `knobs`
    * relation. k and w are deliberately REQUIRED (no defaults): a
    * rename-store probe with wrong knobs is wrong per call, but a
    * migration bakes the declaration in permanently — defaulting it
    * would let a caller who built under different knobs silently
    * record wrong ones that every subsequent probe then trusts.
    */
  def migrateWinnowIndexToVersioned(
      spark: org.apache.spark.sql.SparkSession, src: String, dst: String,
      k: Int, w: Int): Long = {
    val p = new org.apache.hadoop.fs.Path(src)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p) ||
        !fs.exists(new org.apache.hadoop.fs.Path(
          src + graft.operators.StoreRewrite.TmpSuffix)),
      s"migrateWinnowIndexToVersioned: a rewrite of $src crashed " +
        "between delete and rename — run StoreRewrite.recover first, " +
        "then migrate")
    require(graft.operators.VersionedStore
        .currentVersion(spark, dst).isEmpty,
      s"migrateWinnowIndexToVersioned: $dst already holds a versioned " +
        "store — refusing to commit a second lineage over it")
    val fp = spark.read.parquet(src)
    require(fp.columns.toSet == Set("doc_id", "fp_pos", "fp_hash"),
      s"migrateWinnowIndexToVersioned: $src is not a winnow index " +
        s"(columns [${fp.columns.sorted.mkString(",")}])")
    val rev = graft.operators.VersionedStore.save(Map(
      "fp" -> fp, "knobs" -> winnowKnobsDf(spark, k, w)), dst)
    graft.operators.RevisionSync.migrateMarker(spark, src, dst,
      "migrateWinnowIndexToVersioned")
    rev
  }

  /** Shared preamble of the FEDERATION migrations: refuse a live
    * `_forget_intent` (a sharded forget died mid-loop — its recover
    * verb must finish the rewrites before the content is
    * authoritative) and an occupied target root.
    */
  private def checkFederationMigratable(
      spark: org.apache.spark.sql.SparkSession, srcRoot: String,
      dstRoot: String, intentPath: String, routerDst: String,
      verb: String, recoverVerb: String): Unit = {
    val ip = new org.apache.hadoop.fs.Path(intentPath)
    val fs = ip.getFileSystem(spark.sessionState.newHadoopConf())
    require(!fs.exists(ip),
      s"$verb: a sharded forget of $srcRoot died mid-loop (live " +
        s"_forget_intent) — run $recoverVerb first, then migrate")
    require(graft.operators.VersionedStore
        .currentVersion(spark, routerDst).isEmpty,
      s"$verb: $dstRoot already holds a committed federation — " +
        "refusing to commit a second lineage over it")
  }

  /** MIGRATE the rename sharded signature federation: each shard
    * through [[migrateSignatureIndexToVersioned]] (column gate, torn
    * check), the ROUTER copied verbatim as the versioned router and
    * committed LAST — the same build-commit ordering as
    * [[buildSignatureIndexShardedVersioned]], so a crash mid-migration
    * leaves a router-less root every versioned verb refuses, and
    * re-running completes it. The federation's root sync checkpoint
    * carries across.
    */
  def migrateSignatureIndexShardedToVersioned(
      spark: org.apache.spark.sql.SparkSession, srcRoot: String,
      dstRoot: String): Unit = {
    checkFederationMigratable(spark, srcRoot, dstRoot,
      sigForgetIntentPath(srcRoot), sigRouterPath(dstRoot),
      "migrateSignatureIndexShardedToVersioned",
      "recoverSignatureIndexSharded")
    val n = signatureShardCount(spark, srcRoot)
    (0 until n).foreach { i =>
      // a partially-migrated shard (crash + re-run) starts over: the
      // un-referenced debris vacuums away; the refusal gate is only
      // for COMMITTED targets, which a router-less re-run never has
      val sp = new org.apache.hadoop.fs.Path(sigShardPath(dstRoot, i))
      val fs = sp.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(sp)) fs.delete(sp, true)
      migrateSignatureIndexToVersioned(spark, sigShardPath(srcRoot, i),
        sigShardPath(dstRoot, i))
    }
    graft.operators.VersionedStore.save(
      Map("router" -> spark.read.parquet(sigRouterPath(srcRoot))
        .coalesce(1)), sigRouterPath(dstRoot))
    graft.operators.RevisionSync.migrateMarker(spark, srcRoot, dstRoot,
      "migrateSignatureIndexShardedToVersioned")
  }

  /** MIGRATE the rename sharded winnow federation — per-shard `fp`
    * saves (the knobs already ride the router, copied verbatim), the
    * versioned router LAST as the commit marker, root checkpoint
    * carried.
    */
  def migrateWinnowIndexShardedToVersioned(
      spark: org.apache.spark.sql.SparkSession, srcRoot: String,
      dstRoot: String): Unit = {
    checkFederationMigratable(spark, srcRoot, dstRoot,
      winnowForgetIntentPath(srcRoot), winnowRouterPath(dstRoot),
      "migrateWinnowIndexShardedToVersioned",
      "recoverWinnowIndexSharded")
    val (n, _, _) = winnowShardInfo(spark, srcRoot)
    (0 until n).foreach { i =>
      val sp = new org.apache.hadoop.fs.Path(winnowShardPath(dstRoot, i))
      val fs = sp.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(sp)) fs.delete(sp, true)
      // the signature federation's per-shard torn-rewrite gate: a shard
      // whose rewrite died between delete and rename must refuse with
      // the recovery verb named, not a generic path-not-found
      val srcShard = new org.apache.hadoop.fs.Path(winnowShardPath(srcRoot, i))
      require(fs.exists(srcShard) ||
          !fs.exists(new org.apache.hadoop.fs.Path(
            winnowShardPath(srcRoot, i) + graft.operators.StoreRewrite.TmpSuffix)),
        s"migrateWinnowIndexShardedToVersioned: a rewrite of shard $i of " +
          s"$srcRoot crashed between delete and rename — run " +
          "StoreRewrite.recover first, then migrate")
      val fp = spark.read.parquet(winnowShardPath(srcRoot, i))
      require(fp.columns.toSet == Set("doc_id", "fp_pos", "fp_hash"),
        s"migrateWinnowIndexShardedToVersioned: shard $i of $srcRoot " +
          s"is not a winnow shard (columns " +
          s"[${fp.columns.sorted.mkString(",")}])")
      graft.operators.VersionedStore.save(Map("fp" -> fp),
        winnowShardPath(dstRoot, i))
    }
    graft.operators.VersionedStore.save(
      Map("router" -> spark.read.parquet(winnowRouterPath(srcRoot))
        .coalesce(1)), winnowRouterPath(dstRoot))
    graft.operators.RevisionSync.migrateMarker(spark, srcRoot, dstRoot,
      "migrateWinnowIndexShardedToVersioned")
  }

  /** q212: q197's probe served from a store MIGRATED off the rename
    * protocol — build the rename-family signature index, run
    * [[migrateSignatureIndexToVersioned]] (one O(index) copy job, the
    * raw corpus never re-shingled), probe the MIGRATED store through
    * the versioned family's own verb. The oracle is
    * q82/q178/q191/q197's SQL VERBATIM: a protocol migration must be
    * invisible to the probe — same candidates, same scores, bit for
    * bit (MigrateStoreSpec additionally pins content equality against
    * a fresh versioned build).
    */
  private val q212 = QueryDef(
    "q212_migrated_signature_probe",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      val inc = docs.filter(col("source") === "src19")
      val old = docs.filter(col("source") =!= "src19")
      if (old.isEmpty)
        inc.select(col("doc_id").as("new_id"), col("doc_id").as("old_id"),
          lit(0.0).as("jaccard_est")).limit(0)
      else {
        val root = graft.BenchPhases.storeDir("graft-migsig")
        val ren = root + "/ren"
        val ver = root + "/ver"
        graft.BenchPhases.build {
          buildSignatureIndex(old, ren)
          migrateSignatureIndexToVersioned(s, ren, ver)
        }
        val res = probeSignatureIndexVersioned(s, inc, ver)
          .orderBy("new_id").localCheckpoint(true)
        graft.BenchPhases.discard(s, root)
        res
      }
    },
    Some(incRejectOracleSql))

  /** q215: q209's federated probe served from a federation MIGRATED off
    * the rename protocol — build the rename sharded signature index,
    * run [[migrateSignatureIndexShardedToVersioned]] (per-shard gated
    * copies, router verbatim, committed last), probe through the
    * versioned federation's own verb. The oracle is
    * q82/q178/q191/q197/q209/q212's SQL VERBATIM: neither sharding nor
    * the protocol migration may change what the probe returns.
    */
  private val q215 = QueryDef(
    "q215_migrated_sharded_probe",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      val inc = docs.filter(col("source") === "src19")
      val old = docs.filter(col("source") =!= "src19")
      if (old.isEmpty || inc.isEmpty)
        inc.select(col("doc_id").as("new_id"), col("doc_id").as("old_id"),
          lit(0.0).as("jaccard_est")).limit(0)
      else {
        val root = graft.BenchPhases.storeDir("graft-migshv")
        val ren = root + "/ren"
        val ver = root + "/ver"
        graft.BenchPhases.build {
          buildSignatureIndexSharded(old, ren, nShards = 3)
          migrateSignatureIndexShardedToVersioned(s, ren, ver)
        }
        val res = probeSignatureIndexShardedVersioned(s, inc, ver)
          .orderBy("new_id").localCheckpoint(true)
        graft.BenchPhases.discard(s, root)
        res
      }
    },
    Some(incRejectOracleSql))

  /** q193: the dedup corpus lives in a VERSIONED STORE and the sharded
    * signature index is maintained by CDC — q189/q192's bridge
    * discipline closing the triangle on the dedup side. The index is
    * bootstrapped from the first revision, then TWO maintain calls
    * propagate (1) an append window that admits the rest of the corpus
    * plus transient rows, and (2) a delete window whose forgets
    * physically remove those transients from their owning shards — so
    * both CDC paths do real work. The final visible corpus is exactly
    * the non-src19 documents, so the oracle is q82/q178/q191's SQL
    * VERBATIM: maintenance must be indistinguishable from a
    * from-scratch build (ShardedSignatureSpec pins shard-content
    * bit-equality with a fresh sharded build of `read(toRev)` and
    * window replay safety too).
    */
  private val q193 = QueryDef(
    "q193_cdc_signature_maintenance",
    (s, d) => {
      import graft.operators.VersionedStore
      val docs = Tables(s, d, "documents").select("doc_id", "text", "source")
      val inc = docs.filter(col("source") === "src19")
      val old = docs.filter(col("source") =!= "src19")
      if (old.isEmpty || inc.isEmpty)
        inc.select(col("doc_id").as("new_id"), col("doc_id").as("old_id"),
          lit(0.0).as("jaccard_est")).limit(0)
      else {
        val tmp = graft.BenchPhases.storeDir("graft-cdcsig")
        val store = tmp + "/corpus"
        val root = tmp + "/sig"
        graft.BenchPhases.build {
          val boot = old.filter(col("doc_id") % 3 =!= 1)
          val rest = old.filter(col("doc_id") % 3 === 1)
          // transient rows: synthetic ids far above the real id range,
          // appended in window 1 and physically forgotten in window 2
          val extras = old.filter(col("doc_id") % 7 === 0)
            .withColumn("doc_id", col("doc_id") + lit(10000000L))
          val r1 = VersionedStore.save(
            Map("docs" -> boot.select("doc_id", "text")), store)
          buildSignatureIndexSharded(
            VersionedStore.read(s, store, "docs", Some(r1)), root,
            nShards = 3)
          val r2 = VersionedStore.append(
            Map("docs" -> rest.select("doc_id", "text")
              .unionByName(extras.select("doc_id", "text"))), store)
          maintainSignatureIndexShardedFromStore(
            s, store, "docs", r1, r2, root)
          val r3 = VersionedStore.delete(
            extras.select("doc_id"), "docs", store)
          maintainSignatureIndexShardedFromStore(
            s, store, "docs", r2, r3, root)
        }
        val res = probeSignatureIndexSharded(s, inc, root)
          .orderBy("new_id").localCheckpoint(true)
        graft.BenchPhases.discard(s, tmp)
        res
      }
    },
    Some(incRejectOracleSql))

  /** Exact-substring span dedup at token-5-gram granularity (the
    * within-document twin of q29's whole-document dedup, after Lee et al.
    * 2022's "Deduplicating Training Data Makes Language Models Better"):
    * any token position covered by a 5-gram that occurs MORE THAN ONCE in
    * the corpus is removed, and each document's text is rebuilt from the
    * surviving tokens. Boilerplate spans (licence headers, templated
    * navigation) disappear from every copy — including the first — which is
    * exactly the exact-substring contract (document-level dedup keeps one
    * copy; span-level removes repeated SUBSTRINGS everywhere).
    *
    * Scale shape: the gram relation is one row per token (corpus-linear);
    * duplicated-gram detection is ONE hash shuffle on the gram; coverage
    * expansion is a bounded ×5 map-side explode of duplicate occurrences
    * only; the rebuild is one shuffle on doc_id. Real pipelines use a
    * suffix-array pass to find MAXIMAL repeats — the n-gram form
    * approximates it with fixed-width windows and composes from the same
    * relational pieces at any scale.
    */
  private val q96 = QueryDef(
    "q96_ngram_span_dedup",
    (s, d) => {
      val toks = Tables(s, d, "documents")
        .select(col("doc_id"), tokens(col("text")).as("tk"))
        .localCheckpoint(true) // feeds grams, positions, and the final join
      val tokp = toks.select(col("doc_id"), posexplode(col("tk")))
        .toDF("doc_id", "pos0", "tok")
        .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("tok"))
      val grams = explodeShinglesFromTokens(toks, col("tk"), 5, "gram", "pos")
        .select("doc_id", "pos", "gram")
      // duplicated grams are a corpus-frequency aggregate (NOT broadcast:
      // boilerplate-heavy corpora can have a large duplicate vocabulary)
      val dupg = grams.groupBy("gram").agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).select("gram")
      val covered = grams.join(dupg, "gram")
        .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + 4)).as("pos"))
        .distinct()
      val rebuilt = tokp.join(covered, Seq("doc_id", "pos"), "left_anti")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          collect_list(struct(col("pos"), col("tok"))).as("a"))
        .select(col("doc_id"), col("n_kept"),
          expr("array_join(transform(array_sort(a), x -> x.tok), ' ')").as("txt"))
      toks.select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"))
        .join(rebuilt, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
          coalesce(col("txt"), lit("")).as("cleaned_text"))
        .orderBy("doc_id")
    },
    Some(s"""WITH toks AS (SELECT doc_id, $tokSql AS tk FROM documents),
                  tokp AS (SELECT doc_id, CAST(generate_subscripts(tk, 1) AS INT) AS pos,
                                  unnest(tk) AS tok FROM toks),
                  grams AS (SELECT doc_id, CAST(i + 1 AS INT) AS pos,
                                   tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
                                     || ' ' || tk[i+4] || ' ' || tk[i+5] AS gram
                            FROM toks, unnest(CASE WHEN len(tk) >= 5
                                                   THEN range(len(tk) - 4)
                                                   ELSE []::BIGINT[] END) u(i)),
                  dupg AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) > 1),
                  covered AS (SELECT DISTINCT doc_id, CAST(pos + o AS INT) AS pos
                              FROM (SELECT g.doc_id, g.pos
                                    FROM grams g JOIN dupg USING (gram)) dup,
                                   unnest(range(5)) v(o)),
                  kept AS (SELECT t.doc_id, t.pos, t.tok
                           FROM tokp t ANTI JOIN covered c
                             ON t.doc_id = c.doc_id AND t.pos = c.pos),
                  rebuilt AS (SELECT doc_id, COUNT(*) AS n_kept,
                                     string_agg(tok, ' ' ORDER BY pos) AS txt
                              FROM kept GROUP BY doc_id)
             SELECT t.doc_id,
                    CAST(len(tk) AS BIGINT) AS n_tokens,
                    CAST(len(tk) - COALESCE(n_kept, 0) AS BIGINT) AS n_removed,
                    COALESCE(txt, '') AS cleaned_text
             FROM toks t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
             ORDER BY t.doc_id"""))

  /** LSH retrieval-quality evaluation: precision/recall of the banded
    * candidate pairs (q32's generator) against exact-Jaccard ground truth
    * (>= 0.5 over the SAME distinct bigram-shingle sets, df-capped like
    * q33). The q37/q62 recall-measurement discipline applied to the dedup
    * index: band/row counts are the recall dial, and this operator is how
    * a pipeline measures the dial's position before trusting the index at
    * scale. One summary row: candidate/truth/hit counts + precision/recall.
    *
    * Both sides run over a deterministic 30% SAMPLE (doc_id % 10 <= 2) —
    * exact pairwise truth is quadratic-shaped by nature (this corpus's
    * tiny shared vocabulary makes every bigram dense when blocking is
    * absent: measured 30.1 s at sf0.1 unsampled, 9.7 s at a 40% sample,
    * 5.5 s at 30%), and sampling is how production measures banding
    * quality anyway; the pair-level estimates are unbiased (a pair
    * survives the sample with p², uniformly across true and candidate
    * pairs). The truth df-cap stays at q33's 300: tightening it instead
    * was measured to DISTORT truth, not shrink it — at cap 100 the pruned
    * vocabulary shrinks per-doc sets until 1,021 sampled pairs clear 0.5
    * (vs 39 with the honest cap), i.e. the cap dial changes what "near
    * duplicate" means, while the sample dial only changes variance.
    */
  private val q99 = QueryDef(
    "q99_lsh_precision_recall",
    (s, d) => {
      val docs = Tables(s, d, "documents").filter(col("doc_id") % 10 <= 2)
      val sig = minhashSigs(docs).localCheckpoint(true)
      val cand = lshCandidatePairsFromSigs(sig)
      // Materialized (r14, second pass): under the self-join formulation
      // a checkpoint here was neutral (5.11 -> 5.14 s — exchange reuse
      // covered the identical join sides), but the inBucketPairs rewrite
      // changed the consumer set to hot + sizes + the bucket aggregate,
      // three branches whose exchanges never canonicalize equal — without
      // the checkpoint the shingle explosion runs three times. Same
      // corpus-relation trade as q33's pruned tokens.
      val sh = explodeShingles(docs.select("doc_id", "text"), col("text"), 2, "sh")
        .select("doc_id", "sh").distinct()
        .localCheckpoint(true)
      val hot = sh.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") > 300).select("sh")
      val tok = sh.join(broadcast(hot), Seq("sh"), "left_anti")
      val sizes = tok.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val inter = inBucketPairs(tok, Seq("sh"), "doc_id",
          maxBucket = Some(300))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("i"))
      val truth = inter
        .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
        .filter(col("i").cast("double") /
          (col("sa.sz") + col("sb.sz") - col("i")).cast("double") >= 0.5)
        .select("doc_a", "doc_b")
      // outer coalesce: sum over ZERO rows is NULL, and a dedup-clean
      // corpus (empty candidate AND truth sets) must report zeros like
      // the oracle's COUNT(*) subqueries, not a row of NULLs
      cand.withColumn("in_cand", lit(1L))
        .join(truth.withColumn("in_truth", lit(1L)),
          Seq("doc_a", "doc_b"), "full_outer")
        .agg(coalesce(sum(coalesce(col("in_cand"), lit(0L))), lit(0L))
            .as("n_candidates"),
          coalesce(sum(coalesce(col("in_truth"), lit(0L))), lit(0L))
            .as("n_truth"),
          coalesce(sum(when(col("in_cand").isNotNull && col("in_truth").isNotNull,
            1L).otherwise(0L)), lit(0L)).as("n_hit"))
        .select(col("n_candidates"), col("n_truth"), col("n_hit"),
          (col("n_hit").cast("double") /
            greatest(col("n_candidates"), lit(1L)).cast("double")).as("prec"),
          (col("n_hit").cast("double") /
            greatest(col("n_truth"), lit(1L)).cast("double")).as("recall"))
    },
    Some(s"""WITH ${lshPairsCteSqlFrom(
               "(SELECT * FROM documents WHERE doc_id % 10 <= 2)")},
                  hot2 AS (SELECT t FROM tok GROUP BY t HAVING COUNT(*) > 300),
                  tok2 AS (SELECT tok.doc_id, tok.t FROM tok ANTI JOIN hot2 ON tok.t = hot2.t),
                  sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok2 GROUP BY doc_id),
                  inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
                            FROM tok2 a JOIN tok2 b
                              ON a.t = b.t AND a.doc_id < b.doc_id
                            GROUP BY a.doc_id, b.doc_id),
                  truth AS (SELECT doc_a, doc_b
                            FROM inter
                            JOIN sizes sa ON doc_a = sa.doc_id
                            JOIN sizes sb ON doc_b = sb.doc_id
                            WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.5),
                  m AS (SELECT
                          (SELECT COUNT(*) FROM pairs) AS n_candidates,
                          (SELECT COUNT(*) FROM truth) AS n_truth,
                          (SELECT COUNT(*) FROM pairs JOIN truth
                             ON pairs.doc_a = truth.doc_a AND pairs.doc_b = truth.doc_b) AS n_hit)
             SELECT n_candidates, n_truth, n_hit,
                    CAST(n_hit AS DOUBLE) / CAST(GREATEST(n_candidates, 1) AS DOUBLE) AS prec,
                    CAST(n_hit AS DOUBLE) / CAST(GREATEST(n_truth, 1) AS DOUBLE) AS recall
             FROM m"""))

  /** Cross-source redundancy matrix: for EVERY pair of sources (zero-
    * overlap pairs included, as explicit shared=0 rows — a reader must be
    * able to distinguish "no overlap" from "source absent"), how many
    * distinct 8-gram shingles they share, and the Jaccard of their shingle
    * sets. This is the measurement a mixing decision (q78) reads — two
    * mirrors of the same crawl should be collapsed before weights are
    * assigned, and a source whose content is mostly contained in another
    * contributes less novelty than its row count suggests.
    *
    * Scale shape: the distinct (source, gram) projection is one shuffle of
    * the gram rows; the pairwise overlap is an equality join on the gram —
    * per-gram fan-out is bounded by (#sources containing it)², which is
    * #sources-bounded, NOT corpus-bounded (20 sources → ≤190 pairs per
    * gram). At web scale (millions of domains) the same query runs over
    * source GROUPS (registrable domain, crawl snapshot), keeping the pair
    * space small; a df-cap on the gram (à la q33) bounds the worst case.
    */
  /** Oracle twin of overlapMatrix: CTE chain ending in
    * `jac`(source_a, source_b, grams_a, grams_b, shared, jaccard).
    */
  private val overlapCtes: String =
    s"""toks AS (SELECT source, $tokSql AS tk FROM documents),
        sg AS (SELECT DISTINCT source, gram FROM (
                 SELECT source, unnest(
                   CASE WHEN len(tk) >= 8
                        THEN list_transform(range(len(tk) - 7),
                               i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4]
                                 || ' ' || tk[i+5] || ' ' || tk[i+6] || ' ' || tk[i+7] || ' ' || tk[i+8])
                        ELSE []::VARCHAR[] END) AS gram
                 FROM toks)),
        counts AS (SELECT d.source, COALESCE(g, 0) AS n_grams
                   FROM (SELECT DISTINCT source FROM documents) d
                   LEFT JOIN (SELECT source, COUNT(*) AS g
                              FROM sg GROUP BY source) c
                     ON d.source = c.source),
        shared AS (SELECT a.source AS source_a, b.source AS source_b,
                          COUNT(*) AS shared
                   FROM sg a JOIN sg b
                     ON a.gram = b.gram AND a.source < b.source
                   GROUP BY a.source, b.source),
        jac AS (SELECT ca.source AS source_a, cb.source AS source_b,
                       ca.n_grams AS grams_a, cb.n_grams AS grams_b,
                       COALESCE(shared, 0) AS shared,
                       CAST(COALESCE(shared, 0) AS DOUBLE)
                         / CAST(GREATEST(ca.n_grams + cb.n_grams - COALESCE(shared, 0), 1) AS DOUBLE) AS jaccard
                FROM counts ca
                JOIN counts cb ON ca.source < cb.source
                LEFT JOIN shared s ON ca.source = s.source_a
                                  AND cb.source = s.source_b)"""

  /** The full pairwise source matrix (source_a, source_b, grams_a,
    * grams_b, shared, jaccard) behind q103 and the q110 mixing report —
    * rooted in the SOURCE dimension, not the shingle stream, so a source
    * whose docs are all shorter than the shingle width still gets its
    * rows (0 grams), keeping the "every pair" contract honest. The
    * counts×counts matrix is a source-count-sized broadcast nested loop
    * (hinted, so Catalyst can never fall back to CartesianProduct on a
    * bad static estimate); GREATEST floors the union size for two
    * all-short sources (0/0).
    */
  private def overlapMatrix(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // checkpointed: sg feeds the per-source gram counts AND the shared-
    // gram pair aggregate, whose exchanges never canonicalize equal —
    // without this the 8-gram explosion + distinct ran twice (the q99
    // post-kernel lesson)
    val sg = explodeShingles(docs.select("source", "text"),
        col("text"), 8, "gram")
      .select("source", "gram").distinct()
      .localCheckpoint(true)
    val counts = docs.select("source").distinct()
      .join(sg.groupBy("source").agg(count(lit(1)).as("g")), Seq("source"), "left")
      .select(col("source"), coalesce(col("g"), lit(0L)).as("n_grams"))
    // in-bucket pair kernel over the gram buckets: bucket size is
    // naturally bounded by the source count (sg is distinct per
    // (source, gram)), so the collect_list buffer is #sources long
    val shared = inBucketPairs(sg, Seq("gram"), "source")
      .select(col("doc_a").as("source_a"), col("doc_b").as("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("shared"))
    val sh = coalesce(col("shared"), lit(0L))
    counts.as("ca").join(broadcast(counts.as("cb")),
        col("ca.source") < col("cb.source"))
      .join(shared, col("ca.source") === col("source_a")
        && col("cb.source") === col("source_b"), "left")
      .select(col("ca.source").as("source_a"), col("cb.source").as("source_b"),
        col("ca.n_grams").as("grams_a"), col("cb.n_grams").as("grams_b"),
        sh.as("shared"),
        (sh.cast("double") /
          greatest(col("ca.n_grams") + col("cb.n_grams") - sh, lit(1L))
            .cast("double"))
          .as("jaccard"))
  }

  private val q103 = QueryDef(
    "q103_source_overlap",
    (s, d) => overlapMatrix(Tables(s, d, "documents"))
      .orderBy("source_a", "source_b"),
    Some(s"""WITH $overlapCtes
             SELECT * FROM jac ORDER BY source_a, source_b"""))

  /** The mixing decision report: per source, its size (docs/tokens), its
    * exact mean quality (integer-scaled floor(q·10⁶) sums — the q109
    * determinism move, so the mean is order-independent), its worst
    * redundancy against any other source (max pairwise 8-gram Jaccard
    * from the q103 matrix), and a composite mix score = mean_quality ×
    * (1 − max_overlap). This is the table a curation run reads to set
    * q78's weights: big + clean + novel scores high; a mirror of another
    * crawl scores near zero regardless of its size.
    *
    * Scale shape: one corpus pass for the per-source aggregate; the
    * overlap side is exactly q103's plan; the final join is over the
    * source dimension (tiny).
    */
  private val q110 = QueryDef(
    "q110_mixing_report",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      val per = docs.select(col("source"),
          graft.functions.TextFunctions.tokenCount(col("text"))
            .cast("long").as("nt"),
          floor(graft.functions.TextFunctions.qualityScore(col("text"))
            * lit(1e6)).cast("long").as("q6"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"),
          sum("q6").as("sq"))
      val jac = overlapMatrix(docs)
      val both = jac.select(col("source_a").as("source"), col("jaccard"))
        .unionAll(jac.select(col("source_b").as("source"), col("jaccard")))
      val mx = both.groupBy("source").agg(max("jaccard").as("max_overlap"))
      per.join(mx, Seq("source"), "left")
        .select(col("source"), col("n_docs"), col("n_tokens"),
          (col("sq").cast("double") /
            (col("n_docs").cast("double") * lit(1e6))).as("mean_quality"),
          coalesce(col("max_overlap"), lit(0.0)).as("max_overlap"))
        .withColumn("mix_score",
          col("mean_quality") * (lit(1.0) - col("max_overlap")))
        .orderBy("source")
    },
    Some(s"""WITH $overlapCtes,
                  sides AS (SELECT source_a AS source, jaccard FROM jac
                            UNION ALL
                            SELECT source_b AS source, jaccard FROM jac),
                  mx AS (SELECT source, MAX(jaccard) AS max_overlap
                         FROM sides GROUP BY source),
                  per AS (SELECT source, COUNT(*) AS n_docs,
                                 CAST(SUM(len($tokSql)) AS BIGINT) AS n_tokens,
                                 CAST(SUM(CAST(floor((${TextQueries.qualitySql}) * 1e6) AS BIGINT)) AS BIGINT) AS sq
                          FROM documents GROUP BY source)
             SELECT per.source, n_docs, n_tokens,
                    CAST(sq AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 1e6) AS mean_quality,
                    COALESCE(max_overlap, 0.0) AS max_overlap,
                    CAST(sq AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 1e6)
                      * (1.0 - COALESCE(max_overlap, 0.0)) AS mix_score
             FROM per LEFT JOIN mx ON per.source = mx.source
             ORDER BY per.source"""))

  /** Integer-exact PageRank over an undirected pair graph — the
    * centrality signal behind PR-canonical survivor selection (q141).
    * All arithmetic is LONG integer: ranks live at a 1e9 fixed-point
    * scale, each node's outgoing share is `r div deg`, and the damped
    * update is `teleport + (85 · Σ shares) div 100` — floor division
    * and exact long sums everywhere, so the ranks are bit-identical on
    * any engine and any partitioning (a float PageRank's sums would
    * drift with reduction order, the q137 covariance argument applied
    * to graph iteration). Dangling mass: none by construction (every
    * node of an undirected edge list has degree ≥ 1).
    *
    * Scale shape: per iteration one keyed join (ranks→degrees), one
    * edge-keyed join and one keyed sum — all linear in |E|, O(iters)
    * rounds, state checkpointed per round exactly like the CC loop.
    * Fixed iteration count (default 10) rather than convergence: the
    * oracle unrolls the SAME depth (the q137 rationale).
    */
  /** One damped-update iteration over pre-placed loop relations.
    * `edgesD` is (u, v, d) — the edge list with the SOURCE node's degree
    * already attached: that join is loop-invariant (degrees never change),
    * so it is hoisted out of the loop and paid once, where the previous
    * shape re-joined ranks→degrees and then edges→shares EVERY iteration.
    * Here the iteration is: one colocated join (edgesD ⋈ r, both sides
    * enter hash-placed on u/doc_id), the inherent inflow re-key (the
    * groupBy(v) exchange — the one shuffle PageRank fundamentally needs
    * per iteration), and the rank re-attach on nodes' own placement.
    * shuffle_hash hints throughout: the colocated default would be
    * sort-merge, which re-sorts |E| rows per iteration — a per-partition
    * hash build of the smaller side does the same placement-free join
    * with no sort. CcLoopPlanSpec pins the shape.
    */
  private[graft] def prIterShape(r: org.apache.spark.sql.DataFrame,
      edgesD: org.apache.spark.sql.DataFrame,
      nodes: org.apache.spark.sql.DataFrame,
      teleport: Long): org.apache.spark.sql.DataFrame = {
    val inflow = edgesD.join(r.hint("shuffle_hash"),
        col("u") === col("doc_id"))
      .select(col("v"), expr("r div d").as("s"))
      .groupBy("v").agg(sum("s").as("inflow"))
    nodes.join(inflow.hint("shuffle_hash"),
        nodes("doc_id") === col("v"), "left")
      .select(nodes("doc_id"),
        (lit(teleport) + expr("(85 * coalesce(inflow, 0L)) div 100"))
          .as("r"))
  }

  def pagerank(pairs: org.apache.spark.sql.DataFrame,
      iters: Int = 10): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.GraftCheckpointBridge
    val scale = 1000000000L
    // Round 14: every loop-invariant relation is checkpointed PRE-PLACED
    // on its join key (edges/deg on u, nodes on doc_id) through
    // GraftCheckpointBridge, and the rank state's own partitioning
    // survives its periodic checkpoints — so each iteration plans with
    // exactly ONE exchange, the inherent inflow re-key from u to v
    // (plan-asserted in CcLoopPlanSpec). Before, the checkpoints lost
    // their partitioning under AQE and every iteration re-shuffled
    // edges (the largest loop relation), ranks and nodes — 3 avoidable
    // exchanges of |E|/|V| rows per round, 10 rounds deep. The
    // repartitions carry no explicit count, so AQE sizes the state's
    // partitioning to the data (guide §2: scale-adaptive, not a
    // constant); a rare count mismatch between separately checkpointed
    // relations re-shuffles only the coalesced (small) side.
    // materialize the pair generation ONCE before the two union arms
    // reference it (the CC loop's discipline): without this the
    // candidate-pair join's reduce side runs twice
    val p = pairs.localCheckpoint(true)
    val edges = GraftCheckpointBridge.localCheckpointKeyed(
      p.select(col("doc_a").as("u"), col("doc_b").as("v"))
        .union(p.select(col("doc_b").as("u"), col("doc_a").as("v")))
        .repartition(col("u")))
    // projection keeps hashpartitioning(u->doc_id) (alias-aware), and the
    // dedup then runs exchange-free on the pre-placed rows
    val nodes = GraftCheckpointBridge.localCheckpointKeyed(
      edges.select(col("u").as("doc_id")).dropDuplicates("doc_id"))
    val n = nodes.count()
    if (n == 0)
      return nodes.withColumn("r", lit(0L)) // empty graph, empty ranks
    // degrees attached to the edge list ONCE — the deg aggregate and the
    // edges⋈deg join are loop-invariant, and hoisting them replaces two
    // of every iteration's three joins with one (see prIterShape); both
    // the aggregate and the attach run exchange-free on edges' placement
    val edgesD = GraftCheckpointBridge.localCheckpointKeyed(
      edges.join(
        edges.groupBy("u").agg(count(lit(1)).as("d")).hint("shuffle_hash"),
        "u"))
    val teleport = (15L * scale) / (100L * n)
    var r = GraftCheckpointBridge.localCheckpointKeyed(
      nodes.withColumn("r", lit(scale / n)))
    (1 to iters).foreach { i =>
      r = prIterShape(r, edgesD, nodes, teleport)
      // unlike the CC loop (state referenced 4x per round — exponential
      // lineage without truncation) the rank state feeds the next round
      // ONCE, so lineage grows linearly and a checkpoint every round is
      // over-conservative. Every 3rd round keeps the analyzed plan
      // shallow at a third of the checkpoint jobs — wall-clock neutral
      // at sf0.1 (local checkpoints are cheap RAM writes) but at cluster
      // scale each reliable checkpoint is a distributed-FS write of the
      // full rank state, and two thirds of that IO is what this saves
      if (i % 3 == 0 || i == iters)
        r = GraftCheckpointBridge.localCheckpointKeyed(r)
    }
    r
  }

  /** q141: PR-canonical survivor selection — for every near-dup cluster
    * the member with the highest PageRank over the CAPPED candidate-pair
    * graph (the q32 bucket-cap bounds the quadratic; clusters whose
    * every pair fell to the cap simply contribute no scored member).
    * Min-id survivor election (q75) is arbitrary; the PR-canonical
    * member is the copy most connected within its duplicate
    * neighborhood — the version the most other copies resemble, which
    * is the principled pick when copies differ by truncation or
    * boilerplate. Signatures are materialized ONCE for both the pair
    * graph and the cluster labels.
    */
  private val q141 = QueryDef(
    "q141_pagerank_canonical",
    (s, d) => {
      val sig = minhashSigs(Tables(s, d, "documents")).localCheckpoint(true)
      val pr = pagerank(lshCandidatePairsFromSigs(sig))
      val labels = connectedComponents(lshBucketStarsFromSigs(sig))
      labels.join(pr, "doc_id")
        .groupBy("cluster_id")
        .agg(max(struct(col("r").as("r"), negate(col("doc_id")).as("nid")))
          .as("best"), count(lit(1)).as("n_scored"))
        .select(col("cluster_id"), negate(col("best.nid")).as("canonical_id"),
          col("best.r").as("pr_scaled"), col("n_scored"))
        .orderBy("cluster_id")
    },
    Some {
      val iterCtes = (0 until 10).map { k =>
        s"""sh$k AS MATERIALIZED (SELECT u, r // d AS s
              FROM r$k JOIN deg ON r$k.doc_id = deg.u),
            r${k + 1} AS MATERIALIZED (SELECT nodes.doc_id,
                tele + (85 * COALESCE(SUM(s), 0)) // 100 AS r
              FROM nodes CROSS JOIN tl
              LEFT JOIN (SELECT v, s FROM pedges JOIN sh$k
                         ON pedges.u = sh$k.u) inf
                ON nodes.doc_id = inf.v
              GROUP BY nodes.doc_id, tele)"""
      }.mkString(",\n")
      s"""WITH RECURSIVE $ccCteSql,
              pedges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
                         UNION ALL SELECT doc_b, doc_a FROM pairs),
              nodes AS (SELECT DISTINCT u AS doc_id FROM pedges),
              nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
              deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d
                      FROM pedges GROUP BY u),
              tl AS (SELECT (15 * CAST(1000000000 AS BIGINT)) // (100 * n)
                       AS tele FROM nn),
              r0 AS MATERIALIZED (SELECT doc_id, 1000000000 // n AS r
                                  FROM nodes CROSS JOIN nn),
              $iterCtes,
              pr AS (SELECT doc_id, CAST(r AS BIGINT) AS r FROM r10),
              scored AS (SELECT cc.doc_id, cc.cluster_id, pr.r
                         FROM cc JOIN pr ON cc.doc_id = pr.doc_id)
         SELECT cluster_id, doc_id AS canonical_id, r AS pr_scaled, n_scored
         FROM (SELECT cluster_id, doc_id, r,
                 ROW_NUMBER() OVER (PARTITION BY cluster_id
                   ORDER BY r DESC, doc_id ASC) AS rn,
                 COUNT(*) OVER (PARTITION BY cluster_id) AS n_scored
               FROM scored) t
         WHERE rn = 1 ORDER BY cluster_id"""
    })

  /** Incremental CLUSTER maintenance — the missing third of the
    * production ingest path (q82 rejects/admits an increment,
    * [[appendSignatureIndex]] grows the index; this keeps the q74
    * CLUSTER LABELS current without re-running CC on the old corpus).
    *
    * Why increment-sized work suffices: bucket membership is
    * deterministic on content, so the increment only changes buckets it
    * touches — and within any ONE bucket the old members were already a
    * clique in the old graph, hence share ONE old cluster label. The
    * merge graph therefore needs only (per touched bucket) the new
    * member ids plus each old member's cluster REPRESENTATIVE
    * (label; a previously-unpaired old doc is its own representative) —
    * components over those nodes merge exactly like the full graph
    * would, including the new-doc-bridges-two-old-clusters case, and
    * the component minimum equals the full recompute's label because an
    * old representative IS its cluster's minimum. q139's oracle is the
    * FULL-corpus transitive closure — the equivalence is checked, not
    * assumed.
    *
    * Scale shape: new-side signatures from the increment's text; the
    * old side is touched ONLY via an equality join of its (persisted-
    * index-derived) band rows against the increment's touched-bucket
    * set — never an old×old pass; the component loop runs on a graph
    * bounded by the increment's bucket membership; the final relabel
    * joins the (touched-cluster-sized) representative map back onto
    * the label relation. At 100 TB the daily increment's cluster merge
    * costs the increment, not the corpus.
    */
  def incrementalClusters(oldSig: org.apache.spark.sql.DataFrame,
      oldLabels: org.apache.spark.sql.DataFrame,
      newDocs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val newSig = minhashSigs(newDocs).localCheckpoint(true)
    val newBands = bandsFromSigs(newSig).localCheckpoint(true)
    val touched = newBands.select("band", "key").distinct()
    // old band rows in touched buckets, collapsed to cluster representatives
    val oldTouched = bandsFromSigs(oldSig)
      .join(touched, Seq("band", "key"))
      .join(oldLabels, Seq("doc_id"), "left")
      .select(col("band"), col("key"),
        coalesce(col("cluster_id"), col("doc_id")).as("node"))
    val nodes = oldTouched.unionByName(
      newBands.select(col("band"), col("key"), col("doc_id").as("node")))
    val mins = nodes.groupBy("band", "key").agg(min("node").as("a"))
    val edges = nodes.join(mins, Seq("band", "key"))
      .filter(col("node") =!= col("a"))
      .select(col("a").as("doc_a"), col("node").as("doc_b"))
      .distinct()
    // components over the increment-sized merge graph; rm maps every
    // participating node (new doc, old representative, old singleton)
    // to its post-merge label
    val rm = connectedComponents(edges)
      .select(col("doc_id").as("node"), col("cluster_id").as("new_label"))
      .localCheckpoint(true)
    // old docs: relabel through their representative (untouched clusters
    // miss the join and keep their label)
    val oldUpd = oldLabels.join(rm, oldLabels("cluster_id") === rm("node"),
        "left")
      .select(oldLabels("doc_id"),
        coalesce(col("new_label"), oldLabels("cluster_id")).as("cluster_id"))
    // previously-unpaired old docs pulled into a cluster by the increment
    val oldSingles = bandsFromSigs(oldSig)
      .join(touched, Seq("band", "key"))
      .join(oldLabels, Seq("doc_id"), "left_anti")
      .select("doc_id").distinct()
      .join(rm, col("doc_id") === rm("node"))
      .select(col("doc_id"), col("new_label").as("cluster_id"))
    // new docs that landed in a shared bucket (unpaired new docs stay
    // unlabeled — the q74 convention)
    val newLab = rm.join(newSig.select(col("doc_id")),
        rm("node") === col("doc_id"))
      .select(col("doc_id"), col("new_label").as("cluster_id"))
    oldUpd.unionByName(oldSingles).unionByName(newLab)
  }

  /** q139: one source partition stands in for "today's crawl" — the old
    * corpus's labels are bootstrapped once (in production they are the
    * PERSISTED label map), the increment is merged incrementally, and
    * the oracle is the FULL-corpus transitive closure: the incremental
    * path must reproduce the from-scratch clustering exactly.
    */
  private val q139 = QueryDef(
    "q139_incremental_clusters",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      val inc = docs.filter(col("source") === "src19")
      val oldSig = minhashSigs(docs.filter(col("source") =!= "src19"))
        .localCheckpoint(true)
      val oldLabels = connectedComponents(lshBucketStarsFromSigs(oldSig))
      incrementalClusters(oldSig, oldLabels, inc).orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE $ccCteSql
             SELECT doc_id, cluster_id FROM cc ORDER BY doc_id"""))

  /** Right-to-be-forgotten cascade over the deduped corpus: given a
    * deletion set (a withdrawn data provider, a DSAR list), produce the
    * post-deletion survivor corpus WITHOUT recomputing the dedup
    * pipeline. The subtlety a naive "filter the survivors" misses: when
    * a duplicate cluster's SURVIVOR is deleted, its remaining members
    * must not vanish with it — the cluster re-elects the minimum
    * remaining member (flagged `promoted`), and each survivor's
    * absorbed-copy count is recomputed over the remaining membership.
    * Every row of the forgotten set disappears; every retained document
    * survives exactly once.
    *
    * `labels` is the SAME (doc_id, cluster_id) relation q74/q75 consume
    * — materialized once in production (DedupClusterSpec's discipline);
    * deletion is one pass over the EXISTING label map, never a re-run of
    * LSH/CC. Scale shape: the label map is duplicate-population-sized;
    * re-election is one keyed aggregate on cluster_id; the corpus is
    * touched by the BROADCAST deletion-set anti join plus keyed joins
    * against the demoted/rep relations — those are duplicate-population-
    * sized (potentially a large corpus fraction), so they deliberately
    * stay keyed shuffles rather than broadcasts; nothing beyond the
    * joins q75 already pays.
    */
  def deletionCascade(docs: org.apache.spark.sql.DataFrame,
      del: org.apache.spark.sql.DataFrame,
      labels: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val rl = labels.join(del, Seq("doc_id"), "left_anti").localCheckpoint(true)
    val nr = rl.groupBy("cluster_id")
      .agg(min("doc_id").as("rep"), count(lit(1)).as("n"))
    val demoted = rl.join(nr, "cluster_id")
      .filter(col("doc_id") =!= col("rep")).select("doc_id")
    docs.join(del, Seq("doc_id"), "left_anti")
      .join(demoted, Seq("doc_id"), "left_anti")
      .join(nr.select(col("rep").as("doc_id"), col("cluster_id"), col("n")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        (coalesce(col("n"), lit(1L)) - 1L).cast("long").as("n_dupes_removed"),
        coalesce(col("doc_id") =!= col("cluster_id"), lit(false))
          .as("promoted"))
  }

  /** q138: the cascade under a realistic deletion set — one data
    * provider (source src2) withdraws consent. Composes the q74 label
    * map with [[deletionCascade]]; the oracle replays the same
    * re-election over the recursive-CTE closure.
    */
  private val q138 = QueryDef(
    "q138_deletion_cascade",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      val del = docs.filter(col("source") === "src2").select("doc_id")
      deletionCascade(docs, del,
          connectedComponents(lshBucketStars(docs)))
        .orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE $ccCteSql,
                  del AS (SELECT doc_id FROM documents WHERE source = 'src2'),
                  rl AS (SELECT cc.doc_id, cc.cluster_id FROM cc
                         ANTI JOIN del ON cc.doc_id = del.doc_id),
                  nr AS (SELECT cluster_id, MIN(doc_id) AS rep, COUNT(*) AS n
                         FROM rl GROUP BY cluster_id),
                  demoted AS (SELECT rl.doc_id FROM rl
                              JOIN nr ON rl.cluster_id = nr.cluster_id
                              WHERE rl.doc_id <> nr.rep)
             SELECT d.doc_id, d.source,
                    CAST(COALESCE(nr.n, 1) - 1 AS BIGINT) AS n_dupes_removed,
                    COALESCE(d.doc_id <> nr.cluster_id, FALSE) AS promoted
             FROM documents d
             ANTI JOIN del ON d.doc_id = del.doc_id
             ANTI JOIN demoted ON d.doc_id = demoted.doc_id
             LEFT JOIN nr ON d.doc_id = nr.rep
             ORDER BY d.doc_id"""))

  /** Quality-aware survivor election (the FineWeb/Dolma refinement of q75):
    * within each near-dup cluster keep the HIGHEST-QUALITY copy, not the
    * lowest doc_id — near-dup groups routinely mix a clean original with
    * boilerplate-wrapped mirrors, and min-id election keeps whichever was
    * crawled first. One row per duplicate cluster: the elected survivor,
    * its quality, the min-id survivor's quality (what q75 would have kept),
    * and the member count — so the report doubles as the measured value of
    * quality election (q_elected − q_minid ≥ 0 by construction).
    *
    * Scale shape: the label map is dup-population-sized (far smaller than
    * the corpus) and joins the corpus once, keyed on doc_id; the quality
    * score is map-side codegen. Election is GroupTopK(k=1) — exact
    * two-stage, so a boilerplate mega-cluster (the hot-bucket scenario the
    * cluster path deliberately does NOT cap) never funnels one task the
    * way a plain cluster-keyed row_number would. The min-id survivor needs
    * no second election: cluster_id IS the component minimum.
    */
  private val q145 = QueryDef(
    "q145_quality_survivor_election",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      val labels = connectedComponents(lshBucketStars(docs))
      val members = labels
        .join(docs.select(col("doc_id"), qualityScore(col("text")).as("quality")),
          Seq("doc_id"))
      val elected = graft.operators.GroupTopK
        .topK(members, Seq(col("cluster_id")),
          Seq(col("quality").desc, col("doc_id").asc), tie = col("doc_id"), k = 1)
        .select(col("cluster_id"), col("doc_id").as("survivor_doc_id"),
          col("quality").as("q_elected"))
      val minid = members.filter(col("doc_id") === col("cluster_id"))
        .select(col("cluster_id"), col("quality").as("q_minid"))
      val sizes = members.groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
      elected.join(minid, "cluster_id").join(sizes, "cluster_id")
        .select("cluster_id", "survivor_doc_id", "n_members", "q_elected", "q_minid")
        .orderBy("cluster_id")
    },
    Some(s"""WITH RECURSIVE $ccCteSql,
                  members AS (
                    SELECT cc.doc_id, cc.cluster_id,
                           ${PipelineQueries.qualitySql} AS quality
                    FROM cc JOIN documents ON cc.doc_id = documents.doc_id),
                  elected AS (
                    SELECT cluster_id, doc_id AS survivor_doc_id,
                           quality AS q_elected,
                           ROW_NUMBER() OVER (PARTITION BY cluster_id
                             ORDER BY quality DESC, doc_id ASC) AS rn
                    FROM members),
                  minid AS (SELECT cluster_id, quality AS q_minid FROM members
                            WHERE doc_id = cluster_id),
                  sz AS (SELECT cluster_id, COUNT(*) AS n_members
                         FROM members GROUP BY cluster_id)
             SELECT e.cluster_id, e.survivor_doc_id, sz.n_members,
                    e.q_elected, m.q_minid
             FROM elected e
             JOIN minid m ON e.cluster_id = m.cluster_id
             JOIN sz ON e.cluster_id = sz.cluster_id
             WHERE e.rn = 1
             ORDER BY e.cluster_id"""))

  /** Dedup operating curve — the tuning artifact for picking a similarity
    * cutoff: from ONE signature-scored candidate-pair pass (q72's
    * machinery, threshold-free), the pair count and affected-document
    * count at each candidate threshold {0.5..0.9}. An operator reads this
    * before committing a 100 TB dedup run: it is the difference between
    * "0.8 removes 2% of the corpus" and finding that out after the run.
    *
    * Scale shape: scoring is the capped q72 band join (pair-population-
    * sized, never all-pairs); the sweep explodes each scored pair into at
    * most |thresholds| rows (5× the pair population, NOT the corpus) and
    * aggregates to a 5-row report; the distinct-doc count shuffles
    * (threshold, doc) pairs, again pair-population-bounded. Thresholds
    * with zero survivors still report (left join from the threshold axis).
    */
  private val q146 = QueryDef(
    "q146_dedup_threshold_curve",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      val sig = minhashSigs(docs).localCheckpoint(true)
      val pairs = lshCandidatePairsFromSigs(sig)
      val scored = pairs
        .join(sig.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sig.as("sb"), col("doc_b") === col("sb.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          jaccardEstimate("sa", "sb").as("est"))
      val ts = Seq(0.5, 0.6, 0.7, 0.8, 0.9)
      val swept = scored
        .select(col("doc_a"), col("doc_b"), col("est"),
          explode(array(ts.map(lit): _*)).as("threshold"))
        .filter(col("est") >= col("threshold"))
        // ≤ |thresholds| × pair-population rows, feeds THREE consumers
        // (the pair count and both arms of the affected-doc union) —
        // without materialization each re-runs the scoring join
        .localCheckpoint(true)
      val np = swept.groupBy("threshold").agg(count(lit(1)).as("n_pairs"))
      val nd = swept.select(col("threshold"), col("doc_a").as("doc"))
        .union(swept.select(col("threshold"), col("doc_b").as("doc")))
        .distinct()
        .groupBy("threshold").agg(count(lit(1)).as("n_docs_affected"))
      val axis = docs.sparkSession.range(1)
        .select(explode(array(ts.map(lit): _*)).as("threshold"))
      axis.join(np, Seq("threshold"), "left").join(nd, Seq("threshold"), "left")
        .select(col("threshold"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("n_docs_affected"), lit(0L)).as("n_docs_affected"))
        .orderBy("threshold")
    },
    Some(s"""WITH $lshPairsCteSql,
                  est AS (SELECT doc_a, doc_b,
                            ${jaccardEstSql("sa", "sb")} AS est
                          FROM pairs
                          JOIN sig sa ON doc_a = sa.doc_id
                          JOIN sig sb ON doc_b = sb.doc_id),
                  th(threshold) AS (VALUES (0.5), (0.6), (0.7), (0.8), (0.9)),
                  pe AS (SELECT th.threshold, est.doc_a, est.doc_b
                         FROM est JOIN th ON est.est >= th.threshold),
                  np AS (SELECT threshold, COUNT(*) AS n_pairs
                         FROM pe GROUP BY threshold),
                  nd AS (SELECT threshold, COUNT(*) AS n_docs_affected FROM (
                           SELECT DISTINCT threshold, doc FROM (
                             SELECT threshold, doc_a AS doc FROM pe
                             UNION ALL
                             SELECT threshold, doc_b AS doc FROM pe))
                         GROUP BY threshold)
             SELECT th.threshold,
                    CAST(COALESCE(np.n_pairs, 0) AS BIGINT) AS n_pairs,
                    CAST(COALESCE(nd.n_docs_affected, 0) AS BIGINT) AS n_docs_affected
             FROM th
             LEFT JOIN np ON th.threshold = np.threshold
             LEFT JOIN nd ON th.threshold = nd.threshold
             ORDER BY th.threshold"""))

  /** Maximal duplicated-gram coverage spans — the boilerplate MINER that
    * completes q96's exact-substring story (Lee et al. 2022 find repeats
    * with a suffix array; this is the relational form at token-5-gram
    * resolution). q96 REMOVES covered positions; this query REPORTS the
    * covered spans: which stretches of text (licence headers, templated
    * navigation, signature blocks) consist of corpus-duplicated 5-grams,
    * how long they are, and how many documents carry them — the report a
    * curation team reads before deciding what q96 should strip.
    *
    * Semantics, precisely: a span is a maximal run of consecutive
    * duplicated-gram START positions — EXACTLY the text q96 would remove
    * from that document. When two DISTINCT repeats overlap in one
    * document (doc shares t1..t7 with A and t4..t10 with B), their runs
    * chain into one longer covered span whose full text may occur only
    * once — such rows surface with n_occ=1 and mark overlap-chained
    * boilerplate, while verbatim-repeated spans carry n_occ >= 2. The
    * top-20 orders by n_occ, so pure chains sort below true repeats.
    *
    * Shape: gaps-and-islands (`pos - row_number()` over a PER-DOCUMENT
    * window — bounded by the longest document, never corpus-wide); span
    * text is rebuilt by slicing the document's own token array (one keyed
    * join back to the corpus-linear toks relation), and the report is a
    * hash aggregate on the span text. At 100 TB: every stage is
    * corpus-linear; for verbatim-repeated spans the groupBy's map-side
    * partial aggregation collapses the copies before they shuffle (chained
    * n_occ=1 spans shuffle once each, like any distinct string); the
    * top-20 is TakeOrdered (no global sort). Ties at the cut are broken
    * by span_text, so the report is deterministic.
    */
  def repeatedSpans(documents: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val toks = documents
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .localCheckpoint(true) // feeds grams and the slice-back join
    val grams = explodeShinglesFromTokens(toks, col("tk"), 5, "gram", "pos")
      .select("doc_id", "pos", "gram")
    // corpus-frequency aggregate, NOT broadcast (q96's reasoning: the
    // duplicate vocabulary of a boilerplate-heavy corpus is large)
    val dupg = grams.groupBy("gram").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select("gram")
    val starts = grams.join(dupg, "gram").select("doc_id", "pos")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = starts
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("st"), (max(col("pos")) + 4).as("fin"))
    val stext = spans.join(toks, "doc_id")
      .select(col("doc_id"),
        expr("array_join(slice(tk, st, fin - st + 1), ' ')").as("span_text"),
        (col("fin") - col("st") + 1).cast("long").as("span_len"))
    stext.groupBy("span_text")
      .agg(max(col("span_len")).as("span_len"),
        count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"))
  }

  private val q182 = QueryDef(
    "q182_repeated_spans",
    (s, d) => repeatedSpans(Tables(s, d, "documents"))
      .orderBy(col("n_occ").desc, col("span_text"))
      .limit(20),
    Some(s"""WITH toks AS (SELECT doc_id, $tokSql AS tk FROM documents),
                  grams AS (SELECT doc_id, CAST(i + 1 AS INT) AS pos,
                                   tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
                                     || ' ' || tk[i+4] || ' ' || tk[i+5] AS gram
                            FROM toks, unnest(CASE WHEN len(tk) >= 5
                                                   THEN range(len(tk) - 4)
                                                   ELSE []::BIGINT[] END) u(i)),
                  dupg AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) > 1),
                  starts AS (SELECT g.doc_id, g.pos FROM grams g JOIN dupg USING (gram)),
                  isl AS (SELECT doc_id, pos,
                                 pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
                          FROM starts),
                  spans AS (SELECT doc_id, MIN(pos) AS st, MAX(pos) + 4 AS fin
                            FROM isl GROUP BY doc_id, grp),
                  stext AS (SELECT s.doc_id,
                                   array_to_string(t.tk[s.st : s.fin], ' ') AS span_text,
                                   CAST(s.fin - s.st + 1 AS BIGINT) AS span_len
                            FROM spans s JOIN toks t USING (doc_id))
             SELECT span_text, MAX(span_len) AS span_len,
                    COUNT(*) AS n_occ,
                    COUNT(DISTINCT doc_id) AS n_docs
             FROM stext GROUP BY span_text
             ORDER BY n_occ DESC, span_text LIMIT 20"""))

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken 2003 — the
    * MOSS algorithm): hash every token k-gram, slide a window of w
    * consecutive gram hashes over each document, and select each window's
    * MINIMUM hash (ties broken by the RIGHTMOST position — the "robust
    * winnowing" rule that makes selections stable under edits). The
    * selected (position, hash) set is the document's fingerprint, with the
    * guarantee that any shared substring of >= w+k-1 tokens contributes at
    * least one shared fingerprint hash — so fingerprint overlap is a
    * sound detector for q182's repeated spans at ~1/w the gram volume.
    *
    * Cross-engine trick: a gram's 64-bit hash is the first 16 hex chars of
    * md5 (fixed-width hex is order-isomorphic to the integer, and md5 is
    * identical everywhere — the MinHash discipline); the rightmost-min tie
    * rule is encoded in the SAME min() by appending a fixed-width
    * DESCENDING position key (10^9 - pos, zero-padded), so one window
    * min() implements (hash asc, pos desc). Shape at scale: map-only gram
    * hashing, one PER-DOCUMENT window pass (bounded by the longest
    * document, never corpus-wide), distinct on the selected keys —
    * corpus-linear, no corpus shuffle beyond the per-doc repartition.
    */
  def winnowFingerprints(documents: org.apache.spark.sql.DataFrame,
      k: Int, w: Int): org.apache.spark.sql.DataFrame = {
    val toks = documents
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .withColumn("n_tok", size(col("tk")))
    val grams = explodeShinglesFromTokens(toks, col("tk"), k, "gram", "pos")
      .select(col("doc_id"), col("n_tok"), col("pos"),
        substring(md5(col("gram")), 1, 16).as("h"))
    val key = concat(col("h"),
      lpad((lit(1000000000) - col("pos")).cast("string"), 10, "0"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(0, w - 1)
    grams.withColumn("wk", key)
      .withColumn("wmin", min(col("wk")).over(win))
      // only full windows select: window starts run 1 .. n_grams - w + 1
      .filter(col("pos") <= col("n_tok") - k - w + 2)
      .select(col("doc_id"), col("wmin")).distinct()
      .select(col("doc_id"),
        (lit(1000000000) - substring(col("wmin"), 17, 10).cast("int")).as("fp_pos"),
        substring(col("wmin"), 1, 16).as("fp_hash"))
  }

  /** q183: winnowing fingerprints over the corpus at k=4, w=5 — one row
    * per selected (doc, position, hash). The oracle recomputes the full
    * selection in SQL, gating the hash function, the window min, the
    * rightmost tie rule, and the full-window boundary arithmetic.
    */
  private val q183 = QueryDef(
    "q183_winnow_fingerprints",
    (s, d) => winnowFingerprints(Tables(s, d, "documents"), 4, 5)
      .orderBy("doc_id", "fp_pos"),
    Some(s"""WITH toks AS (SELECT doc_id, $tokSql AS tk FROM documents),
                  grams AS (SELECT doc_id, len(tk) AS n_tok, CAST(i + 1 AS INT) AS pos,
                                   substring(md5(tk[i+1] || ' ' || tk[i+2] || ' '
                                     || tk[i+3] || ' ' || tk[i+4]), 1, 16) AS h
                            FROM toks, unnest(CASE WHEN len(tk) >= 4
                                                   THEN range(len(tk) - 3)
                                                   ELSE []::BIGINT[] END) u(i)),
                  keyed AS (SELECT doc_id, n_tok, pos,
                                   h || lpad(CAST(1000000000 - pos AS VARCHAR), 10, '0') AS wk
                            FROM grams),
                  wm AS (SELECT doc_id, n_tok, pos,
                                MIN(wk) OVER (PARTITION BY doc_id ORDER BY pos
                                              ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS wmin
                         FROM keyed),
                  sel AS (SELECT DISTINCT doc_id, wmin FROM wm
                          WHERE pos <= n_tok - 4 - 5 + 2)
             SELECT doc_id,
                    CAST(1000000000 - CAST(substring(wmin, 17, 10) AS INT) AS INT) AS fp_pos,
                    substring(wmin, 1, 16) AS fp_hash
             FROM sel ORDER BY doc_id, fp_pos"""))

  /** Candidate near-dup pairs from winnowing fingerprints: documents
    * sharing >= minShared distinct selected hashes. This is what q183's
    * fingerprints are FOR (the MOSS detector): an equality join on the
    * fingerprint hash at ~1/w the volume of a gram join. Each shared hash
    * certifies a shared k-GRAM (a k-token verbatim overlap); the winnowing
    * guarantee runs the other way — every shared substring of >= w+k-1
    * tokens yields at least ONE shared hash, so detection is complete at
    * minShared = 1 for the floor, and the default minShared = 2 trades
    * that completeness for precision (accidental single-gram collisions
    * drop out).
    *
    * Skew discipline (q33's df-cap, applied to fingerprint hashes): a
    * boilerplate fingerprint carried by n docs fans the self-join to ~n²
    * rows, so hashes with df > dfCap are dropped first — the hot list is
    * tiny and broadcast, the prune is a map-side anti join, and surviving
    * join rows are bounded by dfCap × |fingerprint rows| — linear in the
    * corpus with dfCap the dial. The cap is deterministic and mirrored in
    * the oracle, so the gate covers it.
    */
  def winnowCandidatePairs(documents: org.apache.spark.sql.DataFrame,
      k: Int, w: Int, dfCap: Int = 300,
      minShared: Int = 2): org.apache.spark.sql.DataFrame = {
    // checkpointed: fp feeds the hot-hash aggregate AND the anti-join
    // main branch, whose exchanges never canonicalize equal — without it
    // the fingerprinting (gram md5s + per-doc window min + distinct) ran
    // twice (the q33 corpus-relation discipline)
    val fp = winnowFingerprints(documents, k, w)
      .select("doc_id", "fp_hash").distinct()
      .localCheckpoint(true)
    val hot = fp.groupBy("fp_hash").agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap).select("fp_hash")
    // no checkpoint: with inBucketPairs the pruned relation has ONE
    // consumer (the bucket aggregate), so materializing it buys nothing
    val f = fp.join(broadcast(hot), Seq("fp_hash"), "left_anti")
    inBucketPairs(f, Seq("fp_hash"), "doc_id", maxBucket = Some(dfCap))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** q184: winnow-fingerprint candidate pairs at k=4, w=5, df-cap 300,
    * minShared 2 — the detector over q183's selection, oracle-gated
    * including the cap and the distinct-hash semantics.
    */
  private val q184 = QueryDef(
    "q184_winnow_candidate_pairs",
    (s, d) => winnowCandidatePairs(Tables(s, d, "documents"), 4, 5)
      .orderBy("doc_a", "doc_b"),
    Some(s"""WITH toks AS (SELECT doc_id, $tokSql AS tk FROM documents),
                  grams AS (SELECT doc_id, len(tk) AS n_tok, CAST(i + 1 AS INT) AS pos,
                                   substring(md5(tk[i+1] || ' ' || tk[i+2] || ' '
                                     || tk[i+3] || ' ' || tk[i+4]), 1, 16) AS h
                            FROM toks, unnest(CASE WHEN len(tk) >= 4
                                                   THEN range(len(tk) - 3)
                                                   ELSE []::BIGINT[] END) u(i)),
                  keyed AS (SELECT doc_id, n_tok, pos,
                                   h || lpad(CAST(1000000000 - pos AS VARCHAR), 10, '0') AS wk
                            FROM grams),
                  wm AS (SELECT doc_id, n_tok, pos,
                                MIN(wk) OVER (PARTITION BY doc_id ORDER BY pos
                                              ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS wmin
                         FROM keyed),
                  sel AS (SELECT DISTINCT doc_id, substring(wmin, 1, 16) AS fp_hash
                          FROM wm WHERE pos <= n_tok - 4 - 5 + 2),
                  hot AS (SELECT fp_hash FROM sel GROUP BY fp_hash
                          HAVING COUNT(*) > 300),
                  f AS (SELECT s.doc_id, s.fp_hash FROM sel s
                        ANTI JOIN hot h ON s.fp_hash = h.fp_hash)
             SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    COUNT(*) AS n_shared
             FROM f a JOIN f b
               ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
             GROUP BY a.doc_id, b.doc_id
             HAVING COUNT(*) >= 2
             ORDER BY doc_a, doc_b"""))

  /** Longest exactly-shared token span per candidate pair — the
    * EXPLANATION operator for q184's detector (and the plagiarism-checker
    * shape): for each flagged pair, align the two documents' k-grams on
    * the DIAGONAL (pos_a - pos_b constant) and merge consecutive matches
    * into runs; the longest run of shared k-gram starts [r] is an exactly-
    * shared span of r + k - 1 tokens. Reported with both start offsets and
    * the span text sliced from doc_a's own token array.
    *
    * Scale shape: the pair set is q184's output (df-capped, bounded); the
    * alignment join touches only grams of PAIRED documents (two keyed
    * joins pair→grams, then one equality join on the gram text within the
    * pair), so its volume is pairs-sized, not corpus-sized; the island
    * merge windows partition by (pair, diagonal) — bounded by document
    * length; the winner-per-pair is a deterministic rank (longest, then
    * smallest start_a, then start_b).
    */
  def sharedSpanExplain(documents: org.apache.spark.sql.DataFrame,
      k: Int = 4, w: Int = 5, dfCap: Int = 300,
      minShared: Int = 2): org.apache.spark.sql.DataFrame = {
    val pairs = winnowCandidatePairs(documents, k, w, dfCap, minShared)
      .select("doc_a", "doc_b").localCheckpoint(true)
    val toks = documents
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .localCheckpoint(true) // feeds both gram sides and the text slice
    val grams = explodeShinglesFromTokens(toks, col("tk"), k, "gram", "pos")
      .select("doc_id", "pos", "gram")
    val ga = pairs.join(grams.withColumnRenamed("doc_id", "doc_a")
      .withColumnRenamed("pos", "pa"), "doc_a")
    val m = ga.join(grams.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("pos", "pb"), Seq("doc_b", "gram"))
      .select(col("doc_a"), col("doc_b"), col("pa"), col("pb"),
        (col("pa") - col("pb")).as("diag"))
    val wIsl = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pa"))
    val runs = m.withColumn("grp", col("pa") - row_number().over(wIsl))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("grp"))
      .agg(min(col("pa")).as("start_a"), min(col("pb")).as("start_b"),
        (count(lit(1)) + (k - 1)).cast("int").as("span_len"))
    val wBest = Window.partitionBy(col("doc_a"), col("doc_b"))
      .orderBy(col("span_len").desc, col("start_a").asc, col("start_b").asc)
    runs.withColumn("rk", row_number().over(wBest)).filter(col("rk") === 1)
      .join(toks.withColumnRenamed("doc_id", "doc_a"), "doc_a")
      .select(col("doc_a"), col("doc_b"), col("span_len"),
        col("start_a"), col("start_b"),
        expr("array_join(slice(tk, start_a, span_len), ' ')").as("span_text"))
  }

  /** q185: shared-span explanation for every q184 candidate pair, fully
    * oracle-gated (diagonal alignment, island merge, the deterministic
    * winner rank, and the text slice all recomputed in SQL).
    */
  private val q185 = QueryDef(
    "q185_shared_span_explain",
    (s, d) => sharedSpanExplain(Tables(s, d, "documents"))
      .orderBy("doc_a", "doc_b"),
    Some(s"""WITH toks AS (SELECT doc_id, $tokSql AS tk FROM documents),
                  grams AS (SELECT doc_id, len(tk) AS n_tok, CAST(i + 1 AS INT) AS pos,
                                   tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
                                     || ' ' || tk[i+4] AS gram
                            FROM toks, unnest(CASE WHEN len(tk) >= 4
                                                   THEN range(len(tk) - 3)
                                                   ELSE []::BIGINT[] END) u(i)),
                  keyed AS (SELECT doc_id, n_tok, pos,
                                   substring(md5(gram), 1, 16)
                                     || lpad(CAST(1000000000 - pos AS VARCHAR), 10, '0') AS wk
                            FROM grams),
                  wm AS (SELECT doc_id, n_tok, pos,
                                MIN(wk) OVER (PARTITION BY doc_id ORDER BY pos
                                              ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS wmin
                         FROM keyed),
                  sel AS (SELECT DISTINCT doc_id, substring(wmin, 1, 16) AS fp_hash
                          FROM wm WHERE pos <= n_tok - 4 - 5 + 2),
                  hot AS (SELECT fp_hash FROM sel GROUP BY fp_hash
                          HAVING COUNT(*) > 300),
                  f AS (SELECT s.doc_id, s.fp_hash FROM sel s
                        ANTI JOIN hot h ON s.fp_hash = h.fp_hash),
                  pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                            FROM f a JOIN f b
                              ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
                            GROUP BY a.doc_id, b.doc_id
                            HAVING COUNT(*) >= 2),
                  m AS (SELECT p.doc_a, p.doc_b, ga.pos AS pa, gb.pos AS pb,
                               ga.pos - gb.pos AS diag
                        FROM pairs p
                        JOIN grams ga ON ga.doc_id = p.doc_a
                        JOIN grams gb ON gb.doc_id = p.doc_b
                          AND gb.gram = ga.gram),
                  isl AS (SELECT doc_a, doc_b, diag, pa, pb,
                                 pa - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, diag
                                                         ORDER BY pa) AS grp
                          FROM m),
                  runs AS (SELECT doc_a, doc_b, MIN(pa) AS start_a,
                                  MIN(pb) AS start_b,
                                  CAST(COUNT(*) + 3 AS INT) AS span_len
                           FROM isl GROUP BY doc_a, doc_b, diag, grp),
                  best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b
                                       ORDER BY span_len DESC, start_a, start_b) AS rk
                           FROM runs)
             SELECT b.doc_a, b.doc_b, b.span_len, b.start_a, b.start_b,
                    array_to_string(t.tk[b.start_a : b.start_a + b.span_len - 1], ' ') AS span_text
             FROM best b JOIN toks t ON t.doc_id = b.doc_a
             WHERE b.rk = 1
             ORDER BY doc_a, doc_b"""))

  /** Decontamination WITH EVIDENCE — the cross-relation form of q185:
    * for every (train doc, eval doc) pair sharing a winnow fingerprint,
    * align their k-grams on the diagonal and report the longest exactly-
    * shared span (>= w+k-1 tokens, the winnowing guarantee's floor) with
    * both offsets and the span text. q79/q95 ANSWER "is this document
    * contaminated?"; this answers the auditor's follow-up — "show me the
    * overlapping passage" — which is what actually gets a benchmark
    * exclusion accepted.
    *
    * Scale shape: fingerprints are ~1/w of gram volume on BOTH sides; the
    * pair join is hash-equality with the df-cap computed over the union
    * (a boilerplate hash in train pre-kills eval matches too — the audit
    * wants substantive overlap, not licence headers); alignment touches
    * only PAIRED documents' grams; the eval side is tiny in production so
    * every per-pair relation is eval-bounded.
    */
  def crossSpanEvidence(train: org.apache.spark.sql.DataFrame,
      eval_ : org.apache.spark.sql.DataFrame, k: Int = 4, w: Int = 5,
      dfCap: Int = 300): org.apache.spark.sql.DataFrame = {
    val minLen = w + k - 1
    // both sides checkpointed: each feeds the union df-cap aggregate AND
    // the pair join, so the (expensive) winnowing ran twice per side
    val fpT = winnowFingerprints(train, k, w)
      .select(col("doc_id").as("train_doc"), col("fp_hash")).distinct()
      .localCheckpoint(true)
    val fpE = winnowFingerprints(eval_, k, w)
      .select(col("doc_id").as("eval_doc"), col("fp_hash")).distinct()
      .localCheckpoint(true)
    val hot = fpT.select(col("train_doc").as("d"), col("fp_hash"))
      .unionByName(fpE.select(col("eval_doc").as("d"), col("fp_hash")))
      .groupBy("fp_hash").agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap).select("fp_hash")
    val pairs = fpT.join(broadcast(hot), Seq("fp_hash"), "left_anti")
      .join(fpE.join(broadcast(hot), Seq("fp_hash"), "left_anti"), "fp_hash")
      .select("train_doc", "eval_doc").distinct()
      .localCheckpoint(true)
    val toksT = train.select(col("doc_id"), tokens(col("text")).as("tk"))
      .localCheckpoint(true)
    val toksE = eval_.select(col("doc_id"), tokens(col("text")).as("tk"))
    val gT = explodeShinglesFromTokens(toksT, col("tk"), k, "gram", "pos")
      .select(col("doc_id").as("train_doc"), col("pos").as("pt"), col("gram"))
    val gE = explodeShinglesFromTokens(toksE, col("tk"), k, "gram", "pos")
      .select(col("doc_id").as("eval_doc"), col("pos").as("pe"), col("gram"))
    val m = pairs.join(gT, "train_doc").join(gE, Seq("eval_doc", "gram"))
      .select(col("train_doc"), col("eval_doc"), col("pt"), col("pe"),
        (col("pt") - col("pe")).as("diag"))
    val wIsl = Window.partitionBy(col("train_doc"), col("eval_doc"), col("diag"))
      .orderBy(col("pt"))
    val runs = m.withColumn("grp", col("pt") - row_number().over(wIsl))
      .groupBy(col("train_doc"), col("eval_doc"), col("diag"), col("grp"))
      .agg(min(col("pt")).as("start_train"), min(col("pe")).as("start_eval"),
        (count(lit(1)) + (k - 1)).cast("int").as("span_len"))
    val wBest = Window.partitionBy(col("train_doc"), col("eval_doc"))
      .orderBy(col("span_len").desc, col("start_train").asc, col("start_eval").asc)
    runs.withColumn("rk", row_number().over(wBest)).filter(col("rk") === 1)
      .filter(col("span_len") >= minLen)
      .join(toksT.withColumnRenamed("doc_id", "train_doc"), "train_doc")
      .select(col("train_doc"), col("eval_doc"), col("span_len"),
        col("start_train"), col("start_eval"),
        expr("array_join(slice(tk, start_train, span_len), ' ')").as("span_text"))
  }

  /** q186: contamination evidence between the deterministic train/eval
    * split (eval = doc_id % 10 = 0), fully oracle-gated — fingerprint
    * pairing, union df-cap, diagonal alignment, winner rank, the
    * guarantee-floor length filter, and the text slice.
    */
  private val q186 = QueryDef(
    "q186_decontamination_evidence",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      crossSpanEvidence(docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0))
        .orderBy("train_doc", "eval_doc")
    },
    Some(s"""WITH toks AS (SELECT doc_id, $tokSql AS tk FROM documents),
                  grams AS (SELECT doc_id, len(tk) AS n_tok, CAST(i + 1 AS INT) AS pos,
                                   tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
                                     || ' ' || tk[i+4] AS gram
                            FROM toks, unnest(CASE WHEN len(tk) >= 4
                                                   THEN range(len(tk) - 3)
                                                   ELSE []::BIGINT[] END) u(i)),
                  keyed AS (SELECT doc_id, n_tok, pos,
                                   substring(md5(gram), 1, 16)
                                     || lpad(CAST(1000000000 - pos AS VARCHAR), 10, '0') AS wk
                            FROM grams),
                  wm AS (SELECT doc_id, n_tok, pos,
                                MIN(wk) OVER (PARTITION BY doc_id ORDER BY pos
                                              ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS wmin
                         FROM keyed),
                  sel AS (SELECT DISTINCT doc_id, substring(wmin, 1, 16) AS fp_hash
                          FROM wm WHERE pos <= n_tok - 4 - 5 + 2),
                  hot AS (SELECT fp_hash FROM sel GROUP BY fp_hash
                          HAVING COUNT(*) > 300),
                  f AS (SELECT s.doc_id, s.fp_hash FROM sel s
                        ANTI JOIN hot h ON s.fp_hash = h.fp_hash),
                  pairs AS (SELECT DISTINCT t.doc_id AS train_doc,
                                   e.doc_id AS eval_doc
                            FROM f t JOIN f e ON t.fp_hash = e.fp_hash
                            WHERE t.doc_id % 10 <> 0 AND e.doc_id % 10 = 0),
                  m AS (SELECT p.train_doc, p.eval_doc, gt.pos AS pt,
                               ge.pos AS pe, gt.pos - ge.pos AS diag
                        FROM pairs p
                        JOIN grams gt ON gt.doc_id = p.train_doc
                        JOIN grams ge ON ge.doc_id = p.eval_doc
                          AND ge.gram = gt.gram),
                  isl AS (SELECT train_doc, eval_doc, diag, pt, pe,
                                 pt - ROW_NUMBER() OVER (PARTITION BY train_doc, eval_doc, diag
                                                         ORDER BY pt) AS grp
                          FROM m),
                  runs AS (SELECT train_doc, eval_doc,
                                  MIN(pt) AS start_train, MIN(pe) AS start_eval,
                                  CAST(COUNT(*) + 3 AS INT) AS span_len
                           FROM isl GROUP BY train_doc, eval_doc, diag, grp),
                  best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY train_doc, eval_doc
                                       ORDER BY span_len DESC, start_train, start_eval) AS rk
                           FROM runs)
             SELECT b.train_doc, b.eval_doc, b.span_len,
                    b.start_train, b.start_eval,
                    array_to_string(t.tk[b.start_train : b.start_train + b.span_len - 1], ' ') AS span_text
             FROM best b JOIN toks t ON t.doc_id = b.train_doc
             WHERE b.rk = 1 AND b.span_len >= 8
             ORDER BY train_doc, eval_doc"""))

  /** Persist winnow fingerprints as a probe-able index — the q82/signature
    * store discipline applied to EXACT-SUBSTRING detection: build once
    * over the corpus, probe each day's increment without re-reading (or
    * re-fingerprinting) the old corpus, append the admitted increment.
    */
  def buildWinnowIndex(documents: org.apache.spark.sql.DataFrame,
      path: String, k: Int = 4, w: Int = 5): Unit =
    winnowFingerprints(documents, k, w).write.mode("overwrite").parquet(path)

  /** Probe the stored fingerprint index with an increment: the increment
    * is fingerprinted fresh (increment-sized work), the OLD side comes
    * from the index alone, and the df-cap runs on the STORED side (the
    * quadratic risk is a boilerplate fingerprint carried by many stored
    * docs; the production probe must be able to apply the cap without
    * waiting for the day's increment). Returns (new_doc, old_doc,
    * n_shared) for pairs sharing >= minShared hashes. Direction of the
    * guarantee: each shared hash certifies a shared k-GRAM (a k-token
    * verbatim overlap); completeness is what winnowing guarantees — at
    * minShared=1 EVERY >= w+k-1-token verbatim overlap with a stored doc
    * is reported (no false negatives above the floor).
    */
  def probeWinnowIndex(spark: org.apache.spark.sql.SparkSession,
      increment: org.apache.spark.sql.DataFrame, path: String,
      k: Int = 4, w: Int = 5, dfCap: Int = 300,
      minShared: Int = 2, prune: Boolean = true): org.apache.spark.sql.DataFrame = {
    // increment-sized; feeds the bloom build (count + aggregate) and the
    // pair join — materialize once
    val fpE = winnowFingerprints(increment, k, w)
      .select(col("doc_id").as("new_doc"), col("fp_hash")).distinct()
      .localCheckpoint(true)
    val raw = spark.read.parquet(path)
    // The q178 bloom discipline, map-side BEFORE anything shuffles: a
    // broadcast bitset of the increment's fp_hashes (a few MB at 1% fpp
    // even for millions of increment fingerprints) filters the stored
    // relation inside whole-stage codegen, so every downstream shuffle —
    // the replay-healing distinct, the df-cap aggregation, AND the pair
    // join — is increment-bounded instead of index-sized. Without it the
    // daily probe shuffled the whole stored fingerprint relation (~1/w of
    // gram volume; TBs at 100 TB of corpus).
    //
    // EXACTNESS of the post-prune df-cap is the subtle half of the
    // argument: the bloom predicate is a DETERMINISTIC function of
    // fp_hash alone, so an entire hash group either survives intact or
    // dies intact — never partially. For every hash the increment
    // carries (the only ones that can join) the bloom has no false
    // negatives, so its group survives WHOLE and its post-prune df
    // equals its true df: the cap decision is bit-identical to the
    // unpruned computation. A false-positive hash's group also survives
    // whole (its cap decision is likewise exact) and then dies in the
    // equality join for lack of an increment-side row. Spec-pinned
    // row-identical to prune = false.
    winnowSharedRows(raw, fpE, dfCap, prune)
      .groupBy("new_doc", "old_doc").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The probe's per-store body up to (but not including) the pair
    * aggregation: bloom-prune `stored` with the increment's hashes,
    * heal replay duplicates, apply the df-cap, join. Shared by the
    * monolithic probe (one store, then aggregate) and the sharded
    * federation (union the per-shard rows, THEN one global aggregate —
    * a pair's shared hashes scatter across shards, so per-shard
    * n_shared counts would undercount; the rows are increment-bounded
    * either way, so the global aggregate is cheap).
    */
  private def winnowSharedRows(stored0: org.apache.spark.sql.DataFrame,
      fpE: org.apache.spark.sql.DataFrame, dfCap: Int,
      prune: Boolean,
      preBloom: Option[Array[Byte]] = None): org.apache.spark.sql.DataFrame = {
    val stored = if (prune) {
      // preBloom: the sharded probes build ONE bitset over the FULL
      // increment and reuse it per shard — exact because routing is by
      // fp_hash, so a stored hash in shard i can only equal increment
      // hashes routed to i (cross-shard bloom admissions are false
      // positives that die in the equality join). Build path: no
      // distinct (duplicate hashes set the same bits; fpE is
      // checkpointed so the sizing count reads cached blocks).
      val bloom = preBloom.getOrElse(
        graft.functions.BloomFunctions.buildLongBloom(
          fpE.select(xxhash64(col("fp_hash")).as("h")), col("h"),
          fpE.count(), 0.01))
      stored0.filter(graft.functions.BloomFunctions.mightContainLong(
        bloom, xxhash64(col("fp_hash"))))
    } else stored0
    val fpT = stored
      .select(col("doc_id").as("old_doc"), col("fp_hash")).distinct()
    val hot = fpT.groupBy("fp_hash").agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap).select("fp_hash")
    fpT.join(broadcast(hot), Seq("fp_hash"), "left_anti")
      .join(fpE, "fp_hash")
  }

  /** Append an admitted increment's fingerprints — new files only, no
    * rewrite of the existing index (appendSignatureIndex's contract). A
    * replayed append doubles rows harmlessly: the probe's `.distinct()`
    * collapses them before both the df-cap and the pair join, so every
    * downstream count is computed over the (doc, hash) SET.
    */
  def appendWinnowIndex(increment: org.apache.spark.sql.DataFrame,
      path: String, k: Int = 4, w: Int = 5): Unit =
    winnowFingerprints(increment, k, w).write.mode("append").parquet(path)

  /** FORGET documents from the fingerprint index — the right-to-be-
    * forgotten verb every persisted family carries: crash-durable
    * rewrite without the forgotten ids, after which a re-submitted copy
    * of a fully forgotten document probes clean and re-admits.
    */
  def forgetWinnowIndex(spark: org.apache.spark.sql.SparkSession,
      del: org.apache.spark.sql.DataFrame, path: String): Unit = {
    graft.operators.StoreRewrite.recover(spark, path)
    val ids = del.select("doc_id").localCheckpoint(true)
    // refuse BEFORE the rewrite (the family rule textIndexForget and
    // VectorIngestPipeline.forget enforce): an emptied index relies on
    // a schema-only parquet file to stay probe-able
    val remaining = spark.read.parquet(path)
      .join(ids, Seq("doc_id"), "left_anti").count()
    require(remaining > 0,
      "forgetWinnowIndex: forgetting the ENTIRE corpus leaves an empty " +
        "index — delete the index directory instead")
    graft.operators.StoreRewrite.atomicOverwrite(
      spark.read.parquet(path).join(ids, Seq("doc_id"), "left_anti"),
      path)
  }

  /** COMPACT the fingerprint index — layout maintenance from the store
    * alone (no corpus re-fingerprinting): each [[appendWinnowIndex]]
    * leaves one unclustered file group (and a replayed append leaves
    * exact row duplicates), so after a run of daily ingests the index is
    * small-file litter that every probe re-deduplicates. The compact
    * folds it back to the fresh-build shape: duplicates collapsed ONCE
    * (`distinct()` is provably lossless — the relation is a set of
    * (doc_id, fp_pos, fp_hash) and every verb writes set members), rows
    * re-clustered on fp_hash + sorted within partitions so the parquet
    * row-group min/max statistics carry the hash ranges probes and
    * forgets key on. Content-identical (set equality) to the pre-compact
    * index; crash discipline is [[graft.operators.StoreRewrite]]'s — the
    * old layout survives until the new one is fully written, and a crash
    * inside the rename window is finished by the recover the next verb
    * runs.
    */
  def compactWinnowIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    graft.operators.StoreRewrite.recover(spark, path)
    graft.operators.StoreRewrite.atomicOverwrite(
      spark.read.parquet(path).distinct()
        .repartition(col("fp_hash"))
        .sortWithinPartitions("fp_hash", "doc_id", "fp_pos"),
      path)
  }

  /** Maintain the MONOLITHIC winnow index from a VERSIONED-STORE
    * revision window — verb parity with
    * [[maintainWinnowIndexShardedFromStore]] for the unsharded store a
    * small corpus starts on. `k`/`w` must match the index's build
    * geometry (the monolithic store carries no meta — the probe takes
    * them per call for the same reason). Replay shape is the family's:
    * doubled fingerprint rows are harmless (probes compute over the
    * (doc, hash) set; [[compactWinnowIndex]] folds the litter).
    */
  def maintainWinnowIndexFromStore(
      spark: org.apache.spark.sql.SparkSession, storePath: String,
      rel: String, fromRev: Long, toRev: Long, path: String,
      k: Int = 4, w: Int = 5): Unit =
    graft.operators.CdcBridge.maintain(spark, storePath, rel, fromRev,
      toRev, "doc_id", Seq("doc_id", "text"),
      "maintainWinnowIndexFromStore")(
      del => forgetWinnowIndex(spark, del, path))(
      ins => appendWinnowIndex(ins, path, k, w))

  /** SYNC the monolithic winnow index with its versioned corpus —
    * [[syncWinnowIndexShardedWithStore]]'s unsharded twin, with the
    * monolithic marker discipline of [[syncSignatureIndexWithStore]]:
    * the `_synced_rev` checkpoint lives inside the relation dir,
    * bootstrap writes through [[graft.operators.StoreRewrite]] so the
    * sentinel survives, and forget/compact rewrites carry the marker
    * across. `k`/`w` are consulted at bootstrap AND on every window's
    * appends — they are the index's geometry, keep them constant.
    */
  def syncWinnowIndexWithStore(spark: org.apache.spark.sql.SparkSession,
      storePath: String, rel: String, path: String,
      k: Int = 4, w: Int = 5): Option[(Long, Long)] =
    graft.operators.CdcBridge.sync(spark, storePath, path,
      "syncWinnowIndexWithStore")({
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      fs.exists(p) && fs.listStatus(p)
        .exists(s => !s.getPath.getName.startsWith("_"))
    })(cur =>
      graft.operators.StoreRewrite.atomicOverwrite(
        winnowFingerprints(graft.operators.VersionedStore
          .read(spark, storePath, rel, Some(cur)), k, w), path))((from, to) =>
      maintainWinnowIndexFromStore(spark, storePath, rel, from, to, path,
        k, w))

  // ------------------------------------------------------------------
  // MANIFEST-COMMITTED winnow index — the q197 signature template
  // applied to the fingerprint family (SCALING.md "commit-protocol
  // fork"): the SAME fp relation inside a VersionedStore, every verb
  // one manifest PUT, object-store-safe, no recover verb. Two upgrades
  // over the bare rename-family store come free: the fingerprinting
  // knobs ride in a one-row `knobs` relation committed WITH the
  // fingerprints (the sharded router's can't-mix-selections guarantee,
  // which the bare monolithic store never had), and forget is a
  // tombstone (sticky for a re-appended same doc_id until compact — the
  // family's documented trade; fresh ingests mint fresh doc_ids).
  // ------------------------------------------------------------------

  private def winnowKnobsDf(spark: org.apache.spark.sql.SparkSession,
      k: Int, w: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    Seq((k, w)).toDF("k", "w")
  }

  /** The versioned store's recorded fingerprint geometry — every probe
    * and append fingerprints its increment with the STORE's k/w.
    */
  def winnowIndexVersionedKnobs(spark: org.apache.spark.sql.SparkSession,
      path: String): (Int, Int) = {
    val r = graft.operators.VersionedStore.read(spark, path, "knobs")
      .collect()
    require(r.length == 1,
      s"winnowIndexVersionedKnobs: knobs relation at $path has " +
        s"${r.length} rows — corrupt store")
    (r(0).getAs[Int]("k"), r(0).getAs[Int]("w"))
  }

  /** Build the manifest-committed winnow index: revision 1 commits the
    * corpus's fingerprints AND the (k, w) selection knobs in one PUT.
    */
  def buildWinnowIndexVersioned(documents: org.apache.spark.sql.DataFrame,
      path: String, k: Int = 4, w: Int = 5): Long =
    graft.operators.VersionedStore.save(Map(
      "fp" -> winnowFingerprints(documents, k, w),
      "knobs" -> winnowKnobsDf(documents.sparkSession, k, w)), path)

  /** Probe the manifest-committed index — [[probeWinnowIndex]]'s exact
    * plan (increment-side bloom prune, whole-group df-cap exactness,
    * increment-bounded shuffles) over the store's visible fingerprints;
    * the increment is fingerprinted with the STORE's recorded knobs.
    */
  def probeWinnowIndexVersioned(spark: org.apache.spark.sql.SparkSession,
      increment: org.apache.spark.sql.DataFrame, path: String,
      dfCap: Int = 300, minShared: Int = 2,
      prune: Boolean = true): org.apache.spark.sql.DataFrame = {
    val (k, w) = winnowIndexVersionedKnobs(spark, path)
    val fpE = winnowFingerprints(increment, k, w)
      .select(col("doc_id").as("new_doc"), col("fp_hash")).distinct()
      .localCheckpoint(true)
    winnowSharedRows(
      graft.operators.VersionedStore.read(spark, path, "fp"),
      fpE, dfCap, prune)
      .groupBy("new_doc", "old_doc").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Append an admitted increment's fingerprints: a delta dir + one
    * manifest PUT, fingerprinted with the store's recorded knobs.
    */
  def appendWinnowIndexVersioned(
      increment: org.apache.spark.sql.DataFrame, path: String): Long = {
    val spark = increment.sparkSession
    val (k, w) = winnowIndexVersionedKnobs(spark, path)
    graft.operators.VersionedStore.append(
      Map("fp" -> winnowFingerprints(increment, k, w)), path)
  }

  /** Forget by tombstone: one tiny keys dir + one manifest PUT; the
    * probe's store read anti-joins it from then on. Physical reclaim
    * (and tombstone retirement) at [[graft.operators.VersionedStore.compact]].
    */
  def forgetWinnowIndexVersioned(spark: org.apache.spark.sql.SparkSession,
      del: org.apache.spark.sql.DataFrame, path: String): Long =
    graft.operators.VersionedStore.delete(del.select("doc_id"), "fp", path)

  /** SYNC with the versioned corpus — [[syncWinnowIndexWithStore]]'s
    * contract on the rename-free form; the checkpoint lives beside
    * `_versions` and no rewrite verb exists that could orphan it. The
    * maintenance window lands as ONE mixed commit
    * ([[graft.operators.CdcBridge.maintainAtomic]]): tombstones and the
    * increment's fingerprints become visible at the same instant.
    */
  def syncWinnowIndexVersionedWithStore(
      spark: org.apache.spark.sql.SparkSession, storePath: String,
      rel: String, path: String, k: Int = 4, w: Int = 5,
      retain: Option[Int] = None): Option[(Long, Long)] =
    graft.operators.CdcBridge.sync(spark, storePath, path,
      "syncWinnowIndexVersionedWithStore", retain)(
      graft.operators.VersionedStore.currentVersion(spark, path).isDefined)(
      cur => buildWinnowIndexVersioned(
        graft.operators.VersionedStore.read(spark, storePath, rel,
          Some(cur)), path, k, w))((from, to) =>
      graft.operators.CdcBridge.maintainAtomic(spark, storePath, rel,
        from, to, "doc_id", Seq("doc_id", "text"),
        "syncWinnowIndexVersionedWithStore") { (del, ins) =>
        val (sk, sw) = winnowIndexVersionedKnobs(spark, path)
        graft.operators.VersionedStore.commitMixed(
          ins.map(i => Map("fp" -> winnowFingerprints(i, sk, sw)))
            .getOrElse(Map.empty),
          del.map(d => Map("fp" -> d.select("doc_id")))
            .getOrElse(Map.empty),
          Map.empty, path)
        ()
      })

  // ------------------------------------------------------------------
  // Sharded (federated) winnow-fingerprint index — the 100 TB shape of
  // the family, by the text/vector sharding discipline (q174/q176): a
  // monolithic fingerprint store makes every forget/compact one
  // index-sized rewrite and the build one full-corpus job. Routing is
  // by FP_HASH (not doc_id): the df-cap groupBy is then shard-local
  // AND exact — a hash's every row lives in one shard, so shard-local
  // df equals global df — and a probe touches only the shards its
  // increment's hashes route to. The price: a doc's fingerprints
  // scatter, so forget-by-doc visits every shard (forget is the rare
  // verb; each visit is a 1/n-sized rewrite). Pair aggregation runs
  // AFTER the shard union — a pair's shared hashes scatter too.
  // ------------------------------------------------------------------

  private def winnowShardPath(root: String, i: Int) = s"$root/shard-$i"
  private def winnowRouterPath(root: String) = s"$root/router"

  private def winnowShardOf(n: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(col("fp_hash")), lit(n.toLong))

  /** Read the sharded index's router — (n_shards, k, w), written LAST
    * by [[buildWinnowIndexSharded]] as the commit marker. Carrying the
    * fingerprinting knobs in the router (the bare monolithic index
    * cannot) means every probe/append fingerprints its increment with
    * the STORE's k/w — a caller can never silently mix selections.
    */
  def winnowShardInfo(spark: org.apache.spark.sql.SparkSession,
      root: String): (Int, Int, Int) = {
    val rp = new org.apache.hadoop.fs.Path(winnowRouterPath(root))
    require(rp.getFileSystem(spark.sessionState.newHadoopConf()).exists(rp),
      s"winnowShardInfo: no router at $root — not a sharded winnow index, " +
        "or an interrupted buildWinnowIndexSharded (the router is written " +
        "last); re-run the sharded build")
    // a manifest-protocol federation's router is itself a versioned
    // store — auto-detected, so every consumer serves both forms
    val r =
      if (graft.operators.VersionedStore
          .currentVersion(spark, winnowRouterPath(root)).isDefined)
        graft.operators.VersionedStore
          .read(spark, winnowRouterPath(root), "router").collect()
      else spark.read.parquet(winnowRouterPath(root)).collect()
    require(r.length == 1,
      s"winnowShardInfo: router at $root has ${r.length} rows — corrupt store")
    (r(0).getAs[Int]("n_shards"), r(0).getAs[Int]("k"), r(0).getAs[Int]("w"))
  }

  /** Build the fingerprint index as `nShards` independent stores under
    * `root` plus a router committed LAST. The corpus is fingerprinted
    * ONCE (checkpointed; each shard's write reads its hash slice) —
    * sharding is a storage layout, never extra fingerprinting work. A
    * rebuild over an existing sharded store un-commits it first (router
    * removed before any shard is touched), so a crash mid-build leaves
    * a router-less root every verb refuses loudly, never a silent mix
    * of old and new shards. Refuses a shard that would be empty — use
    * fewer shards for a tiny corpus.
    */
  def buildWinnowIndexSharded(documents: org.apache.spark.sql.DataFrame,
      root: String, nShards: Int, k: Int = 4, w: Int = 5): Unit = {
    require(nShards >= 1,
      s"buildWinnowIndexSharded: nShards must be >= 1, got $nShards")
    val spark = documents.sparkSession
    val rp = new org.apache.hadoop.fs.Path(winnowRouterPath(root))
    val fs = rp.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(rp)) fs.delete(rp, true) // un-commit before rebuild
    // drop EVERY existing shard dir, not just the ones the new count
    // overwrites: rebuilding 5 shards as 3 must not orphan shard-3/4 on
    // disk — they would silently retain forgotten documents' rows
    // forever (no verb loops past the router's n). Crash-safe: the
    // router is already un-committed, so a crash mid-delete leaves a
    // store every verb refuses.
    val rootP = new org.apache.hadoop.fs.Path(root)
    if (fs.exists(rootP))
      fs.listStatus(rootP).map(_.getPath)
        .filter(_.getName.startsWith("shard-"))
        .foreach(p => fs.delete(p, true))
    val fp = winnowFingerprints(documents, k, w)
      .withColumn("_sh", winnowShardOf(nShards)).localCheckpoint(true)
    val present = fp.select("_sh").distinct().collect()
      .map(_.getLong(0)).toSet
    val empty = (0L until nShards.toLong).filterNot(present)
    require(empty.isEmpty,
      s"buildWinnowIndexSharded: shard(s) ${empty.mkString(",")} of " +
        s"$nShards would be EMPTY for this corpus — use fewer shards")
    // r15 (guide §2.6): disjoint per-shard writes off the checkpointed
    // slices, overlapped; the router commit still follows all of them.
    graft.operators.Parallel.shards(nShards) { i =>
      fp.filter(col("_sh") === i).drop("_sh")
        .repartition(col("fp_hash"))
        .sortWithinPartitions("fp_hash", "doc_id", "fp_pos")
        .write.mode("overwrite").parquet(winnowShardPath(root, i))
    }
    import spark.implicits._
    graft.operators.StoreRewrite.atomicOverwrite(
      Seq((nShards, k, w)).toDF("n_shards", "k", "w").coalesce(1),
      winnowRouterPath(root))
  }

  /** Federated probe: the increment is fingerprinted ONCE with the
    * router's k/w, its hashes routed, and each TOUCHED shard runs the
    * bloom-pruned per-store body against its slice — shards with no
    * routed hashes are never scanned (at 100 TB a small increment
    * touches a fraction of the shards; the monolithic store cannot
    * skip anything). Shard-local df-caps are exact (routing by hash),
    * and the pair aggregation runs once over the unioned rows. Row-
    * identical to the monolithic probe — spec-pinned.
    */
  def probeWinnowIndexSharded(spark: org.apache.spark.sql.SparkSession,
      increment: org.apache.spark.sql.DataFrame, root: String,
      dfCap: Int = 300, minShared: Int = 2): org.apache.spark.sql.DataFrame = {
    val (n, k, w) = winnowShardInfo(spark, root)
    val fpE = winnowFingerprints(increment, k, w)
      .select(col("doc_id").as("new_doc"), col("fp_hash")).distinct()
      .withColumn("_sh", winnowShardOf(n)).localCheckpoint(true)
    // ONE bloom over the full increment reused by every shard, and ONE
    // present-shard scan instead of a per-shard isEmpty action —
    // 2n jobs -> 3 on the checkpointed increment; per-shard exactness
    // is unchanged (routing is by fp_hash, see winnowSharedRows)
    val bloom = graft.functions.BloomFunctions.buildLongBloom(
      fpE.select(xxhash64(col("fp_hash")).as("h")), col("h"),
      fpE.count(), 0.01)
    val present = fpE.select("_sh").distinct().collect()
      .map(_.getLong(0)).toSet
    val perShard = graft.operators.Parallel.shards(n) { i =>
      if (!present(i.toLong)) None
      else Some(winnowSharedRows(
        spark.read.parquet(winnowShardPath(root, i)),
        fpE.filter(col("_sh") === i).drop("_sh"), dfCap,
        prune = true, preBloom = Some(bloom)))
    }.flatten
    if (perShard.isEmpty)
      // no routed hashes at all (empty or all-fresh increment): an
      // empty result with the probe's schema
      return fpE.select(col("new_doc"), col("new_doc").as("old_doc"),
        lit(0L).as("n_shared")).limit(0)
    perShard.reduce(_ unionByName _)
      .groupBy("new_doc", "old_doc").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Routed append: the increment's fingerprints land in their hash
    * shards as new files — O(increment) work, untouched shards never
    * written. Replay-safe exactly as the monolithic append (doubled
    * rows collapse in the probe's post-prune distinct and fold away at
    * the next compact).
    */
  def appendWinnowIndexSharded(increment: org.apache.spark.sql.DataFrame,
      root: String): Unit = {
    val spark = increment.sparkSession
    recoverWinnowIndexSharded(spark, root)
    val (n, k, w) = winnowShardInfo(spark, root)
    val fp = winnowFingerprints(increment, k, w)
      .withColumn("_sh", winnowShardOf(n)).localCheckpoint(true)
    (0 until n).foreach { i =>
      val slice = fp.filter(col("_sh") === i).drop("_sh")
      if (!slice.isEmpty)
        slice.write.mode("append").parquet(winnowShardPath(root, i))
    }
  }

  private def winnowForgetIntentPath(root: String) = s"$root/_forget_intent"

  /** FORGET documents across the shards. A doc's fingerprints scatter
    * over EVERY shard (routing is by hash), so unlike the doc-routed
    * text federation the forget visits all n stores — each visit a
    * crash-durable 1/n-sized rewrite. Refuses UP FRONT if any shard
    * would empty (checking inside the loop would leave a partially-
    * forgotten federation behind the refusal).
    *
    * The loop itself spans n independent rewrites, so the id set is
    * persisted as a `_forget_intent` BEFORE the first rewrite (the
    * textIndexForget discipline): a crash mid-loop would otherwise
    * leave the doc silently HALF-forgotten — still probe-visible via
    * the untouched shards — with nothing to replay. Every mutation
    * verb (and [[recoverWinnowIndexSharded]]) replays a pending intent
    * first; the rewrites are anti-joins, so replaying completed shards
    * is a no-op. The intent is written only after the refusal checks
    * passed, so a replay never needs to re-decide.
    */
  def forgetWinnowIndexSharded(spark: org.apache.spark.sql.SparkSession,
      del: org.apache.spark.sql.DataFrame, root: String): Unit = {
    recoverWinnowIndexSharded(spark, root) // heal a predecessor's crash
    val (n, _, _) = winnowShardInfo(spark, root)
    val ids = del.select("doc_id").localCheckpoint(true)
    (0 until n).foreach { i =>
      graft.operators.StoreRewrite.recover(spark, winnowShardPath(root, i))
      val remaining = spark.read.parquet(winnowShardPath(root, i))
        .join(ids, Seq("doc_id"), "left_anti").count()
      require(remaining > 0,
        s"forgetWinnowIndexSharded: forgetting these ids would EMPTY " +
          s"shard $i of $n — rebuild with fewer shards instead")
    }
    graft.operators.StoreRewrite.atomicOverwrite(
      ids, winnowForgetIntentPath(root))
    completeWinnowForgetSharded(spark, root, n, ids)
  }

  /** The forget's shard rewrites + intent cleanup, shared verbatim by
    * the verb and the intent replay — idempotent end to end.
    */
  private def completeWinnowForgetSharded(
      spark: org.apache.spark.sql.SparkSession, root: String, n: Int,
      ids: org.apache.spark.sql.DataFrame): Unit = {
    (0 until n).foreach { i =>
      graft.operators.StoreRewrite.recover(spark, winnowShardPath(root, i))
      graft.operators.StoreRewrite.atomicOverwrite(
        spark.read.parquet(winnowShardPath(root, i))
          .join(ids, Seq("doc_id"), "left_anti"),
        winnowShardPath(root, i))
    }
    val ip = new org.apache.hadoop.fs.Path(winnowForgetIntentPath(root))
    ip.getFileSystem(spark.sessionState.newHadoopConf()).delete(ip, true)
  }

  /** Heal a crashed sharded forget: if a `_forget_intent` survives, the
    * forget's refusal checks had passed and some suffix of the shard
    * rewrites may be missing — replay them all (anti-joins, so
    * completed shards no-op) and clear the intent. Called by every
    * mutation verb before it touches the federation.
    */
  def recoverWinnowIndexSharded(spark: org.apache.spark.sql.SparkSession,
      root: String): Unit = {
    graft.operators.StoreRewrite.recover(spark, winnowForgetIntentPath(root))
    val ip = new org.apache.hadoop.fs.Path(winnowForgetIntentPath(root))
    val fs = ip.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(ip)) {
      val ids = spark.read.parquet(winnowForgetIntentPath(root))
        .localCheckpoint(true)
      val (n, _, _) = winnowShardInfo(spark, root)
      completeWinnowForgetSharded(spark, root, n, ids)
    }
  }

  /** Compact every shard — n independent 1/n-sized layout jobs (the
    * monolithic compact is one index-sized rewrite; a production
    * scheduler staggers these across maintenance windows).
    */
  def compactWinnowIndexSharded(spark: org.apache.spark.sql.SparkSession,
      root: String): Unit = {
    recoverWinnowIndexSharded(spark, root)
    val (n, _, _) = winnowShardInfo(spark, root)
    (0 until n).foreach(i => compactWinnowIndex(spark, winnowShardPath(root, i)))
  }

  /** Maintain the sharded winnow index from a VERSIONED-STORE revision
    * window — the last edge of the CDC bridge quadrangle (text q189,
    * vector q192, signature q193): a corpus revision bump propagates
    * into the fingerprint federation in O(delta + touched rewrites),
    * no caller diffing. Deleted keys run [[forgetWinnowIndexSharded]]
    * FIRST (physical removal; hash routing scatters a doc's
    * fingerprints over every shard, so — unlike the doc-routed
    * signature forget — this is n crash-durable 1/n-sized rewrites,
    * the documented trade for shard-local df-caps), then net-new docs
    * ride [[appendWinnowIndexSharded]]. Replay semantics are the
    * family's own: a replayed window's appends double fingerprint rows
    * HARMLESSLY (every probe `.distinct()`s before the df-cap and the
    * pair join, so results are computed over the (doc, hash) set;
    * compact folds the litter), and the forget of already-absent ids
    * removes nothing — so a replayed window leaves every PROBE result
    * unchanged, which is what ShardedWinnowSpec pins (alongside
    * probe-equality with a fresh sharded build of `read(toRev)`).
    */
  def maintainWinnowIndexShardedFromStore(
      spark: org.apache.spark.sql.SparkSession, storePath: String,
      rel: String, fromRev: Long, toRev: Long, root: String): Unit =
    graft.operators.CdcBridge.maintain(spark, storePath, rel, fromRev,
      toRev, "doc_id", Seq("doc_id", "text"),
      "maintainWinnowIndexShardedFromStore")(
      del => forgetWinnowIndexSharded(spark, del, root))(
      ins => appendWinnowIndexSharded(ins, root))

  /** SYNC the sharded winnow index with its versioned corpus store —
    * the family's bookkeeping-free sync verb (see
    * [[syncSignatureIndexShardedWithStore]]; same [[graft.operators.RevisionSync]]
    * checkpoint, same lag-never-lead crash rule). The winnow twist is
    * replay shape, not safety: a replayed window's appends DOUBLE
    * fingerprint rows harmlessly (probes compute over the (doc, hash)
    * set; compact folds the litter), so a crash-lagged marker costs
    * some store bytes until the next compact, never a wrong probe.
    */
  def syncWinnowIndexShardedWithStore(
      spark: org.apache.spark.sql.SparkSession, storePath: String,
      rel: String, root: String, nShards: Int = 3): Option[(Long, Long)] = {
    import graft.operators.{CdcBridge, VersionedStore}
    CdcBridge.sync(spark, storePath, root,
      "syncWinnowIndexShardedWithStore")({
      val rp = new org.apache.hadoop.fs.Path(winnowRouterPath(root))
      rp.getFileSystem(spark.sessionState.newHadoopConf()).exists(rp)
    })(cur =>
      buildWinnowIndexSharded(
        VersionedStore.read(spark, storePath, rel, Some(cur)), root,
        nShards))((from, to) =>
      maintainWinnowIndexShardedFromStore(
        spark, storePath, rel, from, to, root))
  }

  // ------------------------------------------------------------------
  // Sharded (federated) signature index — the near-dup twin of the
  // sharded winnow store, routed by DOC_ID (a doc owns exactly one
  // signature row, so doc routing puts each doc's whole record — and
  // its forget — in ONE shard; contrast the winnow index, where
  // hash routing makes the df-cap shard-local instead). Bucket-hotness
  // caps CANNOT be shard-local here (a band bucket's members scatter
  // across doc-routed shards), so the probe bloom-prunes each shard's
  // band rows independently — exact per bucket KEY, the q178 argument
  // — and runs ONE [[rejectFromBands]] over the union, where the
  // hot-bucket aggregation sees the increment-bounded survivors only.
  // ------------------------------------------------------------------

  private def sigShardPath(root: String, i: Int) = s"$root/shard-$i"
  private def sigRouterPath(root: String) = s"$root/router"
  private val sigTag = "minhash8x2"

  /** Read the sharded signature index's router — written LAST by
    * [[buildSignatureIndexSharded]] as the commit marker; the tag pins
    * the signature scheme (8 components over 2-shingles) so a probe
    * can never silently mix MinHash families.
    */
  def signatureShardCount(spark: org.apache.spark.sql.SparkSession,
      root: String): Int = {
    val rp = new org.apache.hadoop.fs.Path(sigRouterPath(root))
    require(rp.getFileSystem(spark.sessionState.newHadoopConf()).exists(rp),
      s"signatureShardCount: no router at $root — not a sharded signature " +
        "index, or an interrupted buildSignatureIndexSharded (the router " +
        "is written last); re-run the sharded build")
    // a manifest-protocol federation's router is itself a versioned
    // store — auto-detected, so every consumer serves both forms
    val r =
      if (graft.operators.VersionedStore
          .currentVersion(spark, sigRouterPath(root)).isDefined)
        graft.operators.VersionedStore
          .read(spark, sigRouterPath(root), "router").collect()
      else spark.read.parquet(sigRouterPath(root)).collect()
    require(r.length == 1,
      s"signatureShardCount: router at $root has ${r.length} rows — corrupt store")
    require(r(0).getAs[String]("sig_tag") == sigTag,
      s"signatureShardCount: store signature scheme " +
        s"'${r(0).getAs[String]("sig_tag")}' != '$sigTag'")
    r(0).getAs[Int]("n_shards")
  }

  /** Build the signature index as doc-routed shard stores plus a router
    * committed LAST. Signatures are computed ONCE; a rebuild un-commits
    * the router first so a crash mid-build refuses loudly everywhere.
    * Refuses empty shards (use fewer shards for a tiny corpus).
    */
  def buildSignatureIndexSharded(documents: org.apache.spark.sql.DataFrame,
      root: String, nShards: Int): Unit = {
    require(nShards >= 1,
      s"buildSignatureIndexSharded: nShards must be >= 1, got $nShards")
    val spark = documents.sparkSession
    val rp = new org.apache.hadoop.fs.Path(sigRouterPath(root))
    val fs = rp.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(rp)) fs.delete(rp, true) // un-commit before rebuild
    // drop every existing shard dir (see buildWinnowIndexSharded): a
    // rebuild with fewer shards must not orphan the higher-numbered
    // dirs and their forgotten documents' signature rows
    val rootP = new org.apache.hadoop.fs.Path(root)
    if (fs.exists(rootP))
      fs.listStatus(rootP).map(_.getPath)
        .filter(_.getName.startsWith("shard-"))
        .foreach(p => fs.delete(p, true))
    val sig = minhashSigs(documents)
      .withColumn("_sh", pmod(xxhash64(col("doc_id")), lit(nShards.toLong)))
      .localCheckpoint(true)
    val present = sig.select("_sh").distinct().collect()
      .map(_.getLong(0)).toSet
    val empty = (0L until nShards.toLong).filterNot(present)
    require(empty.isEmpty,
      s"buildSignatureIndexSharded: shard(s) ${empty.mkString(",")} of " +
        s"$nShards would be EMPTY for this corpus — use fewer shards")
    // r15 (guide §2.6): disjoint per-shard writes, overlapped (the
    // winnow sharded build's rationale); router commit after all.
    graft.operators.Parallel.shards(nShards) { i =>
      sig.filter(col("_sh") === i).drop("_sh")
        .write.mode("overwrite").parquet(sigShardPath(root, i))
    }
    import spark.implicits._
    graft.operators.StoreRewrite.atomicOverwrite(
      Seq((nShards, sigTag)).toDF("n_shards", "sig_tag").coalesce(1),
      sigRouterPath(root))
  }

  /** Federated bloom-pruned probe: the increment is signed ONCE, its
    * band-key bitset broadcast, and each shard's band rows are pruned
    * map-side inside its own scan (n independent store scans, no
    * cross-shard exchange to assemble the inputs); ONE
    * [[rejectFromBands]] then runs over the union — the hot-bucket
    * aggregation, candidate join, and scoring all see increment-bounded
    * rows. Exact by the q178 argument applied per shard: the bloom
    * predicate is a function of the bucket key alone, and a bucket's
    * members within a shard survive or die together, so the post-union
    * hot counts equal the unpruned federation's for every touchable
    * bucket. Row-identical to the monolithic pruned probe, spec-pinned.
    */
  def probeSignatureIndexSharded(spark: org.apache.spark.sql.SparkSession,
      increment: org.apache.spark.sql.DataFrame, root: String,
      bucketCap: Int = defaultBucketCap,
      threshold: Double = 0.5,
      maxCandidates: Long = defaultMaxCandidates): org.apache.spark.sql.DataFrame = {
    val n = signatureShardCount(spark, root)
    val newSig = minhashSigs(increment).localCheckpoint(true)
    val newBands = bandsFromSigs(newSig).localCheckpoint(true)
    val keyHash = xxhash64(col("band"), col("key"))
    // no distinct before the bloom build (duplicates set the same bits;
    // the raw-count sizing only oversizes) — one exchange-free aggregate
    // over the checkpointed bands, cached-block sizing count
    val bloom = graft.functions.BloomFunctions.buildLongBloom(
      newBands.select(keyHash.as("h")), col("h"), newBands.count(), 0.01)
    // ONE read per shard (footer job), shared by the sig union and the
    // band generator (the old shape read every shard twice), constructed
    // on the overlap pool (guide §2.6)
    val shardSigs = graft.operators.Parallel.shards(n)(
      i => spark.read.parquet(sigShardPath(root, i)))
    val oldSig = shardSigs.reduce(_ unionByName _)
    val oldBands = shardSigs
      .map(s => bandsFromSigs(s)
        .filter(graft.functions.BloomFunctions.mightContainLong(bloom, keyHash)))
      .reduce(_ unionByName _)
    rejectFromBands(oldBands, newBands, oldSig, newSig, bucketCap, threshold,
      maxCandidates)
  }

  /** Routed append: each admitted doc's signature row lands in its hash
    * shard as new files — O(increment), untouched shards never written.
    * Replay-safe: each touched shard's existing doc_ids left-anti the
    * slice before the write (the probe is shard-sized, not index-sized,
    * and only runs on shards the increment actually touches), so a
    * re-run batch — a crashed CDC window re-applied, a duplicated
    * ingest micro-batch — appends nothing.
    */
  def appendSignatureIndexSharded(increment: org.apache.spark.sql.DataFrame,
      root: String): Unit = {
    val spark = increment.sparkSession
    recoverSignatureIndexSharded(spark, root)
    val n = signatureShardCount(spark, root)
    val sig = minhashSigs(increment)
      .withColumn("_sh", pmod(xxhash64(col("doc_id")), lit(n.toLong)))
      .localCheckpoint(true)
    (0 until n).foreach { i =>
      val slice = sig.filter(col("_sh") === i).drop("_sh")
      if (!slice.isEmpty) {
        val existing = spark.read.parquet(sigShardPath(root, i))
          .select("doc_id").distinct()
        val fresh = slice.join(existing, Seq("doc_id"), "left_anti")
        if (!fresh.isEmpty)
          fresh.write.mode("append").parquet(sigShardPath(root, i))
      }
    }
  }

  /** Maintain the sharded signature index from a VERSIONED-STORE
    * revision window — the dedup twin of the text side's
    * `textIndexMaintainFromStore` (q189) and the vector side's
    * `VectorIndex.maintainFromStore` (q192): the corpus lives in a
    * [[graft.operators.VersionedStore]] and evolves only through its
    * manifest-committed verbs, and ONE call propagates any run of
    * append/delete revisions into the index in O(delta), no caller
    * diffing. Deleted keys run [[forgetSignatureIndexSharded]] FIRST —
    * for a near-dup index the right delete verb is PHYSICAL removal (a
    * gone document must stop matching future probes; there is no
    * statistics mask to hide behind), and doc routing makes it touch
    * only the owning shards. Net-new rows then ride the replay-safe
    * [[appendSignatureIndexSharded]]. Consistency with the store's
    * sticky-tombstone view is structural: `changes` nets any row whose
    * key is tombstoned at `toRev` out of its inserted side, so a
    * delete-then-reappend (or append-then-delete) window admits
    * nothing the store doesn't show — incremental-equals-full is
    * spec-pinned (the maintained shards are bit-equal to a fresh
    * sharded build of `read(toRev)`), and a replayed window changes
    * nothing (the forget of already-absent ids is a no-op, the append
    * is left-anti guarded).
    */
  def maintainSignatureIndexShardedFromStore(
      spark: org.apache.spark.sql.SparkSession, storePath: String,
      rel: String, fromRev: Long, toRev: Long, root: String): Unit =
    graft.operators.CdcBridge.maintain(spark, storePath, rel, fromRev,
      toRev, "doc_id", Seq("doc_id", "text"),
      "maintainSignatureIndexShardedFromStore")(
      del => forgetSignatureIndexSharded(spark, del, root))(
      ins => appendSignatureIndexSharded(ins, root))

  /** SYNC the sharded signature index with its versioned corpus store —
    * the bookkeeping-free form of
    * [[maintainSignatureIndexShardedFromStore]] (the text side's
    * `textIndexSyncWithStore` contract): the federation checkpoints the
    * last absorbed revision at its root ([[graft.operators.RevisionSync]]),
    * a first call against an empty root bootstraps the n-shard build
    * from `read(current)`, later calls absorb every pending
    * append/delete revision in one window, and a crash between
    * maintenance and marker bump replays harmlessly (left-anti-guarded
    * appends, no-op forgets of absent ids). `nShards` is consulted only
    * at bootstrap; afterwards the router rules.
    */
  def syncSignatureIndexShardedWithStore(
      spark: org.apache.spark.sql.SparkSession, storePath: String,
      rel: String, root: String, nShards: Int = 3): Option[(Long, Long)] = {
    import graft.operators.{CdcBridge, VersionedStore}
    CdcBridge.sync(spark, storePath, root,
      "syncSignatureIndexShardedWithStore")({
      val rp = new org.apache.hadoop.fs.Path(sigRouterPath(root))
      rp.getFileSystem(spark.sessionState.newHadoopConf()).exists(rp)
    })(cur =>
      buildSignatureIndexSharded(
        VersionedStore.read(spark, storePath, rel, Some(cur)), root,
        nShards))((from, to) =>
      maintainSignatureIndexShardedFromStore(
        spark, storePath, rel, from, to, root))
  }

  private def sigForgetIntentPath(root: String) = s"$root/_forget_intent"

  /** FORGET documents — routed to the OWNING shard only (doc routing
    * puts a doc's one signature row in exactly one store, so unlike
    * the hash-routed winnow forget this rewrites 1/n of the index,
    * and only for shards that actually hold doomed ids). Refuses up
    * front if any touched shard would empty. The touched set can still
    * span several shards, so — like the winnow forget — the id set is
    * persisted as a `_forget_intent` before the first rewrite and
    * replayed by every mutation verb ([[recoverSignatureIndexSharded]]):
    * a crash mid-loop never leaves a half-forgotten doc with nothing
    * to finish the job.
    */
  def forgetSignatureIndexSharded(spark: org.apache.spark.sql.SparkSession,
      del: org.apache.spark.sql.DataFrame, root: String): Unit = {
    recoverSignatureIndexSharded(spark, root)
    val n = signatureShardCount(spark, root)
    val ids = del.select(col("doc_id"))
      .withColumn("_sh", pmod(xxhash64(col("doc_id")), lit(n.toLong)))
      .localCheckpoint(true)
    val touched = (0 until n).filter(i => !ids.filter(col("_sh") === i).isEmpty)
    touched.foreach { i =>
      graft.operators.StoreRewrite.recover(spark, sigShardPath(root, i))
      val slice = ids.filter(col("_sh") === i).drop("_sh")
      val remaining = spark.read.parquet(sigShardPath(root, i))
        .join(slice, Seq("doc_id"), "left_anti").count()
      require(remaining > 0,
        s"forgetSignatureIndexSharded: forgetting these ids would EMPTY " +
          s"shard $i of $n — rebuild with fewer shards instead")
    }
    graft.operators.StoreRewrite.atomicOverwrite(
      ids.select("doc_id"), sigForgetIntentPath(root))
    completeSignatureForgetSharded(spark, root, n, ids)
  }

  /** The forget's routed rewrites + intent cleanup, shared by the verb
    * and the intent replay — idempotent (anti-joins; untouched shards
    * are never opened).
    */
  private def completeSignatureForgetSharded(
      spark: org.apache.spark.sql.SparkSession, root: String, n: Int,
      ids: org.apache.spark.sql.DataFrame): Unit = {
    val touched = (0 until n).filter(i => !ids.filter(col("_sh") === i).isEmpty)
    touched.foreach { i =>
      graft.operators.StoreRewrite.recover(spark, sigShardPath(root, i))
      val slice = ids.filter(col("_sh") === i).drop("_sh")
      graft.operators.StoreRewrite.atomicOverwrite(
        spark.read.parquet(sigShardPath(root, i))
          .join(slice, Seq("doc_id"), "left_anti"),
        sigShardPath(root, i))
    }
    val ip = new org.apache.hadoop.fs.Path(sigForgetIntentPath(root))
    ip.getFileSystem(spark.sessionState.newHadoopConf()).delete(ip, true)
  }

  /** Heal a crashed sharded forget from its persisted intent — the
    * winnow federation's recover contract on the doc-routed store.
    */
  def recoverSignatureIndexSharded(
      spark: org.apache.spark.sql.SparkSession, root: String): Unit = {
    graft.operators.StoreRewrite.recover(spark, sigForgetIntentPath(root))
    val ip = new org.apache.hadoop.fs.Path(sigForgetIntentPath(root))
    val fs = ip.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(ip)) {
      val n = signatureShardCount(spark, root)
      val ids = spark.read.parquet(sigForgetIntentPath(root))
        .select(col("doc_id"))
        .withColumn("_sh", pmod(xxhash64(col("doc_id")), lit(n.toLong)))
        .localCheckpoint(true)
      completeSignatureForgetSharded(spark, root, n, ids)
    }
  }

  /** Compact every shard — fold append litter (exact duplicate rows
    * from replayed appends collapse; the relation is unique on doc_id
    * per write) and restore one clustered file group per shard.
    */
  def compactSignatureIndexSharded(spark: org.apache.spark.sql.SparkSession,
      root: String): Unit = {
    recoverSignatureIndexSharded(spark, root)
    val n = signatureShardCount(spark, root)
    (0 until n).foreach { i =>
      graft.operators.StoreRewrite.recover(spark, sigShardPath(root, i))
      graft.operators.StoreRewrite.atomicOverwrite(
        spark.read.parquet(sigShardPath(root, i)).distinct()
          .repartition(col("doc_id"))
          .sortWithinPartitions("doc_id"),
        sigShardPath(root, i))
    }
  }

  // ------------------------------------------------------------------
  // MANIFEST-COMMITTED sharded signature federation — q191's layout on
  // the rename-free protocol: each shard is the q197 versioned store
  // and the router is itself a 1-relation versioned store, so the
  // whole federated build/append/forget is object-store-safe end to
  // end. The forget needs NO `_forget_intent`/recover machinery: a
  // routed forget is one idempotent manifest tombstone PUT per owning
  // shard — there are no torn rewrites to heal, a crash mid-loop
  // leaves only fully-forgotten and untouched shards, and replaying
  // the call (or the CDC window that carried it) completes the rest.
  // Probe/append/sync are the rename federation's exact shapes over
  // versioned reads; sticky-until-compact replaces immediate re-admit
  // exactly as in the monolithic q197 migration.
  // ------------------------------------------------------------------

  /** Build the versioned federation: signatures computed ONCE, each
    * doc-routed slice saved as an independent versioned store, the
    * versioned router committed LAST (its manifest PUT is the build's
    * commit marker — a crash mid-build leaves a router-less root every
    * verb refuses loudly).
    */
  def buildSignatureIndexShardedVersioned(
      documents: org.apache.spark.sql.DataFrame, root: String,
      nShards: Int): Unit = {
    require(nShards >= 1,
      s"buildSignatureIndexShardedVersioned: nShards must be >= 1, " +
        s"got $nShards")
    val spark = documents.sparkSession
    val rp = new org.apache.hadoop.fs.Path(sigRouterPath(root))
    val fs = rp.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(rp)) fs.delete(rp, true) // un-commit before rebuild
    val rootP = new org.apache.hadoop.fs.Path(root)
    if (fs.exists(rootP))
      fs.listStatus(rootP).map(_.getPath)
        .filter(_.getName.startsWith("shard-"))
        .foreach(p => fs.delete(p, true))
    val sig = minhashSigs(documents)
      .withColumn("_sh", pmod(xxhash64(col("doc_id")), lit(nShards.toLong)))
      .localCheckpoint(true)
    val present = sig.select("_sh").distinct().collect()
      .map(_.getLong(0)).toSet
    val empty = (0L until nShards.toLong).filterNot(present)
    require(empty.isEmpty,
      s"buildSignatureIndexShardedVersioned: shard(s) " +
        s"${empty.mkString(",")} of $nShards would be EMPTY for this " +
        "corpus — use fewer shards")
    // r15 (guide §2.6): disjoint per-shard PUTs, overlapped; router last.
    graft.operators.Parallel.shards(nShards) { i =>
      graft.operators.VersionedStore.save(
        Map("sig" -> sig.filter(col("_sh") === i).drop("_sh")),
        sigShardPath(root, i))
    }
    import spark.implicits._
    graft.operators.VersionedStore.save(
      Map("router" -> Seq((nShards, sigTag)).toDF("n_shards", "sig_tag")
        .coalesce(1)), sigRouterPath(root))
  }

  /** Federated bloom-pruned probe over versioned shards —
    * [[probeSignatureIndexSharded]]'s exact plan (per-shard map-side
    * band prune, ONE post-union reject so bucket caps stay global and
    * exact) with each shard's visible rows served through its manifest.
    */
  def probeSignatureIndexShardedVersioned(
      spark: org.apache.spark.sql.SparkSession,
      increment: org.apache.spark.sql.DataFrame, root: String,
      bucketCap: Int = defaultBucketCap,
      threshold: Double = 0.5,
      maxCandidates: Long = defaultMaxCandidates): org.apache.spark.sql.DataFrame = {
    val n = signatureShardCount(spark, root)
    val newSig = minhashSigs(increment).localCheckpoint(true)
    val newBands = bandsFromSigs(newSig).localCheckpoint(true)
    val keyHash = xxhash64(col("band"), col("key"))
    // no distinct before the bloom build (duplicates set the same bits;
    // the raw-count sizing only oversizes) — one exchange-free aggregate
    // over the checkpointed bands, cached-block sizing count
    val bloom = graft.functions.BloomFunctions.buildLongBloom(
      newBands.select(keyHash.as("h")), col("h"), newBands.count(), 0.01)
    // ONE manifest read per shard, shared by the sig union and the band
    // generator (the old shape read every shard's manifest twice),
    // constructed on the overlap pool (guide §2.6)
    val shardSigs = graft.operators.Parallel.shards(n)(
      i => graft.operators.VersionedStore
        .read(spark, sigShardPath(root, i), "sig"))
    val oldSig = shardSigs.reduce(_ unionByName _)
    val oldBands = shardSigs
      .map(s => bandsFromSigs(s)
        .filter(graft.functions.BloomFunctions.mightContainLong(bloom, keyHash)))
      .reduce(_ unionByName _)
    rejectFromBands(oldBands, newBands, oldSig, newSig, bucketCap, threshold,
      maxCandidates)
  }

  /** Routed append: each admitted doc's signature row lands in its hash
    * shard as a delta revision — O(increment), untouched shards never
    * committed; idempotent against each shard's VISIBLE doc_ids (so a
    * tombstoned id stays forgotten across a replayed append, the
    * protocol's sticky trade).
    */
  def appendSignatureIndexShardedVersioned(
      increment: org.apache.spark.sql.DataFrame, root: String): Unit = {
    val spark = increment.sparkSession
    val n = signatureShardCount(spark, root)
    val sig = minhashSigs(increment)
      .withColumn("_sh", pmod(xxhash64(col("doc_id")), lit(n.toLong)))
      .localCheckpoint(true)
    (0 until n).foreach { i =>
      val slice = sig.filter(col("_sh") === i).drop("_sh")
      if (!slice.isEmpty) {
        val existing = graft.operators.VersionedStore
          .read(spark, sigShardPath(root, i), "sig")
          .select("doc_id").distinct()
        val fresh = slice.join(existing, Seq("doc_id"), "left_anti")
          .localCheckpoint(true)
        if (!fresh.isEmpty)
          graft.operators.VersionedStore.append(Map("sig" -> fresh),
            sigShardPath(root, i))
      }
    }
  }

  /** FORGET — one manifest tombstone PUT per OWNING shard (doc routing
    * puts a doc's one row in exactly one store). Idempotent and
    * replay-completing; physical reclaim per shard at
    * [[graft.operators.VersionedStore.compact]].
    */
  def forgetSignatureIndexShardedVersioned(
      spark: org.apache.spark.sql.SparkSession,
      del: org.apache.spark.sql.DataFrame, root: String): Unit = {
    val n = signatureShardCount(spark, root)
    val ids = del.select(col("doc_id"))
      .withColumn("_sh", pmod(xxhash64(col("doc_id")), lit(n.toLong)))
      .localCheckpoint(true)
    (0 until n).foreach { i =>
      val slice = ids.filter(col("_sh") === i).select("doc_id")
      if (!slice.isEmpty)
        graft.operators.VersionedStore.delete(slice, "sig",
          sigShardPath(root, i))
    }
  }

  /** CDC maintenance — forgets routed first (tombstones), net-new rows
    * appended; per-shard commits, replay-idempotent end to end.
    */
  def maintainSignatureIndexShardedVersionedFromStore(
      spark: org.apache.spark.sql.SparkSession, storePath: String,
      rel: String, fromRev: Long, toRev: Long, root: String): Unit =
    graft.operators.CdcBridge.maintain(spark, storePath, rel, fromRev,
      toRev, "doc_id", Seq("doc_id", "text"),
      "maintainSignatureIndexShardedVersionedFromStore")(
      del => forgetSignatureIndexShardedVersioned(spark, del, root))(
      ins => appendSignatureIndexShardedVersioned(ins, root))

  /** One-verb sync of the versioned federation with its versioned
    * corpus — [[syncSignatureIndexShardedWithStore]]'s contract with
    * the versioned router as the existence witness.
    */
  def syncSignatureIndexShardedVersionedWithStore(
      spark: org.apache.spark.sql.SparkSession, storePath: String,
      rel: String, root: String, nShards: Int = 3,
      retain: Option[Int] = None): Option[(Long, Long)] =
    graft.operators.CdcBridge.sync(spark, storePath, root,
      "syncSignatureIndexShardedVersionedWithStore", retain,
      // retention sweeps the whole federation: every shard store plus
      // the router (evaluated after bootstrap, when the router exists)
      () => (0 until signatureShardCount(spark, root))
        .map(sigShardPath(root, _)) :+ sigRouterPath(root))(
      graft.operators.VersionedStore
        .currentVersion(spark, sigRouterPath(root)).isDefined)(
      cur => buildSignatureIndexShardedVersioned(
        graft.operators.VersionedStore.read(spark, storePath, rel,
          Some(cur)), root, nShards))(
      (from, to) => maintainSignatureIndexShardedVersionedFromStore(
        spark, storePath, rel, from, to, root))

  // ------------------------------------------------------------------
  // MANIFEST-COMMITTED sharded winnow federation — q188's hash-routed
  // layout on the rename-free protocol. A doc's fingerprints scatter
  // over EVERY shard, so the forget tombstones doc_ids on all n shards
  // — n idempotent PUTs replacing the rename federation's
  // `_forget_intent` + n crash-durable rewrites (nothing to heal, a
  // replayed call completes a crashed loop). Knobs ride in the
  // versioned router, exactly as the rename router carries them.
  // ------------------------------------------------------------------

  /** Build the versioned winnow federation: fingerprints computed ONCE
    * with (k, w), each hash slice saved as an independent versioned
    * store, the versioned (n, k, w) router committed LAST.
    */
  def buildWinnowIndexShardedVersioned(
      documents: org.apache.spark.sql.DataFrame, root: String,
      nShards: Int, k: Int = 4, w: Int = 5): Unit = {
    require(nShards >= 1,
      s"buildWinnowIndexShardedVersioned: nShards must be >= 1, got $nShards")
    val spark = documents.sparkSession
    val rp = new org.apache.hadoop.fs.Path(winnowRouterPath(root))
    val fs = rp.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(rp)) fs.delete(rp, true) // un-commit before rebuild
    val rootP = new org.apache.hadoop.fs.Path(root)
    if (fs.exists(rootP))
      fs.listStatus(rootP).map(_.getPath)
        .filter(_.getName.startsWith("shard-"))
        .foreach(p => fs.delete(p, true))
    val fp = winnowFingerprints(documents, k, w)
      .withColumn("_sh", winnowShardOf(nShards)).localCheckpoint(true)
    val present = fp.select("_sh").distinct().collect()
      .map(_.getLong(0)).toSet
    val empty = (0L until nShards.toLong).filterNot(present)
    require(empty.isEmpty,
      s"buildWinnowIndexShardedVersioned: shard(s) ${empty.mkString(",")} " +
        s"of $nShards would be EMPTY for this corpus — use fewer shards")
    // r15 (guide §2.6): disjoint per-shard PUTs, overlapped; router last.
    graft.operators.Parallel.shards(nShards) { i =>
      graft.operators.VersionedStore.save(
        Map("fp" -> fp.filter(col("_sh") === i).drop("_sh")
          .repartition(col("fp_hash"))
          .sortWithinPartitions("fp_hash", "doc_id", "fp_pos")),
        winnowShardPath(root, i))
    }
    import spark.implicits._
    graft.operators.VersionedStore.save(
      Map("router" -> Seq((nShards, k, w)).toDF("n_shards", "k", "w")
        .coalesce(1)), winnowRouterPath(root))
  }

  /** Federated probe over versioned shards —
    * [[probeWinnowIndexSharded]]'s exact plan (touched shards only,
    * shard-local EXACT df-caps by hash routing, one post-union pair
    * aggregation) with each shard served through its manifest.
    */
  def probeWinnowIndexShardedVersioned(
      spark: org.apache.spark.sql.SparkSession,
      increment: org.apache.spark.sql.DataFrame, root: String,
      dfCap: Int = 300, minShared: Int = 2): org.apache.spark.sql.DataFrame = {
    val (n, k, w) = winnowShardInfo(spark, root)
    val fpE = winnowFingerprints(increment, k, w)
      .select(col("doc_id").as("new_doc"), col("fp_hash")).distinct()
      .withColumn("_sh", winnowShardOf(n)).localCheckpoint(true)
    // one global bloom + one present-shard scan (the rename federation's
    // probe discipline): exact per shard because routing is by fp_hash
    val bloom = graft.functions.BloomFunctions.buildLongBloom(
      fpE.select(xxhash64(col("fp_hash")).as("h")), col("h"),
      fpE.count(), 0.01)
    val present = fpE.select("_sh").distinct().collect()
      .map(_.getLong(0)).toSet
    val perShard = graft.operators.Parallel.shards(n) { i =>
      if (!present(i.toLong)) None
      else Some(winnowSharedRows(
        graft.operators.VersionedStore.read(spark, winnowShardPath(root, i),
          "fp"), fpE.filter(col("_sh") === i).drop("_sh"), dfCap,
        prune = true, preBloom = Some(bloom)))
    }.flatten
    if (perShard.isEmpty)
      return fpE.select(col("new_doc"), col("new_doc").as("old_doc"),
        lit(0L).as("n_shared")).limit(0)
    perShard.reduce(_ unionByName _)
      .groupBy("new_doc", "old_doc").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Routed append: the increment's fingerprints land in their hash
    * shards as delta revisions — O(increment), untouched shards never
    * committed (replayed appends' doubled rows collapse in the probe's
    * post-prune distinct and fold away at compact, exactly as in the
    * rename federation).
    */
  def appendWinnowIndexShardedVersioned(
      increment: org.apache.spark.sql.DataFrame, root: String): Unit = {
    val spark = increment.sparkSession
    val (n, k, w) = winnowShardInfo(spark, root)
    val fp = winnowFingerprints(increment, k, w)
      .withColumn("_sh", winnowShardOf(n)).localCheckpoint(true)
    (0 until n).foreach { i =>
      val slice = fp.filter(col("_sh") === i).drop("_sh")
        .localCheckpoint(true)
      if (!slice.isEmpty)
        graft.operators.VersionedStore.append(Map("fp" -> slice),
          winnowShardPath(root, i))
    }
  }

  /** FORGET — a doc's fingerprints scatter, so doc_id tombstones land
    * on ALL n shards: n idempotent manifest PUTs, no intent marker to
    * persist and nothing to heal (the rename federation's
    * `_forget_intent` exists because its n rewrites are destructive;
    * tombstones are not).
    */
  def forgetWinnowIndexShardedVersioned(
      spark: org.apache.spark.sql.SparkSession,
      del: org.apache.spark.sql.DataFrame, root: String): Unit = {
    val (n, _, _) = winnowShardInfo(spark, root)
    val ids = del.select(col("doc_id")).localCheckpoint(true)
    if (!ids.isEmpty)
      (0 until n).foreach { i =>
        graft.operators.VersionedStore.delete(ids, "fp",
          winnowShardPath(root, i))
      }
  }

  /** CDC maintenance + one-verb sync — the q194 bridge on the
    * versioned federation.
    */
  def maintainWinnowIndexShardedVersionedFromStore(
      spark: org.apache.spark.sql.SparkSession, storePath: String,
      rel: String, fromRev: Long, toRev: Long, root: String): Unit =
    graft.operators.CdcBridge.maintain(spark, storePath, rel, fromRev,
      toRev, "doc_id", Seq("doc_id", "text"),
      "maintainWinnowIndexShardedVersionedFromStore")(
      del => forgetWinnowIndexShardedVersioned(spark, del, root))(
      ins => appendWinnowIndexShardedVersioned(ins, root))

  def syncWinnowIndexShardedVersionedWithStore(
      spark: org.apache.spark.sql.SparkSession, storePath: String,
      rel: String, root: String, nShards: Int = 3, k: Int = 4,
      w: Int = 5, retain: Option[Int] = None): Option[(Long, Long)] =
    graft.operators.CdcBridge.sync(spark, storePath, root,
      "syncWinnowIndexShardedVersionedWithStore", retain,
      () => { val (n, _, _) = winnowShardInfo(spark, root)
        (0 until n).map(winnowShardPath(root, _)) :+
          winnowRouterPath(root) })(
      graft.operators.VersionedStore
        .currentVersion(spark, winnowRouterPath(root)).isDefined)(
      cur => buildWinnowIndexShardedVersioned(
        graft.operators.VersionedStore.read(spark, storePath, rel,
          Some(cur)), root, nShards, k, w))(
      (from, to) => maintainWinnowIndexShardedVersionedFromStore(
        spark, storePath, rel, from, to, root))

  /** q187: the daily exact-substring probe off the persisted fingerprint
    * index — q82's incremental shape for verbatim-overlap detection
    * (q186's pairing served from a store instead of re-fingerprinting the
    * corpus per audit). WinnowIndexSpec proves the probe plan's only file
    * scan is the index. The oracle recomputes both sides' fingerprints,
    * the stored-side cap, and the pair join.
    */
  private val q187 = QueryDef(
    "q187_winnow_index_probe",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      val inc = docs.filter(col("source") === "src19")
      val old = docs.filter(col("source") =!= "src19")
      val root = graft.BenchPhases.storeDir("graft-winx")
      val path = root + "/fp"
      graft.BenchPhases.build { buildWinnowIndex(old, path) }
      // minShared 1 keeps the probe guarantee-COMPLETE: every >= w+k-1
      // token verbatim overlap with a stored doc yields >= 1 shared
      // fingerprint (the winnowing guarantee), and the audit wants every
      // such hit — unlike q184's corpus-internal pair miner, which trades
      // the floor's completeness for precision at minShared = 2
      val res = probeWinnowIndex(s, inc, path, minShared = 1)
        .orderBy("new_doc", "old_doc").localCheckpoint(true)
      graft.BenchPhases.discard(s, root)
      res
    },
    Some(winnowProbeOracleSql))

  /** q188: the SAME probe served from the SHARDED index — build the
    * 3-shard federation in-query, probe it federated. Its oracle is
    * q187's SQL VERBATIM: sharding is a storage layout, never a
    * semantics change — the federated, bloom-pruned, shard-local-capped
    * probe must reproduce the monolithic from-scratch recomputation
    * row for row (ShardedWinnowSpec additionally pins it bit-equal to
    * the monolithic STORE probe).
    */
  private val q188 = QueryDef(
    "q188_winnow_sharded_probe",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      val inc = docs.filter(col("source") === "src19")
      val old = docs.filter(col("source") =!= "src19")
      if (old.isEmpty || inc.isEmpty)
        // the sharded build refuses an empty corpus (empty shards);
        // with either side empty the probe is vacuously empty
        inc.select(col("doc_id").as("new_doc"),
          col("doc_id").as("old_doc"), lit(0L).as("n_shared")).limit(0)
      else {
        val root = graft.BenchPhases.storeDir("graft-winshx")
        val store = root + "/winnow"
        graft.BenchPhases.build { buildWinnowIndexSharded(old, store, nShards = 3) }
        val res = probeWinnowIndexSharded(s, inc, store, minShared = 1)
          .orderBy("new_doc", "old_doc").localCheckpoint(true)
        graft.BenchPhases.discard(s, root)
        res
      }
    },
    Some(winnowProbeOracleSql))

  /** q210: q188's federated probe with every shard AND the router
    * manifest-committed — the hash-routed winnow federation on the
    * rename-free protocol (the all-shard forget becomes n idempotent
    * tombstone PUTs, retiring the `_forget_intent` machinery). Oracle
    * is q188's SQL VERBATIM.
    */
  private val q210 = QueryDef(
    "q210_versioned_winnow_sharded",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      val inc = docs.filter(col("source") === "src19")
      val old = docs.filter(col("source") =!= "src19")
      if (old.isEmpty || inc.isEmpty)
        inc.select(col("doc_id").as("new_doc"),
          col("doc_id").as("old_doc"), lit(0L).as("n_shared")).limit(0)
      else {
        val root = graft.BenchPhases.storeDir("graft-winshv")
        val store = root + "/winnow"
        graft.BenchPhases.build {
          buildWinnowIndexShardedVersioned(old, store, nShards = 3)
        }
        val res = probeWinnowIndexShardedVersioned(s, inc, store,
            minShared = 1)
          .orderBy("new_doc", "old_doc").localCheckpoint(true)
        graft.BenchPhases.discard(s, root)
        res
      }
    },
    Some(winnowProbeOracleSql))

  /** q194: the corpus lives in a VERSIONED STORE and the sharded winnow
    * index is maintained by CDC — the bridge quadrangle's last edge
    * (q189 text, q192 vector, q193 signature), exercised exactly like
    * q193: bootstrap from the first revision, an append window that
    * admits the rest plus transient rows, then a delete window whose
    * forgets physically remove the transients from every shard (hash
    * routing scatters a doc's fingerprints — the documented contrast
    * to the doc-routed signature forget). The final visible corpus is
    * exactly the non-src19 documents, so the oracle is q187/q188's SQL
    * VERBATIM: CDC maintenance must be indistinguishable from a
    * from-scratch federation build (ShardedWinnowSpec pins
    * probe-equality with a fresh build of read(toRev) and window
    * replay safety too).
    */
  private val q194 = QueryDef(
    "q194_cdc_winnow_maintenance",
    (s, d) => {
      import graft.operators.VersionedStore
      val docs = Tables(s, d, "documents").select("doc_id", "text", "source")
      val inc = docs.filter(col("source") === "src19")
      val old = docs.filter(col("source") =!= "src19")
      if (old.isEmpty || inc.isEmpty)
        inc.select(col("doc_id").as("new_doc"),
          col("doc_id").as("old_doc"), lit(0L).as("n_shared")).limit(0)
      else {
        val tmp = graft.BenchPhases.storeDir("graft-cdcwin")
        val store = tmp + "/corpus"
        val root = tmp + "/winnow"
        graft.BenchPhases.build {
          val boot = old.filter(col("doc_id") % 3 =!= 1)
          val rest = old.filter(col("doc_id") % 3 === 1)
          val extras = old.filter(col("doc_id") % 7 === 0)
            .withColumn("doc_id", col("doc_id") + lit(10000000L))
          val r1 = VersionedStore.save(
            Map("docs" -> boot.select("doc_id", "text")), store)
          buildWinnowIndexSharded(
            VersionedStore.read(s, store, "docs", Some(r1)), root,
            nShards = 3)
          val r2 = VersionedStore.append(
            Map("docs" -> rest.select("doc_id", "text")
              .unionByName(extras.select("doc_id", "text"))), store)
          maintainWinnowIndexShardedFromStore(s, store, "docs", r1, r2, root)
          val r3 = VersionedStore.delete(
            extras.select("doc_id"), "docs", store)
          maintainWinnowIndexShardedFromStore(s, store, "docs", r2, r3, root)
        }
        val res = probeWinnowIndexSharded(s, inc, root, minShared = 1)
          .orderBy("new_doc", "old_doc").localCheckpoint(true)
        graft.BenchPhases.discard(s, tmp)
        res
      }
    },
    Some(winnowProbeOracleSql))

  /** Shared oracle of q187 and q188: the from-scratch winnow-probe
    * semantics (both sides fingerprinted, stored-side df-cap, pair
    * join at minShared = 1). The monolithic bloom-pruned store probe
    * AND the sharded federation must reproduce it row-for-row.
    */
  private lazy val winnowProbeOracleSql: String =
    s"""WITH toks AS (SELECT doc_id, source, $tokSql AS tk FROM documents),
                  grams AS (SELECT doc_id, source, len(tk) AS n_tok,
                                   CAST(i + 1 AS INT) AS pos,
                                   tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
                                     || ' ' || tk[i+4] AS gram
                            FROM toks, unnest(CASE WHEN len(tk) >= 4
                                                   THEN range(len(tk) - 3)
                                                   ELSE []::BIGINT[] END) u(i)),
                  keyed AS (SELECT doc_id, source, n_tok, pos,
                                   substring(md5(gram), 1, 16)
                                     || lpad(CAST(1000000000 - pos AS VARCHAR), 10, '0') AS wk
                            FROM grams),
                  wm AS (SELECT doc_id, source, n_tok, pos,
                                MIN(wk) OVER (PARTITION BY doc_id ORDER BY pos
                                              ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS wmin
                         FROM keyed),
                  sel AS (SELECT DISTINCT doc_id, source,
                                 substring(wmin, 1, 16) AS fp_hash
                          FROM wm WHERE pos <= n_tok - 4 - 5 + 2),
                  oldfp AS (SELECT doc_id AS old_doc, fp_hash FROM sel
                            WHERE source <> 'src19'),
                  hot AS (SELECT fp_hash FROM oldfp GROUP BY fp_hash
                          HAVING COUNT(*) > 300),
                  newfp AS (SELECT doc_id AS new_doc, fp_hash FROM sel
                            WHERE source = 'src19')
             SELECT n.new_doc, o.old_doc, COUNT(*) AS n_shared
             FROM oldfp o
             ANTI JOIN hot h ON o.fp_hash = h.fp_hash
             JOIN newfp n ON n.fp_hash = o.fp_hash
             GROUP BY n.new_doc, o.old_doc
             ORDER BY new_doc, old_doc"""

  /** q200: the daily exact-substring probe served from the
    * MANIFEST-COMMITTED winnow index — q197's signature template
    * applied to the fingerprint family, completing the commit-protocol
    * migration row for the monolithic dedup stores. The lifecycle runs
    * in-query (save the old corpus's fingerprints + the (k, w) knobs as
    * revision 1, probe the increment fingerprinted with the STORE's
    * recorded knobs) and the oracle is q187/q188's SQL at minShared=1
    * VERBATIM: swapping the commit protocol must change NOTHING about
    * what the probe reports.
    */
  private val q200 = QueryDef(
    "q200_versioned_winnow_probe",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      val inc = docs.filter(col("source") === "src19")
      val old = docs.filter(col("source") =!= "src19")
      if (old.isEmpty)
        inc.select(col("doc_id").as("new_doc"), col("doc_id").as("old_doc"),
          lit(0L).as("n_shared")).limit(0)
      else {
        val root = graft.BenchPhases.storeDir("graft-vwinx")
        val path = root + "/fp"
        graft.BenchPhases.build { buildWinnowIndexVersioned(old, path) }
        val res = probeWinnowIndexVersioned(s, inc, path, minShared = 1)
          .orderBy("new_doc", "old_doc").localCheckpoint(true)
        graft.BenchPhases.discard(s, root)
        res
      }
    },
    Some(winnowProbeOracleSql))

  override def defs: Seq[QueryDef] =
    Seq(q29, q30, q31, q32, q33, q34, q35, q72, q74, q75, q82, q96, q99, q133, q134,
      q103, q110, q124, q138, q139, q141, q145, q146, q178, q182, q183, q184, q185,
      q186, q187, q188, q191, q193, q194, q197, q200, q209, q210, q212,
      q215)
}
