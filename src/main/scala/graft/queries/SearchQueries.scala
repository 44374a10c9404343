package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Retrieval operators over the corpus: BM25 keyword search and
  * BM25×embedding hybrid ranking via reciprocal-rank fusion — the serving
  * twin of the dedup/ANN index-build operators (a training-data engine also
  * answers "which documents match this query", for corpus exploration and
  * retrieval-augmented pipelines).
  *
  * Scale design: ONE corpus scan. Per-document length and per-term tf are
  * array arithmetic over the token array (map-side, no token explode, no
  * per-doc aggregate shuffle); corpus statistics (N, total tokens, per-term
  * df) are ONE 1-row aggregate broadcast back; scoring is a map-side
  * projection over the rows matching at least one term. Nothing
  * corpus-sized is ever shuffled or joined — the only exchanges are the
  * 1-row stats funnel and the top-k. Ranking is over the matching set
  * only; the corpus never sorts globally.
  *
  * Cross-engine determinism: BM25 is computed in its log-free odds form —
  * idf = (N - df + 0.5)/(df + 0.5) without the usual ln() — because ln()
  * bit-patterns are libm-dependent (the q51 rationale). The per-term scores
  * are added in FIXED term order (one column per term, absent terms
  * contributing exactly 0.0), not by a floating-point aggregate whose
  * addition order the engine picks.
  */
object SearchQueries extends QueryModule {

  private val tokSql = "regexp_extract_all(lower(text), '[a-z0-9]+')"

  /** The fixed demo query. Any term set works; these hit the corpus. */
  private val terms = Seq("spark", "window", "hash")

  /** BM25 scores (k1=1.2, b=0.75, log-free idf) for documents matching at
    * least one query term: (doc_id, n_terms_hit, score). One corpus scan:
    * tf and dl are computed from the token array per row, the corpus
    * stats (N, Σdl, per-term df) are a single 1-row broadcast aggregate,
    * and the score is a map-side projection over matching rows.
    */
  def bm25Scores(docs: DataFrame, queryTerms: Seq[String] = terms): DataFrame = {
    val base = docs.select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id") +: size(col("tk")).as("dl") +:
        queryTerms.zipWithIndex.map { case (t, i) =>
          size(filter(col("tk"), x => x === lit(t))).as(s"tf$i")
        }: _*)
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("tot") +:
        queryTerms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i")): _*)
    base.filter(queryTerms.indices.map(i => col(s"tf$i") > 0).reduce(_ || _))
      .crossJoin(broadcast(stats))
      .select(bm25Projection(queryTerms): _*)
  }

  /** The ONE implementation of the scoring projection, shared by the
    * in-query scorer above and the persisted-index search below — the
    * two paths must stay bit-identical (double addition order is part
    * of the contract), so the expression tree exists exactly once.
    * Expects columns: doc_id, dl, tf0..tfN, n_docs, tot, df0..dfN.
    */
  private def bm25Projection(queryTerms: Seq[String]): Seq[Column] = {
    val avgdl = col("tot").cast("double") / col("n_docs").cast("double")
    def termScore(i: Int) = {
      val idf = (col("n_docs").cast("double") - col(s"df$i").cast("double") + lit(0.5)) /
        (col(s"df$i").cast("double") + lit(0.5))
      val tfd = col(s"tf$i").cast("double")
      val norm = (tfd * lit(2.2)) /
        (tfd + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl)))
      when(col(s"tf$i") > 0, idf * norm).otherwise(lit(0.0))
    }
    Seq(col("doc_id"),
      queryTerms.indices.map(i => (col(s"tf$i") > 0).cast("int"))
        .reduce(_ + _).as("n_terms_hit"),
      queryTerms.indices.map(termScore).reduce(_ + _).as("score"))
  }

  /** Shared oracle CTE chain ending in `bm(doc_id, n_terms_hit, score)` —
    * the q92 scorer, reused verbatim by q93's fusion oracle. Mirrors the
    * Spark single-scan shape: per-row tf/dl from the token list, one
    * stats row, map-side scoring.
    */
  private val bm25CteSql = bm25CteSqlFrom("documents")

  private def bm25CteSqlFrom(rel: String): String = {
    val tfDefs = terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(tk, x -> x = '$t')) AS tf$i"
    }.mkString(",\n                  ")
    val dfDefs = terms.indices.map(i =>
      s"CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
      .mkString(",\n                  ")
    def termScoreSql(i: Int) =
      s"""(CASE WHEN tf$i > 0 THEN
            ((CAST(n_docs AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5)
               / (CAST(df$i AS DOUBLE) + 0.5))
            * ((CAST(tf$i AS DOUBLE) * 2.2)
               / (CAST(tf$i AS DOUBLE) + 1.2 * (0.25 + 0.75
                    * (CAST(dl AS DOUBLE)
                       / (CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
          ELSE 0.0 END)"""
    s"""base AS (SELECT doc_id, len(tk) AS dl,
                  $tfDefs
                FROM (SELECT doc_id, $tokSql AS tk FROM $rel) t0),
        stats AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS tot,
                  $dfDefs
                  FROM base),
        bm AS (SELECT doc_id,
                 ${terms.indices.map(i => s"CAST(tf$i > 0 AS INT)").mkString(" + ")} AS n_terms_hit,
                 ${terms.indices.map(termScoreSql).mkString("\n                 + ")} AS score
               FROM base CROSS JOIN stats
               WHERE ${terms.indices.map(i => s"tf$i > 0").mkString(" OR ")})"""
  }

  /** BM25 top-20 for the fixed query-term set.
    *
    * Scale shape: the top-20 is `orderBy(...).limit(20)` — Catalyst plans
    * it as TakeOrderedAndProject (per-partition bounded heaps, parallel),
    * never a global sort or a match-list-sized single-partition rank
    * window (for common terms the match list is a large corpus
    * fraction). The rank column is then a window over the 20 survivors —
    * constant-sized regardless of corpus. Identical deterministic output
    * to rank-then-filter because the order is total (score, doc_id).
    */
  private val q92 = QueryDef(
    "q92_bm25_search",
    (s, d) => {
      val bm = bm25Scores(Tables(s, d, "documents"))
      bm.orderBy(col("score").desc, col("doc_id").asc).limit(20)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id").asc)))
        .select("rank", "doc_id", "n_terms_hit", "score")
        .orderBy("rank")
    },
    Some(s"""WITH $bm25CteSql
             SELECT rank, doc_id, n_terms_hit, score FROM (
               SELECT doc_id, n_terms_hit, score,
                      ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rank
               FROM bm) t
             WHERE rank <= 20 ORDER BY rank"""))

  /** Hybrid retrieval: BM25 rank fused with embedding-cosine rank by
    * reciprocal-rank fusion, rrf = 1/(60+r_bm25) + 1/(60+r_cos), both
    * sides genuine CANDIDATE lists: the sparse side is the BM25 top-30
    * (TakeOrdered heap, the q92 move), the dense side is the top-30 from
    * the q111 multi-table LSH ANN index — the composition a production
    * retrieval stack actually runs (ANN candidates fused with keyword
    * candidates), not a stand-in full-corpus exact rank. A document
    * missing from one list contributes only the other list's term — the
    * standard RRF convention. ANN recall vs the exact dense rank is the
    * measured q111 table (SCALING.md).
    *
    * Scale shape: nothing corpus-sized is ever ranked on one task — the
    * BM25 side bounds to 30 rows via TakeOrderedAndProject before its
    * rank window, the dense side's per-query candidate set is bounded by
    * L × bucket occupancy (lshMultiAnn's qid-partitioned window), and
    * the fusion join and final rrf rank run over ≤ 60 rows.
    */
  private val q93 = QueryDef(
    "q93_hybrid_rrf",
    (s, d) => {
      val bm = bm25Scores(Tables(s, d, "documents"))
        .orderBy(col("score").desc, col("doc_id").asc).limit(30)
        .select(col("doc_id"), row_number().over(
          Window.orderBy(col("score").desc, col("doc_id").asc)).as("bm25_rank"))
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val q = e.filter(col("vec_id") === 0)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val vr = SimilarityQueries.lshMultiAnn(e, q, topK = 30,
          excludeSelfMatches = true)
        .select(col("neighbor_id").as("vec_id"), col("rank").as("cos_rank"))
      bm.join(vr, col("doc_id") === col("vec_id"), "full_outer")
        .select(coalesce(col("doc_id"), col("vec_id")).as("id"),
          col("bm25_rank"), col("cos_rank"))
        .withColumn("rrf",
          coalesce(lit(1.0) / (lit(60.0) + col("bm25_rank").cast("double")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60.0) + col("cos_rank").cast("double")), lit(0.0)))
        .orderBy(col("rrf").desc, col("id").asc).limit(15)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("rrf").desc, col("id").asc)))
        .select("rank", "id", "bm25_rank", "cos_rank", "rrf")
        .orderBy("rank")
    },
    Some(s"""WITH $bm25CteSql,
                  br AS (SELECT doc_id, bm25_rank FROM (
                           SELECT doc_id,
                             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS bm25_rank
                           FROM bm) x WHERE bm25_rank <= 30),
                  e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                  mbk AS (${SimilarityQueries.multiBucketSql(4, 6)}),
                  ev AS (SELECT e.vec_id, v, tbl, bucket
                         FROM e JOIN mbk ON e.vec_id = mbk.vec_id),
                  qs AS (SELECT vec_id AS qid, v AS qv, tbl, bucket
                         FROM ev WHERE vec_id = 0),
                  cand AS (SELECT DISTINCT qid, ev.vec_id AS nid,
                                  ${SimilarityQueries.cosSqlShared("qv", "v")} AS sim
                           FROM ev JOIN qs ON ev.tbl = qs.tbl
                                          AND ev.bucket = qs.bucket
                                          AND qid <> ev.vec_id),
                  vr AS (SELECT nid AS vec_id, rn AS cos_rank FROM (
                           SELECT nid, ROW_NUMBER() OVER (PARTITION BY qid
                             ORDER BY sim DESC, nid ASC) AS rn
                           FROM cand) y WHERE rn <= 30),
                  fused AS (SELECT COALESCE(br.doc_id, vr.vec_id) AS id,
                              bm25_rank, cos_rank,
                              COALESCE(1.0 / (60.0 + CAST(bm25_rank AS DOUBLE)), 0.0)
                                + COALESCE(1.0 / (60.0 + CAST(cos_rank AS DOUBLE)), 0.0) AS rrf
                            FROM br FULL OUTER JOIN vr ON br.doc_id = vr.vec_id)
             SELECT rank, id, bm25_rank, cos_rank, rrf FROM (
               SELECT id, bm25_rank, cos_rank, rrf,
                      ROW_NUMBER() OVER (ORDER BY rrf DESC, id ASC) AS rank
               FROM fused) t
             WHERE rank <= 15 ORDER BY rank"""))

  /** RAG context assembly — the serving step after retrieval: the BM25
    * top-20 (q92's ranking verbatim) greedily packed into a 200-token
    * context window in rank order, reported as a per-candidate manifest
    * (rank, token cost, running total, included?). The drop-tail rule is
    * the standard greedy context builder: a candidate whose tokens would
    * overflow the budget is excluded but later (cheaper) candidates may
    * still fit — budget arithmetic is exact integers, so the manifest is
    * engine-exact. A pipeline reads this to know exactly WHICH retrieved
    * documents the generator saw and what each cost — the provenance a
    * RAG eval needs when attributing an answer to its context.
    *
    * Scale shape: everything after q92's TakeOrdered heap is
    * 20-row-bounded — the text join probes the corpus with the broadcast
    * candidate set (map-side), and the running sum + greedy flags are a
    * window over <= 20 rows. The greedy "skip the overflowing doc,
    * consider the next" rule needs iterated prefix sums in general; over
    * a rank-ordered candidate LIST it is the one-pass rule "include iff
    * my tokens fit the budget minus what prior INCLUDED docs consumed",
    * computed here as a 20-element aggregate fold (exact, bounded, the
    * SQL twin folds the same list in the same order).
    */
  private val q152 = QueryDef(
    "q152_rag_context_pack",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      packContext(bm25Scores(docs),
        docs.select(col("doc_id"),
          tokenCount(col("text")).cast("long").as("n_tokens")))
    },
    Some(ragPackSql))

  /** The packing oracle, shared VERBATIM by q152 and q175: the store-
    * served packer must reproduce the corpus-served manifest exactly
    * (dl == tokenCount by construction), so the two gates are the
    * same SQL.
    */
  private lazy val ragPackSql: String =
    s"""WITH $bm25CteSql,
                  top AS (SELECT doc_id, n_terms_hit, score,
                            ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rank
                          FROM bm ORDER BY score DESC, doc_id ASC LIMIT 20),
                  costed AS (SELECT rank, top.doc_id,
                               CAST(len($tokSql) AS BIGINT) AS n_tokens
                             FROM top JOIN documents ON top.doc_id = documents.doc_id),
                  lst AS (SELECT list(struct_pack(rank := rank,
                                                  n_tokens := n_tokens)
                                      ORDER BY rank) AS all20
                          FROM costed)
             SELECT rank, doc_id, n_tokens,
                    list_reduce(list_prepend(CAST(0 AS BIGINT),
                      list_transform(list_filter(all20, x -> x.rank <= rank),
                                     x -> x.n_tokens)),
                      (acc, t) -> CASE WHEN acc + t <= 200 THEN acc + t
                                       ELSE acc END) AS cum_tokens,
                    (list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(list_filter(all20, x -> x.rank < rank),
                                      x -> x.n_tokens)),
                       (acc, t) -> CASE WHEN acc + t <= 200 THEN acc + t
                                        ELSE acc END) + n_tokens) <= 200
                      AS included
             FROM costed CROSS JOIN lst
             ORDER BY rank"""

  /** The greedy context-packing fold, shared by q152 (corpus-served)
    * and q175 (store-served) — the two must stay row-identical, so the
    * manifest arithmetic exists exactly once. `bm` is any relation with
    * the q92 scorer's (doc_id, score) columns; `costs` supplies
    * (doc_id, n_tokens). Everything after the TakeOrdered top-20 is
    * 20-row-bounded; the greedy "skip the overflowing doc, consider the
    * next" rule is a 20-element aggregate fold (exact integers).
    */
  private def packContext(bm: DataFrame, costs: DataFrame): DataFrame = {
    val top = bm.orderBy(col("score").desc, col("doc_id").asc).limit(20)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)))
    val costed = top.join(costs, Seq("doc_id"))
    // greedy fold over the rank-ordered 20-element list: running total
    // counts INCLUDED docs only (an overflowing doc is skipped, later
    // cheaper docs may still fit) — aggregate() is a sequential fold,
    // exact and bounded
    val packed = costed
      .withColumn("all20", collect_list(struct(col("rank"), col("n_tokens")))
        .over(Window.orderBy(lit(1)).rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("cum_included",
        expr("""aggregate(
                  filter(array_sort(all20), x -> x.rank <= rank),
                  0L,
                  (acc, x) -> IF(acc + x.n_tokens <= 200L, acc + x.n_tokens, acc))"""))
      .withColumn("included",
        expr("""aggregate(
                  filter(array_sort(all20), x -> x.rank < rank),
                  0L,
                  (acc, x) -> IF(acc + x.n_tokens <= 200L, acc + x.n_tokens, acc))""")
          + col("n_tokens") <= lit(200L))
      .select(col("rank"), col("doc_id"), col("n_tokens"),
        col("cum_included").as("cum_tokens"), col("included"))
    packed.orderBy("rank")
  }

  /** Context packing served ENTIRELY from the persisted index: the
    * ranking reads term-pushed postings, and the token costs are the
    * store's OWN docstats.dl — by construction dl == tokenCount(text)
    * (the same tokenizer sized both), so the packer never touches the
    * corpus text. This is the retrieval stack's serving property: at
    * 100 TB the generator-facing query path runs off index relations
    * alone, and the manifest is row-identical to the corpus-served
    * packer (spec-pinned, and q175's oracle IS q152's SQL).
    */
  def textIndexPackContext(spark: SparkSession, path: String,
      queryTerms: Seq[String] = terms): DataFrame = {
    val (_, docstats) = textIndexLoad(spark, path)
    packContext(textIndexSearch(spark, path, queryTerms),
      docstats.select(col("doc_id"), col("dl").cast("long").as("n_tokens")))
  }

  /** MMR (maximal marginal relevance) diversification of retrieval
    * results — the redundancy cut between ranking and context assembly:
    * from the BM25 top-8, iteratively select 4 documents maximizing
    * λ·relevance − (1−λ)·max-cosine-to-already-selected (λ = 0.7), so
    * the context holds four DIFFERENT relevant documents instead of the
    * four most-relevant near-duplicates of one source. The classic
    * Carbonell–Goldstein greedy, exactly unrolled: 4 selection rounds
    * over an 8-candidate set, every argmax total-ordered (mmr DESC,
    * doc_id ASC), relevance and cosine both bit-identical cross-engine
    * (the q92/q36 disciplines), so the oracle lands on the same picks.
    *
    * Scale shape: everything after the TakeOrdered top-8 is bounded —
    * the candidate×candidate cosine table is 8×8 via a broadcast self
    * join on the candidate ids, each selection round is a ≤8-row
    * aggregate + a 1-row TakeOrdered, and the output is 4 rows. The
    * candidate count (not the corpus) is the only cost dial.
    */
  private val q154 = QueryDef(
    "q154_mmr_diversify",
    (s, d) => {
      val lam = 0.7
      // the demo ranks over the embedded sub-corpus (the synthetic
      // embeddings table is 500 vectors at every SF) — otherwise the
      // candidate→vector join starves the selection as documents grow
      val docs = Tables(s, d, "documents").filter(col("doc_id") < 500)
      val cand = bm25Scores(docs)
        .orderBy(col("score").desc, col("doc_id").asc).limit(8)
        .select(col("doc_id"), col("score").as("rel"))
        .join(Tables(s, d, "embeddings")
          .select(col("vec_id").as("doc_id"), asDouble(col("embedding")).as("v")),
          Seq("doc_id"))
        .localCheckpoint(true) // 8 rows; feeds the sim table + every round
      val sims = cand.select(col("doc_id").as("da"), col("v").as("va"))
        .join(broadcast(cand.select(col("doc_id").as("db"), col("v").as("vb"))),
          col("da") =!= col("db"))
        .select(col("da"), col("db"), cosine(col("va"), col("vb")).as("sim"))
        .localCheckpoint(true)
      var selected = cand.limit(0)
        .select(col("doc_id"), col("rel"), lit(0.0).as("max_sim_prior"),
          lit(0.0).as("mmr"), lit(0).as("sel_rank"))
      (1 to 4).foreach { k =>
        val remaining = cand.join(selected.select("doc_id"),
          Seq("doc_id"), "left_anti")
        val msim = remaining
          .join(sims, col("doc_id") === col("da"), "left")
          .join(selected.select(col("doc_id").as("sid")),
            col("db") === col("sid"), "left")
          .groupBy(col("doc_id"), col("rel"))
          .agg(coalesce(max(when(col("sid").isNotNull, col("sim"))), lit(0.0))
            .as("max_sim_prior"))
        val pick = msim
          .withColumn("mmr", lit(lam) * col("rel")
            - lit(1.0 - lam) * col("max_sim_prior"))
          .orderBy(col("mmr").desc, col("doc_id").asc).limit(1)
          .withColumn("sel_rank", lit(k))
          .select("doc_id", "rel", "max_sim_prior", "mmr", "sel_rank")
        selected = selected.unionByName(pick).localCheckpoint(true)
      }
      selected.select(col("sel_rank"), col("doc_id"), col("rel"),
          col("max_sim_prior"), col("mmr"))
        .orderBy("sel_rank")
    },
    Some {
      val rounds = (1 to 4).map { k =>
        val prev = s"sel${k - 1}"
        s"""m$k AS MATERIALIZED (
              SELECT c.doc_id, c.rel,
                     COALESCE(MAX(CASE WHEN p.doc_id IS NOT NULL
                                       THEN sims.sim END), 0.0)
                       AS max_sim_prior
              FROM cand c
              LEFT JOIN sims ON c.doc_id = sims.da
              LEFT JOIN $prev p ON sims.db = p.doc_id
              WHERE c.doc_id NOT IN (SELECT doc_id FROM $prev)
              GROUP BY c.doc_id, c.rel),
            pick$k AS MATERIALIZED (
              SELECT doc_id, rel, max_sim_prior,
                     0.7 * rel - 0.3 * max_sim_prior AS mmr, $k AS sel_rank
              FROM m$k
              ORDER BY 0.7 * rel - 0.3 * max_sim_prior DESC, doc_id ASC
              LIMIT 1),
            sel$k AS MATERIALIZED (
              SELECT * FROM $prev UNION ALL SELECT * FROM pick$k)"""
      }.mkString(",\n")
      s"""WITH ${bm25CteSqlFrom("(SELECT * FROM documents WHERE doc_id < 500)")},
              top8 AS (SELECT doc_id, score AS rel FROM bm
                       ORDER BY score DESC, doc_id ASC LIMIT 8),
              cand AS (SELECT top8.doc_id, rel,
                              CAST(embedding AS DOUBLE[]) AS v
                       FROM top8 JOIN embeddings
                         ON top8.doc_id = embeddings.vec_id),
              sims AS (SELECT a.doc_id AS da, b.doc_id AS db,
                              ${SimilarityQueries.cosSqlShared("a.v", "b.v")} AS sim
                       FROM cand a JOIN cand b ON a.doc_id <> b.doc_id),
              sel0 AS (SELECT doc_id, rel, 0.0 AS max_sim_prior,
                              0.0 AS mmr, 0 AS sel_rank
                       FROM cand WHERE FALSE),
              $rounds
         SELECT sel_rank, doc_id, rel, max_sim_prior, mmr
         FROM sel4 ORDER BY sel_rank"""
    })

  // ------------------------------------------------------------------
  // Persisted inverted (BM25) text index — the EIGHTH store family:
  // the text-retrieval twin of the seven vector stores. Build once,
  // search forever off the postings alone; append increments; delete
  // via the shared tombstone mask. At 100 TB the corpus is tokenized
  // ONCE at build; every query after that touches only the postings of
  // its own terms (predicate pushdown on the term column; at cluster
  // scale the postings store is written bucketed by term so a query
  // reads a few buckets, not the corpus).
  //
  // Store layout under <path>/:
  //   meta/      1 row: tokenizer tag, corpus stats, content stamps
  //   postings/  (term, doc_id, tf)
  //   docstats/  (doc_id, dl)   [dl = 0 rows kept: they count in avgdl]
  //   tombstones/ (shared IndexTombstones doc-id mask)
  //
  // Provenance: no per-row stamp — instead an ORDER-INSENSITIVE content
  // stamp (n, Σdl, Σ decimal(xxhash64(doc_id, dl))) computed over
  // docstats AND recomputed from postings (dl := Σtf per doc), both
  // checked against meta at load. This is strictly stronger than a
  // per-row fingerprint: a spliced, truncated, or foreign postings set
  // cannot reproduce the docstats stamp, and the postings↔docstats
  // PAIRING itself is verified (the failure mode a per-row stamp
  // misses). The stamp is additive, so append updates meta in O(1)
  // driver arithmetic from the increment's stamp alone.
  // ------------------------------------------------------------------

  private val tokTag = "ti1:tok=[a-z0-9]+:k1=1.2:b=0.75"

  private val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)

  /** (n_docs, Σdl, Σhash) over a (doc_id, dl) relation — the content
    * stamp. The hash sum is decimal(38,0): a plain long sum of 2⁶³-range
    * hashes overflows (and throws under ANSI) after a handful of rows.
    */
  private def presenceStamp(pairs: DataFrame): (Long, Long, java.math.BigInteger) = {
    val r = pairs.agg(
      count(lit(1)),
      coalesce(sum(col("dl").cast("long")), lit(0L)),
      coalesce(sum(xxhash64(col("doc_id"), col("dl").cast("long")).cast(dec38)),
        lit(0L).cast(dec38))).head()
    (r.getLong(0), r.getLong(1), r.getDecimal(2).toBigInteger)
  }

  private def stampFingerprint(n: Long, tot: Long, h: java.math.BigInteger): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(s"$tokTag:n=$n:tot=$tot:h=$h".getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Reconstruct (doc_id, dl) from postings (dl = Σtf) — covers exactly
    * the docs that HAVE postings, so it is compared against the dl>0
    * slice of docstats (a zero-token doc legitimately has no posting).
    */
  private def postingsPresence(postings: DataFrame): DataFrame =
    postings.groupBy("doc_id").agg(sum(col("tf").cast("long")).as("dl"))

  /** Reconstruct (doc_id, dl) from POSITIONAL postings (dl = row count:
    * every token occupies exactly one position) — by construction equal
    * to [[postingsPresence]] over the same corpus, so the positions
    * relation is verified against the SAME meta stamp (n_pos, tot_pos,
    * h_pos) as the tf postings: no new meta fields, and a spliced or
    * truncated positions store cannot reproduce it.
    */
  private def positionsPresence(positions: DataFrame): DataFrame =
    positions.groupBy("doc_id").agg(count(lit(1)).as("dl"))

  /** Does the store at `path` carry the positional relation? Directory
    * probe — the positions store is an OPT-IN layer of the text index
    * (≈ token-stream-sized: the standard index trade where persisting
    * positions buys candidates-sized phrase queries), and every
    * mutating verb maintains it exactly when present. The stamps
    * protect CONTENT; directory presence, like the store root itself,
    * is the deployment's to protect.
    */
  def textIndexHasPositions(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$path/positions")
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Tokenize the corpus into the two index relations:
    * postings(term, doc_id, tf) + docstats(doc_id, dl). The corpus text
    * is read twice here (once per relation); a production 100 TB build
    * persists the tokenized scan (or builds docstats from the postings
    * shuffle plus the zero-token remainder) — the harness keeps the
    * declarative form.
    */
  def textIndexBuild(docs: DataFrame): (DataFrame, DataFrame) = {
    val base = docs.select(col("doc_id"), tokens(col("text")).as("tk"))
    val docstats = base.select(col("doc_id"), size(col("tk")).as("dl"))
    val postings = base.select(col("doc_id"), explode(col("tk")).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).cast("int").as("tf"))
    (postings, docstats)
  }

  /** The 1-row meta relation in its one schema — every writer (save,
    * append, forget, recover) goes through here so a column added to the
    * stamp set cannot silently diverge between verbs.
    */
  private def metaDf(spark: SparkSession, n: Long, tot: Long,
      h: java.math.BigInteger, np: Long, totp: Long,
      hp: java.math.BigInteger): DataFrame = {
    import spark.implicits._
    Seq((tokTag, n, tot, h.toString, np, totp, hp.toString,
        stampFingerprint(n, tot, h)))
      .toDF("tag", "n_docs", "tot_dl", "h_all", "n_pos", "tot_pos", "h_pos", "fp")
      .coalesce(1)
  }

  /** Recompute meta from the stored relations and rewrite it atomically —
    * the shared tail of forget and recover (both rare verbs, so the
    * O(store) restamp buys a self-consistent meta over subtraction
    * bookkeeping).
    */
  private def restampMeta(spark: SparkSession, path: String): Unit = {
    val (n, tot, h) = presenceStamp(spark.read.parquet(s"$path/docstats"))
    val (np, totp, hp) = presenceStamp(
      postingsPresence(spark.read.parquet(s"$path/postings")))
    graft.operators.StoreRewrite.atomicOverwrite(
      metaDf(spark, n, tot, h, np, totp, hp), s"$path/meta")
  }

  /** Persist the index. Refuses an empty corpus (an empty store is
    * indistinguishable from an interrupted save) and refuses a
    * postings/docstats pair that don't describe the same corpus — a
    * mis-paired save would pass every later load check and search
    * wrongly forever. Every write goes through the crash-durable
    * [[graft.operators.StoreRewrite.atomicOverwrite]]: a re-save OVER a
    * live store that dies mid-write leaves the old relation intact (a
    * plain overwrite deletes the target before the new files commit —
    * the store would be destroyed with no recovery path). A crash
    * BETWEEN the three writes leaves a mixed-generation store that
    * fails at load via the pairing stamps — loud, never wrong scores.
    *
    * `positions` opts the store into the POSITIONAL layer (the 9th
    * store family's relation: (term, doc_id, pos), built by
    * [[positionalPostings]]) — phrase queries then serve term-pushed
    * from disk instead of re-tokenizing the corpus. A mis-paired
    * positions relation refuses here (its per-doc row counts must
    * reproduce the postings' token counts exactly); a save WITHOUT
    * positions removes any stale positions relation (full save is
    * authoritative — a leftover positions store would silently answer
    * phrase queries from a previous corpus).
    */
  def textIndexSave(postings: DataFrame, docstats: DataFrame, path: String,
      positions: Option[DataFrame] = None): Unit = {
    val (n, tot, h) = presenceStamp(docstats)
    require(n > 0,
      "textIndexSave: refusing to persist an EMPTY index — tokenize a " +
        "non-empty corpus first (an empty store would be rejected at load " +
        "as interrupted)")
    val (np, totp, hp) = presenceStamp(postingsPresence(postings))
    val (nz, totz, hz) = presenceStamp(docstats.filter(col("dl") > 0))
    require((np, totp, hp) == (nz, totz, hz),
      s"textIndexSave: postings describe ($np docs, $totp tokens) but " +
        s"docstats' dl>0 slice says ($nz docs, $totz tokens) — the two " +
        "relations are not the same corpus")
    positions.foreach { pos =>
      val (nq, totq, hq) = presenceStamp(positionsPresence(pos))
      require((nq, totq, hq) == (np, totp, hp),
        s"textIndexSave: positions describe ($nq docs, $totq tokens) but " +
          s"the postings say ($np docs, $totp tokens) — the positional " +
          "relation is not the same corpus")
    }
    val spark = postings.sparkSession
    // physical layout: range-cluster the term-keyed relations on
    // (term, doc_id) and sort within files, so every file carries a
    // contiguous term range and parquet min/max stats let a term-pushed
    // query SKIP whole files/row groups — the "term-bucketed files at
    // cluster scale" the query-path scaladocs rely on, made real at
    // save time. Range partitioning (not hash) keeps a stopword's run
    // split across at most adjacent files instead of funneling one
    // writer; the content stamps are order-insensitive, so layout is
    // free to change. Appends write unclustered increments — their
    // files still carry stats; the next full save re-clusters.
    graft.operators.StoreRewrite.atomicOverwrite(
      postings.repartitionByRange(col("term"), col("doc_id"))
        .sortWithinPartitions("term", "doc_id"),
      s"$path/postings")
    graft.operators.StoreRewrite.atomicOverwrite(docstats, s"$path/docstats")
    positions match {
      case Some(pos) =>
        graft.operators.StoreRewrite.atomicOverwrite(
          pos.repartitionByRange(col("term"), col("doc_id"), col("pos"))
            .sortWithinPartitions("term", "doc_id", "pos"),
          s"$path/positions")
      case None =>
        val pp = new org.apache.hadoop.fs.Path(s"$path/positions")
        val fs = pp.getFileSystem(spark.sessionState.newHadoopConf())
        if (fs.exists(pp)) fs.delete(pp, true)
    }
    graft.operators.StoreRewrite.atomicOverwrite(
      metaDf(spark, n, tot, h, np, totp, hp), s"$path/meta")
    // full save = compaction point: fresh stores are authoritative —
    // pending tombstones AND the derived champions relation (elected
    // from the superseded corpus) are both dropped; re-run
    // textIndexChampionsSave after a full save
    graft.operators.IndexTombstones.clear(spark, path)
    val cp = new org.apache.hadoop.fs.Path(championsPath(path))
    val cfs = cp.getFileSystem(spark.sessionState.newHadoopConf())
    if (cfs.exists(cp)) cfs.delete(cp, true)
  }

  /** Restore (postings, docstats), tombstone-masked. EVERY stamp is
    * recomputed from the stored rows and checked against meta — a
    * truncated write, a spliced postings set, a foreign docstats file,
    * or a hand-edited meta row all fail HERE, not as wrong scores.
    */
  def textIndexLoad(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val metaRows = spark.read.parquet(s"$path/meta").collect()
    require(metaRows.length == 1,
      s"textIndexLoad: meta store at $path/meta has ${metaRows.length} rows — " +
        "interrupted save or wrong path")
    val m = metaRows(0)
    require(m.getAs[String]("tag") == tokTag,
      s"textIndexLoad: store was built under tokenizer '${m.getAs[String]("tag")}' " +
        s"but this library tokenizes '$tokTag' — scores would silently disagree")
    val fpStored = m.getAs[String]("fp")
    val docstats = spark.read.parquet(s"$path/docstats")
    val postings = spark.read.parquet(s"$path/postings")
    val (n, tot, h) = presenceStamp(docstats)
    require(stampFingerprint(n, tot, h) == fpStored &&
      n == m.getAs[Long]("n_docs") && tot == m.getAs[Long]("tot_dl") &&
      h.toString == m.getAs[String]("h_all"),
      s"textIndexLoad: docstats at $path do not reproduce the meta stamp " +
        "(truncated/foreign/edited store)")
    val (np, totp, hp) = presenceStamp(postingsPresence(postings))
    require(np == m.getAs[Long]("n_pos") && totp == m.getAs[Long]("tot_pos") &&
      hp.toString == m.getAs[String]("h_pos"),
      s"textIndexLoad: postings at $path do not reproduce the meta stamp — " +
        "the postings/docstats pairing is broken (splice or partial append)")
    maskBoth(postings, docstats, path)
  }

  /** Tombstone-mask the (postings, docstats) pair with ONE read of the
    * store's tombstone set (two maskOn calls paid a parquet footer job
    * each for the same tiny relation).
    */
  private def maskBoth(postings: DataFrame, docstats: DataFrame,
      path: String): (DataFrame, DataFrame) =
    graft.operators.IndexTombstones
      .tombstoneSet(postings.sparkSession, path) match {
      case Some(t) =>
        (graft.operators.IndexTombstones.maskWith(postings, t, Seq("doc_id")),
          graft.operators.IndexTombstones.maskWith(docstats, t, Seq("doc_id")))
      case None => (postings, docstats)
    }

  /** Restore the positional relation (term, doc_id, pos), tombstone-
    * masked. Verified against the SAME meta stamp as the tf postings
    * (positions-per-doc == tokens-per-doc by construction), so a
    * truncated, spliced, or foreign positions store fails HERE — and a
    * store that was never saved with positions fails with the opt-in
    * hint rather than a bare missing-path read error.
    */
  def textIndexLoadPositions(spark: SparkSession, path: String): DataFrame = {
    val metaRows = spark.read.parquet(s"$path/meta").collect()
    require(metaRows.length == 1,
      s"textIndexLoadPositions: meta store at $path/meta has " +
        s"${metaRows.length} rows — interrupted save or wrong path")
    val m = metaRows(0)
    require(m.getAs[String]("tag") == tokTag,
      s"textIndexLoadPositions: store tokenizer '${m.getAs[String]("tag")}'" +
        s" != '$tokTag' — positions would not match this tokenization")
    require(textIndexHasPositions(spark, path),
      s"textIndexLoadPositions: the index at $path carries NO positional " +
        "relation — save it with positions (textIndexSave(..., " +
        "positions = Some(positionalPostings(docs)))) to serve phrase " +
        "queries from the store")
    val positions = spark.read.parquet(s"$path/positions")
    val (nq, totq, hq) = presenceStamp(positionsPresence(positions))
    require(nq == m.getAs[Long]("n_pos") && totq == m.getAs[Long]("tot_pos") &&
      hq.toString == m.getAs[String]("h_pos"),
      s"textIndexLoadPositions: positions at $path do not reproduce the " +
        "meta stamp (truncated/foreign/edited positions store)")
    graft.operators.IndexTombstones.maskOn(positions, path, Seq("doc_id"))
  }

  /** O(1) crash-intent marker: the mutating verbs create `_inflight`
    * before their first store write and clear it after their last, so
    * the ingest loop can ask "did the previous run die mid-write?"
    * without the O(store) consistency scans [[textIndexRecover]] needs
    * — at 100 TB, re-deriving the postings presence before EVERY
    * micro-batch would dwarf the appends themselves.
    */
  def textIndexInflight(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_inflight")
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  private def setInflight(spark: SparkSession, path: String, on: Boolean): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_inflight")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (on) fs.create(p, true).close() else if (fs.exists(p)) fs.delete(p, false)
  }

  /** APPEND an increment of new documents. Idempotent: already-indexed
    * doc_ids (probed against the RAW docstats, so tombstoned docs stay
    * deleted — forgetting survives ingest replay) are dropped before
    * tokenization. Meta is updated by ADDING the increment's stamp
    * (O(increment) work + one atomic 1-row rewrite); postings, then
    * docstats, then meta — a crash between the three leaves a store
    * that FAILS AT LOAD (the pairing stamps cannot match), never one
    * that searches wrongly, and [[textIndexRecover]] repairs it. The
    * `_inflight` marker brackets the writes so the loop knows whether
    * a recover pass is even needed.
    */
  def textIndexAppend(docsInc: DataFrame, path: String): Unit = {
    val spark = docsInc.sparkSession
    val metaRows = spark.read.parquet(s"$path/meta").collect()
    require(metaRows.length == 1, s"textIndexAppend: no index at $path")
    val m = metaRows(0)
    require(m.getAs[String]("tag") == tokTag,
      s"textIndexAppend: store tokenizer '${m.getAs[String]("tag")}' != '$tokTag'")
    val rawIds = spark.read.parquet(s"$path/docstats").select("doc_id")
    val fresh = docsInc.join(rawIds, Seq("doc_id"), "left_anti")
      .localCheckpoint(true) // increment-sized; read 4× below
    val (p2, d2) = textIndexBuild(fresh)
    val (ni, toti, hi) = presenceStamp(d2)
    if (ni == 0) return // pure replay: nothing new, stores untouched
    val (npi, totpi, hpi) = presenceStamp(postingsPresence(p2))
    setInflight(spark, path, on = true)
    // positions land FIRST: a crash after them leaves position rows for
    // docs absent from docstats — the same orphan signature as a
    // half-applied postings append, shed by the same recover rule
    if (textIndexHasPositions(spark, path))
      positionalPostings(fresh).write.mode("append").parquet(s"$path/positions")
    p2.write.mode("append").parquet(s"$path/postings")
    d2.write.mode("append").parquet(s"$path/docstats")
    graft.operators.StoreRewrite.atomicOverwrite(
      metaDf(spark,
        m.getAs[Long]("n_docs") + ni, m.getAs[Long]("tot_dl") + toti,
        new java.math.BigInteger(m.getAs[String]("h_all")).add(hi),
        m.getAs[Long]("n_pos") + npi, m.getAs[Long]("tot_pos") + totpi,
        new java.math.BigInteger(m.getAs[String]("h_pos")).add(hpi)),
      s"$path/meta")
    // champions maintenance LAST (derived data): re-elect only the
    // increment's terms. A crash before this rewrite leaves the lists
    // merely STALE for those terms — candidate-set approximation only,
    // scores stay exact — and since a replayed batch returns early
    // above, staleness persists until the next real append or a fresh
    // textIndexChampionsSave; never a wrong score, so recover does not
    // track champions.
    if (hasChampions(spark, path))
      reelectChampions(spark, path,
        p2.select("term").distinct().localCheckpoint(true), None)
    setInflight(spark, path, on = false)
  }

  /** DELETE documents: a tombstone append under the store, masked out
    * of BOTH relations at load (and the deleted docs leave the BM25
    * statistics too — searches behave as if the corpus never held
    * them). Sticky across replayed appends; a fresh save re-admits.
    */
  def textIndexDelete(ids: DataFrame, path: String): Unit =
    graft.operators.IndexTombstones.append(
      ids.select(col("doc_id").cast("long").as("vec_id")), path)

  /** Maintain the text index from a VERSIONED-STORE revision window —
    * the bridge between the manifest-committed corpus protocol
    * ([[graft.operators.VersionedStore]]) and this index family: a
    * corpus revision bump (any run of append/delete revisions)
    * propagates into the index in O(delta) with NO caller-side diffing.
    * [[graft.operators.VersionedStore.changes]] reads ONLY the window's
    * added dirs (the manifest delta IS the change log), the inserted
    * rows ride [[textIndexAppend]] (idempotent, crash-recovered), and
    * the window's deleted keys become index tombstones
    * ([[textIndexDelete]] — deleted docs leave results AND statistics
    * at load, physical reclaim deferred to the index compact, exactly
    * as the store defers it to its own). Incremental-equals-full: the
    * maintained index LOADS identically to a fresh build of
    * `read(toRev)` (q139's discipline, spec-pinned), because the
    * append admits exactly the net-new docs and the tombstone mask
    * removes exactly the doomed ones. Replay-safe end to end: a
    * re-run window re-appends nothing (the left-anti probe) and
    * re-tombstoning is idempotent.
    */
  def textIndexMaintainFromStore(spark: SparkSession, storePath: String,
      rel: String, fromRev: Long, toRev: Long, indexPath: String): Unit =
    graft.operators.CdcBridge.maintain(spark, storePath, rel, fromRev,
      toRev, "doc_id", Seq("doc_id", "text"), "textIndexMaintainFromStore")(
      del => textIndexDelete(del, indexPath))(
      ins => textIndexAppend(ins, indexPath))

  /** SYNC the text index with its versioned corpus store — the
    * bookkeeping-free form of [[textIndexMaintainFromStore]]: the index
    * carries its own revision checkpoint
    * ([[graft.operators.RevisionSync]], a `_synced_rev` relation inside
    * the index store), so ONE argumentless-in-spirit call absorbs
    * however many append/delete revisions landed since the last sync —
    * an ingest loop or cron job never tracks revision numbers, and two
    * operators can't double-apply a window by miscounting.
    *
    * First call against an EMPTY index path bootstraps: build from
    * `read(current)`, save, checkpoint at current. Later calls resolve
    * the window marker→current and run the bridge. Crash safety is the
    * marker's lag-never-lead rule: maintenance commits BEFORE the bump,
    * and the bridge is replay-safe end to end, so a crash between the
    * two re-applies the window harmlessly on the next sync. An index
    * that exists but carries no marker refuses (unknown provenance —
    * it may have been maintained by hand past any revision; syncing a
    * guessed window would double-apply or skip), as does a marker that
    * tracks a DIFFERENT store path or sits ahead of the store's current
    * revision (store rebuilt from scratch). A window that crosses a
    * full save or compact propagates the CDC refusal: delta sync
    * applies only across append/delete revisions — rebuild the index
    * (delete + re-sync) after a corpus-replacing revision.
    *
    * Returns the (fromRev, toRev) window it applied, None when already
    * current.
    */
  def textIndexSyncWithStore(spark: SparkSession, storePath: String,
      rel: String, idxPath: String): Option[(Long, Long)] = {
    import graft.operators.{CdcBridge, VersionedStore}
    CdcBridge.sync(spark, storePath, idxPath, "textIndexSyncWithStore")({
      val pp = new org.apache.hadoop.fs.Path(s"$idxPath/postings")
      pp.getFileSystem(spark.sessionState.newHadoopConf()).exists(pp)
    })({ cur =>
      val base = VersionedStore.read(spark, storePath, rel, Some(cur))
      val (p0, ds0) = textIndexBuild(base.select("doc_id", "text"))
      textIndexSave(p0, ds0, idxPath)
    })((from, to) =>
      textIndexMaintainFromStore(spark, storePath, rel, from, to, idxPath))
  }

  /** FORGET documents — the right-to-be-forgotten verb, distinct from
    * [[textIndexDelete]] exactly as in the vector families: delete is a
    * STICKY tombstone (cheap, survives replayed appends, content never
    * re-admits), forget is PHYSICAL removal after which a fresh copy of
    * the same document re-admits. Both relations are rewritten through
    * the crash-durable StoreRewrite; the meta stamps are recomputed
    * from the rewritten stores (forget is rare — the O(store) recompute
    * buys a self-consistent meta rather than subtraction bookkeeping);
    * the forgotten ids' OWN tombstones are removed last (their rows are
    * physically gone, so keeping the tombstone would silently block
    * re-admission forever) while every OTHER tombstone survives — the
    * rewritten stores still carry those docs' rows, so clearing the
    * whole set would resurrect previously deleted content. A crash
    * between the two store rewrites leaves a store that FAILS AT LOAD
    * (pairing stamps), the append contract's failure mode.
    *
    * The forget's id set is persisted BEFORE any store mutation
    * (`_forget_intent`, itself a crash-durable write, bracketed by the
    * `_inflight` marker so the ingest loop's O(1) probe sees the crash)
    * and removed only after the last step: a crash ANYWHERE inside the
    * verb — including after the meta rewrite, when the stores are
    * already mutually consistent and no pairing stamp fires — leaves
    * the intent on disk, and [[textIndexRecover]] replays the whole
    * forget from it (every step is idempotent). Without the intent,
    * that late-crash state is invisible: a previously
    * deleted-then-forgotten doc would keep its stale tombstone and a
    * re-submitted copy would silently never re-admit.
    */
  def textIndexForget(ids: DataFrame, path: String): Unit = {
    val spark = ids.sparkSession
    val del = ids.select(col("doc_id").cast("long").as("doc_id"))
      .distinct().localCheckpoint(true)
    // refuse BEFORE touching the stores — an all-forgotten index would
    // already have destroyed both relations by the time an after-the-
    // fact check fired
    val remaining = spark.read.parquet(s"$path/docstats")
      .join(del, Seq("doc_id"), "left_anti").count()
    require(remaining > 0,
      "textIndexForget: forgetting the ENTIRE corpus leaves an empty " +
        "store — delete the index directory instead")
    // `_inflight` FIRST, then the intent: the ingest loop's O(1) crash
    // probe is the inflight marker, so an intent that existed without it
    // (crash between the two writes in the old order) was invisible —
    // the forget replayed only at the next unrelated recover. With this
    // order a crash between the two recovers as a clean no-op (inflight
    // set, no intent, stores untouched) and every intent on disk is
    // guaranteed to be covered by the marker the loop actually polls.
    setInflight(spark, path, on = true)
    graft.operators.StoreRewrite.atomicOverwrite(del, s"$path/_forget_intent")
    completeForget(spark, path, del)
  }

  /** The forget's store mutations, shared verbatim by the verb and by
    * [[textIndexRecover]]'s intent replay — idempotent end to end:
    * shedding already-absent rows is a no-op, the meta restamp is
    * deterministic, and tombstone removal of absent ids does nothing.
    */
  private def completeForget(spark: SparkSession, path: String,
      del: DataFrame): Unit = {
    if (textIndexHasPositions(spark, path))
      graft.operators.StoreRewrite.atomicOverwrite(
        spark.read.parquet(s"$path/positions")
          .join(del, Seq("doc_id"), "left_anti"),
        s"$path/positions")
    graft.operators.StoreRewrite.atomicOverwrite(
      spark.read.parquet(s"$path/postings").join(del, Seq("doc_id"), "left_anti"),
      s"$path/postings")
    graft.operators.StoreRewrite.atomicOverwrite(
      spark.read.parquet(s"$path/docstats").join(del, Seq("doc_id"), "left_anti"),
      s"$path/docstats")
    restampMeta(spark, path)
    // champion lists that referenced a forgotten doc: shed the rows and
    // re-elect exactly those terms from the rewritten stores (derived
    // data, so a crash here only leaves lists short/stale — scores stay
    // exact; a replay whose champions were already shed re-elects
    // nothing and the next append or championsSave refreshes)
    if (hasChampions(spark, path)) {
      val touched = spark.read.parquet(championsPath(path))
        .join(del, Seq("doc_id"), "left_semi")
        .select("term").distinct().localCheckpoint(true)
      reelectChampions(spark, path, touched, Some(del))
    }
    graft.operators.IndexTombstones.remove(
      del.select(col("doc_id").as("vec_id")), path)
    val ip = new org.apache.hadoop.fs.Path(s"$path/_forget_intent")
    val fs = ip.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(ip)) fs.delete(ip, true)
    setInflight(spark, path, on = false)
  }

  /** Repair the store from a crash inside [[textIndexAppend]] or
    * [[textIndexForget]] — the recovery half of the streaming ingest
    * loop (TextIngest runs it before every batch). The two verbs'
    * write orders give every single-crash state a UNIQUE signature:
    *
    *  - postings carry docs absent from docstats → append crashed
    *    between its two store writes (postings land first). Repair:
    *    roll the orphan postings back — the store returns to the
    *    pre-append state and the replayed batch re-admits cleanly.
    *  - dl>0 docstats docs absent from postings → forget crashed
    *    between its two rewrites (postings shed first). Repair:
    *    finish the shed. (A mid-forget crash on a dl=0 doc is
    *    invisible here — the store is already consistent; re-running
    *    the forget completes the intent.)
    *  - stores mutually consistent but meta stale → append crashed
    *    after docstats, before the meta rewrite. Repair: recompute
    *    meta from the stores.
    *
    * Both directions inconsistent at once is not a single-crash state
    * and fails loudly (rebuild). Returns what it did, for logs.
    *
    * A persisted `_forget_intent` short-circuits the signature analysis:
    * the crashed verb is KNOWN to be a forget of exactly those ids, so
    * recover replays it wholesale (idempotent) — this is the only way to
    * heal the late-forget crash whose store state is fully consistent
    * (crash after the meta rewrite, before tombstone removal): no stamp
    * fires there, but the stale tombstones would silently block
    * re-admission forever.
    */
  def textIndexRecover(spark: SparkSession, path: String): String = {
    // champions ride the list too: a crash inside the champions
    // atomicOverwrite (during append/forget maintenance) between target
    // delete and tmp rename would otherwise leave hasChampions = false
    // forever — scores stay exact via the fallback recompute, but the
    // persisted lists are silently lost and the complete __rewrite_tmp
    // debris never reclaimed
    Seq("postings", "docstats", "meta", "positions", "champions",
        "_forget_intent")
      .foreach(s => graft.operators.StoreRewrite.recover(spark, s"$path/$s"))
    val ip = new org.apache.hadoop.fs.Path(s"$path/_forget_intent")
    if (ip.getFileSystem(spark.sessionState.newHadoopConf()).exists(ip)) {
      val del = spark.read.parquet(ip.toString).localCheckpoint(true)
      completeForget(spark, path, del)
      return "forget-replay"
    }
    val docstats = spark.read.parquet(s"$path/docstats")
    val postings = spark.read.parquet(s"$path/postings")
    val dsLive = docstats.filter(col("dl") > 0).select("doc_id")
    val pDocs = postings.select("doc_id").distinct()
    val extraP = pDocs.join(docstats.select("doc_id"), Seq("doc_id"), "left_anti").count()
    val extraD = dsLive.join(pDocs, Seq("doc_id"), "left_anti").count()
    require(extraP == 0 || extraD == 0,
      s"textIndexRecover: postings carry $extraP unknown docs AND docstats " +
        s"carry $extraD unposted docs — not a single-crash state; rebuild " +
        "the index from the corpus")
    var action = "none"
    if (extraP > 0) {
      graft.operators.StoreRewrite.atomicOverwrite(
        postings.join(docstats.select("doc_id"), Seq("doc_id"), "left_semi"),
        s"$path/postings")
      action = "append-rollback"
    } else if (extraD > 0) {
      graft.operators.StoreRewrite.atomicOverwrite(
        docstats.join(pDocs, Seq("doc_id"), "left_semi")
          .unionByName(docstats.filter(col("dl") === 0)),
        s"$path/docstats")
      action = "forget-finish"
    }
    val ds2 = spark.read.parquet(s"$path/docstats")
    // doc-id SET equality is not enough before re-stamping meta: a
    // doubled store (the same increment's rows appended twice by a
    // direct textIndexAppend retry after a crash) has consistent doc
    // sets but 2× tf/dl — blessing it with a recomputed meta would
    // convert a loudly-failing store into one that scores wrongly
    // forever. Docstats cannot double through any verb (the append
    // probe reads it first), so duplicate doc_ids there are a foreign
    // write: rebuild. Doubled postings ARE reachable and are exact
    // row duplicates of a relation unique on (term, doc_id), so
    // distinct() is a provably lossless repair; a dl mismatch that
    // distinct() cannot close is a genuine splice: rebuild.
    require(ds2.groupBy("doc_id").count().filter(col("count") > 1).isEmpty,
      s"textIndexRecover: docstats at $path carry duplicate doc_ids — " +
        "not a state any verb produces; rebuild the index from the corpus")
    def dlMismatch(p: DataFrame): Long =
      postingsPresence(p).withColumnRenamed("dl", "pdl")
        .join(ds2.filter(col("dl") > 0), "doc_id")
        .filter(col("pdl") =!= col("dl")).count()
    if (dlMismatch(spark.read.parquet(s"$path/postings")) > 0) {
      val deduped = spark.read.parquet(s"$path/postings")
        .distinct().localCheckpoint(true)
      require(dlMismatch(deduped) == 0,
        s"textIndexRecover: per-doc token counts at $path disagree between " +
          "postings and docstats even after duplicate-row removal — a " +
          "genuine splice; rebuild the index from the corpus")
      graft.operators.StoreRewrite.atomicOverwrite(deduped, s"$path/postings")
      action = if (action == "none") "postings-dedup" else s"$action+postings-dedup"
    }
    if (textIndexHasPositions(spark, path)) {
      // the positional layer repairs by the same two rules: docs unknown
      // to docstats are a half-applied append's residue (positions land
      // FIRST in the append order, so they can be orphaned alone) — shed;
      // a doubled direct-append retry is exact row duplicates of a
      // relation unique on (term, doc_id, pos) — distinct() is lossless;
      // any remaining stamp disagreement is a genuine splice: rebuild
      val orphans = spark.read.parquet(s"$path/positions")
        .select("doc_id").distinct()
        .join(ds2.select("doc_id"), Seq("doc_id"), "left_anti").count()
      if (orphans > 0) {
        graft.operators.StoreRewrite.atomicOverwrite(
          spark.read.parquet(s"$path/positions")
            .join(ds2.select("doc_id"), Seq("doc_id"), "left_semi"),
          s"$path/positions")
        action = if (action == "none") "positions-rollback"
          else s"$action+positions-rollback"
      }
      def posStamp(p: DataFrame) = presenceStamp(positionsPresence(p))
      val want = presenceStamp(ds2.filter(col("dl") > 0))
      if (posStamp(spark.read.parquet(s"$path/positions")) != want) {
        val deduped = spark.read.parquet(s"$path/positions")
          .distinct().localCheckpoint(true)
        require(posStamp(deduped) == want,
          s"textIndexRecover: positions at $path disagree with docstats " +
            "even after duplicate-row removal — a genuine splice; rebuild " +
            "the index from the corpus")
        graft.operators.StoreRewrite.atomicOverwrite(deduped, s"$path/positions")
        action = if (action == "none") "positions-dedup"
          else s"$action+positions-dedup"
      }
    }
    val p2 = spark.read.parquet(s"$path/postings")
    val (n, tot, h) = presenceStamp(ds2)
    require(n > 0, s"textIndexRecover: store at $path is empty after repair")
    val (np, totp, hp) = presenceStamp(postingsPresence(p2))
    val m = spark.read.parquet(s"$path/meta").collect()
    val metaOk = m.length == 1 &&
      m(0).getAs[Long]("n_docs") == n && m(0).getAs[Long]("tot_dl") == tot &&
      m(0).getAs[String]("h_all") == h.toString &&
      m(0).getAs[Long]("n_pos") == np && m(0).getAs[Long]("tot_pos") == totp &&
      m(0).getAs[String]("h_pos") == hp.toString
    if (!metaOk) {
      graft.operators.StoreRewrite.atomicOverwrite(
        metaDf(spark, n, tot, h, np, totp, hp), s"$path/meta")
      action = if (action == "none") "meta" else s"$action+meta"
    }
    setInflight(spark, path, on = false)
    action
  }

  /** COMPACT the store's physical layout — the maintenance verb that
    * restores what a fresh [[textIndexSave]] provides WITHOUT touching
    * the corpus. After a run of appends the term-keyed relations hold
    * one unclustered file group per increment (append writes its
    * increment as-is; only a full save re-clusters), so term-pushed
    * queries progressively stop skipping files and small files
    * accumulate — and at 100 TB the save route is unaffordable, since
    * it re-tokenizes the corpus just to restore layout. Compaction
    * reads ONLY the index itself: postings (and positions, when
    * present) are rewritten range-clustered on (term, …) exactly as
    * save lays them out, docstats' increment files are merged
    * doc-clustered (the append probe and stat joins then prune by
    * doc_id min/max), and the champion lists are re-elected in full,
    * clearing the append path's documented per-term staleness.
    *
    * Content is IDENTICAL before and after: tombstoned rows are kept
    * (delete stays sticky — physical removal remains [[textIndexForget]]'s
    * job) and the content stamps are order-insensitive, so meta needs
    * no rewrite. That is what makes the verb crash-safe with NO
    * inflight marker or intent file: each rewrite goes through the
    * crash-durable StoreRewrite, and every intermediate state — any
    * prefix of the steps applied — is a fully consistent, loadable,
    * identically-scoring store (spec-pinned per prefix). A crashed
    * compact needs no recovery; re-running it finishes the layout.
    * Refuses a store with an interrupted MUTATION (`_inflight`):
    * compacting crash debris would re-cluster garbage — run
    * [[textIndexRecover]] first.
    */
  def textIndexCompact(spark: SparkSession, path: String): Unit = {
    require(!textIndexInflight(spark, path),
      s"textIndexCompact: the store at $path has an interrupted mutation " +
        "(_inflight marker) — run textIndexRecover before compacting")
    textIndexLoad(spark, path) // stamp verification only: never bless debris
    compactSteps(spark, path).foreach(_._2())
  }

  /** The compact's rewrites as named steps, in order — factored so the
    * spec can execute every crash PREFIX and prove each one loads and
    * scores identically (the claim that licenses compact's marker-free
    * design). Champions last: the only derived relation.
    */
  private[graft] def compactSteps(spark: SparkSession,
      path: String): Seq[(String, () => Unit)] = {
    val positions =
      if (textIndexHasPositions(spark, path))
        Seq("positions" -> (() => graft.operators.StoreRewrite.atomicOverwrite(
          spark.read.parquet(s"$path/positions")
            .repartitionByRange(col("term"), col("doc_id"), col("pos"))
            .sortWithinPartitions("term", "doc_id", "pos"),
          s"$path/positions")))
      else Seq.empty
    val champions =
      if (hasChampions(spark, path))
        Seq("champions" -> (() => textIndexChampionsSave(spark, path,
          spark.read.parquet(championsPath(path)).select("m").head.getInt(0))))
      else Seq.empty
    positions ++ Seq(
      "postings" -> (() => graft.operators.StoreRewrite.atomicOverwrite(
        spark.read.parquet(s"$path/postings")
          .repartitionByRange(col("term"), col("doc_id"))
          .sortWithinPartitions("term", "doc_id"),
        s"$path/postings")),
      "docstats" -> (() => graft.operators.StoreRewrite.atomicOverwrite(
        spark.read.parquet(s"$path/docstats")
          .repartitionByRange(col("doc_id"))
          .sortWithinPartitions("doc_id"),
        s"$path/docstats"))) ++ champions
  }

  /** BM25 search off the PERSISTED index alone: postings are filtered
    * to the query terms (pushed into the parquet scan — the plan reads
    * term-matching row groups, and at cluster scale term-bucketed
    * files), pivoted to the q92 tf-column shape, joined to docstats
    * for lengths, and scored by the SAME shared projection as the
    * in-query scorer — bit-identical results by construction. Corpus
    * statistics come from the masked docstats (deleted docs vanish
    * from idf/avgdl, not just from results). The corpus text is never
    * touched.
    */
  def textIndexSearch(spark: SparkSession, path: String,
      queryTerms: Seq[String] = terms): DataFrame = {
    val (postings, docstats) = textIndexLoad(spark, path)
    scoreIndexed(postings, docstats, queryTerms)
  }

  /** The index-served scoring body, shared by the single-store search
    * above and the sharded federation below — the two must stay
    * bit-identical (same pivot, same stats aggregates, same shared
    * projection), so the plan exists exactly once.
    */
  private def scoreIndexed(postings: DataFrame, docstats: DataFrame,
      queryTerms: Seq[String]): DataFrame = {
    val matched = postings.filter(col("term").isin(queryTerms: _*))
    val pivoted = matched.groupBy("doc_id").agg(
      queryTerms.zipWithIndex.map { case (t, i) =>
        coalesce(max(when(col("term") === lit(t), col("tf"))), lit(0)).as(s"tf$i")
      }.head,
      queryTerms.zipWithIndex.drop(1).map { case (t, i) =>
        coalesce(max(when(col("term") === lit(t), col("tf"))), lit(0)).as(s"tf$i")
      }: _*)
      .join(docstats, "doc_id")
    val corpusStats = docstats.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"))
    // r14: per-term dfs come straight off the term-pushed postings scan —
    // one 1-row aggregate over `matched` instead of a second pivot+join
    // pass (exchange reuse covered only the pivot's INPUT, so the pivot
    // aggregate and the docstats join ran twice per search). Exact
    // because a served store holds ONE posting row per (term, doc):
    // builds emit one row per pair, the rename append is left-anti
    // guarded and replays return early, versioned mutations are
    // exactly-once manifest commits, orphans from a crashed append are
    // shed by recover before a load serves, and tombstone masks apply to
    // postings and docstats alike — so count(rows of term t) equals
    // count(docs with tf_t > 0), the df the pivot pass computed.
    val termStats = matched.agg(
      queryTerms.zipWithIndex.map { case (t, i) =>
        sum(when(col("term") === lit(t), 1L).otherwise(0L)).as(s"df$i")
      }.head,
      queryTerms.zipWithIndex.drop(1).map { case (t, i) =>
        sum(when(col("term") === lit(t), 1L).otherwise(0L)).as(s"df$i")
      }: _*)
    pivoted.crossJoin(broadcast(corpusStats)).crossJoin(broadcast(termStats))
      .select(bm25Projection(queryTerms): _*)
  }

  /** Per-term champion lists: the top-m postings of each term by the
    * term's EXACT BM25 contribution (idf × tf-norm — fully computable
    * at INDEX time, since df/avgdl are corpus statistics the index
    * already holds). The classic impact-ordered-index move: a query's
    * candidate set becomes ≤ m·|terms| docs however common the terms,
    * and the postings store can be physically laid out impact-ordered
    * so the top-m are the FIRST rows of each term's run. Champion
    * selection through the exact two-stage GroupTopK — a stopword's
    * corpus-sized posting list never funnels one window task.
    */
  def textIndexChampions(spark: SparkSession, path: String, m: Int): DataFrame = {
    val (postings, docstats) = textIndexLoad(spark, path)
    championsOf(postings, docstats, m)
  }

  private def championsPath(path: String) = s"$path/champions"

  private def hasChampions(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(championsPath(path))
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Elect and PERSIST the per-term champion lists at `path`/champions
    * (term, doc_id, tscore, rank, m) — the impact-ordered index heads
    * materialized at INDEX time, so [[textIndexChampionSearch]] reads
    * candidate sets straight off the store head instead of aggregating
    * the full postings per query (the stopword-killer was recomputed per
    * query before this verb existed). Election runs over the MASKED
    * store (a deleted doc is never a champion) with the exact per-term
    * impact arithmetic the in-query path uses — stored vs recomputed is
    * spec-pinned equal. [[textIndexAppend]] keeps the lists fresh by
    * re-electing ONLY the increment's terms (the knnReknit discipline);
    * untouched terms keep lists elected under the pre-append avgdl —
    * candidate-set staleness only, scores stay exact (spec-measured).
    * A full [[textIndexSave]] removes the champions relation (fresh
    * saves are authoritative); re-run this verb after one.
    */
  def textIndexChampionsSave(spark: SparkSession, path: String, m: Int): Unit = {
    require(m >= 1, s"textIndexChampionsSave: m must be >= 1, got $m")
    val (postings, docstats) = textIndexLoad(spark, path)
    graft.operators.StoreRewrite.atomicOverwrite(
      championsOf(postings, docstats, m).withColumn("m", lit(m)),
      championsPath(path))
  }

  /** Re-elect `touchedTerms`' champion lists from the CURRENT stores
    * and splice them over the persisted relation — the shared tail of
    * the append and forget maintenance paths. One postings scan per
    * mutation (broadcast term-slice join; term-bucketed files prune it
    * at cluster scale), never one per query.
    */
  private def reelectChampions(spark: SparkSession, path: String,
      touchedTerms: DataFrame, dropDocs: Option[DataFrame]): Unit = {
    val posts = graft.operators.IndexTombstones.maskOn(
      spark.read.parquet(s"$path/postings"), path, Seq("doc_id"))
    val stats = graft.operators.IndexTombstones.maskOn(
      spark.read.parquet(s"$path/docstats"), path, Seq("doc_id"))
    reelectChampionsOn(spark, path, posts, stats, touchedTerms, dropDocs)
  }

  /** The election splice itself, parameterized on the (masked) postings
    * and docstats relations so the single-store verbs and the sharded
    * federation (whose relations are shard UNIONS) share one body —
    * the statistics the election runs under are whatever relations the
    * caller supplies, so the federated splice is automatically elected
    * under GLOBAL df/avgdl, the distributed-IR requirement.
    */
  private def reelectChampionsOn(spark: SparkSession, base: String,
      posts: DataFrame, stats: DataFrame,
      touchedTerms: DataFrame, dropDocs: Option[DataFrame]): Unit =
    graft.operators.StoreRewrite.atomicOverwrite(
      splicedChampions(spark.read.parquet(championsPath(base)),
        posts, stats, touchedTerms, dropDocs),
      championsPath(base))

  /** The splice itself as a RELATION (no write): fresh lists for the
    * touched terms elected from the supplied (post-mutation) postings
    * and docstats, untouched terms' lists kept (minus dropped docs).
    * Shared by the rename-family overwrite above and the versioned
    * family's replace-in-one-commit maintenance, so the election
    * algebra exists exactly once.
    */
  private def splicedChampions(champs0: DataFrame, posts: DataFrame,
      stats: DataFrame, touchedTerms: DataFrame,
      dropDocs: Option[DataFrame]): DataFrame = {
    val mStored = champs0.select("m").head.getInt(0)
    val slice = posts.join(broadcast(touchedTerms.select("term")), Seq("term"))
    val fresh = championsOf(slice, stats, mStored).withColumn("m", lit(mStored))
    val kept0 = champs0.join(touchedTerms.select("term"), Seq("term"), "left_anti")
    val kept = dropDocs.fold(kept0)(d =>
      kept0.join(d.select("doc_id"), Seq("doc_id"), "left_anti"))
    kept.select("term", "doc_id", "tscore", "rank", "m")
      .unionByName(fresh.select("term", "doc_id", "tscore", "rank", "m"))
  }

  private def championsOf(postings: DataFrame, docstats: DataFrame,
      m: Int): DataFrame = {
    val corpus = docstats.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"))
    val tdf = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = postings.join(docstats, "doc_id")
      .join(tdf, "term")
      .crossJoin(broadcast(corpus))
      .withColumn("idf",
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)))
      .withColumn("norm",
        (col("tf").cast("double") * lit(2.2)) /
          (col("tf").cast("double") + lit(1.2) * (lit(0.25) + lit(0.75) *
            (col("dl").cast("double") /
              (col("tot").cast("double") / col("n_docs").cast("double"))))))
      .withColumn("tscore", col("idf") * col("norm"))
    graft.operators.GroupTopK.topK(
      scored.select("term", "doc_id", "tscore"),
      Seq(col("term")), Seq(col("tscore").desc, col("doc_id").asc),
      col("doc_id"), m)
  }

  /** Champion-pruned BM25 search: candidates = the union of the query
    * terms' champion lists (≤ m·|terms| docs), then EXACT scoring of
    * the candidates — tf pivot restricted by doc_id (so every matched
    * term of a candidate still counts), statistics from the FULL
    * matched postings and docstats (so idf/avgdl are the true corpus
    * values). Scores of returned docs are therefore BIT-exact vs the
    * unpruned search; only the candidate SET is approximate (a doc
    * mediocre in every term but good in sum can be missed) — the
    * recall is measured in TextIndexSpec, the q148 discipline.
    */
  def textIndexChampionSearch(spark: SparkSession, path: String,
      queryTerms: Seq[String] = terms, m: Int = 50): DataFrame = {
    val (postings, docstats) = textIndexLoad(spark, path)
    val matched = postings.filter(col("term").isin(queryTerms: _*))
    // candidate set from the PERSISTED champion lists when the store
    // carries them at sufficient depth (term filter + rank cut pushed
    // into the champions scan — the per-query postings aggregation this
    // verb used to run exists only as the fallback for stores without
    // the relation or for a deeper m than was elected); tombstones are
    // masked so a deleted doc never re-enters via a stale list
    val cands =
      (if (hasChampions(spark, path) &&
          spark.read.parquet(championsPath(path)).select("m").head.getInt(0) >= m)
        graft.operators.IndexTombstones.maskOn(
            spark.read.parquet(championsPath(path)), path, Seq("doc_id"))
          .filter(col("term").isin(queryTerms: _*) && col("rank") <= m)
      else championsOf(matched, docstats, m)).select("doc_id").distinct()
    championScoreTail(matched, docstats, cands, queryTerms)
  }

  /** The champion search's exact-scoring tail — candidates restrict the
    * tf pivot, statistics come from the FULL matched postings and
    * docstats, so returned scores are bit-exact vs the unpruned search.
    * Shared by the single-store verb and the sharded federation (whose
    * matched/docstats are shard unions — counts and sums of longs, so
    * the federated statistics are exact, the scoreIndexed argument).
    */
  private def championScoreTail(matched: DataFrame, docstats: DataFrame,
      cands: DataFrame, queryTerms: Seq[String]): DataFrame = {
    val pivoted = matched.join(cands, "doc_id")
      .groupBy("doc_id").agg(
        queryTerms.zipWithIndex.map { case (t, i) =>
          coalesce(max(when(col("term") === lit(t), col("tf"))), lit(0)).as(s"tf$i")
        }.head,
        queryTerms.zipWithIndex.drop(1).map { case (t, i) =>
          coalesce(max(when(col("term") === lit(t), col("tf"))), lit(0)).as(s"tf$i")
        }: _*)
      .join(docstats, "doc_id")
    val corpusStats = docstats.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"))
    val termStats = matched.agg(
      queryTerms.zipWithIndex.map { case (t, i) =>
        sum(when(col("term") === lit(t), 1L).otherwise(0L)).as(s"df$i")
      }.head,
      queryTerms.zipWithIndex.drop(1).map { case (t, i) =>
        sum(when(col("term") === lit(t), 1L).otherwise(0L)).as(s"df$i")
      }: _*)
    pivoted.crossJoin(broadcast(corpusStats)).crossJoin(broadcast(termStats))
      .select(bm25Projection(queryTerms): _*)
  }

  /** Build a throwaway on-disk index from `docs`, run `search` against
    * it, EAGERLY materialize the (bounded) result, and delete the store
    * before returning — the in-query harness pattern of q163/q167. The
    * eager localCheckpoint is what licenses the delete: the returned
    * plan reads Spark-managed blocks, not the parquet we just removed.
    * Without the delete, every execution (bench runs each query n=3)
    * leaked a corpus-sized temp index. Driver-local temp is correct for
    * this HARNESS path only — the session runs local-mode; a cluster
    * deployment persists through the lifecycle verbs to a shared path.
    */
  private def withThrowawayIndex(docs: DataFrame,
      withPositions: Boolean = false, championM: Option[Int] = None)(
      search: String => DataFrame): DataFrame = {
    val root = graft.BenchPhases.storeDir("graft-ti")
    val path = root + "/idx"
    graft.BenchPhases.build {
      val (p, ds) = textIndexBuild(docs)
      textIndexSave(p, ds, path,
        if (withPositions) Some(positionalPostings(docs)) else None)
      championM.foreach(m =>
        textIndexChampionsSave(docs.sparkSession, path, m))
    }
    val res = search(path).localCheckpoint(true)
    graft.BenchPhases.discard(docs.sparkSession, root)
    res
  }

  /** The sharded twin of [[withThrowawayIndex]]: build once, save as
    * `n` shard stores, run `search` against the root, eagerly
    * materialize the (bounded) result, delete the whole tree.
    */
  private def withThrowawayShards(docs: DataFrame, n: Int)(
      search: String => DataFrame): DataFrame = {
    val tmp = graft.BenchPhases.storeDir("graft-tis")
    val root = tmp + "/idx"
    graft.BenchPhases.build {
      val (p, ds) = textIndexBuild(docs)
      textIndexSaveSharded(p, ds, root, n)
    }
    val res = search(root).localCheckpoint(true)
    graft.BenchPhases.discard(docs.sparkSession, tmp)
    res
  }

  /** q163: the q92 ranking served from the persisted inverted index —
    * build/save/load/search in-query (the q157 pattern), with the
    * ORACLE being q92's independent from-scratch SQL: the index path
    * must lose nothing and add nothing vs scoring the corpus directly.
    * TextIndexSpec carries the lifecycle (append/delete/splice/tamper).
    */
  private val q163 = QueryDef(
    "q163_bm25_indexed",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      if (docs.isEmpty)
        docs.select(lit(1).as("rank"), col("doc_id"),
          lit(1).as("n_terms_hit"), lit(0.0).as("score")).limit(0)
      else {
        val top = withThrowawayIndex(docs)(path =>
          textIndexSearch(s, path)
            .orderBy(col("score").desc, col("doc_id").asc).limit(20))
        top.withColumn("rank", row_number().over(
            Window.orderBy(col("score").desc, col("doc_id").asc)))
          .select("rank", "doc_id", "n_terms_hit", "score")
          .orderBy("rank")
      }
    },
    Some(s"""WITH $bm25CteSql
             SELECT rank, doc_id, n_terms_hit, score FROM (
               SELECT doc_id, n_terms_hit, score,
                      ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rank
               FROM bm) t
             WHERE rank <= 20 ORDER BY rank"""))

  /** The oracle twin of the champion selection: per term, the top-m
    * doc_ids by the exact per-term contribution (same arithmetic, same
    * association as the Spark side), UNION'd (distinct) — the SQL
    * statement of "impact-ordered index head".
    */
  private def championCteSql(m: Int): String = {
    def ts(i: Int) =
      s"""(((CAST(n_docs AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5)
            / (CAST(df$i AS DOUBLE) + 0.5))
          * ((CAST(tf$i AS DOUBLE) * 2.2)
             / (CAST(tf$i AS DOUBLE) + 1.2 * (0.25 + 0.75
                  * (CAST(dl AS DOUBLE)
                     / (CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE)))))))"""
    val unions = terms.indices.map { i =>
      s"""SELECT doc_id FROM (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY ${ts(i)} DESC, doc_id ASC) AS r
            FROM base CROSS JOIN stats WHERE tf$i > 0) c$i
          WHERE r <= $m"""
    }.mkString("\n UNION \n")
    s"cham AS ($unions)"
  }

  /** q167: champion-pruned BM25 (impact-ordered index search) — the
    * candidate set is the union of the query terms' top-50 champion
    * lists instead of EVERY matching doc; candidate scores stay exact
    * (TextIndexSpec pins score-equality and measures the recall).
    * Since r10 the champion lists are PERSISTED at index time
    * (textIndexChampionsSave) and the search reads candidates off the
    * store head — no per-query postings aggregation (plan-asserted in
    * TextIndexSpec). Scale point: for stopword-grade terms the
    * unpruned match set is a large corpus fraction; champions bound
    * the scoring set at m·|terms| REGARDLESS of df, and an
    * impact-ordered physical layout makes the champion read the first
    * rows of each term's run. The oracle reproduces selection AND
    * scoring independently.
    */
  private val q167 = QueryDef(
    "q167_bm25_champion",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      if (docs.isEmpty)
        docs.select(lit(1).as("rank"), col("doc_id"),
          lit(1).as("n_terms_hit"), lit(0.0).as("score")).limit(0)
      else {
        val top = withThrowawayIndex(docs, championM = Some(50))(path =>
          textIndexChampionSearch(s, path, terms, m = 50)
            .orderBy(col("score").desc, col("doc_id").asc).limit(20))
        top.withColumn("rank", row_number().over(
            Window.orderBy(col("score").desc, col("doc_id").asc)))
          .select("rank", "doc_id", "n_terms_hit", "score")
          .orderBy("rank")
      }
    },
    Some(championSearchOracleSql))

  /** Shared oracle of q167 and q190: champion-pruned BM25 top-20 with
    * the m=50 election recomputed from scratch in SQL. The monolithic
    * store-served search AND the sharded federation (root-level global
    * election) must reproduce it row-for-row.
    */
  private lazy val championSearchOracleSql: String =
    s"""WITH $bm25CteSql,
             ${championCteSql(50)}
             SELECT rank, doc_id, n_terms_hit, score FROM (
               SELECT bm.doc_id, n_terms_hit, score,
                      ROW_NUMBER() OVER (ORDER BY score DESC, bm.doc_id ASC) AS rank
               FROM bm JOIN cham ON bm.doc_id = cham.doc_id) t
             WHERE rank <= 20 ORDER BY rank"""

  /** q190: q167's champion search served from the SHARDED federation —
    * 3-shard build, ONE root-level election under the federation's
    * global statistics, search off the stored heads. The oracle is
    * q167's SQL verbatim: the federated champion layer must lose
    * nothing and add nothing vs the monolithic store (per-shard
    * elections under shard-local idf/avgdl would rank impact wrongly
    * across shards — the distributed-IR mistake the root relation
    * exists to avoid; ShardedIndexSpec pins list bit-equality too).
    */
  private val q190 = QueryDef(
    "q190_bm25_champion_sharded",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      if (docs.isEmpty)
        docs.select(lit(1).as("rank"), col("doc_id"),
          lit(1).as("n_terms_hit"), lit(0.0).as("score")).limit(0)
      else {
        val top = withThrowawayShards(docs, 3) { root =>
          graft.BenchPhases.build {
            textIndexChampionsSaveSharded(s, root, 50)
          }
          textIndexChampionSearchSharded(s, root, terms, m = 50)
            .orderBy(col("score").desc, col("doc_id").asc).limit(20)
        }
        top.withColumn("rank", row_number().over(
            Window.orderBy(col("score").desc, col("doc_id").asc)))
          .select("rank", "doc_id", "n_terms_hit", "score")
          .orderBy("rank")
      }
    },
    Some(championSearchOracleSql))

  /** The cross-doc / store-served phrase matcher q168's scaladoc
    * promises, for phrases of ANY length: given a positional postings
    * relation (term, doc_id, pos) — in production a persisted store
    * beside the tf postings — an n-word phrase is a chain of n−1
    * EQUALITY self-joins on (doc_id, pos + offset). Every join input
    * is pre-filtered to ONE term's postings (tiny next to the corpus;
    * term-pushed when the relation is a parquet store), so the work is
    * candidates-sized at any corpus size — never a token-stream scan
    * per query, which is exactly what the in-doc map-side form (q168)
    * must do. Output: (doc_id, pos) of each phrase START, one row per
    * occurrence. PhraseSpec proves equality with the map-side count.
    */
  def phraseMatches(positions: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseMatches: empty phrase")
    val first = positions.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos"))
    phrase.zipWithIndex.drop(1).foldLeft(first) { case (acc, (t, i)) =>
      acc.join(
        positions.filter(col("term") === t)
          .select(col("doc_id"), (col("pos") - i).as("pos")),
        Seq("doc_id", "pos"))
    }
  }

  /** Proximity (NEAR) matching over a positional postings relation:
    * anchor positions of `termA` that have an occurrence of `termB`
    * within `window` tokens (|posA − posB| ≤ window), one row per
    * qualifying ANCHOR position — the slop-query half of the
    * positional family (phrase = exact adjacency; NEAR = bounded
    * distance, the standard retrieval operator a bag-of-words index
    * cannot answer).
    *
    * Scale shape: the naive per-doc position join is quadratic for
    * common terms; instead positions are bucketed by `pos div window`
    * (integer div — the IntervalJoin discipline) and the anchor side
    * explodes into its bucket ± 1, so the pairing is ONE hash equality
    * semi-join on (doc_id, bucket) with the exact |Δpos| predicate
    * inside — every B within `window` of an A sits in one of A's three
    * buckets, each exploded A row meets a given bucket at most once,
    * and the LEFT SEMI keeps anchor rows (not pairs), so a term with
    * many nearby matches costs one surviving row. Both inputs are
    * single-term slices (term-pushed when the relation is the
    * persisted store). The final distinct dedupes anchors matched in
    * several of their three buckets.
    */
  def proximityMatches(positions: DataFrame, termA: String, termB: String,
      window: Int): DataFrame = {
    require(window >= 1, s"proximityMatches: window must be >= 1, got $window")
    require(termA != termB,
      "proximityMatches: termA == termB — every anchor matches itself at " +
        "distance 0; a same-term repetition query is a phrase/adjacency " +
        "question (phraseMatches)")
    // integer div, never double division (the IntervalJoin boundary
    // lesson); pos >= 0 so truncating div == floor
    val a = positions.filter(col("term") === termA)
      .select(col("doc_id"), col("pos"),
        explode(array(lit(-1L), lit(0L), lit(1L))).as("off"))
      .select(col("doc_id"), col("pos"),
        (expr(s"pos div $window") + col("off")).as("bk"))
    val b = positions.filter(col("term") === termB)
      .select(col("doc_id"), col("pos").as("pos_b"),
        expr(s"pos div $window").as("bk"))
    a.join(b,
        a("doc_id") === b("doc_id") && a("bk") === b("bk") &&
          abs(a("pos") - b("pos_b")) <= window,
        "left_semi")
      .select(col("doc_id"), col("pos")).distinct()
  }

  /** Positional postings from a corpus — the build-side of the phrase
    * store: one posexplode + nothing else (no aggregate: positions are
    * already unique per (doc_id, pos)). Persisting this beside the tf
    * postings is the standard index trade: ~token-stream-sized storage
    * buys candidates-sized phrase queries.
    */
  def positionalPostings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "term")))
      .select(col("term"), col("doc_id"), col("pos"))

  /** Phrase search served ENTIRELY from the persisted index — the 9th
    * store family's query path: load the positional relation (stamp-
    * verified, tombstone-masked) and run the [[phraseMatches]] equality-
    * join chain over it. Each term's filter pushes into the positions
    * parquet scan (plan-asserted in PhraseSpec), so an n-word phrase
    * reads n term-slices of the store — candidates-sized work at any
    * corpus size, the corpus text never touched. Output: (doc_id, pos)
    * of each phrase start.
    */
  def textIndexPhraseSearch(spark: SparkSession, path: String,
      phrase: Seq[String]): DataFrame =
    phraseMatches(textIndexLoadPositions(spark, path), phrase)

  /** Proximity search served from the persisted positional store — the
    * NEAR twin of [[textIndexPhraseSearch]]: two term-pushed slices of
    * the positions relation through the banded semi-join of
    * [[proximityMatches]]. Output: (doc_id, pos) of each qualifying
    * anchor (`termA`) position.
    */
  def textIndexProximitySearch(spark: SparkSession, path: String,
      termA: String, termB: String, window: Int): DataFrame =
    proximityMatches(textIndexLoadPositions(spark, path), termA, termB,
      window)

  // ------------------------------------------------------------------
  // MANIFEST-COMMITTED text index — the multi-relation migration off
  // the rename-based commit protocol (SCALING.md "commit-protocol
  // fork"; q197's signature store is the single-relation template).
  // The SAME relations — postings(term, doc_id, tf), docstats(doc_id,
  // dl), optional positions(term, doc_id, pos) and champions(term,
  // doc_id, tscore, rank, m) — live inside ONE
  // [[graft.operators.VersionedStore]], so every verb commits by one
  // small manifest PUT that spans ALL of them: a save lands postings
  // and docstats at the same instant (the rename family orders two
  // directory swaps and needs its integrity stamps to catch the torn
  // window), an append lands new postings/docstats/positions dirs AND
  // the re-elected champion heads in one revision
  // ([[graft.operators.VersionedStore.commitMixed]] — a reader can
  // never score candidates from heads elected under the previous
  // corpus statistics), and a delete tombstones every relation in one
  // revision. Object-store-safe end to end (no directory rename
  // anywhere), no recover verb exists or is needed, and time-travel
  // search comes free: every verb leaves the previous revision
  // readable, so `asOf` serves the index exactly as it stood — the
  // reproducibility primitive (re-run last week's retrieval under last
  // week's corpus statistics) that a rename-based store structurally
  // cannot offer.
  //
  // The rename family's cross-relation integrity stamps have no
  // equivalent here BY DESIGN: postings and docstats are computed from
  // one [[textIndexBuild]] pass inside the verb (consistent by
  // construction), dirs are immutable once committed, and a torn write
  // is invisible (the manifest referencing it was never PUT). The one
  // semantic trade is the family's usual: delete is a TOMBSTONE,
  // sticky for a re-appended SAME doc_id until
  // [[graft.operators.VersionedStore.compact]] folds it out.
  // ------------------------------------------------------------------

  private def versionedPostings(spark: SparkSession, path: String,
      asOf: Option[Long]): (DataFrame, DataFrame) =
    (graft.operators.VersionedStore.read(spark, path, "postings", asOf),
      graft.operators.VersionedStore.read(spark, path, "docstats", asOf))

  private def versionedHas(spark: SparkSession, path: String,
      rel: String, asOf: Option[Long] = None): Boolean =
    graft.operators.VersionedStore.relations(spark, path, asOf)
      .contains(rel)

  /** Build the manifest-committed text index: revision 1 commits the
    * corpus's postings + docstats (and positions when asked) in ONE
    * PUT. Postings are range-clustered on (term, doc_id) exactly like
    * the rename family's save, so a query term's rows sit in few
    * row-groups and the term filter prunes the scan.
    */
  def textIndexSaveVersioned(docs: DataFrame, path: String,
      withPositions: Boolean = false): Long = {
    val (postings, docstats) = textIndexBuild(docs)
    val rels = Map(
      "postings" -> postings.repartitionByRange(col("term"), col("doc_id")),
      "docstats" -> docstats) ++
      (if (withPositions)
        Map("positions" -> positionalPostings(docs)
          .repartitionByRange(col("term"), col("doc_id")))
      else Map.empty)
    graft.operators.VersionedStore.save(rels, path)
  }

  /** BM25 search over the manifest-committed index — [[scoreIndexed]]'s
    * exact plan (bit-identical to the rename-family search and the
    * sharded federation) over the store's visible relations; `asOf`
    * serves the index as of an earlier revision (time travel).
    */
  def textIndexSearchVersioned(spark: SparkSession, path: String,
      queryTerms: Seq[String] = terms,
      asOf: Option[Long] = None): DataFrame = {
    val (postings, docstats) = versionedPostings(spark, path, asOf)
    scoreIndexed(postings, docstats, queryTerms)
  }

  /** The shared mutation body: ONE mixed commit that appends the
    * increment's postings/docstats (and positions when the store
    * carries them), tombstones the doomed doc_ids across every data
    * relation, and swaps in champion lists re-elected for the touched
    * terms — all visible at the same instant. Every input frame
    * computes against the pre-commit revision (commitMixed's contract),
    * so the champion splice legitimately reads the relations it rides
    * with.
    */
  private def versionedTextMutation(spark: SparkSession, path: String,
      insDocs: Option[DataFrame], delIds: Option[DataFrame]): Long = {
    val hasPos = versionedHas(spark, path, "positions")
    val hasCh = versionedHas(spark, path, "champions")
    val delKeys = delIds.map(_.select("doc_id").localCheckpoint(true))
    val built = insDocs.map { docs =>
      val (p, ds) = textIndexBuild(docs)
      (p, ds, if (hasPos) Some(positionalPostings(docs)) else None)
    }
    val appends = built.map { case (p, ds, pos) =>
      Map("postings" -> p.repartitionByRange(col("term"), col("doc_id")),
        "docstats" -> ds) ++
        pos.map(r => "positions" ->
          r.repartitionByRange(col("term"), col("doc_id")))
    }.getOrElse(Map.empty[String, DataFrame])
    val deletes = delKeys.map { k =>
      Map("postings" -> k, "docstats" -> k) ++
        (if (hasPos) Map("positions" -> k) else Map.empty)
    }.getOrElse(Map.empty[String, DataFrame])
    val replaces =
      if (!hasCh) Map.empty[String, DataFrame]
      else {
        val (posts0, stats0) = versionedPostings(spark, path, None)
        // post-mutation relations, computed pre-commit
        val posts1 = delKeys.fold(posts0)(k =>
          posts0.join(k, Seq("doc_id"), "left_anti"))
          .unionByName(built.map(_._1.select("term", "doc_id", "tf"))
            .getOrElse(posts0.limit(0)))
        val stats1 = delKeys.fold(stats0)(k =>
          stats0.join(k, Seq("doc_id"), "left_anti"))
          .unionByName(built.map(_._2.select("doc_id", "dl"))
            .getOrElse(stats0.limit(0)))
        // terms touched by the increment or carried by the doomed docs
        val touched = built.map(_._1.select("term").distinct())
          .getOrElse(posts0.select("term").limit(0))
          .unionByName(delKeys.map(k =>
            posts0.join(k, Seq("doc_id")).select("term").distinct())
            .getOrElse(posts0.select("term").limit(0)))
          .distinct().localCheckpoint(true)
        Map("champions" -> splicedChampions(
          graft.operators.VersionedStore.read(spark, path, "champions"),
          posts1, stats1, touched, delKeys))
      }
    graft.operators.VersionedStore.commitMixed(appends, deletes, replaces,
      path)
  }

  /** Append an increment: delta dirs + the champion re-election (when
    * elected) in ONE manifest PUT; the existing relations' dirs are
    * referenced, never rewritten or read (O(increment) bytes).
    */
  def textIndexAppendVersioned(docsInc: DataFrame, path: String): Long =
    versionedTextMutation(docsInc.sparkSession, path, Some(docsInc), None)

  /** Delete documents: one revision tombstones every data relation and
    * swaps in champion lists with the doomed docs dropped and their
    * terms re-elected — a deleted doc can never resurface through a
    * stale champion head, and no reader sees a half-deleted index.
    */
  def textIndexDeleteVersioned(ids: DataFrame, path: String): Long =
    versionedTextMutation(ids.sparkSession, path, None, Some(ids))

  /** First champion election (or re-election at a new depth): the
    * heads relation is REPLACED in one revision; created if absent.
    */
  def textIndexChampionsSaveVersioned(spark: SparkSession, path: String,
      m: Int): Long = {
    require(m >= 1, s"textIndexChampionsSaveVersioned: m must be >= 1, got $m")
    val (postings, docstats) = versionedPostings(spark, path, None)
    graft.operators.VersionedStore.commitMixed(Map.empty, Map.empty,
      Map("champions" ->
        championsOf(postings, docstats, m).withColumn("m", lit(m))), path)
  }

  /** Champion-pruned search over the manifest-committed index — the
    * rename family's exact contract (candidates from the stored heads,
    * scoring BIT-exact from the full matched postings), with no
    * tombstone mask needed: deletion replaced the champions relation
    * atomically, so the stored heads are always consistent with the
    * revision's postings. `asOf` time-travels the WHOLE search,
    * candidate heads included.
    */
  def textIndexChampionSearchVersioned(spark: SparkSession, path: String,
      queryTerms: Seq[String] = terms, m: Int = 50,
      asOf: Option[Long] = None): DataFrame = {
    val (postings, docstats) = versionedPostings(spark, path, asOf)
    val matched = postings.filter(col("term").isin(queryTerms: _*))
    val cands =
      (if (versionedHas(spark, path, "champions", asOf) &&
          graft.operators.VersionedStore.read(spark, path, "champions", asOf)
            .select("m").head.getInt(0) >= m)
        graft.operators.VersionedStore.read(spark, path, "champions", asOf)
          .filter(col("term").isin(queryTerms: _*) && col("rank") <= m)
      else championsOf(matched, docstats, m)).select("doc_id").distinct()
    championScoreTail(matched, docstats, cands, queryTerms)
  }

  /** Phrase search over the manifest-committed positional relation —
    * [[phraseMatches]]' equality-join chain, term filters pushed into
    * the multi-dir scan; `asOf` time-travels it.
    */
  def textIndexPhraseSearchVersioned(spark: SparkSession, path: String,
      phrase: Seq[String], asOf: Option[Long] = None): DataFrame =
    phraseMatches(graft.operators.VersionedStore
      .read(spark, path, "positions", asOf), phrase)

  /** Proximity (NEAR) search over the manifest-committed positional
    * relation — [[proximityMatches]]' banded semi-join; `asOf`
    * time-travels it.
    */
  def textIndexProximitySearchVersioned(spark: SparkSession, path: String,
      termA: String, termB: String, window: Int,
      asOf: Option[Long] = None): DataFrame =
    proximityMatches(graft.operators.VersionedStore
      .read(spark, path, "positions", asOf), termA, termB, window)

  /** SYNC with the versioned corpus — [[textIndexSyncWithStore]]'s
    * contract on the rename-free form. The maintenance window lands as
    * ONE mixed commit ([[graft.operators.CdcBridge.maintainAtomic]]):
    * tombstones, the increment's relations, and the champion
    * re-election become visible at the same instant — the torn window
    * the rename family's deletes-first two-step briefly exposes cannot
    * exist here. The checkpoint lives beside `_versions`; no rewrite
    * verb exists that could orphan it.
    */
  def textIndexSyncVersionedWithStore(spark: SparkSession,
      storePath: String, rel: String, path: String,
      withPositions: Boolean = false,
      retain: Option[Int] = None): Option[(Long, Long)] =
    graft.operators.CdcBridge.sync(spark, storePath, path,
      "textIndexSyncVersionedWithStore", retain)(
      graft.operators.VersionedStore.currentVersion(spark, path).isDefined)(
      cur => textIndexSaveVersioned(
        graft.operators.VersionedStore.read(spark, storePath, rel,
          Some(cur)).select("doc_id", "text"), path, withPositions))(
      (from, to) =>
        graft.operators.CdcBridge.maintainAtomic(spark, storePath, rel,
          from, to, "doc_id", Seq("doc_id", "text"),
          "textIndexSyncVersionedWithStore") { (del, ins) =>
          versionedTextMutation(spark, path, ins, del)
          ()
        })

  /** MIGRATE a rename-protocol text index to the manifest-committed
    * form, in place of the full re-tokenize the versioned build would
    * cost: every relation is read through the family's VERIFYING loader
    * (stamp recompute and all — a torn or spliced source refuses here,
    * never lands in the target), pending tombstones are applied (the
    * versioned twin starts with a clean slate — masked content, no
    * carried sidecar), and ONE manifest PUT commits postings + docstats
    * (+ positions and champions when the source carries them) as
    * revision 1. At 100 TB this is an O(index) copy job — the raw
    * corpus is never touched, where a rebuild would re-tokenize it.
    * A CDC [[graft.operators.RevisionSync]] checkpoint migrates too, so
    * a synced index keeps syncing from the same corpus store after the
    * protocol switch; a bootstrap-sentinel marker (crashed bootstrap)
    * refuses. The in-flight intent marker refuses up front: a source
    * mid-mutation must be healed ([[textIndexRecover]]) before its
    * content can be called authoritative.
    */
  def migrateTextIndexToVersioned(spark: SparkSession, src: String,
      dst: String): Long = {
    require(!textIndexInflight(spark, src),
      s"migrateTextIndexToVersioned: index at $src has an _inflight " +
        "intent marker — a mutation died mid-write; run " +
        "textIndexRecover first, then migrate")
    require(graft.operators.VersionedStore
        .currentVersion(spark, dst).isEmpty,
      s"migrateTextIndexToVersioned: $dst already holds a versioned " +
        "store — refusing to commit a second lineage over it")
    val (postings, docstats) = textIndexLoad(spark, src)
    val rels = Map(
      "postings" -> postings.repartitionByRange(col("term"), col("doc_id")),
      "docstats" -> docstats) ++
      (if (textIndexHasPositions(spark, src))
        Map("positions" -> textIndexLoadPositions(spark, src)
          .repartitionByRange(col("term"), col("doc_id")))
      else Map.empty) ++
      (if (hasChampions(spark, src))
        // masked like the rename family's own champion search masks, so
        // the migrated candidate heads are EXACTLY the ones the source
        // store was serving
        Map("champions" -> graft.operators.IndexTombstones.maskOn(
          spark.read.parquet(championsPath(src)), src, Seq("doc_id")))
      else Map.empty)
    val rev = graft.operators.VersionedStore.save(rels, dst)
    graft.operators.RevisionSync.migrateMarker(spark, src, dst,
      "migrateTextIndexToVersioned")
    rev
  }

  // ------------------------------------------------------------------
  // Sharded (federated) index — the 100 TB shape of the store family.
  // A monolithic store stops being maintainable long before 100 TB:
  // every forget/compact rewrites the whole postings relation, and a
  // single build must tokenize the full corpus in one job. Sharding by
  // doc hash bounds every maintenance verb at 1/n of the corpus and
  // lets shards build/append/compact INDEPENDENTLY (per-source, per-day
  // ingest), while search federates them with EXACT global statistics —
  // BM25's idf/avgdl are corpus-level, so scoring each shard against
  // its own statistics would rank wrongly across shards (the classic
  // distributed-IR mistake). Here df/N/avgdl come from the UNION of the
  // shard stores (counts and sums of longs — order-insensitive, so
  // federation is exact, not approximate), and the result is spec-pinned
  // BIT-equal to a monolithic index over the same corpus.
  // ------------------------------------------------------------------

  private def shardPath(root: String, i: Int) = s"$root/shard-$i"
  private def routerPath(root: String) = s"$root/router"

  /** Union of the shards' RAW (unverified) tombstone-masked relations —
    * the maintenance-path read, mirroring the single-store reelect's
    * raw reads: a mutation verb must not pay the stamp-verify scans a
    * query-path load runs (the verbs it follows just wrote those
    * stamps).
    */
  private def federatedMaskedRaw(spark: SparkSession, root: String,
      n: Int): (DataFrame, DataFrame) = {
    // per-shard reads constructed on the overlap pool; the shard's
    // tombstone set is read ONCE and masks both relations
    val per = graft.operators.Parallel.shards(n) { i =>
      val sp = shardPath(root, i)
      (spark.read.parquet(s"$sp/postings"),
        spark.read.parquet(s"$sp/docstats"))
    }.zipWithIndex.map { case ((p, d), i) =>
      maskBoth(p, d, shardPath(root, i))
    }
    (per.map(_._1).reduce(_ unionByName _),
      per.map(_._2).reduce(_ unionByName _))
  }

  /** The routing column: which shard owns a doc_id. Deterministic pure
    * hash (xxhash64, the engine's standard), so routing needs no lookup
    * table and any writer routes identically forever.
    */
  private def shardOf(n: Int): Column =
    pmod(xxhash64(col("doc_id").cast("long")), lit(n.toLong))

  /** Read the router (shard count) of a sharded index, verifying the
    * tokenizer tag. The router is written LAST by [[textIndexSaveSharded]]
    * — it is the store's commit marker, so its absence means an
    * interrupted (or never-run) sharded save and every verb refuses
    * loudly here instead of federating a partial shard set silently.
    */
  def textIndexShardCount(spark: SparkSession, root: String): Int = {
    val rp = new org.apache.hadoop.fs.Path(routerPath(root))
    require(rp.getFileSystem(spark.sessionState.newHadoopConf()).exists(rp),
      s"textIndexShardCount: no router at $root — not a sharded index, or " +
        "an interrupted textIndexSaveSharded (the router is written last); " +
        "re-run the sharded save")
    // a manifest-protocol federation's router is itself a versioned
    // store — auto-detected, so every consumer serves both forms
    val r =
      if (graft.operators.VersionedStore
          .currentVersion(spark, routerPath(root)).isDefined)
        graft.operators.VersionedStore
          .read(spark, routerPath(root), "router").collect()
      else spark.read.parquet(routerPath(root)).collect()
    require(r.length == 1,
      s"textIndexShardCount: router at $root has ${r.length} rows — " +
        "corrupt sharded store")
    require(r(0).getAs[String]("tag") == tokTag,
      s"textIndexShardCount: sharded store tokenizer '${r(0).getAs[String]("tag")}'" +
        s" != '$tokTag' — scores would silently disagree")
    r(0).getAs[Int]("n_shards")
  }

  /** Persist the index as `nShards` INDEPENDENT stores under `root`
    * (shard-0 … shard-{n−1}), routed by doc hash, plus a 1-row router
    * relation written LAST as the commit marker. Each shard is a full
    * first-class store — its own meta stamps, tombstones, champions,
    * optional positions — so the ENTIRE single-store verb surface
    * (append/delete/forget/recover/compact/ingest) applies per shard,
    * and a maintenance job touches 1/n of the corpus. The input
    * relations are tokenized ONCE (checkpointed here; a production
    * build persists them — the build-once discipline) and each shard's
    * save reads only its hash slice. Refuses a shard that would be
    * EMPTY (textIndexSave's empty-store rule): use fewer shards for a
    * tiny corpus. A crash mid-save leaves no router — every later verb
    * refuses — and re-running the save completes it (each shard write
    * is the atomic single-store save).
    */
  def textIndexSaveSharded(postings: DataFrame, docstats: DataFrame,
      root: String, nShards: Int,
      positions: Option[DataFrame] = None): Unit = {
    require(nShards >= 1, s"textIndexSaveSharded: nShards must be >= 1, got $nShards")
    val spark = postings.sparkSession
    // un-commit FIRST, then drop every existing shard dir: a rebuild
    // must not leave a crashed half-rebuild readable under the OLD
    // router, and rebuilding with fewer shards must not orphan the
    // higher-numbered dirs (forgotten docs' rows would persist on disk
    // with no verb ever reading or reclaiming them)
    locally {
      val rp = new org.apache.hadoop.fs.Path(routerPath(root))
      val fs = rp.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(rp)) fs.delete(rp, true)
      val rootP = new org.apache.hadoop.fs.Path(root)
      if (fs.exists(rootP))
        fs.listStatus(rootP).map(_.getPath)
          .filter(_.getName.startsWith("shard-"))
          .foreach(p => fs.delete(p, true))
    }
    val d = docstats.withColumn("_sh", shardOf(nShards)).localCheckpoint(true)
    val present = d.select("_sh").distinct().collect().map(_.getLong(0)).toSet
    val empty = (0L until nShards.toLong).filterNot(present)
    require(empty.isEmpty,
      s"textIndexSaveSharded: shard(s) ${empty.mkString(",")} of $nShards " +
        "would be EMPTY for this corpus (an empty store is refused at " +
        "save) — use fewer shards")
    val p = postings.withColumn("_sh", shardOf(nShards)).localCheckpoint(true)
    val pos = positions.map(_.withColumn("_sh", shardOf(nShards))
      .localCheckpoint(true))
    // r15 (guide §2.6): shard saves write DISJOINT dirs off the same
    // checkpointed slices — independent job chains the sequential loop
    // serialized for no reason; overlapping them back-fills each save's
    // tiny stamp/footer jobs. The router below still lands strictly
    // after every shard completed (Parallel.shards joins all futures),
    // so the crash contract is unchanged.
    graft.operators.Parallel.shards(nShards) { i =>
      textIndexSave(
        p.filter(col("_sh") === i).drop("_sh"),
        d.filter(col("_sh") === i).drop("_sh"),
        shardPath(root, i),
        pos.map(_.filter(col("_sh") === i).drop("_sh")))
    }
    // fresh saves are authoritative: a root champion relation elected
    // under the superseded corpus is deleted, exactly as the
    // single-store save drops its champions (re-run the sharded
    // championsSave after a full save)
    val cp = new org.apache.hadoop.fs.Path(championsPath(root))
    val cfs = cp.getFileSystem(spark.sessionState.newHadoopConf())
    if (cfs.exists(cp)) cfs.delete(cp, true)
    import spark.implicits._
    graft.operators.StoreRewrite.atomicOverwrite(
      Seq((nShards, tokTag)).toDF("n_shards", "tag").coalesce(1),
      routerPath(root))
  }

  /** APPEND an increment across the shards: route each new doc to its
    * hash shard and run the single-store append there — idempotence
    * (left-anti probe), tombstone stickiness, the crash signatures and
    * `_inflight` discipline, and champions maintenance all ride the
    * per-shard verb unchanged. The increment is checkpointed once
    * (read by every shard's slice); per-shard work is
    * O(increment-slice), and shards could append in PARALLEL jobs —
    * the harness loops for determinism.
    */
  def textIndexAppendSharded(docsInc: DataFrame, root: String): Unit = {
    val spark = docsInc.sparkSession
    val n = textIndexShardCount(spark, root)
    val inc = docsInc.withColumn("_sh", shardOf(n)).localCheckpoint(true)
    (0 until n).foreach { i =>
      textIndexAppend(inc.filter(col("_sh") === i).drop("_sh"),
        shardPath(root, i))
    }
    // root champion maintenance LAST (derived data, staleness-safe):
    // re-elect the increment's terms from the GROWN federation unions —
    // one broadcast term-slice per mutation, elected under the global
    // statistics (the per-shard appends above never touch champions;
    // shard stores carry none under the federated layout). Touched
    // terms come from the raw increment — a superset of the admitted
    // terms when part of the batch was a replay, and re-electing an
    // untouched term is a no-op splice.
    if (hasChampions(spark, root)) {
      val touched = inc.select(explode(tokens(col("text"))).as("term"))
        .distinct().localCheckpoint(true)
      val (posts, stats) = federatedMaskedRaw(spark, root, n)
      reelectChampionsOn(spark, root, posts, stats, touched, None)
    }
  }

  /** DELETE documents across the shards: tombstones are routed to the
    * owning shard (the hash that placed the doc places its tombstone),
    * so each shard's mask stays 1/n-sized instead of every shard
    * carrying the full deletion set.
    */
  def textIndexDeleteSharded(ids: DataFrame, root: String): Unit = {
    val spark = ids.sparkSession
    val n = textIndexShardCount(spark, root)
    val del = ids.select(col("doc_id")).withColumn("_sh", shardOf(n))
      .localCheckpoint(true)
    (0 until n).foreach { i =>
      val slice = del.filter(col("_sh") === i).drop("_sh")
      // skip untouched shards: an empty tombstone append would still
      // create the relation, growing every shard's mask read for nothing
      if (!slice.isEmpty) textIndexDelete(slice, shardPath(root, i))
    }
  }

  /** Federated BM25 search: every shard's (stamp-verified, tombstone-
    * masked) postings slice is term-pushed INDEPENDENTLY — n parallel
    * store scans, no cross-shard exchange to assemble the inputs (union
    * is a plan concat, not a shuffle) — and the union feeds the ONE
    * shared scoring body, so corpus statistics (N, avgdl, per-term df)
    * are computed over the whole federation: counts and sums of longs,
    * order-insensitive, hence EXACT. Bit-equal to the monolithic index
    * over the same corpus (spec-pinned): sharding is a storage layout,
    * never a semantics change. Per-query cost: |terms| pushed slices ×
    * n shards + the candidates-sized pivot — the corpus never scans.
    */
  def textIndexSearchSharded(spark: SparkSession, root: String,
      queryTerms: Seq[String] = terms): DataFrame = {
    val n = textIndexShardCount(spark, root)
    val (postings, docstats) = textIndexLoadFederated(spark, root, n)
    scoreIndexed(postings, docstats, queryTerms)
  }

  /** Load and gate-verify EVERY shard of the rename federation with a
    * BATCHED verification (round 15, guide §2.6): the sequential
    * per-shard [[textIndexLoad]] paid, per shard, a meta footer+collect,
    * two relation footer reads, TWO driver-blocking stamp-aggregate jobs
    * and two tombstone reads — ~11 driver-serialized jobs per shard, the
    * dominant cost of a warm federated probe (and, at scale, n
    * store-sized verification scans run back to back). Here the n 1-row
    * metas are read in ONE multi-path scan, every shard's docstats AND
    * postings-presence stamps ride ONE grouped aggregate job (shards
    * scan in parallel inside it), relation/tombstone reads overlap on
    * the shard pool, and each shard's tombstone set is read once for
    * both relations. The CHECKS are textIndexLoad's verbatim — same
    * requires, same messages, every shard still individually verified —
    * only the job layout changes.
    */
  private def textIndexLoadFederated(spark: SparkSession, root: String,
      n: Int): (DataFrame, DataFrame) = {
    val paths = (0 until n).map(shardPath(root, _))
    val shards = graft.operators.Parallel.shards(n) { i =>
      val p = paths(i)
      (spark.read.parquet(s"$p/postings"),
        spark.read.parquet(s"$p/docstats"),
        graft.operators.IndexTombstones.tombstoneSet(spark, p))
    }
    val metaRows = spark.read.parquet(paths.map(_ + "/meta"): _*)
      .withColumn("_f", input_file_name()).collect()
    val metaOf = (0 until n).map { i =>
      val rows = metaRows.filter(_.getAs[String]("_f")
        .contains(s"/shard-$i/meta/"))
      require(rows.length == 1,
        s"textIndexLoad: meta store at ${paths(i)}/meta has " +
          s"${rows.length} rows — interrupted save or wrong path")
      i -> rows(0)
    }.toMap
    // one stamp job for the whole federation: (shard, kind) groups where
    // kind 0 = docstats presence, kind 1 = postings-derived presence —
    // per-group aggregates are presenceStamp's, bit-identical per shard
    val presAll = shards.zipWithIndex.map { case ((posts, ds, _), i) =>
      ds.select(lit(i).as("_sh"), lit(0).as("_k"), col("doc_id"),
          col("dl").cast("long").as("dl"))
        .unionByName(postingsPresence(posts)
          .select(lit(i).as("_sh"), lit(1).as("_k"), col("doc_id"),
            col("dl").cast("long").as("dl")))
    }.reduce(_ unionByName _)
    val stampRows = presAll.groupBy("_sh", "_k").agg(
      count(lit(1)).as("n"),
      coalesce(sum(col("dl")), lit(0L)).as("tot"),
      coalesce(sum(xxhash64(col("doc_id"), col("dl")).cast(dec38)),
        lit(0L).cast(dec38)).as("h")).collect()
    def st(i: Int, k: Int): (Long, Long, java.math.BigInteger) =
      stampRows.find(r => r.getInt(0) == i && r.getInt(1) == k)
        .map(r => (r.getLong(2), r.getLong(3), r.getDecimal(4).toBigInteger))
        .getOrElse((0L, 0L, java.math.BigInteger.ZERO))
    val masked = shards.zipWithIndex.map { case ((postings, docstats, tomb), i) =>
      val path = paths(i)
      val m = metaOf(i)
      require(m.getAs[String]("tag") == tokTag,
        s"textIndexLoad: store was built under tokenizer '${m.getAs[String]("tag")}' " +
          s"but this library tokenizes '$tokTag' — scores would silently disagree")
      val fpStored = m.getAs[String]("fp")
      val (nD, totD, hD) = st(i, 0)
      require(stampFingerprint(nD, totD, hD) == fpStored &&
        nD == m.getAs[Long]("n_docs") && totD == m.getAs[Long]("tot_dl") &&
        hD.toString == m.getAs[String]("h_all"),
        s"textIndexLoad: docstats at $path do not reproduce the meta stamp " +
          "(truncated/foreign/edited store)")
      val (np, totp, hp) = st(i, 1)
      require(np == m.getAs[Long]("n_pos") && totp == m.getAs[Long]("tot_pos") &&
        hp.toString == m.getAs[String]("h_pos"),
        s"textIndexLoad: postings at $path do not reproduce the meta stamp — " +
          "the postings/docstats pairing is broken (splice or partial append)")
      tomb match {
        case Some(t) =>
          (graft.operators.IndexTombstones.maskWith(postings, t, Seq("doc_id")),
            graft.operators.IndexTombstones.maskWith(docstats, t, Seq("doc_id")))
        case None => (postings, docstats)
      }
    }
    (masked.map(_._1).reduce(_ unionByName _),
      masked.map(_._2).reduce(_ unionByName _))
  }

  /** Federated phrase search: a phrase lives entirely inside one
    * document, and shards partition documents — so the federation is
    * the UNION of per-shard store-served matches, each shard's join
    * chain running against its own term-pushed positions slices
    * (joins never cross shards; equality with the monolithic store
    * follows from doc-disjointness and is spec-pinned).
    */
  def textIndexPhraseSearchSharded(spark: SparkSession, root: String,
      phrase: Seq[String]): DataFrame =
    graft.operators.Parallel.shards(textIndexShardCount(spark, root))(
        i => textIndexPhraseSearch(spark, shardPath(root, i), phrase))
      .reduce(_ unionByName _)

  /** Federated proximity (NEAR) search — the phrase federation's twin,
    * completing the sharded family's verb parity with the positional
    * store: a NEAR match pairs two positions of ONE document, and
    * shards partition documents, so the banded semi-join of
    * [[proximityMatches]] never crosses shards and the federation is
    * the plain UNION of per-shard store-served matches (each shard's
    * two term-pushed position slices; equality with the monolithic
    * store follows from doc-disjointness, spec-pinned).
    */
  def textIndexProximitySearchSharded(spark: SparkSession, root: String,
      termA: String, termB: String, window: Int): DataFrame =
    graft.operators.Parallel.shards(textIndexShardCount(spark, root))(
        i => textIndexProximitySearch(spark, shardPath(root, i), termA,
          termB, window))
      .reduce(_ unionByName _)

  /** Elect and persist the federation's champion lists at
    * `root`/champions — a FEDERATION-LEVEL derived relation, not a
    * per-shard one, because impact ordering is a corpus-global
    * property: a term's idf and the corpus avgdl come from ALL shards,
    * so per-shard elections under shard-local statistics would rank
    * impact wrongly across shards (the same distributed-IR mistake
    * federated scoring avoids via scoreIndexed). Election runs over
    * the shard UNIONS through the one shared [[championsOf]] body —
    * bit-identical lists to a monolithic store over the same corpus,
    * spec-pinned. Per-shard stores deliberately carry NO champions
    * relation under this layout (the single-store append's shard-local
    * re-election would corrupt a global list; the federated append
    * maintains the root relation instead).
    */
  def textIndexChampionsSaveSharded(spark: SparkSession, root: String,
      m: Int): Unit = {
    require(m >= 1, s"textIndexChampionsSaveSharded: m must be >= 1, got $m")
    val n = textIndexShardCount(spark, root)
    val (postings, docstats) = textIndexLoadFederated(spark, root, n)
    graft.operators.StoreRewrite.atomicOverwrite(
      championsOf(postings, docstats, m).withColumn("m", lit(m)),
      championsPath(root))
  }

  /** Champion-pruned search over the federation: candidates come off
    * the root champion store's head (term filter + rank cut pushed
    * into one small scan; each shard's tombstones mask the lists so a
    * deleted doc never re-enters via a stale head), scores come from
    * the exact federated tail — bit-exact vs the unpruned federated
    * search for every returned doc, with the monolithic fallback
    * semantics (recompute) when the relation is absent or elected
    * shallower than `m`.
    */
  def textIndexChampionSearchSharded(spark: SparkSession, root: String,
      queryTerms: Seq[String] = terms, m: Int = 50): DataFrame = {
    val n = textIndexShardCount(spark, root)
    val (postings, docstats) = textIndexLoadFederated(spark, root, n)
    val matched = postings.filter(col("term").isin(queryTerms: _*))
    val cands =
      (if (hasChampions(spark, root) &&
          spark.read.parquet(championsPath(root)).select("m").head.getInt(0) >= m)
        (0 until n).foldLeft(spark.read.parquet(championsPath(root)))(
            (df, i) => graft.operators.IndexTombstones.maskOn(
              df, shardPath(root, i), Seq("doc_id")))
          .filter(col("term").isin(queryTerms: _*) && col("rank") <= m)
      else championsOf(matched, docstats, m)).select("doc_id").distinct()
    championScoreTail(matched, docstats, cands, queryTerms)
  }

  /** FORGET documents across the shards — physical removal routed to
    * the owning shards, each running the single-store crash-durable
    * forget (intent file, restamp, tombstone cleanup) independently.
    * The single-store refusal to forget an ENTIRE corpus applies per
    * shard: a forget that would empty one shard refuses there — at
    * that point the right verb is re-sharding to fewer shards.
    */
  def textIndexForgetSharded(ids: DataFrame, root: String): Unit = {
    val spark = ids.sparkSession
    val n = textIndexShardCount(spark, root)
    val del = ids.select(col("doc_id")).withColumn("_sh", shardOf(n))
      .localCheckpoint(true)
    // refuse UP FRONT if ANY routed shard would end up empty — checking
    // inside the loop would apply earlier shards' forgets before the
    // refusal fired, leaving a partially-forgotten federation
    (0 until n).foreach { i =>
      val slice = del.filter(col("_sh") === i).drop("_sh")
      if (!slice.isEmpty) {
        val remaining = spark.read
          .parquet(s"${shardPath(root, i)}/docstats")
          .join(slice, Seq("doc_id"), "left_anti").count()
        require(remaining > 0,
          s"textIndexForgetSharded: forgetting these ids would EMPTY " +
            s"shard $i of $n — an empty shard store is refused at save " +
            "and unloadable; rebuild with fewer shards instead")
      }
    }
    (0 until n).foreach { i =>
      val slice = del.filter(col("_sh") === i).drop("_sh")
      if (!slice.isEmpty) textIndexForget(slice, shardPath(root, i))
    }
    // shed forgotten docs from the root champion lists and re-elect
    // exactly the terms they appeared under, from the post-forget
    // federation (derived data: a crash here leaves lists stale-only)
    if (hasChampions(spark, root)) {
      val touched = spark.read.parquet(championsPath(root))
        .join(del.select("doc_id"), Seq("doc_id"), "left_semi")
        .select("term").distinct().localCheckpoint(true)
      val (posts, stats) = federatedMaskedRaw(spark, root, n)
      reelectChampionsOn(spark, root, posts, stats, touched,
        Some(del.select("doc_id")))
    }
  }

  /** COMPACT every shard store — n INDEPENDENT bounded layout jobs
    * (each 1/n of the corpus; a production scheduler runs them in
    * parallel, or staggers them across maintenance windows — the
    * monolithic store forces one corpus-sized rewrite). Per-shard
    * crash discipline is the single-store compact's: every prefix of
    * every shard's steps is consistent, so a crashed sharded compact
    * re-runs to completion with no recovery.
    */
  def textIndexCompactSharded(spark: SparkSession, root: String): Unit = {
    (0 until textIndexShardCount(spark, root))
      .foreach(i => textIndexCompact(spark, shardPath(root, i)))
    // mirror the single-store compact: a full re-election restores the
    // fresh-save champion layout (content identical federation, so the
    // lists are identical too — this is layout/staleness maintenance)
    if (hasChampions(spark, root))
      textIndexChampionsSaveSharded(spark, root,
        spark.read.parquet(championsPath(root)).select("m").head.getInt(0))
  }

  /** Recover every shard store, returning the per-shard repair actions
    * (index = shard number, the single-store action vocabulary). Shards
    * crash independently — one interrupted shard must not block the
    * others' ingest — so the loop heals them all in one pass.
    */
  def textIndexRecoverSharded(spark: SparkSession, root: String): Seq[String] = {
    // the root champion relation is maintained through atomicOverwrite;
    // finish a rename it crashed inside before healing the shards
    graft.operators.StoreRewrite.recover(spark, championsPath(root))
    (0 until textIndexShardCount(spark, root))
      .map(i => textIndexRecover(spark, shardPath(root, i)))
  }

  /** True when ANY shard carries an interrupted-mutation marker. */
  def textIndexInflightSharded(spark: SparkSession, root: String): Boolean =
    (0 until textIndexShardCount(spark, root))
      .exists(i => textIndexInflight(spark, shardPath(root, i)))

  /** Expose a shard's store path — for per-shard maintenance (a
    * production deployment compacts/ingests shards from separate
    * jobs) and for the specs' crash-injection.
    */
  def textIndexShardStorePath(root: String, i: Int): String = shardPath(root, i)

  // ------------------------------------------------------------------
  // MANIFEST-COMMITTED sharded text federation — q174's layout on the
  // rename-free protocol: each shard is the q198 versioned multi-
  // relation store, the router is a versioned store, and the
  // FEDERATION-LEVEL champion lists live as a second relation IN the
  // router store — so root champion maintenance is a replace-in-one-
  // PUT instead of the rename federation's StoreRewrite, and the
  // championed search needs no tombstone mask (every mutation verb
  // replaces the heads consistently with the revision it commits).
  // Per-shard mutations are the monolithic versioned verbs (one
  // commitMixed each); cross-shard sequences are replay-completing
  // (idempotent per-shard commits), the same consistency unit as the
  // rename federation's per-shard rewrites.
  // ------------------------------------------------------------------

  /** Persist the federation: relations tokenized ONCE by the caller
    * (the rename sharded save's signature), each hash slice committed
    * as an independent versioned store with the monolithic save's
    * range-clustering, the versioned router LAST as the commit marker.
    */
  def textIndexSaveShardedVersioned(postings: DataFrame,
      docstats: DataFrame, root: String, nShards: Int,
      positions: Option[DataFrame] = None): Unit = {
    require(nShards >= 1,
      s"textIndexSaveShardedVersioned: nShards must be >= 1, got $nShards")
    val spark = postings.sparkSession
    locally {
      val rp = new org.apache.hadoop.fs.Path(routerPath(root))
      val fs = rp.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(rp)) fs.delete(rp, true) // un-commit before rebuild
      val rootP = new org.apache.hadoop.fs.Path(root)
      if (fs.exists(rootP))
        fs.listStatus(rootP).map(_.getPath)
          .filter(_.getName.startsWith("shard-"))
          .foreach(p => fs.delete(p, true))
    }
    val d = docstats.withColumn("_sh", shardOf(nShards)).localCheckpoint(true)
    val present = d.select("_sh").distinct().collect().map(_.getLong(0)).toSet
    val empty = (0L until nShards.toLong).filterNot(present)
    require(empty.isEmpty,
      s"textIndexSaveShardedVersioned: shard(s) ${empty.mkString(",")} of " +
        s"$nShards would be EMPTY for this corpus — use fewer shards")
    val p = postings.withColumn("_sh", shardOf(nShards)).localCheckpoint(true)
    val pos = positions.map(_.withColumn("_sh", shardOf(nShards))
      .localCheckpoint(true))
    // r15 (guide §2.6): disjoint per-shard PUTs off shared checkpointed
    // slices — overlapped like the rename save's; the router commit
    // still strictly follows every shard (Parallel.shards joins all).
    graft.operators.Parallel.shards(nShards) { i =>
      val rels = Map(
        "postings" -> p.filter(col("_sh") === i).drop("_sh")
          .repartitionByRange(col("term"), col("doc_id")),
        "docstats" -> d.filter(col("_sh") === i).drop("_sh")) ++
        pos.map(r => "positions" -> r.filter(col("_sh") === i).drop("_sh")
          .repartitionByRange(col("term"), col("doc_id")))
      graft.operators.VersionedStore.save(rels, shardPath(root, i))
    }
    import spark.implicits._
    // a fresh save is authoritative: the router (and any root champion
    // relation riding in it) starts a new lineage in one PUT
    graft.operators.VersionedStore.save(
      Map("router" -> Seq((nShards, tokTag)).toDF("n_shards", "tag")
        .coalesce(1)), routerPath(root))
  }

  /** MIGRATE the rename sharded text federation: each shard through
    * [[migrateTextIndexToVersioned]] (verifying loads, tombstones
    * applied, one PUT per shard), the ROOT champion lists — masked by
    * every shard's tombstones, exactly as the rename federated search
    * serves them — riding the versioned ROUTER's save (the layout
    * [[textIndexChampionsSaveShardedVersioned]] maintains), committed
    * LAST as the federation's commit marker. A crash mid-migration
    * leaves a router-less root every versioned verb refuses;
    * re-running completes it. Refuses a federation with any shard
    * mid-mutation; the root sync checkpoint carries across.
    */
  def migrateTextIndexShardedToVersioned(spark: SparkSession,
      srcRoot: String, dstRoot: String): Unit = {
    require(!textIndexInflightSharded(spark, srcRoot),
      s"migrateTextIndexShardedToVersioned: a shard of $srcRoot has an " +
        "_inflight intent marker — run textIndexRecoverSharded first, " +
        "then migrate")
    require(graft.operators.VersionedStore
        .currentVersion(spark, routerPath(dstRoot)).isEmpty,
      s"migrateTextIndexShardedToVersioned: $dstRoot already holds a " +
        "committed federation — refusing to commit a second lineage " +
        "over it")
    val n = textIndexShardCount(spark, srcRoot)
    (0 until n).foreach { i =>
      val sp = new org.apache.hadoop.fs.Path(shardPath(dstRoot, i))
      val fs = sp.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(sp)) fs.delete(sp, true) // crashed prior attempt
      migrateTextIndexToVersioned(spark, shardPath(srcRoot, i),
        shardPath(dstRoot, i))
    }
    val champs =
      if (!hasChampions(spark, srcRoot)) Map.empty[String, DataFrame]
      else Map("champions" ->
        (0 until n).foldLeft(spark.read.parquet(championsPath(srcRoot)))(
          (df, i) => graft.operators.IndexTombstones.maskOn(
            df, shardPath(srcRoot, i), Seq("doc_id"))))
    graft.operators.VersionedStore.save(
      Map("router" -> spark.read.parquet(routerPath(srcRoot))
        .coalesce(1)) ++ champs, routerPath(dstRoot))
    graft.operators.RevisionSync.migrateMarker(spark, srcRoot, dstRoot,
      "migrateTextIndexShardedToVersioned")
  }

  private def federatedVersionedPostings(spark: SparkSession,
      root: String, n: Int): (DataFrame, DataFrame) = {
    // per-shard manifest reads overlap on the shard pool (guide §2.6)
    val per = graft.operators.Parallel.shards(n)(i =>
      versionedPostings(spark, shardPath(root, i), None))
    (per.map(_._1).reduce(_ unionByName _),
      per.map(_._2).reduce(_ unionByName _))
  }

  /** Federated BM25 search over versioned shards —
    * [[textIndexSearchSharded]]'s exact plan (per-shard term-pushed
    * scans, ONE shared scoring body over the union so corpus
    * statistics stay global and exact) with each shard served through
    * its manifest.
    */
  def textIndexSearchShardedVersioned(spark: SparkSession, root: String,
      queryTerms: Seq[String] = terms): DataFrame = {
    val n = textIndexShardCount(spark, root)
    val (postings, docstats) = federatedVersionedPostings(spark, root, n)
    scoreIndexed(postings, docstats, queryTerms)
  }

  /** Federated phrase / proximity search over versioned shards — the
    * union of per-shard store-served matches (joins never cross
    * shards; doc-disjointness gives equality with the monolithic
    * store).
    */
  def textIndexPhraseSearchShardedVersioned(spark: SparkSession,
      root: String, phrase: Seq[String]): DataFrame =
    graft.operators.Parallel.shards(textIndexShardCount(spark, root))(
        i => textIndexPhraseSearchVersioned(spark, shardPath(root, i),
          phrase))
      .reduce(_ unionByName _)

  def textIndexProximitySearchShardedVersioned(spark: SparkSession,
      root: String, termA: String, termB: String,
      window: Int): DataFrame =
    graft.operators.Parallel.shards(textIndexShardCount(spark, root))(
        i => textIndexProximitySearchVersioned(spark,
          shardPath(root, i), termA, termB, window))
      .reduce(_ unionByName _)

  /** Elect (or re-elect at a new depth) the federation's champion
    * lists — a FEDERATION-LEVEL relation (global idf/avgdl; see
    * [[textIndexChampionsSaveSharded]]'s distributed-IR argument),
    * REPLACED in the router store in one PUT.
    */
  def textIndexChampionsSaveShardedVersioned(spark: SparkSession,
      root: String, m: Int): Long = {
    require(m >= 1,
      s"textIndexChampionsSaveShardedVersioned: m must be >= 1, got $m")
    val n = textIndexShardCount(spark, root)
    val (postings, docstats) = federatedVersionedPostings(spark, root, n)
    graft.operators.VersionedStore.commitMixed(Map.empty, Map.empty,
      Map("champions" -> championsOf(postings, docstats, m)
        .withColumn("m", lit(m))), routerPath(root))
  }

  private def versionedRootChampions(spark: SparkSession,
      root: String): Option[DataFrame] =
    if (graft.operators.VersionedStore
        .relations(spark, routerPath(root)).contains("champions"))
      Some(graft.operators.VersionedStore.read(spark, routerPath(root),
        "champions"))
    else None

  /** Champion-pruned federated search — candidates from the router
    * store's heads (no tombstone mask needed: every mutation verb
    * replaces the heads consistently), scores BIT-exact from the
    * federation's matched postings; monolithic fallback semantics
    * (recompute) when absent or elected shallower than `m`.
    */
  def textIndexChampionSearchShardedVersioned(spark: SparkSession,
      root: String, queryTerms: Seq[String] = terms,
      m: Int = 50): DataFrame = {
    val n = textIndexShardCount(spark, root)
    val (postings, docstats) = federatedVersionedPostings(spark, root, n)
    val matched = postings.filter(col("term").isin(queryTerms: _*))
    val stored = versionedRootChampions(spark, root)
      .filter(_.select("m").head.getInt(0) >= m)
    val cands = stored
      .map(_.filter(col("term").isin(queryTerms: _*) && col("rank") <= m))
      .getOrElse(championsOf(matched, docstats, m))
      .select("doc_id").distinct()
    championScoreTail(matched, docstats, cands, queryTerms)
  }

  /** Root champion maintenance shared by the mutation verbs: fresh
    * lists for the touched terms elected under the POST-mutation
    * federation statistics, spliced over the kept heads, REPLACED in
    * the router store in one PUT.
    */
  private def reelectChampionsShardedVersioned(spark: SparkSession,
      root: String, touched: DataFrame,
      dropDocs: Option[DataFrame]): Unit =
    versionedRootChampions(spark, root).foreach { champs0 =>
      val n = textIndexShardCount(spark, root)
      val (posts, stats) = federatedVersionedPostings(spark, root, n)
      graft.operators.VersionedStore.commitMixed(Map.empty, Map.empty,
        Map("champions" ->
          splicedChampions(champs0, posts, stats, touched, dropDocs)),
        routerPath(root))
    }

  /** APPEND an increment: route each doc to its hash shard and run the
    * monolithic versioned append there (ONE commitMixed per touched
    * shard), then re-elect the increment's terms at the federation
    * root under the grown global statistics.
    */
  def textIndexAppendShardedVersioned(docsInc: DataFrame,
      root: String): Unit = {
    val spark = docsInc.sparkSession
    val n = textIndexShardCount(spark, root)
    val inc = docsInc.withColumn("_sh", shardOf(n)).localCheckpoint(true)
    (0 until n).foreach { i =>
      val slice = inc.filter(col("_sh") === i).drop("_sh")
      if (!slice.isEmpty)
        textIndexAppendVersioned(slice, shardPath(root, i))
    }
    reelectChampionsShardedVersioned(spark, root,
      inc.select(explode(tokens(col("text"))).as("term")).distinct()
        .localCheckpoint(true), None)
  }

  /** DELETE documents: tombstones routed to the owning shard (each
    * shard's commitMixed drops them from every data relation), then
    * the doomed docs' terms re-elected at the root — a deleted doc can
    * never resurface through a stale federation head.
    */
  def textIndexDeleteShardedVersioned(ids: DataFrame,
      root: String): Unit = {
    val spark = ids.sparkSession
    val n = textIndexShardCount(spark, root)
    val del = ids.select(col("doc_id")).withColumn("_sh", shardOf(n))
      .localCheckpoint(true)
    // doomed docs' terms from the PRE-delete federation (their rows
    // vanish with the per-shard commits below)
    val touched =
      if (versionedRootChampions(spark, root).isEmpty) None
      else {
        val (posts, _) = federatedVersionedPostings(spark, root, n)
        Some(posts.join(del.select("doc_id"), Seq("doc_id"))
          .select("term").distinct().localCheckpoint(true))
      }
    (0 until n).foreach { i =>
      val slice = del.filter(col("_sh") === i).drop("_sh")
      if (!slice.isEmpty)
        textIndexDeleteVersioned(slice, shardPath(root, i))
    }
    touched.foreach(t => reelectChampionsShardedVersioned(spark, root, t,
      Some(del.select("doc_id"))))
  }

  /** CDC maintenance + one-verb sync — the q189 bridge on the
    * versioned federation (deletes routed first, net-new appended;
    * per-shard atomic commits, replay-completing across shards).
    */
  def textIndexMaintainShardedVersionedFromStore(spark: SparkSession,
      storePath: String, rel: String, fromRev: Long, toRev: Long,
      root: String): Unit =
    graft.operators.CdcBridge.maintain(spark, storePath, rel, fromRev,
      toRev, "doc_id", Seq("doc_id", "text"),
      "textIndexMaintainShardedVersionedFromStore")(
      del => textIndexDeleteShardedVersioned(del, root))(
      ins => textIndexAppendShardedVersioned(ins, root))

  def textIndexSyncShardedVersionedWithStore(spark: SparkSession,
      storePath: String, rel: String, root: String, nShards: Int = 3,
      withPositions: Boolean = false,
      retain: Option[Int] = None): Option[(Long, Long)] =
    graft.operators.CdcBridge.sync(spark, storePath, root,
      "textIndexSyncShardedVersionedWithStore", retain,
      () => (0 until textIndexShardCount(spark, root))
        .map(shardPath(root, _)) :+ routerPath(root))(
      graft.operators.VersionedStore
        .currentVersion(spark, routerPath(root)).isDefined)(
      cur => {
        val docs = graft.operators.VersionedStore
          .read(spark, storePath, rel, Some(cur)).select("doc_id", "text")
          .localCheckpoint(true)
        val (p, ds) = textIndexBuild(docs)
        textIndexSaveShardedVersioned(p, ds, root, nShards,
          if (withPositions) Some(positionalPostings(docs)) else None)
      })(
      (from, to) => textIndexMaintainShardedVersionedFromStore(spark,
        storePath, rel, from, to, root))

  /** q168: exact phrase search ("data line") — the adjacency query a
    * bag-of-words index cannot answer. Within a document a phrase is a
    * positional-adjacency scan of the token array, so the right plan is
    * MAP-ONLY: a codegen'd higher-order filter over the positions,
    * zero shuffle before the #sources-row aggregate — at 100 TB this
    * is one pass, and the cross-doc variant (phrase search served from
    * a store) is the same arithmetic over a persisted POSITIONAL
    * postings relation (term, doc_id, pos) with a (doc_id, pos+1)
    * equality self-join of the two terms' postings — candidates-sized,
    * never corpus-sized. The oracle mirrors the per-position scan with
    * DuckDB list lambdas; the sequence is guarded (size ≥ 2) because
    * Spark's sequence(1, 0) would DESCEND and negative element_at
    * indexes read from the array's tail.
    */
  private val q168 = QueryDef(
    "q168_phrase_search",
    (s, d) => {
      // Round 14: the original per-row higher-order `filter` lambda over
      // the position range evaluated INTERPRETED (the explodeShingles
      // finding: HOF lambdas are ~8x a codegen'd position explode) and
      // made this "map-only" scan the suite's slowest text query
      // (4.9 s at sf0.1; 0.8 s with the shared kernel). Same arithmetic,
      // codegen'd: explode bigram positions, filter the phrase MAP-SIDE
      // (post-filter rows = occurrence count, tiny), aggregate per
      // source, and re-attach the zero-hit sources from the corpus'
      // (broadcast-sized) source axis.
      val docs = Tables(s, d, "documents")
      val hits = explodeShinglesFromTokens(
          docs.select(col("source"), col("doc_id"), tokens(col("text")).as("tk")),
          col("tk"), 2, "gram", "pos")
        .filter(col("gram") === "data line")
      val per = hits.groupBy("source")
        .agg(countDistinct("doc_id").as("n_docs_phrase"),
          count(lit(1)).as("n_occurrences"))
      docs.select("source").distinct()
        .join(per, Seq("source"), "left")
        .select(col("source"),
          coalesce(col("n_docs_phrase"), lit(0L)).as("n_docs_phrase"),
          coalesce(col("n_occurrences"), lit(0L)).as("n_occurrences"))
        .orderBy("source")
    },
    Some("""WITH tk AS (SELECT doc_id, source,
                               regexp_extract_all(lower(text), '[a-z0-9]+') AS t
                        FROM documents),
            hits AS (SELECT source,
                            len(list_filter(range(1, len(t)),
                                i -> t[i] = 'data' AND t[i+1] = 'line')) AS occ
                     FROM tk)
            SELECT source,
                   CAST(SUM(CASE WHEN occ > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_phrase,
                   CAST(SUM(occ) AS BIGINT) AS n_occurrences
            FROM hits GROUP BY source ORDER BY source"""))

  /** q170: q168's phrase search served from the PERSISTED positional
    * store — build/save with positions in-query (the q163 pattern),
    * then the match set comes from [[textIndexPhraseSearch]]: n−1
    * equality joins over term-pushed slices of the positions relation,
    * the corpus text never re-tokenized. The ORACLE is q168's SQL
    * verbatim — the store-served path must lose nothing and add
    * nothing vs the map-side scan. The only corpus-sized read after
    * the build is the 2-column (doc_id, source) projection the
    * per-source report needs; the MATCHING itself is store-sized.
    * PhraseSpec carries the lifecycle (append/delete/forget/splice).
    */
  private val q170 = QueryDef(
    "q170_phrase_indexed",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      if (docs.isEmpty)
        docs.select(col("source"), lit(0L).as("n_docs_phrase"),
          lit(0L).as("n_occurrences")).limit(0)
      else {
        val occ = withThrowawayIndex(docs, withPositions = true)(path =>
          textIndexPhraseSearch(s, path, Seq("data", "line"))
            .groupBy("doc_id").agg(count(lit(1)).as("occ")))
        docs.select(col("doc_id"), col("source"))
          .join(occ, Seq("doc_id"), "left")
          .groupBy("source")
          .agg(sum(when(col("occ") > 0, 1L).otherwise(0L)).as("n_docs_phrase"),
            coalesce(sum(col("occ")), lit(0L)).cast("long").as("n_occurrences"))
          .orderBy("source")
      }
    },
    q168.oracle)

  /** q172: proximity (NEAR) search served from the positional store —
    * "'data' within 5 tokens of 'merge'", the slop query that completes
    * the positional family (q168/q170 = exact adjacency; this = bounded
    * distance). The match set comes from [[textIndexProximitySearch]]:
    * two term-pushed slices of the persisted positions relation through
    * a window-banded equality SEMI-join (never a per-doc quadratic
    * position join — common terms would make that a corpus-scale
    * cross product per document). The oracle recomputes the semantics
    * independently as a per-document nested positional scan (DuckDB
    * list lambdas), all-integer — no float rounding surface. Reported
    * per source over ALL docs (q168's report shape).
    */
  private val q172 = QueryDef(
    "q172_proximity_search",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      if (docs.isEmpty)
        docs.select(col("source"), lit(0L).as("n_docs_near"),
          lit(0L).as("n_anchor_positions")).limit(0)
      else {
        val occ = withThrowawayIndex(docs, withPositions = true)(path =>
          textIndexProximitySearch(s, path, "data", "merge", 5)
            .groupBy("doc_id").agg(count(lit(1)).as("occ")))
        docs.select(col("doc_id"), col("source"))
          .join(occ, Seq("doc_id"), "left")
          .groupBy("source")
          .agg(sum(when(col("occ") > 0, 1L).otherwise(0L)).as("n_docs_near"),
            coalesce(sum(col("occ")), lit(0L)).cast("long")
              .as("n_anchor_positions"))
          .orderBy("source")
      }
    },
    Some("""WITH tk AS (SELECT doc_id, source,
                               regexp_extract_all(lower(text), '[a-z0-9]+') AS t
                        FROM documents),
            hits AS (SELECT source,
                            len(list_filter(range(1, len(t) + 1),
                                i -> t[i] = 'data' AND
                                  len(list_filter(
                                    range(greatest(1, i - 5),
                                          least(len(t), i + 5) + 1),
                                    j -> t[j] = 'merge')) > 0)) AS occ
                     FROM tk)
            SELECT source,
                   CAST(SUM(CASE WHEN occ > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_near,
                   CAST(SUM(occ) AS BIGINT) AS n_anchor_positions
            FROM hits GROUP BY source ORDER BY source"""))

  /** q171: hybrid retrieval served from TWO persisted stores — the q93
    * composition with both candidate generators store-backed: the
    * sparse side is the BM25 top-30 off the inverted index (the q163
    * path), the dense side the SQ8-ADC top-30 routed through the
    * VectorIndex façade (the q157 path — a code store whose search
    * reads ONLY the persisted params+codes, no corpus vectors at query
    * time). RRF fusion over ≤ 60 rows exactly as q93; a document
    * missing from one list contributes only the other list's term. The
    * oracle recomputes BOTH sides from scratch (q92's scorer + q136's
    * ADC arithmetic) — the two stores must add nothing and lose
    * nothing vs direct computation — and HybridStoreSpec plan-asserts
    * the composed search touches no corpus file, only the two stores.
    */
  private val q171 = QueryDef(
    "q171_hybrid_stores",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      if (docs.isEmpty || e.isEmpty)
        docs.select(lit(1).as("rank"), col("doc_id").as("id"),
          lit(1).as("bm25_rank"), lit(1).as("adc_rank"),
          lit(0.0).as("rrf")).limit(0)
      else {
        val bm = withThrowawayIndex(docs)(path =>
          textIndexSearch(s, path)
            .orderBy(col("score").desc, col("doc_id").asc).limit(30))
          .select(col("doc_id"), row_number().over(
            Window.orderBy(col("score").desc, col("doc_id").asc))
            .as("bm25_rank"))
        val root = graft.BenchPhases.storeDir("graft-hyb")
        val vpath = root + "/idx"
        graft.BenchPhases.build {
          graft.operators.VectorIndex.build(e, "sq8", vpath, protocol = "rename")
        }
        val q = e.filter(col("vec_id") === 0)
          .select(col("vec_id").as("qid"), col("v").as("qv"))
        val vr = graft.operators.VectorIndex.search(e, q, vpath, k = 30)
          .select(col("neighbor_id").as("vec_id"), col("rank").as("adc_rank"))
          .localCheckpoint(true) // eager: frees the throwaway store
        graft.BenchPhases.discard(s, root)
        bm.join(vr, col("doc_id") === col("vec_id"), "full_outer")
          .select(coalesce(col("doc_id"), col("vec_id")).as("id"),
            col("bm25_rank"), col("adc_rank"))
          .withColumn("rrf",
            coalesce(lit(1.0) / (lit(60.0) + col("bm25_rank").cast("double")),
              lit(0.0)) +
              coalesce(lit(1.0) / (lit(60.0) + col("adc_rank").cast("double")),
                lit(0.0)))
          .orderBy(col("rrf").desc, col("id").asc).limit(15)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("rrf").desc, col("id").asc)))
          .select("rank", "id", "bm25_rank", "adc_rank", "rrf")
          .orderBy("rank")
      }
    },
    Some(s"""WITH $bm25CteSql,
                  br AS (SELECT doc_id, bm25_rank FROM (
                           SELECT doc_id,
                             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS bm25_rank
                           FROM bm) x WHERE bm25_rank <= 30),
                  ${QuantQueries.sq8AdcOracleCtes("vec_id = 0")},
                  vr AS (SELECT vec_id, rn AS adc_rank FROM (
                           SELECT vec_id, ROW_NUMBER() OVER (
                             ORDER BY adc_dist ASC, vec_id ASC) AS rn
                           FROM scored) y WHERE rn <= 30),
                  fused AS (SELECT COALESCE(br.doc_id, vr.vec_id) AS id,
                              bm25_rank, adc_rank,
                              COALESCE(1.0 / (60.0 + CAST(bm25_rank AS DOUBLE)), 0.0)
                                + COALESCE(1.0 / (60.0 + CAST(adc_rank AS DOUBLE)), 0.0) AS rrf
                            FROM br FULL OUTER JOIN vr ON br.doc_id = vr.vec_id)
             SELECT rank, id, bm25_rank, adc_rank, rrf FROM (
               SELECT id, bm25_rank, adc_rank, rrf,
                      ROW_NUMBER() OVER (ORDER BY rrf DESC, id ASC) AS rank
               FROM fused) t
             WHERE rank <= 15 ORDER BY rank"""))

  /** q173: the FULL maintained-store lifecycle under one oracle —
    * save a third of the corpus, append the other two thirds as
    * increments (the additive-stamp path), tombstone-delete a slice,
    * COMPACT (layout rewrite from the index alone — no corpus), then
    * search. The oracle is the from-scratch BM25 over exactly the
    * surviving corpus: the lifecycle must add nothing and lose
    * nothing vs building fresh on the reduced corpus — the statistics
    * (idf/avgdl) must move with the delete, the append arithmetic
    * must be exact, and compaction must be a pure layout change.
    * q163 gates save→search; this gates append→delete→compact.
    */
  private val q173 = QueryDef(
    "q173_bm25_compacted",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      if (docs.isEmpty)
        docs.select(lit(1).as("rank"), col("doc_id"),
          lit(1).as("n_terms_hit"), lit(0.0).as("score")).limit(0)
      else {
        val h = pmod(col("doc_id").cast("long"), lit(3L))
        val base = docs.filter(h === 0)
        // a tiny corpus may leave the first slice empty (save refuses
        // an empty store): seed with everything, appends become no-ops
        val seed = if (base.isEmpty) docs else base
        val top = withThrowawayIndex(seed) { path =>
          graft.BenchPhases.build {
            textIndexAppend(docs.filter(h === 1), path)
            textIndexAppend(docs.filter(h === 2), path)
            textIndexDelete(
              docs.filter(pmod(col("doc_id").cast("long"), lit(7L)) === 3)
                .select("doc_id"), path)
            textIndexCompact(s, path)
          }
          textIndexSearch(s, path)
            .orderBy(col("score").desc, col("doc_id").asc).limit(20)
        }
        top.withColumn("rank", row_number().over(
            Window.orderBy(col("score").desc, col("doc_id").asc)))
          .select("rank", "doc_id", "n_terms_hit", "score")
          .orderBy("rank")
      }
    },
    Some(s"""WITH ${bm25CteSqlFrom("(SELECT * FROM documents WHERE doc_id % 7 <> 3)")}
             SELECT rank, doc_id, n_terms_hit, score FROM (
               SELECT doc_id, n_terms_hit, score,
                      ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rank
               FROM bm) t
             WHERE rank <= 20 ORDER BY rank"""))

  /** q174: the SHARDED store family under the q173 lifecycle oracle —
    * save a third of the corpus as THREE hash-routed shard stores,
    * append the other two thirds through the shard router, delete a
    * slice (tombstones routed to their owning shards), then run the
    * FEDERATED search. The oracle is the from-scratch BM25 over the
    * surviving corpus: federation with exact global statistics must
    * rank identically to never having sharded at all — idf/avgdl/df
    * computed across the union of the shard stores, per-shard appends
    * and tombstone masks composing to exactly the monolithic result.
    */
  private val q174 = QueryDef(
    "q174_bm25_sharded",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      if (docs.isEmpty)
        docs.select(lit(1).as("rank"), col("doc_id"),
          lit(1).as("n_terms_hit"), lit(0.0).as("score")).limit(0)
      else {
        val h = pmod(col("doc_id").cast("long"), lit(3L))
        val base = docs.filter(h === 0)
        // tiny-corpus guard, the q173 rule: seed with everything if the
        // first slice is empty; the appends then replay to no-ops
        val seed = if (base.isEmpty) docs else base
        val top = withThrowawayShards(seed, 3) { root =>
          graft.BenchPhases.build {
            textIndexAppendSharded(docs.filter(h === 1), root)
            textIndexAppendSharded(docs.filter(h === 2), root)
            textIndexDeleteSharded(
              docs.filter(pmod(col("doc_id").cast("long"), lit(5L)) === 2)
                .select("doc_id"), root)
          }
          textIndexSearchSharded(s, root)
            .orderBy(col("score").desc, col("doc_id").asc).limit(20)
        }
        top.withColumn("rank", row_number().over(
            Window.orderBy(col("score").desc, col("doc_id").asc)))
          .select("rank", "doc_id", "n_terms_hit", "score")
          .orderBy("rank")
      }
    },
    Some(shardedBm25OracleSql))

  private lazy val shardedBm25OracleSql: String =
    s"""WITH ${bm25CteSqlFrom("(SELECT * FROM documents WHERE doc_id % 5 <> 2)")}
             SELECT rank, doc_id, n_terms_hit, score FROM (
               SELECT doc_id, n_terms_hit, score,
                      ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rank
               FROM bm) t
             WHERE rank <= 20 ORDER BY rank"""

  /** q211: q174's federated lifecycle — seed build, two routed
    * appends, a routed delete, federated search — on the MANIFEST
    * protocol: every shard is the q198 versioned multi-relation store
    * (each mutation ONE commitMixed), the router is a versioned store,
    * and root champion maintenance (exercised in the spec, not here)
    * replaces a relation in the router instead of a rename. The oracle
    * is q174's SQL VERBATIM: neither sharding nor the commit protocol
    * may change what BM25 returns.
    */
  private val q211 = QueryDef(
    "q211_versioned_bm25_sharded",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      if (docs.isEmpty)
        docs.select(lit(1).as("rank"), col("doc_id"),
          lit(1).as("n_terms_hit"), lit(0.0).as("score")).limit(0)
      else {
        val h = pmod(col("doc_id").cast("long"), lit(3L))
        val base = docs.filter(h === 0)
        // tiny-corpus guard, the q173 rule — but the versioned append
        // carries no idempotence probe (replay safety rides the CDC
        // bridge), so a full-corpus seed SKIPS the appends instead of
        // replaying them
        val seeded = base.isEmpty
        val seed = if (seeded) docs else base
        val tmp = graft.BenchPhases.storeDir("graft-tisv")
        val root = tmp + "/idx"
        graft.BenchPhases.build {
          val (p, ds) = textIndexBuild(seed)
          textIndexSaveShardedVersioned(p, ds, root, 3)
          if (!seeded) {
            textIndexAppendShardedVersioned(docs.filter(h === 1), root)
            textIndexAppendShardedVersioned(docs.filter(h === 2), root)
          }
          textIndexDeleteShardedVersioned(
            docs.filter(pmod(col("doc_id").cast("long"), lit(5L)) === 2)
              .select("doc_id"), root)
        }
        val top = textIndexSearchShardedVersioned(s, root)
          .orderBy(col("score").desc, col("doc_id").asc).limit(20)
          .localCheckpoint(true)
        graft.BenchPhases.discard(s, tmp)
        top.withColumn("rank", row_number().over(
            Window.orderBy(col("score").desc, col("doc_id").asc)))
          .select("rank", "doc_id", "n_terms_hit", "score")
          .orderBy("rank")
      }
    },
    Some(shardedBm25OracleSql))

  /** q175: q152's context packing served from the persisted index
    * alone — ranking off term-pushed postings, token costs off the
    * store's own docstats.dl (== tokenCount(text) by construction:
    * the same tokenizer sized both at build time). The oracle is
    * q152's SQL VERBATIM: serving from the store must reproduce the
    * corpus-served manifest row-for-row — the generator-facing query
    * path at 100 TB runs off index relations with the corpus never
    * read at query time (plan-asserted in TextIndexSpec).
    */
  private val q175 = QueryDef(
    "q175_rag_pack_stored",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      if (docs.isEmpty)
        docs.select(lit(1).as("rank"), col("doc_id"),
          lit(0L).as("n_tokens"), lit(0L).as("cum_tokens"),
          lit(false).as("included")).limit(0)
      else
        withThrowawayIndex(docs)(path => textIndexPackContext(s, path))
          .orderBy("rank")
    },
    Some(ragPackSql))

  /** q189: the corpus lives in a VERSIONED STORE and evolves only
    * through its manifest-committed verbs (save → append → tombstone
    * delete); the text index is bootstrapped from the first revision
    * and then maintained by ONE [[textIndexMaintainFromStore]] call
    * over the revision window — the O(delta) CDC bridge, no caller
    * diffing. The ORACLE recomputes BM25 from scratch over the final
    * visible corpus: the maintained index must lose nothing and add
    * nothing vs a fresh build of `read(toRev)` (CdcIndexSpec pins the
    * loaded relations row-equal too).
    */
  private val q189 = QueryDef(
    "q189_cdc_index_maintenance",
    (s, d) => {
      import graft.operators.VersionedStore
      val docs = Tables(s, d, "documents").select("doc_id", "text", "source")
      val old = docs.filter(col("source") =!= "src19")
      val inc = docs.filter(col("source") === "src19")
      if (old.isEmpty)
        docs.select(lit(1).as("rank"), col("doc_id"),
          lit(1).as("n_terms_hit"), lit(0.0).as("score")).limit(0)
      else {
        val tmp = graft.BenchPhases.storeDir("graft-cdcix")
        val store = tmp + "/corpus"
        val idx = tmp + "/idx"
        graft.BenchPhases.build {
          val r1 = VersionedStore.save(Map("docs" -> old), store)
          val base = VersionedStore.read(s, store, "docs", Some(r1))
          val (p0, ds0) = textIndexBuild(base.select("doc_id", "text"))
          textIndexSave(p0, ds0, idx)
          VersionedStore.append(Map("docs" -> inc), store)
          val doomed = old.filter(col("doc_id") % 17 === 3).select("doc_id")
          val r3 = VersionedStore.delete(doomed, "docs", store)
          textIndexMaintainFromStore(s, store, "docs", r1, r3, idx)
        }
        val top = textIndexSearch(s, idx)
          .orderBy(col("score").desc, col("doc_id").asc).limit(20)
        val res = top.withColumn("rank", row_number().over(
            Window.orderBy(col("score").desc, col("doc_id").asc)))
          .select("rank", "doc_id", "n_terms_hit", "score")
          .orderBy("rank").localCheckpoint(true)
        graft.BenchPhases.discard(s, tmp)
        res
      }
    },
    Some(cdcMaintainOracleSql))

  /** Shared oracle of q189 and q195: BM25 top-20 recomputed from
    * scratch over the final visible corpus of the SAME revision dance
    * (old docs minus the %17=3 deletions, plus the src19 append) — the
    * explicit-window bridge and the marker-driven sync must both land
    * on exactly this.
    */
  private lazy val cdcMaintainOracleSql: String =
    s"""WITH ${bm25CteSqlFrom(
        "(SELECT * FROM documents WHERE NOT (source <> 'src19' AND doc_id % 17 = 3))")}
             SELECT rank, doc_id, n_terms_hit, score FROM (
               SELECT doc_id, n_terms_hit, score,
                      ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rank
               FROM bm) t
             WHERE rank <= 20 ORDER BY rank"""

  /** q195: q189's corpus-evolution scenario driven through the
    * BOOKKEEPING-FREE sync verb — the index checkpoints the revisions
    * it has absorbed ([[graft.operators.RevisionSync]]), so the caller
    * makes three identical `textIndexSyncWithStore` calls (bootstrap,
    * catch-up over BOTH pending revisions at once, and a no-op when
    * already current) and never names a revision number. The oracle is
    * q189's SQL verbatim: how the window was resolved — explicit
    * arguments or the stored marker — must be invisible in the result
    * (CdcIndexSpec additionally pins the crash-lag replay: maintenance
    * applied but marker not yet bumped re-syncs to the identical
    * index).
    */
  private val q195 = QueryDef(
    "q195_index_store_sync",
    (s, d) => {
      import graft.operators.VersionedStore
      val docs = Tables(s, d, "documents").select("doc_id", "text", "source")
      val old = docs.filter(col("source") =!= "src19")
      val inc = docs.filter(col("source") === "src19")
      if (old.isEmpty)
        docs.select(lit(1).as("rank"), col("doc_id"),
          lit(1).as("n_terms_hit"), lit(0.0).as("score")).limit(0)
      else {
        val tmp = graft.BenchPhases.storeDir("graft-syncix")
        val store = tmp + "/corpus"
        val idx = tmp + "/idx"
        graft.BenchPhases.build {
          VersionedStore.save(Map("docs" -> old.select("doc_id", "text")),
            store)
          textIndexSyncWithStore(s, store, "docs", idx) // bootstrap
          VersionedStore.append(
            Map("docs" -> inc.select("doc_id", "text")), store)
          VersionedStore.delete(
            old.filter(col("doc_id") % 17 === 3).select("doc_id"),
            "docs", store)
          textIndexSyncWithStore(s, store, "docs", idx) // catch up both
          require(textIndexSyncWithStore(s, store, "docs", idx).isEmpty,
            "q195: a third sync against an unchanged store must be a no-op")
        }
        val top = textIndexSearch(s, idx)
          .orderBy(col("score").desc, col("doc_id").asc).limit(20)
        val res = top.withColumn("rank", row_number().over(
            Window.orderBy(col("score").desc, col("doc_id").asc)))
          .select("rank", "doc_id", "n_terms_hit", "score")
          .orderBy("rank").localCheckpoint(true)
        graft.BenchPhases.discard(s, tmp)
        res
      }
    },
    Some(cdcMaintainOracleSql))

  /** q198: q189's corpus-evolution scenario driven through the
    * MANIFEST-COMMITTED text index's own verbs — save revision 1 from
    * the old corpus, append the increment, tombstone-delete the doomed
    * docs (each verb ONE manifest PUT spanning postings and docstats),
    * then search the current revision. The oracle is q189/q195's SQL
    * VERBATIM: swapping the whole commit protocol under the index —
    * rename windows + integrity stamps out, immutable dirs + manifest
    * PUTs in — must change NOTHING about what the search returns.
    */
  private val q198 = QueryDef(
    "q198_versioned_text_search",
    (s, d) => {
      val docs = Tables(s, d, "documents").select("doc_id", "text", "source")
      val old = docs.filter(col("source") =!= "src19")
      val inc = docs.filter(col("source") === "src19")
      if (old.isEmpty)
        docs.select(lit(1).as("rank"), col("doc_id"),
          lit(1).as("n_terms_hit"), lit(0.0).as("score")).limit(0)
      else {
        val tmp = graft.BenchPhases.storeDir("graft-vtix")
        val idx = tmp + "/idx"
        graft.BenchPhases.build {
          textIndexSaveVersioned(old.select("doc_id", "text"), idx)
          textIndexAppendVersioned(inc.select("doc_id", "text"), idx)
          textIndexDeleteVersioned(
            old.filter(col("doc_id") % 17 === 3).select("doc_id"), idx)
        }
        val top = textIndexSearchVersioned(s, idx)
          .orderBy(col("score").desc, col("doc_id").asc).limit(20)
        val res = top.withColumn("rank", row_number().over(
            Window.orderBy(col("score").desc, col("doc_id").asc)))
          .select("rank", "doc_id", "n_terms_hit", "score")
          .orderBy("rank").localCheckpoint(true)
        graft.BenchPhases.discard(s, tmp)
        res
      }
    },
    Some(cdcMaintainOracleSql))

  /** q213: q198's search served from a store MIGRATED off the rename
    * protocol — drive the RENAME-family lifecycle (save, append,
    * tombstone-delete), run [[migrateTextIndexToVersioned]] (every
    * relation through the verifying loader, pending tombstones applied,
    * ONE manifest PUT — an O(index) copy, the corpus never
    * re-tokenized), and search the MIGRATED store through the versioned
    * family's verb. The oracle is q189/q195/q198's SQL VERBATIM: the
    * protocol switch must be invisible to the search — same statistics,
    * same ranking, bit for bit.
    */
  private val q213 = QueryDef(
    "q213_migrated_text_search",
    (s, d) => {
      val docs = Tables(s, d, "documents").select("doc_id", "text", "source")
      val old = docs.filter(col("source") =!= "src19")
      val inc = docs.filter(col("source") === "src19")
      if (old.isEmpty)
        docs.select(lit(1).as("rank"), col("doc_id"),
          lit(1).as("n_terms_hit"), lit(0.0).as("score")).limit(0)
      else {
        val tmp = graft.BenchPhases.storeDir("graft-migtix")
        val ren = tmp + "/ren"
        val ver = tmp + "/ver"
        graft.BenchPhases.build {
          val (p, ds) = textIndexBuild(old.select("doc_id", "text"))
          textIndexSave(p, ds, ren)
          textIndexAppend(inc.select("doc_id", "text"), ren)
          textIndexDelete(
            old.filter(col("doc_id") % 17 === 3).select("doc_id"), ren)
          migrateTextIndexToVersioned(s, ren, ver)
        }
        val top = textIndexSearchVersioned(s, ver)
          .orderBy(col("score").desc, col("doc_id").asc).limit(20)
        val res = top.withColumn("rank", row_number().over(
            Window.orderBy(col("score").desc, col("doc_id").asc)))
          .select("rank", "doc_id", "n_terms_hit", "score")
          .orderBy("rank").localCheckpoint(true)
        graft.BenchPhases.discard(s, tmp)
        res
      }
    },
    Some(cdcMaintainOracleSql))

  /** q199: TIME-TRAVEL search — the capability the manifest protocol
    * gives the index family for free and a rename-based store
    * structurally cannot: after the append and the delete land, search
    * the index AS OF revision 1 and get the ranking exactly as it
    * stood — old corpus statistics, old candidate set, bit for bit.
    * This is the retrieval-reproducibility primitive (re-run last
    * week's RAG query under last week's index to attribute a drifted
    * answer to corpus change vs code change). The oracle recomputes
    * BM25 from scratch over ONLY the old corpus slice: the later
    * revisions' appends and tombstones must be invisible at `asOf`.
    */
  private val q199 = QueryDef(
    "q199_time_travel_search",
    (s, d) => {
      val docs = Tables(s, d, "documents").select("doc_id", "text", "source")
      val old = docs.filter(col("source") =!= "src19")
      val inc = docs.filter(col("source") === "src19")
      if (old.isEmpty)
        docs.select(lit(1).as("rank"), col("doc_id"),
          lit(1).as("n_terms_hit"), lit(0.0).as("score")).limit(0)
      else {
        val tmp = graft.BenchPhases.storeDir("graft-ttix")
        val idx = tmp + "/idx"
        val r1 = graft.BenchPhases.build {
          val r = textIndexSaveVersioned(old.select("doc_id", "text"), idx)
          textIndexAppendVersioned(inc.select("doc_id", "text"), idx)
          textIndexDeleteVersioned(
            old.filter(col("doc_id") % 17 === 3).select("doc_id"), idx)
          r
        }
        val top = textIndexSearchVersioned(s, idx, asOf = Some(r1))
          .orderBy(col("score").desc, col("doc_id").asc).limit(20)
        val res = top.withColumn("rank", row_number().over(
            Window.orderBy(col("score").desc, col("doc_id").asc)))
          .select("rank", "doc_id", "n_terms_hit", "score")
          .orderBy("rank").localCheckpoint(true)
        graft.BenchPhases.discard(s, tmp)
        res
      }
    },
    Some(s"""WITH ${bm25CteSqlFrom(
        "(SELECT * FROM documents WHERE source <> 'src19')")}
             SELECT rank, doc_id, n_terms_hit, score FROM (
               SELECT doc_id, n_terms_hit, score,
                      ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rank
               FROM bm) t
             WHERE rank <= 20 ORDER BY rank"""))

  override def defs: Seq[QueryDef] =
    Seq(q92, q93, q152, q154, q163, q167, q168, q170, q171, q172, q173,
      q174, q175, q189, q190, q195, q198, q199, q211, q213)
}
