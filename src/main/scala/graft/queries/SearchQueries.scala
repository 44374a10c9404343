package graft.queries

import org.apache.spark.sql.DataFrame
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
    val avgdl = col("tot").cast("double") / col("n_docs").cast("double")
    def termScore(i: Int) = {
      val idf = (col("n_docs").cast("double") - col(s"df$i").cast("double") + lit(0.5)) /
        (col(s"df$i").cast("double") + lit(0.5))
      val tfd = col(s"tf$i").cast("double")
      val norm = (tfd * lit(2.2)) /
        (tfd + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl)))
      when(col(s"tf$i") > 0, idf * norm).otherwise(lit(0.0))
    }
    base.filter(queryTerms.indices.map(i => col(s"tf$i") > 0).reduce(_ || _))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
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
      val bm = bm25Scores(docs)
      val top = bm.orderBy(col("score").desc, col("doc_id").asc).limit(20)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id").asc)))
      val costed = top
        .join(docs.select(col("doc_id"),
          tokenCount(col("text")).cast("long").as("n_tokens")), Seq("doc_id"))
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
    },
    Some(s"""WITH $bm25CteSql,
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
             ORDER BY rank"""))

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

  override def defs: Seq[QueryDef] = Seq(q92, q93, q152, q154)
}
