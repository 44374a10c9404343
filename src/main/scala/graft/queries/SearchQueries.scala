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
  * Scale design: the query-term set is tiny by definition, so term
  * statistics (df, avgdl) are broadcast scalars; the tf scan filters to
  * query terms INSIDE the token explode (predicate on the generator
  * output), so the only shuffled relation is (matching doc, term) —
  * query-selectivity-sized, not corpus-sized. Ranking is over the matching
  * set only; the corpus never sorts globally.
  *
  * Cross-engine determinism: BM25 is computed in its log-free odds form —
  * idf = (N - df + 0.5)/(df + 0.5) without the usual ln() — because ln()
  * bit-patterns are libm-dependent (the q51 rationale). The per-term scores
  * are summed in FIXED term order (one pivoted column per term), not by a
  * floating-point aggregate whose addition order the engine picks.
  */
object SearchQueries extends QueryModule {

  private val tokSql = "regexp_extract_all(lower(text), '[a-z0-9]+')"

  /** The fixed demo query. Any term set works; these hit the corpus. */
  private val terms = Seq("spark", "window", "hash")

  /** BM25 scores (k1=1.2, b=0.75, log-free idf) for documents matching at
    * least one query term: (doc_id, n_terms_hit, score).
    */
  def bm25Scores(docs: DataFrame, queryTerms: Seq[String] = terms): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val tf = tok.filter(col("tok").isin(queryTerms: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfx = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("tot"))
    val avgdl = col("tot").cast("double") / col("n_docs").cast("double")
    val idf = (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val tfd = col("tf").cast("double")
    val norm = (tfd * lit(2.2)) /
      (tfd + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl)))
    val scored = tf.join(broadcast(dfx), "tok").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("tok"), (idf * norm).as("s"))
    // pivot to one column per term: each per-term aggregate sees <= 1 row,
    // so the final fixed-order addition is engine-identical
    val pivoted = scored.groupBy("doc_id")
      .agg(sum(when(col("tok") === queryTerms.head, col("s"))).as("s0"),
        queryTerms.tail.zipWithIndex.map { case (t, i) =>
          sum(when(col("tok") === t, col("s"))).as(s"s${i + 1}")
        }: _*)
    val hit = queryTerms.indices
      .map(i => col(s"s$i").isNotNull.cast("int")).reduce(_ + _)
    val total = queryTerms.indices
      .map(i => coalesce(col(s"s$i"), lit(0.0))).reduce(_ + _)
    pivoted.select(col("doc_id"), hit.as("n_terms_hit"), total.as("score"))
  }

  /** Shared oracle CTE chain ending in `bm(doc_id, n_terms_hit, score)` —
    * the q92 scorer, reused verbatim by q93's fusion oracle.
    */
  private val bm25CteSql =
    s"""tok AS (SELECT doc_id, unnest($tokSql) AS tok FROM documents),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
        stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS tot FROM dl),
        tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok
               WHERE tok IN (${terms.map(t => s"'$t'").mkString(", ")})
               GROUP BY doc_id, tok),
        dfx AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        scored AS (SELECT doc_id, tok,
                     ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                        / (CAST(df AS DOUBLE) + 0.5))
                     * ((CAST(tf AS DOUBLE) * 2.2)
                        / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75
                             * (CAST(dl AS DOUBLE)
                                / (CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) AS s
                   FROM tf JOIN dfx USING (tok) JOIN dl USING (doc_id)
                   CROSS JOIN stats),
        piv AS (SELECT doc_id,
                  ${terms.zipWithIndex.map { case (t, i) =>
                    s"SUM(CASE WHEN tok = '$t' THEN s END) AS s$i"
                  }.mkString(",\n                  ")}
                FROM scored GROUP BY doc_id),
        bm AS (SELECT doc_id,
                 ${terms.indices.map(i => s"CAST(s$i IS NOT NULL AS INT)").mkString(" + ")} AS n_terms_hit,
                 ${terms.indices.map(i => s"COALESCE(s$i, 0.0)").mkString(" + ")} AS score
               FROM piv)"""

  /** BM25 top-20 for the fixed query-term set. */
  private val q92 = QueryDef(
    "q92_bm25_search",
    (s, d) => {
      val bm = bm25Scores(Tables(s, d, "documents"))
      bm.withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id").asc)))
        .filter(col("rank") <= 20)
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
    * reciprocal-rank fusion, rrf = 1/(60+r_bm25) + 1/(60+r_cos). The dense
    * side ranks every non-query vector against the query vector (vec_id 0,
    * broadcast); the sparse side ranks BM25 matches. A document missing
    * from one list contributes only the other list's term — the standard
    * RRF convention.
    *
    * Scale shape: both ranked lists are CANDIDATE lists (BM25 matches /
    * ANN results), orders of magnitude smaller than the corpus — the
    * full-corpus dense rank here stands in for an ANN top-k (q37/q62); the
    * fusion join is candidate-sized. The global row_number windows rank
    * those candidate lists, not the corpus.
    */
  private val q93 = QueryDef(
    "q93_hybrid_rrf",
    (s, d) => {
      val bm = bm25Scores(Tables(s, d, "documents"))
        .select(col("doc_id"), row_number().over(
          Window.orderBy(col("score").desc, col("doc_id").asc)).as("bm25_rank"))
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
      val vr = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .select(col("vec_id"), cosine(col("v"), col("qv")).as("sim"))
        .select(col("vec_id"), row_number().over(
          Window.orderBy(col("sim").desc, col("vec_id").asc)).as("cos_rank"))
      bm.join(vr, col("doc_id") === col("vec_id"), "full_outer")
        .select(coalesce(col("doc_id"), col("vec_id")).as("id"),
          col("bm25_rank"), col("cos_rank"))
        .withColumn("rrf",
          coalesce(lit(1.0) / (lit(60.0) + col("bm25_rank").cast("double")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60.0) + col("cos_rank").cast("double")), lit(0.0)))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("rrf").desc, col("id").asc)))
        .filter(col("rank") <= 15)
        .select("rank", "id", "bm25_rank", "cos_rank", "rrf")
        .orderBy("rank")
    },
    Some(s"""WITH $bm25CteSql,
                  br AS (SELECT doc_id,
                           ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS bm25_rank
                         FROM bm),
                  e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                  q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
                  vr AS (SELECT vec_id,
                           ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id ASC) AS cos_rank
                         FROM (SELECT vec_id,
                                 list_dot_product(v, qv)
                                   / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) AS sim
                               FROM e CROSS JOIN q WHERE vec_id <> 0)),
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

  override def defs: Seq[QueryDef] = Seq(q92, q93)
}
