package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions.{asDouble, dot}

/** Scalar (SQ8) quantization of the embedding corpus — the missing middle
  * of the compression family (flat float64 → SQ8 int8 → PQ → residual
  * IVF-PQ → binary sign codes). Each dimension is affinely mapped to one
  * byte using the corpus per-dimension min/max: 8× smaller than float64
  * at near-exact recall, the industry-default first compression step
  * before PQ's lossier 32–128×.
  *
  * The reference (etlhelper) has no vector surface at all — its closest
  * analogue is typed row transform on extract
  * (/root/reference/etlhelper/row_factories.py:1) — so this module is
  * part of the designed beyond-reference LLM-pipeline capability set
  * (SURVEY.md §2.12).
  *
  * Determinism discipline (the hash-gate contract every quantization
  * family here obeys): the trained parameters are per-dimension MIN/MAX —
  * order-insensitive aggregates, bit-identical on any engine and any
  * partitioning, unlike a mean/std scheme whose float sums drift with
  * reduction order. Codes follow by `floor(x + 0.5)` on identically
  * derived doubles, reconstruction and ADC distances are elementwise
  * arithmetic plus one sequential-fold dot product — every step
  * bit-identical to the DuckDB twin.
  *
  * Scale design: training is ONE corpus scan with map-side partial
  * min/max (64 rows per partition pre-shuffle); encoding is map-only
  * against the broadcast 1-row parameter frame; search scans ONLY the
  * 64-byte code rows (the raw vectors never rescan — the ADC move), with
  * queries broadcast and the exact two-stage
  * [[graft.operators.GroupTopK]] keeping every shuffle candidate-sized.
  */
object QuantQueries extends QueryModule {

  private val dims = 64
  private val levels = 255 // codes span [0, 255]

  /** ||a-b||² via the dot expansion (three sequential folds) — the shared
    * exactness form (see SimilarityQueries.l2).
    */
  private def l2(a: Column, b: Column): Column =
    dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b)
  private def l2Sql(a: String, b: String) =
    s"(list_dot_product($a, $a) - 2.0 * list_dot_product($a, $b) + list_dot_product($b, $b))"

  /** Train the SQ8 parameters over `e`(vec_id, v): a single-row frame
    * (mn: array<double>, mx: array<double>) holding the per-dimension
    * corpus min/max. One scan, map-side combined to 64 rows per
    * partition; the 64-row shuffle output is assembled into ordered
    * arrays so the parameter artifact broadcasts as one row.
    */
  def sqTrain(e: DataFrame): DataFrame = {
    val perDim = e.select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("i").agg(min("x").as("mni"), max("x").as("mxi"))
    perDim.agg(
        sort_array(collect_list(struct(col("i"), col("mni")))).as("a"),
        sort_array(collect_list(struct(col("i"), col("mxi")))).as("b"))
      .select(expr("transform(a, s -> s.mni)").as("mn"),
        expr("transform(b, s -> s.mxi)").as("mx"))
  }

  /** Per-dimension byte code: 0 for a constant dimension (mx = mn, where
    * the affine map is degenerate), else round((v-mn)/step) clamped to
    * [0, 255] with step = (mx-mn)/255 — the clamp is inert on training
    * data (min/max bound it by construction) and exact on appended
    * out-of-range vectors.
    */
  private val encodeExpr =
    s"""transform(sequence(1, $dims), i ->
          IF(element_at(mx, i) = element_at(mn, i), 0,
             least($levels, greatest(0, CAST(floor(
               (element_at(v, i) - element_at(mn, i))
                 / ((element_at(mx, i) - element_at(mn, i)) / $levels.0D)
                 + 0.5D) AS INT)))))"""

  private def encodeSql(v: String) =
    s"""list_transform(range(1, ${dims + 1}), i ->
          CASE WHEN mx[i] = mn[i] THEN 0
               ELSE least($levels, greatest(0, CAST(floor(
                 ($v[i] - mn[i]) / ((mx[i] - mn[i]) / $levels.0) + 0.5)
                 AS INT))) END)"""

  /** Reconstruction difference q − dequant(code): elementwise, then one
    * sequential dot for the ADC distance. A constant dimension has
    * step = 0 and code = 0, so dequant degenerates to mn — no special
    * case needed on the decode side.
    */
  private val diffExpr =
    s"""transform(sequence(1, $dims), i ->
          element_at(qv, i) - (element_at(mn, i)
            + CAST(element_at(code, i) AS DOUBLE)
              * ((element_at(mx, i) - element_at(mn, i)) / $levels.0D)))"""

  private val diffSql =
    s"""list_transform(range(1, ${dims + 1}), i ->
          qv[i] - (mn[i] + CAST(code[i] AS DOUBLE)
            * ((mx[i] - mn[i]) / $levels.0)))"""

  /** Identity of a trained SQ8 parameter set: md5 over the exact bit
    * patterns of both arrays under the family/layout tag. The same
    * provenance gate the PQ/IVF/binary stores carry — codes encoded
    * under foreign parameters must fail loudly, not search wrongly.
    */
  def sqFingerprint(params: DataFrame): String = {
    val rows = params.select(col("mn"), col("mx")).collect()
    require(rows.length == 1,
      s"sqFingerprint: expected the 1-row parameter frame, got ${rows.length} rows")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(s"sq8:dims=$dims:levels=${levels + 1}:".getBytes("UTF-8"))
    Seq(rows(0).getSeq[Double](0), rows(0).getSeq[Double](1)).foreach { arr =>
      require(arr.length == dims,
        s"sqFingerprint: parameter arrays must have $dims entries, got ${arr.length}")
      arr.foreach { x =>
        md.update(java.nio.ByteBuffer.allocate(8)
          .putLong(java.lang.Double.doubleToLongBits(x)).array())
      }
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Encode `emb`(vec_id, v) under `params`: (vec_id, code: array<int>,
    * fp). Map-only — the 1-row parameter frame is broadcast; vector
    * length is validated on the scan (a short array would silently
    * quantize missing dimensions).
    */
  def sqCodes(params: DataFrame, emb: DataFrame): DataFrame = {
    val fp = sqFingerprint(params)
    emb.filter(
        assert_true(size(col("v")) === lit(dims),
          lit(s"sqCodes: vector length must be $dims")).isNull)
      .crossJoin(broadcast(params))
      .select(col("vec_id"), expr(encodeExpr).as("code"))
      .withColumn("fp", lit(fp))
  }

  /** Persist the SQ8 index: the parameter row (+ fingerprint + layout)
    * at `path`/meta, the byte codes at `path`/codes — build once, search
    * forever, append increments (the PQ/IVF/binary store lifecycle).
    */
  def sqSaveIndex(params: DataFrame, codes: DataFrame, path: String): Unit = {
    val fp = sqFingerprint(params)
    require(codes.columns.contains("fp"),
      "sqSaveIndex: codes carry no provenance stamp — encode them with sqCodes")
    val stamps = codes.select("fp").distinct().collect()
      .map(_.getString(0)).toSeq.sorted
    require(stamps.nonEmpty,
      "sqSaveIndex: refusing to persist an EMPTY code set — encode the " +
        "corpus with sqCodes first (an empty store would be rejected by " +
        "sqLoadIndex as interrupted)")
    require(stamps == Seq(fp),
      s"sqSaveIndex: codes were encoded under parameters ${stamps.mkString(", ")} " +
        s"that do not match the parameter frame in hand ($fp) — a " +
        "foreign-parameter store would decode every distance wrongly")
    params.select(col("mn"), col("mx"), lit(fp).as("fp"),
        lit(dims).as("dims"), lit(levels + 1).as("levels"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    codes.write.mode("overwrite").parquet(s"$path/codes")
  }

  /** Restore a persisted SQ8 index as (params, codes). The stored
    * fingerprint is recomputed from the stored arrays (a corrupted or
    * hand-edited parameter row fails here, not as wrong distances) and
    * every code row's stamp is checked — a store spliced from two
    * trainings fails loudly.
    */
  def sqLoadIndex(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val meta = spark.read.parquet(s"$path/meta")
    val head = meta.select("fp").take(1)
    require(head.nonEmpty,
      s"sqLoadIndex: meta store at $path/meta is empty — interrupted " +
        "save or wrong path")
    val params = meta.select("mn", "mx")
    val recomputed = sqFingerprint(params)
    require(head(0).getString(0) == recomputed,
      s"sqLoadIndex: stored fingerprint ${head(0).getString(0)} does not " +
        s"match the stored parameter arrays ($recomputed) — the meta row " +
        "was corrupted or edited; retrain instead of searching it")
    val codes = spark.read.parquet(s"$path/codes")
    val stamps = codes.select("fp").distinct().collect()
      .map(_.getString(0)).toSeq
    require(stamps == Seq(recomputed),
      s"sqLoadIndex: code rows carry stamps ${stamps.mkString(", ")} — the " +
        s"store at $path/codes mixes trainings or is corrupt")
    (params, codes)
  }

  /** The APPEND verb: encode a new batch under the STORE's parameters and
    * append, idempotent on vec_id. Out-of-range components (the trained
    * min/max no longer bound a drifted increment) clamp to the byte
    * range — quantization error grows at the clamp but ordering stays
    * sane; retraining is the drift remedy, detected by comparing
    * [[sqTrain]] on the grown corpus against the stored parameters.
    */
  def sqAppendCodes(emb: DataFrame, path: String): Unit = {
    val spark = emb.sparkSession
    val (params, _) = sqLoadIndex(spark, path)
    val existing = spark.read.parquet(s"$path/codes").select("vec_id").distinct()
    sqCodes(params, emb.join(existing, Seq("vec_id"), "left_anti"))
      .write.mode("append").parquet(s"$path/codes")
  }

  /** Asymmetric-distance search over SQ8 codes: full-precision `queries`
    * (qid, qv) are broadcast with the parameter row; the corpus side is
    * ONLY its 64-byte code rows, each dequantized against the query
    * in-register (elementwise diff + one sequential dot — all codegen'd,
    * no UDFs). Returns the exact ADC top-`topR` per query via
    * [[graft.operators.GroupTopK]] with the rank as `arank`; callers
    * rerank survivors against full-precision vectors exactly as q136
    * does inline. `excludeSelfMatches` only when queries are corpus
    * members.
    */
  def sqAdcSearch(params: DataFrame, codes: DataFrame, queries: DataFrame,
      topR: Int = 25, excludeSelfMatches: Boolean = false): DataFrame = {
    val pq = queries.crossJoin(broadcast(params))
    val scored = codes.select("vec_id", "code")
      .join(broadcast(pq),
        if (excludeSelfMatches) col("vec_id") =!= col("qid") else lit(true))
      .withColumn("d", expr(diffExpr))
      .select(col("qid"), col("vec_id"),
        dot(col("d"), col("d")).as("adc_dist"))
    graft.operators.GroupTopK.topK(scored, Seq(col("qid")),
      Seq(col("adc_dist").asc, col("vec_id").asc), col("vec_id"), topR,
      rankName = "arank")
  }

  /** SQ8 ANN end-to-end: train the per-dimension affine parameters,
    * encode the corpus to one byte per dimension, take the ADC top-25
    * per query off the code scan, and rerank the survivors by exact L2
    * for the final top-5. The rerank window is candidate-sized (<= 25
    * rows per query by construction), never corpus-sized.
    */
  private val q136 = QueryDef(
    "q136_sq8_adc_search",
    (s, d) => {
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      // the 1-row parameter frame feeds the encoder AND the search —
      // materialize once (q72 one-relation-many-consumers discipline)
      val params = sqTrain(e).localCheckpoint(true)
      val codes = sqCodes(params, e)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val cand = sqAdcSearch(params, codes, q, topR = 25,
        excludeSelfMatches = true)
      val wr = Window.partitionBy("qid")
        .orderBy(col("l2_dist").asc, col("vec_id").asc)
      e.join(broadcast(cand.select("qid", "vec_id", "adc_dist")), "vec_id")
        .join(broadcast(q), "qid")
        .withColumn("l2_dist", l2(col("qv"), col("v")))
        .withColumn("rank", row_number().over(wr))
        .filter(col("rank") <= 5)
        .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"),
          col("rank"), col("adc_dist"), col("l2_dist"))
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                        FROM embeddings),
                  pd AS (SELECT i, MIN(v[i]) AS mni, MAX(v[i]) AS mxi
                         FROM e CROSS JOIN range(1, ${dims + 1}) r(i)
                         GROUP BY i),
                  params AS (SELECT list(mni ORDER BY i) AS mn,
                                    list(mxi ORDER BY i) AS mx FROM pd),
                  codes AS (SELECT vec_id, ${encodeSql("v")} AS code
                            FROM e CROSS JOIN params),
                  q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
                  scored AS (SELECT qid, vec_id, qv,
                               list_dot_product(d, d) AS adc_dist
                             FROM (SELECT qid, vec_id, qv, $diffSql AS d
                                   FROM codes CROSS JOIN q CROSS JOIN params
                                   WHERE vec_id <> qid) t),
                  cand AS (SELECT qid, vec_id, qv, adc_dist FROM (
                             SELECT qid, vec_id, qv, adc_dist,
                               ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY adc_dist ASC, vec_id ASC) AS arank
                             FROM scored) a WHERE arank <= 25)
             SELECT qid AS query_id, vec_id AS neighbor_id, rank, adc_dist,
                    l2_dist
             FROM (SELECT qid, vec_id, adc_dist,
                     ${l2Sql("qv", "e.v")} AS l2_dist,
                     ROW_NUMBER() OVER (PARTITION BY qid
                       ORDER BY ${l2Sql("qv", "e.v")} ASC, vec_id ASC) AS rank
                   FROM cand JOIN e USING (vec_id)) r
             WHERE rank <= 5 ORDER BY query_id, rank"""))

  override def defs: Seq[QueryDef] = Seq(q136)
}
