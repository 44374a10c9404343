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

  /** The SQ8 train→encode→ADC chain as oracle CTEs ending in
    * scored(qid, vec_id, adc_dist) — the exact arithmetic of q136/q157's
    * oracles, factored for oracles composed OUTSIDE this module (q171's
    * hybrid fusion) so the engine-side scoring has ONE SQL twin.
    */
  private[queries] def sq8AdcOracleCtes(queryPred: String): String =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings),
        pd AS (SELECT i, MIN(v[i]) AS mni, MAX(v[i]) AS mxi
               FROM e CROSS JOIN range(1, ${dims + 1}) r(i)
               GROUP BY i),
        params AS (SELECT list(mni ORDER BY i) AS mn,
                          list(mxi ORDER BY i) AS mx FROM pd),
        codes AS (SELECT vec_id, ${encodeSql("v")} AS code
                  FROM e CROSS JOIN params),
        q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE $queryPred),
        scored AS (SELECT qid, vec_id, list_dot_product(d, d) AS adc_dist
                   FROM (SELECT qid, vec_id, $diffSql AS d
                         FROM codes CROSS JOIN q CROSS JOIN params) t)"""

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
      // length 0 is the empty-corpus degenerate (nothing to encode, and
      // sqSaveIndex refuses empty stores anyway); any OTHER length is a
      // layout mismatch that would silently mis-decode every distance
      require(arr.length == dims || arr.isEmpty,
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

  /** Provenance gates shared by the rename-family and manifest-committed
    * saves: the codes must carry [[sqCodes]]' stamp, must be non-empty,
    * and the stamp must match the parameter frame in hand (a
    * foreign-parameter store would decode every distance wrongly).
    * Returns the 1-row meta frame (mn, mx, fp, dims, levels).
    */
  private def sqMetaChecked(params: DataFrame, codes: DataFrame,
      verb: String): DataFrame = {
    val fp = sqFingerprint(params)
    require(codes.columns.contains("fp"),
      s"$verb: codes carry no provenance stamp — encode them with sqCodes")
    val stamps = codes.select("fp").distinct().collect()
      .map(_.getString(0)).toSeq.sorted
    require(stamps.nonEmpty,
      s"$verb: refusing to persist an EMPTY code set — encode the " +
        "corpus with sqCodes first (an empty store would be rejected at " +
        "load as interrupted)")
    require(stamps == Seq(fp),
      s"$verb: codes were encoded under parameters ${stamps.mkString(", ")} " +
        s"that do not match the parameter frame in hand ($fp) — a " +
        "foreign-parameter store would decode every distance wrongly")
    params.select(col("mn"), col("mx"), lit(fp).as("fp"),
      lit(dims).as("dims"), lit(levels + 1).as("levels"))
  }

  /** Load-side gates shared by [[sqLoadIndex]] and
    * [[sqLoadIndexVersioned]]: the stored fingerprint is recomputed from
    * the stored arrays (a corrupted or hand-edited parameter row fails
    * here, not as wrong distances) and every code row's stamp is checked
    * — a store spliced from two trainings fails loudly. Returns params.
    */
  private def sqGateLoaded(meta: DataFrame, codes: DataFrame,
      verb: String, where: String): DataFrame = {
    val head = meta.select("fp").take(1)
    require(head.nonEmpty,
      s"$verb: meta store at $where is empty — interrupted save or " +
        "wrong path")
    val params = meta.select("mn", "mx")
    val recomputed = sqFingerprint(params)
    require(head(0).getString(0) == recomputed,
      s"$verb: stored fingerprint ${head(0).getString(0)} does not " +
        s"match the stored parameter arrays ($recomputed) — the meta row " +
        "was corrupted or edited; retrain instead of searching it")
    val stamps = codes.select("fp").distinct().collect()
      .map(_.getString(0)).toSeq
    require(stamps == Seq(recomputed),
      s"$verb: code rows carry stamps ${stamps.mkString(", ")} — the " +
        s"store at $where mixes trainings or is corrupt")
    params
  }

  /** Persist the SQ8 index: the parameter row (+ fingerprint + layout)
    * at `path`/meta, the byte codes at `path`/codes — build once, search
    * forever, append increments (the PQ/IVF/binary store lifecycle).
    */
  def sqSaveIndex(params: DataFrame, codes: DataFrame, path: String): Unit = {
    val meta = sqMetaChecked(params, codes, "sqSaveIndex")
    meta.coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    codes.write.mode("overwrite").parquet(s"$path/codes")
    // a full save is the compaction point: the new code set is the
    // authoritative corpus, so pending tombstones (already excluded from
    // any properly-rebuilt code set) are cleared rather than masking the
    // fresh store
    graft.operators.IndexTombstones.clear(codes.sparkSession, path)
  }

  /** Restore a persisted SQ8 index as (params, codes). The stored
    * fingerprint is recomputed from the stored arrays (a corrupted or
    * hand-edited parameter row fails here, not as wrong distances) and
    * every code row's stamp is checked — a store spliced from two
    * trainings fails loudly.
    */
  def sqLoadIndex(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val meta = spark.read.parquet(s"$path/meta")
    val codes = spark.read.parquet(s"$path/codes")
    val params = sqGateLoaded(meta, codes, "sqLoadIndex", s"$path")
    // tombstones mask deleted vectors at load, so EVERY consumer of a
    // loaded store honors deletions without its own bookkeeping
    (params, graft.operators.IndexTombstones.mask(codes, path))
  }

  /** The DELETE verb of the store lifecycle (the q138 cascade's index
    * half): record `ids`(vec_id) as tombstones — [[sqLoadIndex]] masks
    * them from every subsequent search. Deletion is a small append, not
    * a store rewrite (at 100 TB rewriting the code store per DSAR batch
    * is the non-starter; the mask is tombstone-list-sized and compacts
    * at the next full save). Idempotent: re-deleting is a no-op at read
    * (distinct), and deletion is STICKY — a tombstoned vec_id stays
    * masked even if re-appended, because forgetting must survive a
    * replayed ingest; re-admission requires an explicit new save.
    */
  def sqDeleteVectors(ids: DataFrame, path: String): Unit = {
    val spark = ids.sparkSession
    val meta = spark.read.parquet(s"$path/meta").select("fp").take(1)
    require(meta.nonEmpty,
      s"sqDeleteVectors: meta store at $path/meta is empty — nothing to " +
        "delete from (interrupted save or wrong path)")
    graft.operators.IndexTombstones.append(ids, path)
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

  // ------------------------------------------------------------------
  // MANIFEST-COMMITTED SQ8 store — the VECTOR-family migration off the
  // rename-based commit protocol (SCALING.md "commit-protocol fork";
  // q197 signature = single-relation template, q198 text =
  // multi-relation template; this is the params+codes template the
  // remaining quantization families follow). The SAME relations — the
  // 1-row `meta` (mn, mx, fp, dims, levels) and `codes`(vec_id, code,
  // fp) — live inside one [[graft.operators.VersionedStore]]: build is
  // ONE manifest PUT spanning both (the rename family orders two
  // directory writes and gates the torn window with its fingerprint
  // recompute), append references the existing code dirs and adds one
  // (never rewrites), delete is a manifest tombstone, and every verb
  // is object-store-safe (no directory rename anywhere) with no
  // recover verb needed. The provenance gates are IDENTICAL to the
  // rename family ([[sqMetaChecked]]/[[sqGateLoaded]] — shared bodies,
  // so the two families can never drift), and the semantics carry
  // over exactly: the quantizer is FROZEN at build (appends encode
  // under the stored parameters — retraining is the rebuild path),
  // deletion is STICKY for a re-appended SAME vec_id until
  // [[graft.operators.VersionedStore.compact]] folds the tombstone out
  // (the rename family's stickiness lasts until the next full save —
  // same trade, different compaction point). Time-travel search comes
  // free: `asOf` serves the codes AND the meta row as of any earlier
  // revision, so last week's ANN results reproduce bit-exactly after
  // the corpus has moved on.
  // ------------------------------------------------------------------

  /** Build the manifest-committed SQ8 store: ONE revision commits the
    * checked meta row and the stamped codes together. `extra` relations
    * (the façade's 1-row `family` marker) ride the SAME commit, so a
    * façade build is crash-atomic end to end — there is no instant at
    * which the data is committed but the marker is not.
    */
  def sqSaveIndexVersioned(params: DataFrame, codes: DataFrame,
      path: String, extra: Map[String, DataFrame] = Map.empty): Long = {
    val meta = sqMetaChecked(params, codes, "sqSaveIndexVersioned")
    graft.operators.VersionedStore.save(
      Map("meta" -> meta.coalesce(1), "codes" -> codes) ++ extra, path)
  }

  /** Restore (params, codes) at the current — or `asOf` — revision,
    * through the SAME gates as [[sqLoadIndex]]. No tombstone sidecar to
    * mask: deletes are manifest tombstones, already applied by the
    * versioned read.
    */
  def sqLoadIndexVersioned(spark: SparkSession, path: String,
      asOf: Option[Long] = None): (DataFrame, DataFrame) = {
    val meta = graft.operators.VersionedStore.read(spark, path, "meta", asOf)
    val codes = graft.operators.VersionedStore.read(spark, path, "codes", asOf)
    (sqGateLoaded(meta, codes, "sqLoadIndexVersioned", path), codes)
  }

  /** APPEND: encode the batch under the STORE's frozen parameters
    * (out-of-range components clamp, exactly like [[sqAppendCodes]]),
    * idempotent on vec_id against the visible code set, committed as a
    * delta revision — existing dirs are referenced, never read or
    * rewritten beyond the dedup anti-join. A batch that nets to zero
    * fresh rows commits nothing and returns the current revision (an
    * empty data dir would poison the multi-dir read).
    */
  def sqAppendCodesVersioned(emb: DataFrame, path: String): Long = {
    val spark = emb.sparkSession
    val (params, existing) = sqLoadIndexVersioned(spark, path)
    val fresh = sqCodes(params,
      emb.join(existing.select("vec_id").distinct(), Seq("vec_id"),
        "left_anti")).localCheckpoint(true)
    if (fresh.isEmpty)
      graft.operators.VersionedStore.currentVersion(spark, path).get
    else
      graft.operators.VersionedStore.append(Map("codes" -> fresh), path)
  }

  /** DELETE: one manifest tombstone revision on `codes`. Idempotent;
    * sticky for a re-appended same vec_id until compact (see the
    * family header).
    */
  def sqDeleteVectorsVersioned(ids: DataFrame, path: String): Long =
    graft.operators.VersionedStore.delete(ids.select("vec_id"), "codes",
      path)

  /** ADC search over the store's visible (or `asOf`) revision —
    * [[sqAdcSearch]]'s exact plan, bit-identical to the rename family
    * over the same corpus.
    */
  def sqAdcSearchVersioned(spark: SparkSession, queries: DataFrame,
      path: String, topR: Int = 25, excludeSelfMatches: Boolean = false,
      asOf: Option[Long] = None): DataFrame = {
    val (params, codes) = sqLoadIndexVersioned(spark, path, asOf)
    sqAdcSearch(params, codes, queries, topR, excludeSelfMatches)
  }

  /** SYNC with a versioned embedding corpus —
    * [[graft.operators.VectorIndex.syncWithStore]]'s contract on the
    * rename-free form: bootstrap trains + saves from read(current),
    * every later call absorbs the pending revision window as ONE
    * [[graft.operators.VersionedStore.commitDelta]] (tombstones and
    * frozen-quantizer codes visible at the same instant —
    * [[graft.operators.CdcBridge.maintainAtomic]]), the checkpoint
    * lives beside `_versions`, and replays are no-ops.
    */
  def sqSyncVersionedWithStore(spark: SparkSession, storePath: String,
      rel: String, path: String,
      retain: Option[Int] = None): Option[(Long, Long)] =
    graft.operators.CdcBridge.sync(spark, storePath, path,
      "sqSyncVersionedWithStore", retain)(
      graft.operators.VersionedStore.currentVersion(spark, path).isDefined)(
      cur => {
        val e = graft.operators.VersionedStore
          .read(spark, storePath, rel, Some(cur)).select("vec_id", "v")
        val params = sqTrain(e).localCheckpoint(true)
        sqSaveIndexVersioned(params, sqCodes(params, e), path)
      })(
      (from, to) =>
        graft.operators.CdcBridge.maintainAtomic(spark, storePath, rel,
          from, to, "vec_id", Seq("vec_id", "v"),
          "sqSyncVersionedWithStore") { (del, ins) =>
          val (params, existing) = sqLoadIndexVersioned(spark, path)
          val appends = ins.map(e => sqCodes(params,
              e.join(existing.select("vec_id").distinct(), Seq("vec_id"),
                "left_anti")).localCheckpoint(true))
            .filterNot(_.isEmpty)
            .map(f => Map("codes" -> f))
            .getOrElse(Map.empty[String, DataFrame])
          val deletes = del.map(k => Map("codes" -> k.select("vec_id")))
            .getOrElse(Map.empty[String, DataFrame])
          if (appends.nonEmpty || deletes.nonEmpty)
            graft.operators.VersionedStore.commitDelta(appends, deletes,
              path)
          ()
        })

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
      // materialize once (q72 one-relation-many-consumers discipline);
      // the fit is the persistable artifact, so it's bench-bracketed
      val params = graft.BenchPhases.build { sqTrain(e).localCheckpoint(true) }
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

  // ------------------------------------------------------------------
  // Distributed PCA — the rotation/whitening half of the quantization
  // family (OPQ's first step: rotate so subspace variances balance).
  // ------------------------------------------------------------------

  private val pcaIters = 30

  /** Integer-exact centered Gram statistics over `e`(vec_id, v): the
    * upper-triangle second-moment sums, the per-dimension first-moment
    * sums, and the row count. Components are quantized to 1e-6 longs
    * (the [[graft.functions.VectorFunctions]] LSH move) so every sum is
    * EXACT INTEGER arithmetic — order-insensitive under any partitioning
    * and bit-identical on any engine, where a float Gram would drift
    * with reduction order and poison the eigen iteration downstream.
    *
    * Scale shape: ONE corpus scan explodes each row into its 2,080
    * upper-triangle products; map-side partial aggregation folds every
    * partition to <= 2,080 rows before the shuffle, so the exchange is
    * O(partitions · dims²) regardless of corpus size. Long overflow
    * bounds the training set at ~9·10^6 unit-norm vectors (|q| <= 1e6 →
    * |q_i·q_j| <= 1e12, sum < 2^63): at 100 TB the rotation trains on a
    * deterministic uniform sample under that bound — the standard OPQ
    * practice (rotations are estimated from ~10^5–10^6 vectors) — and
    * applies map-only to everything.
    */
  def pcaGramStats(e: DataFrame): (Array[Array[Long]], Array[Long], Long) = {
    val q = e.select(col("vec_id"),
      expr("transform(v, x -> CAST(floor(x * 1000000.0D + 0.5D) AS BIGINT))")
        .as("qv"))
    val pairs = q.select(col("qv"),
        explode(expr(
          s"""flatten(transform(sequence(1, $dims), i ->
                transform(sequence(i, $dims), j ->
                  named_struct('i', i, 'j', j))))""")).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"),
        expr("element_at(qv, p.i) * element_at(qv, p.j)").as("prod"))
    val gRows = pairs.groupBy("i", "j").agg(sum("prod").as("s")).collect()
    val g = Array.ofDim[Long](dims, dims)
    gRows.foreach { r =>
      g(r.getInt(0) - 1)(r.getInt(1) - 1) = r.getLong(2)
    }
    val mRows = q.select(posexplode(col("qv")).as(Seq("i", "x")))
      .groupBy("i").agg(sum("x").as("m")).collect()
    val m = Array.ofDim[Long](dims)
    mRows.foreach(r => m(r.getInt(0)) = r.getLong(1))
    (g, m, e.count())
  }

  /** Sequential left-fold dot — the Scala twin of DuckDB's
    * list_dot_product (verified bit-identical empirically; every float
    * reduction in the eigen iteration goes through this ONE fold so the
    * order can never drift between the two engines).
    */
  private def sdot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Deterministic pseudo-random start vector for component `c`: the md5
    * coin from the LSH hyperplanes (engine-portable), scaled to unit
    * norm (64 components of ±1/8).
    */
  private def pcaInit(c: Int): Array[Double] =
    Array.tabulate(dims) { i0 =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"pca$c:${i0 + 1}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (hex.charAt(0) <= '7') 0.125 else -0.125
    }

  /** Top-`k` eigenpairs of the centered covariance by power iteration
    * with deflation, plus the trace. The covariance is the 64×64 = 2,080-
    * long-sum artifact of [[pcaGramStats]] — k-sized, so the iteration
    * itself is a driver-side loop on a fixed matrix (the centroid-
    * materialization discipline), with every reduction through [[sdot]].
    * Fixed `iters` rather than a convergence test: a tolerance check
    * would make the ORACLE's unrolled iteration count data-dependent.
    */
  def pcaTopComponents(e: DataFrame, k: Int, iters: Int = pcaIters)
      : (Seq[(Double, Array[Double])], Double) = {
    val (cov, _, n) = pcaCovarianceAndMean(e)
    if (n == 0) return (Seq.empty, 0.0) // no corpus, no spectrum
    val trace = sdot(Array.tabulate(dims)(i => cov(i)(i)),
      Array.fill(dims)(1.0))
    var g = cov.map(_.clone())
    val out = (0 until k).map { c =>
      var x = pcaInit(c)
      (0 until iters).foreach { _ =>
        val y = Array.tabulate(dims)(i => sdot(g(i), x))
        val nrm = math.sqrt(sdot(y, y))
        x = y.map(_ / nrm)
      }
      val y = Array.tabulate(dims)(i => sdot(g(i), x))
      val lam = sdot(x, y)
      val xf = x
      g = Array.tabulate(dims, dims)((i, j) => g(i)(j) - lam * xf(i) * xf(j))
      (lam, xf)
    }
    (out, trace)
  }

  /** Principal-axis projection ("PCA scores"): each vector centered on
    * the corpus mean and projected onto the `comps` eigenvectors —
    * map-only against the broadcast (pc, u) frame, the application half
    * that runs over everything the training sample stood in for. With
    * `whiten` each score divides by sqrt(eigenvalue), equalizing
    * component variances (the whitening used before cosine-metric
    * re-indexing).
    */
  def pcaProject(e: DataFrame, comps: Seq[(Double, Array[Double])],
      mean: Array[Double], whiten: Boolean = false): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val cf = comps.zipWithIndex
      .map { case ((lam, u), i) => (i + 1, lam, u.toSeq) }
      .toDF("pc", "lam", "u")
    val mu = array(mean.toIndexedSeq.map(lit): _*)
    e.withColumn("mu", mu)
      .withColumn("vc", expr("zip_with(v, mu, (a, b) -> a - b)"))
      .crossJoin(broadcast(cf))
      .select(col("vec_id"), col("pc"),
        (if (whiten) dot(col("vc"), col("u")) / sqrt(col("lam"))
         else dot(col("vc"), col("u"))).as("score"))
  }

  /** The corpus mean vector (exact integer first moments / n). */
  def pcaMean(e: DataFrame): Array[Double] = {
    val (_, msum, n) = pcaGramStats(e)
    msum.map(_.toDouble / 1000000.0 / n.toDouble)
  }

  /** Centered covariance + mean as driver-side arrays (the k-sized
    * artifact [[pcaTopComponents]] and the Jacobi path share).
    */
  def pcaCovarianceAndMean(e: DataFrame)
      : (Array[Array[Double]], Array[Double], Long) = {
    val (gsum, msum, n) = pcaGramStats(e)
    val nd = n.toDouble
    val cov = Array.tabulate(dims, dims) { (i, j) =>
      val s = if (i <= j) gsum(i)(j) else gsum(j)(i)
      s.toDouble / 1000000000000.0 / nd -
        (msum(i).toDouble / 1000000.0 / nd) *
        (msum(j).toDouble / 1000000.0 / nd)
    }
    (cov, msum.map(_.toDouble / 1000000.0 / nd), n)
  }

  /** Full eigendecomposition of a symmetric matrix by cyclic Jacobi
    * rotations — the driver-side path when the WHOLE basis is needed
    * (the OPQ-style rotation below), where power iteration's deflation
    * error would compound over 64 near-degenerate components. Returns
    * (eigenvalues, eigenvectors-as-rows) sorted by eigenvalue
    * descending. Driver-side on the 64×64 artifact by design — same
    * class as the centroid materializations; nothing corpus-sized.
    */
  def jacobiEigen(a0: Array[Array[Double]], sweeps: Int = 12)
      : (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    (0 until sweeps).foreach { _ =>
      for (p <- 0 until n - 1; q <- p + 1 until n) {
        val apq = a(p)(q)
        if (math.abs(apq) > 1e-15) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
          val t = math.signum(theta) /
            (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          (0 until n).foreach { i =>
            val aip = a(i)(p); val aiq = a(i)(q)
            a(i)(p) = c * aip - s * aiq
            a(i)(q) = s * aip + c * aiq
          }
          (0 until n).foreach { i =>
            val api = a(p)(i); val aqi = a(q)(i)
            a(p)(i) = c * api - s * aqi
            a(q)(i) = s * api + c * aqi
          }
          (0 until n).foreach { i =>
            val vip = v(i)(p); val viq = v(i)(q)
            v(i)(p) = c * vip - s * viq
            v(i)(q) = s * vip + c * viq
          }
        }
      }
    }
    val order = (0 until n).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => Array.tabulate(n)(r => v(r)(i))).toArray)
  }

  /** OPQ-lite rotation: center on the corpus mean and rotate into the
    * eigenbasis with VARIANCE-BALANCED subspace allocation — output
    * position 16·s + t carries eigen-direction 4·t + s, so each of the 4
    * PQ subspaces receives every 4th direction in variance order and the
    * subspace variances equalize (the OPQ insight: PQ spends its code
    * budget per subspace, so packing all high-variance directions into
    * one subspace wastes the others' budgets). The rotation is
    * orthogonal — L2 distances are preserved exactly up to float
    * round-off — so a PQ index built on the rotated frame answers
    * original-space queries once they pass through the same rotation.
    *
    * Map-only: the 64×64 rotation matrix rides the plan as a literal —
    * no join, no shuffle; the one scan does 64 sequential-fold dots per
    * row. This is the application half; the basis trains on a bounded
    * sample ([[pcaGramStats]]'s overflow-bound discipline).
    */
  def opqRotate(e: DataFrame, basis: Array[Array[Double]],
      mean: Array[Double], subspaces: Int = 4): DataFrame = {
    require(basis.length == dims,
      s"opqRotate: need the full $dims-direction basis, got ${basis.length}")
    val subDim = dims / subspaces
    val perm = Array.tabulate(dims) { k =>
      val s = k / subDim; val t = k % subDim
      subspaces * t + s
    }
    val rm = array(perm.toIndexedSeq.map(k =>
      array(basis(k).toIndexedSeq.map(lit): _*)): _*)
    val mu = array(mean.toIndexedSeq.map(lit): _*)
    e.withColumn("mu", mu).withColumn("rm", rm)
      .withColumn("vc", expr("zip_with(v, mu, (a, b) -> a - b)"))
      .select(col("vec_id"),
        expr(s"""transform(sequence(1, $dims), k ->
            aggregate(sequence(1, $dims), 0D, (acc, i) ->
              acc + element_at(element_at(rm, k), i) * element_at(vc, i)))""")
          .as("v"))
  }

  /** Distributed PCA: top-4 principal components of the embedding
    * corpus — eigenvalue and explained-variance ratio per component, by
    * power iteration with deflation over the integer-exact centered
    * Gram. The oracle twin unrolls the SAME 30 iterations per component
    * as materialized CTEs over the SAME quantized sums, so eigenvalues
    * match bit-for-bit (prototype-verified) — convergence quality is
    * irrelevant to the equivalence, only to the downstream use.
    */
  private val q137 = QueryDef(
    "q137_pca_power_iteration",
    (s, d) => {
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val (comps, trace) = pcaTopComponents(e, k = 4)
      import s.implicits._
      comps.zipWithIndex
        .map { case ((lam, _), i) => (i + 1, lam, lam / trace) }
        .toDF("pc", "eigenvalue", "evr")
        .orderBy("pc")
    },
    Some(pcaOracleSql(4)))

  /** Generated oracle for [[q137]]: quantized integer Gram + unrolled
    * power iteration (every iteration CTE MATERIALIZED — a plain CTE
    * would re-inline the whole chain exponentially).
    */
  private def pcaOracleSql(k: Int): String = {
    val d1 = dims + 1
    val pre =
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                     FROM embeddings),
            q AS (SELECT vec_id, list_transform(range(1, $d1), i ->
                    CAST(floor(v[i] * 1000000.0 + 0.5) AS BIGINT)) AS qv
                  FROM e),
            n AS (SELECT COUNT(*) AS n FROM e),
            pairs AS (SELECT r1.i AS i, r2.j AS j
                      FROM range(1, $d1) r1(i), range(1, $d1) r2(j)
                      WHERE r1.i <= r2.j),
            gsum AS (SELECT i, j, SUM(qv[i] * qv[j]) AS s
                     FROM q CROSS JOIN pairs GROUP BY i, j),
            msum AS (SELECT i, SUM(qv[i]) AS m
                     FROM q CROSS JOIN range(1, $d1) r(i) GROUP BY i),
            cmat AS (SELECT g.i, g.j,
                       CAST(g.s AS DOUBLE) / 1000000000000.0 / n.n
                         - (CAST(mi.m AS DOUBLE) / 1000000.0 / n.n)
                           * (CAST(mj.m AS DOUBLE) / 1000000.0 / n.n) AS c
                     FROM gsum g JOIN msum mi ON g.i = mi.i
                          JOIN msum mj ON g.j = mj.i CROSS JOIN n),
            cfull AS (SELECT i, j, c FROM cmat
                      UNION ALL SELECT j, i, c FROM cmat WHERE i < j),
            g0 AS (SELECT list(l ORDER BY i) AS g FROM
                     (SELECT i, list(c ORDER BY j) AS l FROM cfull
                      GROUP BY i) t),
            tr AS (SELECT list_dot_product(
                     list_transform(range(1, $d1), i -> g[i][i]),
                     list_transform(range(1, $d1), i -> 1.0)) AS trace
                   FROM g0)"""
    val ctes = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = scala.collection.mutable.ArrayBuffer.empty[String]
    (0 until k).foreach { c =>
      val gin = if (c == 0) "g0" else s"g$c"
      ctes += s"""x${c}_0 AS MATERIALIZED (SELECT list_transform(
          range(1, $d1), i ->
            CASE WHEN substring(md5('pca$c:' || CAST(i AS VARCHAR)), 1, 1)
                   <= '7' THEN 0.125 ELSE -0.125 END) AS x)"""
      (0 until pcaIters).foreach { it =>
        ctes += s"""y${c}_$it AS MATERIALIZED (SELECT list_transform(
            range(1, $d1), i -> list_dot_product(g[i], x)) AS y
            FROM $gin, x${c}_$it)"""
        ctes += s"""x${c}_${it + 1} AS MATERIALIZED (SELECT list_transform(
            y, t -> t / sqrt(list_dot_product(y, y))) AS x FROM y${c}_$it)"""
      }
      ctes += s"""lam$c AS MATERIALIZED (SELECT list_dot_product(x,
          list_transform(range(1, $d1), i -> list_dot_product(g[i], x)))
          AS lam FROM $gin, x${c}_$pcaIters)"""
      ctes += s"""g${c + 1} AS MATERIALIZED (SELECT list_transform(
          range(1, $d1), i -> list_transform(range(1, $d1), j ->
            g[i][j] - lam * x[i] * x[j])) AS g
          FROM $gin, x${c}_$pcaIters, lam$c)"""
      results += s"""SELECT ${c + 1} AS pc, lam AS eigenvalue,
          lam / trace AS evr FROM lam$c, tr"""
    }
    pre + ",\n" + ctes.mkString(",\n") + "\n" +
      results.mkString(" UNION ALL ") + " ORDER BY pc"
  }

  /** q157: the compression ladder as a ROUTING decision, end to end —
    * [[graft.operators.VectorIndex.select]] picks the family for a
    * 64-byte/vec budget at the full measured recall floor (→ SQ8, the
    * near-free 8×), [[graft.operators.VectorIndex.build]] persists the
    * corpus under that family with the façade's family marker, and
    * [[graft.operators.VectorIndex.search]] routes the 5 query vectors
    * through the STORED marker (not the caller's knowledge) to the
    * family's own ADC search. The oracle recomputes the routed family's
    * exact arithmetic — the routing layer must add nothing and lose
    * nothing vs calling the family directly (VectorIndexSpec pins the
    * equality against the native verb; this query pins it against the
    * independent engine).
    *
    * Scale shape: identical to q136's (train = one min/max scan,
    * encode map-only, search scans only the 64-byte codes with
    * broadcast queries) — the façade delegates, never re-plans.
    */
  private val q157 = QueryDef(
    "q157_vector_index_route",
    (s, d) => {
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      if (e.isEmpty)
        // empty corpus: the store families refuse to PERSIST an empty
        // index (interrupted-save ambiguity), so the routed pipeline
        // degrades to its empty result before the build
        e.select(col("vec_id").as("query_id"),
          col("vec_id").as("neighbor_id"),
          lit(1).as("rank"), lit(0.0).as("score")).limit(0)
      else {
        val fam = graft.operators.VectorIndex.select(
          maxBytesPerVec = 64, minRecallAt5 = 0.99)
        withThrowawayStore { path =>
          graft.BenchPhases.build {
            graft.operators.VectorIndex.build(e, fam, path, protocol = "rename")
          }
          graft.operators.VectorIndex.search(e, q, path, k = 5)
            .orderBy("query_id", "rank")
        }(s)
      }
    },
    Some(sq8RoutedSql))

  /** q207: q157's ladder-routed pipeline with the façade told to build
    * the MANIFEST-COMMITTED twin (`protocol = "manifest"`) — the store
    * carries its family marker as a relation inside the versioned
    * store, search/append/delete dispatch on the store's own protocol,
    * and the oracle is q157's SQL VERBATIM: the commit discipline is
    * invisible through the one routed API (VersionedFacadeSpec pins
    * bit-equality across protocols for every searchable family, routed
    * sync included).
    */
  private val q207 = QueryDef(
    "q207_vector_route_versioned",
    (s, d) => {
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      if (e.isEmpty)
        e.select(col("vec_id").as("query_id"),
          col("vec_id").as("neighbor_id"),
          lit(1).as("rank"), lit(0.0).as("score")).limit(0)
      else {
        val fam = graft.operators.VectorIndex.select(
          maxBytesPerVec = 64, minRecallAt5 = 0.99)
        withThrowawayStore { path =>
          graft.BenchPhases.build {
            graft.operators.VectorIndex.build(e, fam, path,
              protocol = "manifest")
          }
          graft.operators.VectorIndex.search(e, q, path, k = 5)
            .orderBy("query_id", "rank")
        }(s)
      }
    },
    Some(sq8RoutedSql))

  /** The routed-SQ8 search oracle, shared VERBATIM by q157 and q176:
    * the sharded federation must reproduce the monolithic routed
    * search exactly, so the two gates are the same SQL.
    */
  private lazy val sq8RoutedSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                        FROM embeddings),
                  pd AS (SELECT i, MIN(v[i]) AS mni, MAX(v[i]) AS mxi
                         FROM e CROSS JOIN range(1, ${dims + 1}) r(i)
                         GROUP BY i),
                  params AS (SELECT list(mni ORDER BY i) AS mn,
                                    list(mxi ORDER BY i) AS mx FROM pd),
                  codes AS (SELECT vec_id, ${encodeSql("v")} AS code
                            FROM e CROSS JOIN params),
                  q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
                  scored AS (SELECT qid, vec_id,
                               list_dot_product(d, d) AS adc_dist
                             FROM (SELECT qid, vec_id, $diffSql AS d
                                   FROM codes CROSS JOIN q CROSS JOIN params) t)
             SELECT qid AS query_id, vec_id AS neighbor_id, rank,
                    adc_dist AS score
             FROM (SELECT qid, vec_id, adc_dist,
                     ROW_NUMBER() OVER (PARTITION BY qid
                       ORDER BY adc_dist ASC, vec_id ASC) AS rank
                   FROM scored) r
             WHERE rank <= 5 ORDER BY query_id, rank"""

  /** Build a throwaway on-disk store under a temp root, run `body`
    * against it, eagerly materialize the (bounded) result, delete the
    * tree — the SearchQueries in-query harness discipline (without the
    * delete, every bench execution leaks a store-sized temp dir).
    */
  private def withThrowawayStore(body: String => DataFrame)(
      s: SparkSession): DataFrame = {
    val root = graft.BenchPhases.storeDir("graft-vidx")
    val res = body(root + "/idx").localCheckpoint(true)
    graft.BenchPhases.discard(s, root)
    res
  }

  /** q176: the SHARDED code store federated — q157's routed SQ8 search
    * with the codes hash-split across three independent shard stores
    * (one GLOBAL quantizer training copied into each shard; per-shard
    * training would make ADC distances incomparable across shards, the
    * vector-side twin of per-shard idf). The oracle is q157's SQL
    * VERBATIM: the union of per-shard top-k re-cut to k must reproduce
    * the monolithic search bit-for-bit — sharding the code relation is
    * a storage layout, never a semantics change.
    */
  private val q176 = QueryDef(
    "q176_sq8_sharded",
    (s, d) => {
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      if (e.isEmpty)
        e.select(col("vec_id").as("query_id"),
          col("vec_id").as("neighbor_id"),
          lit(1).as("rank"), lit(0.0).as("score")).limit(0)
      else
        withThrowawayStore { root =>
          graft.BenchPhases.build {
            graft.operators.VectorIndex.buildSharded(e, "sq8", root, 3, protocol = "rename")
          }
          graft.operators.VectorIndex.searchSharded(q, root, k = 5)
            .orderBy("query_id", "rank")
        }(s)
    },
    Some(sq8RoutedSql))

  /** q208: q176's three-shard federation built on the MANIFEST protocol
    * — every shard store AND the router commit as manifest PUTs (the
    * router is itself a 1-relation versioned store), so the whole
    * federated build is object-store-safe end to end; search/append/
    * delete route through the same protocol-aware verbs. Oracle is
    * q157's monolithic SQL VERBATIM, exactly as q176: neither sharding
    * nor the commit protocol may change what the search returns.
    */
  private val q208 = QueryDef(
    "q208_sq8_sharded_versioned",
    (s, d) => {
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      if (e.isEmpty)
        e.select(col("vec_id").as("query_id"),
          col("vec_id").as("neighbor_id"),
          lit(1).as("rank"), lit(0.0).as("score")).limit(0)
      else
        withThrowawayStore { root =>
          graft.BenchPhases.build {
            graft.operators.VectorIndex.buildSharded(e, "sq8", root, 3,
              protocol = "manifest")
          }
          graft.operators.VectorIndex.searchSharded(q, root, k = 5)
            .orderBy("query_id", "rank")
        }(s)
    },
    Some(sq8RoutedSql))

  /** q192: the embedding corpus lives in a VERSIONED STORE and evolves
    * only through its manifest-committed verbs (save → append →
    * tombstone delete); the SQ8 index is bootstrapped from the first
    * revision and then maintained by ONE
    * [[graft.operators.VectorIndex.maintainFromStore]] call over the
    * revision window — the O(delta) CDC bridge on the vector side
    * (q189's discipline applied to the 8-family store). The quantizer
    * is trained ONCE at bootstrap and FROZEN across the window (the
    * production maintenance trade: re-encoding the corpus per revision
    * is the rebuild path, not maintenance), so the oracle trains its
    * parameters on the BOOTSTRAP corpus and scores the final VISIBLE
    * corpus under them — the maintained index must lose nothing and
    * add nothing vs that frozen-parameter arithmetic
    * (CdcVectorIndexSpec additionally pins bit-equality against
    * hand-driven append/delete and replay safety).
    *
    * The window exercises all three CDC shapes: an append of net-new
    * vectors (encoded under the frozen quantizer), deletes that hit
    * BOTH bootstrap rows (vec_id % 8 = 1 ⇒ % 4 = 1, in rev1) and
    * appended rows (vec_id % 8 = 7 ⇒ % 4 = 3, in rev2 — netted out of
    * the changeset's inserted side by the store, so the index never
    * even encodes them).
    */
  private val q192 = QueryDef(
    "q192_cdc_vector_maintenance",
    (s, d) => {
      import graft.operators.{VectorIndex, VersionedStore}
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val boot = e.filter(col("vec_id") % 4 =!= 3)
      if (boot.isEmpty)
        e.select(col("vec_id").as("query_id"),
          col("vec_id").as("neighbor_id"),
          lit(1).as("rank"), lit(0.0).as("score")).limit(0)
      else
        withThrowawayStore { root =>
          val store = root.stripSuffix("/idx") + "/emb"
          val idx = root
          graft.BenchPhases.build {
            val r1 = VersionedStore.save(Map("emb" -> boot), store)
            VectorIndex.build(
              VersionedStore.read(s, store, "emb", Some(r1)), "sq8", idx, protocol = "rename")
            VersionedStore.append(
              Map("emb" -> e.filter(col("vec_id") % 4 === 3)), store)
            val doomed = e.filter(col("vec_id") % 8 === 1 ||
                col("vec_id") % 8 === 7).select("vec_id")
            val r3 = VersionedStore.delete(doomed, "emb", store)
            VectorIndex.maintainFromStore(s, store, "emb", r1, r3, idx)
          }
          VectorIndex.search(e, q, idx, k = 5)
            .orderBy("query_id", "rank")
        }(s)
    },
    Some(cdcVectorOracleSql))

  /** The frozen-quantizer corpus-evolution oracle shared VERBATIM by
    * q192 (rename-family store maintained through the CDC bridge) and
    * q201 (manifest-committed store driven through its own verbs):
    * parameters trained on the bootstrap slice, every finally-visible
    * vector scored under them — the commit protocol must be invisible
    * to the arithmetic.
    */
  private lazy val cdcVectorOracleSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                        FROM embeddings),
                  boot AS (SELECT * FROM e WHERE vec_id % 4 <> 3),
                  pd AS (SELECT i, MIN(v[i]) AS mni, MAX(v[i]) AS mxi
                         FROM boot CROSS JOIN range(1, ${dims + 1}) r(i)
                         GROUP BY i),
                  params AS (SELECT list(mni ORDER BY i) AS mn,
                                    list(mxi ORDER BY i) AS mx FROM pd),
                  vis AS (SELECT * FROM e WHERE vec_id % 8 NOT IN (1, 7)),
                  codes AS (SELECT vec_id, ${encodeSql("v")} AS code
                            FROM vis CROSS JOIN params),
                  q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
                  scored AS (SELECT qid, vec_id,
                               list_dot_product(d, d) AS adc_dist
                             FROM (SELECT qid, vec_id, $diffSql AS d
                                   FROM codes CROSS JOIN q CROSS JOIN params) t)
             SELECT qid AS query_id, vec_id AS neighbor_id, rank,
                    adc_dist AS score
             FROM (SELECT qid, vec_id, adc_dist,
                     ROW_NUMBER() OVER (PARTITION BY qid
                       ORDER BY adc_dist ASC, vec_id ASC) AS rank
                   FROM scored) r
             WHERE rank <= 5 ORDER BY query_id, rank"""

  /** q201: q192's corpus-evolution scenario driven through the
    * MANIFEST-COMMITTED SQ8 store's own verbs — train+save on the
    * bootstrap slice (one PUT spanning meta and codes), append the
    * increment under the FROZEN quantizer, tombstone-delete doomed
    * vec_ids from both generations, then ADC-search the current
    * revision. The oracle is q192's SQL VERBATIM: swapping the commit
    * protocol under the vector store — directory overwrites + sidecar
    * tombstones out, immutable dirs + manifest PUTs in — must change
    * NOTHING about what the search returns (VersionedSq8Spec
    * additionally pins bit-equality against the rename family, sync
    * parity, and `asOf` time travel).
    */
  private val q201 = QueryDef(
    "q201_versioned_sq8_search",
    (s, d) => {
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val boot = e.filter(col("vec_id") % 4 =!= 3)
      if (boot.isEmpty)
        e.select(col("vec_id").as("query_id"),
          col("vec_id").as("neighbor_id"),
          lit(1).as("rank"), lit(0.0).as("score")).limit(0)
      else
        withThrowawayStore { idx =>
          graft.BenchPhases.build {
            val params = sqTrain(boot).localCheckpoint(true)
            sqSaveIndexVersioned(params, sqCodes(params, boot), idx)
            sqAppendCodesVersioned(e.filter(col("vec_id") % 4 === 3), idx)
            sqDeleteVectorsVersioned(
              e.filter(col("vec_id") % 8 === 1 || col("vec_id") % 8 === 7)
                .select("vec_id"), idx)
          }
          sqAdcSearchVersioned(s, q, idx, topR = 5)
            .select(col("qid").as("query_id"),
              col("vec_id").as("neighbor_id"), col("arank").as("rank"),
              col("adc_dist").as("score"))
            .orderBy("query_id", "rank")
        }(s)
    },
    Some(cdcVectorOracleSql))

  /** q214: q201's search served from a store MIGRATED off the rename
    * protocol — drive the RENAME-family lifecycle (save under the
    * frozen quantizer, append, sidecar-tombstone delete), run
    * [[graft.operators.VectorIndex.migrateToVersioned]] (codes through
    * the verifying loader, tombstones applied, meta stamp recomputed,
    * data + façade marker in ONE manifest PUT), and ADC-search the
    * MIGRATED store. The oracle is q192/q201's SQL VERBATIM: the
    * protocol switch must be invisible to the search — the codes were
    * encoded once under the frozen parameters and migration moves them
    * bit-for-bit.
    */
  private val q214 = QueryDef(
    "q214_migrated_sq8_search",
    (s, d) => {
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val boot = e.filter(col("vec_id") % 4 =!= 3)
      if (boot.isEmpty)
        e.select(col("vec_id").as("query_id"),
          col("vec_id").as("neighbor_id"),
          lit(1).as("rank"), lit(0.0).as("score")).limit(0)
      else {
        val root = graft.BenchPhases.storeDir("graft-migsq")
        val ren = root + "/ren"
        val ver = root + "/ver"
        graft.BenchPhases.build {
          val params = sqTrain(boot).localCheckpoint(true)
          sqSaveIndex(params, sqCodes(params, boot), ren)
          sqAppendCodes(e.filter(col("vec_id") % 4 === 3), ren)
          sqDeleteVectors(
            e.filter(col("vec_id") % 8 === 1 || col("vec_id") % 8 === 7)
              .select("vec_id"), ren)
          graft.operators.VectorIndex.migrateToVersioned(s, ren, ver,
            declared = Some("sq8"))
        }
        val res = sqAdcSearchVersioned(s, q, ver, topR = 5)
          .select(col("qid").as("query_id"),
            col("vec_id").as("neighbor_id"), col("arank").as("rank"),
            col("adc_dist").as("score"))
          .orderBy("query_id", "rank").localCheckpoint(true)
        graft.BenchPhases.discard(s, root)
        res
      }
    },
    Some(cdcVectorOracleSql))

  override def defs: Seq[QueryDef] =
    Seq(q136, q137, q157, q176, q192, q201, q207, q208, q214)
}
