package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._

/** Similarity search over the `embeddings` table (array<float>, 64 dims):
  * brute-force cosine top-k as the correctness baseline, random-hyperplane
  * LSH bucketing as the scale path, and LSH-prefiltered near-dup pairs.
  *
  * Scale design: the query set is broadcast (it is small by definition);
  * brute-force scoring is a broadcast nested loop — linear in the corpus,
  * no shuffle of the big side. The LSH variants replace the quadratic pair
  * space with equality joins on bucket ids; bucket count (2^planes) tunes
  * the recall/cost trade-off. Cosine is a sequential double fold =>
  * bit-identical to DuckDB's list_dot_product (verified), so scores
  * hash-match without rounding.
  */
object SimilarityQueries extends QueryModule {

  private val dims = 64

  /** Shared oracle fragment: cosine between DOUBLE[] vectors, written as
    * dot / (sqrt(dot_aa) * sqrt(dot_bb)) exactly like VectorFunctions.cosine.
    */
  private def cosSql(a: String, b: String) =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  /** Exact squared L2 via the dot expansion ||a-b||² = a·a − 2a·b + b·b —
    * three sequential-fold dots and fixed-order arithmetic, so both
    * engines produce bit-identical distances (the subtraction form would
    * need an elementwise zip that DuckDB folds in a different order).
    */
  private def l2(a: Column, b: Column): Column =
    dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b)
  private def l2Sql(a: String, b: String) =
    s"(list_dot_product($a, $a) - 2.0 * list_dot_product($a, $b) + list_dot_product($b, $b))"

  /** Nearest-centroid assignment: broadcast the (tiny) centroid relation,
    * score every (vector, centroid) pair, keep the argmax-cosine (argmin-L2
    * when `byL2`) row per vector with the cid tiebreak. The ONE shared
    * implementation of the move the Lloyd loop, the SemDeDup cell
    * assignment (q101) and the PQ encoder (q107) all make — tie-break
    * changes happen here and in nearestSql, nowhere else. (q62 keeps its
    * inline ranked form because it also reads crn <= 2 for probe cells.)
    * Output columns: vec_id, v, cid, cv.
    */
  private def nearestCentroid(e: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame,
      byL2: Boolean = false): org.apache.spark.sql.DataFrame = {
    val aff = if (byL2) l2(col("v"), col("cv")) else cosine(col("v"), col("cv"))
    val w =
      if (byL2) Window.partitionBy("vec_id").orderBy(col("aff").asc, col("cid").asc)
      else Window.partitionBy("vec_id").orderBy(col("aff").desc, col("cid").asc)
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("cid"), col("cv"), aff.as("aff"))
      .withColumn("crn", row_number().over(w))
      .filter(col("crn") === 1)
      .select("vec_id", "v", "cid", "cv")
  }

  /** Oracle twin of nearestCentroid: one argmin/argmax select over
    * `rel`(vec_id, v) × `cents`(cid, cv), projecting `out`.
    */
  private def nearestSql(rel: String, cents: String, byL2: Boolean,
      out: String): String = {
    val ord =
      if (byL2) s"${l2Sql("v", "cv")} ASC" else s"${cosSql("v", "cv")} DESC"
    s"""SELECT $out FROM (
          SELECT $rel.vec_id, v, cid, cv,
                 ROW_NUMBER() OVER (PARTITION BY $rel.vec_id
                   ORDER BY $ord, cid ASC) AS crn
          FROM $rel CROSS JOIN $cents) x WHERE crn = 1"""
  }

  /** Brute-force cosine top-10 neighbors for query vectors (vec_id < 5). */
  private val q36 = QueryDef(
    "q36_cosine_topk",
    (s, d) => {
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val scored = e.join(broadcast(q), col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id").as("nid"),
          cosine(col("qv"), col("v")).as("sim"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("nid").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("qid").as("query_id"), col("nid").as("neighbor_id"),
          col("rank"), col("sim").as("cos_sim"))
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                  q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
                  scored AS (SELECT qid, e.vec_id AS nid, ${cosSql("qv", "v")} AS sim
                             FROM e JOIN q ON qid <> e.vec_id)
             SELECT qid AS query_id, nid AS neighbor_id, rn AS rank, sim AS cos_sim
             FROM (SELECT qid, nid, sim,
                          ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rn
                   FROM scored) t
             WHERE rn <= 10 ORDER BY query_id, rank"""))

  /** Shared oracle fragment: 4-plane LSH bucket via exact integer
    * quantization (round(v[i]*1e6) as bigint) and md5-derived plane signs —
    * bucket bits can never flip on float noise.
    */
  private val bucketSql =
    """SELECT vec_id, CAST(SUM(CASE WHEN proj > 0 THEN (CAST(1 AS BIGINT) << p) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
       FROM (SELECT vec_id, p,
                    list_sum(list_transform(range(1, 65),
                      i -> (CASE WHEN substring(md5(p || ':' || i), 1, 1) <= '7' THEN 1 ELSE -1 END)
                           * CAST(floor(v[i] * 1000000.0 + 0.5) AS BIGINT))) AS proj
             FROM e, range(6) r(p)) t
       GROUP BY vec_id"""

  /** ANN via LSH buckets: candidates share the query's bucket; exact cosine
    * re-rank within the bucket, top 5 per query.
    */
  private val q37 = QueryDef(
    "q37_ann_lsh",
    (s, d) => {
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .withColumn("bucket", lshBucket(col("v"), 6, dims))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("bucket").as("qb"))
      val scored = e.join(broadcast(q),
          col("qb") === col("bucket") && col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id").as("nid"), col("bucket"),
          cosine(col("qv"), col("v")).as("sim"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("nid").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("qid").as("query_id"), col("nid").as("neighbor_id"),
          col("bucket"), col("rank"), col("sim").as("cos_sim"))
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                  bk AS ($bucketSql),
                  ev AS (SELECT e.vec_id, v, bucket FROM e JOIN bk ON e.vec_id = bk.vec_id),
                  q AS (SELECT vec_id AS qid, v AS qv, bucket AS qb FROM ev WHERE vec_id < 5),
                  scored AS (SELECT qid, ev.vec_id AS nid, ev.bucket, ${cosSql("qv", "v")} AS sim
                             FROM ev JOIN q ON qb = ev.bucket AND qid <> ev.vec_id)
             SELECT qid AS query_id, nid AS neighbor_id, bucket, rn AS rank, sim AS cos_sim
             FROM (SELECT qid, nid, bucket, sim,
                          ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rn
                   FROM scored) t
             WHERE rn <= 5 ORDER BY query_id, rank"""))

  /** Embedding near-duplicate pairs: LSH-bucket prefilter (equality join)
    * then exact cosine >= 0.3 — the approximate-near-dup contract: only
    * same-bucket pairs are candidates.
    */
  private val q38 = QueryDef(
    "q38_embedding_neardup",
    (s, d) => {
      // r15 (guide §2.5): same uncapped-bucket self-join exposure as q35
      // — and this one carries the VECTOR payload through the join, so a
      // degenerate bucket is quadratic in 64-double rows. Guard trips
      // loudly past 50k members; result-neutral below (SkewGuardSpec).
      val e = graft.operators.SkewGuard.boundedBuckets(
        Tables(s, d, "embeddings")
          .select(col("vec_id"), asDouble(col("embedding")).as("v"))
          .withColumn("bucket", lshBucket(col("v"), 6, dims)),
        Seq("bucket"), 50000L, "q38_embedding_neardup")
      val a = e.as("a"); val b = e.as("b")
      a.join(b, col("a.bucket") === col("b.bucket")
          && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          cosine(col("a.v"), col("b.v")).as("sim"))
        .filter(col("sim") >= 0.3)
        .orderBy("vec_a", "vec_b")
    },
    Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                  bk AS ($bucketSql),
                  ev AS (SELECT e.vec_id, v, bucket FROM e JOIN bk ON e.vec_id = bk.vec_id)
             SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                    ${cosSql("a.v", "b.v")} AS sim
             FROM ev a JOIN ev b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
             WHERE ${cosSql("a.v", "b.v")} >= 0.3
             ORDER BY vec_a, vec_b"""))

  /** Deterministic bounded-iteration k-means centroids for the IVF index:
    * seeds are the k corpus vectors with the smallest md5(vec_id) (a
    * deterministic stand-in for random sampling — uniform over the corpus,
    * engine-portable), refined by `iters` Lloyd iterations. The refinement
    * is exact across engines: element sums run over the integer-quantized
    * components (floor(v*1e6+0.5), the q37 LSH trick), so the mean is
    * CAST(SUM(bigint) AS DOUBLE)/n/1e6 — identical FP ops on both sides —
    * and centroid arrays are reassembled by idx order, no FP reordering.
    * A cell that loses all members disappears identically on both engines.
    *
    * Scale shape: assignment is a broadcast (k rows) cross join + argmax,
    * linear per iteration with a (cid, idx) grouped sum — k-means|| at
    * real scale swaps the seeding for oversampled distributed init, but
    * keeps exactly this bounded-iteration refinement loop.
    */
  private def kmeansCentroids(e: org.apache.spark.sql.DataFrame,
      k: Int = 8, iters: Int = 3,
      byL2: Boolean = false): org.apache.spark.sql.DataFrame = {
    // materialized once: every Lloyd iteration reads the quantized
    // component rows, and without the checkpoint each iteration would
    // re-scan and re-explode the corpus (the dominant row volume)
    val ex = e.select(col("vec_id"), posexplode(col("v")))
      .toDF("vec_id", "idx", "vv")
      .select(col("vec_id"), col("idx"),
        floor(col("vv") * lit(1e6) + lit(0.5)).cast("long").as("q"))
      .localCheckpoint(true)
    val seedBase = e.select(col("vec_id"), col("v"),
        md5(col("vec_id").cast("string")).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(k)
    var cents = seedBase.select(
      (row_number().over(Window.orderBy(col("h"), col("vec_id"))) - 1).as("cid"),
      col("v").as("cv"))
    for (_ <- 0 until iters) {
      // cosine argmax for the spherical IVF/SemDeDup form; exact L2
      // argmin for the PQ codebooks (subvector norms must count there)
      val assigned = nearestCentroid(e, cents, byL2).select("vec_id", "cid")
      cents = assigned.join(ex, "vec_id")
        .groupBy("cid", "idx")
        .agg(sum("q").as("sq"), count(lit(1)).as("n"))
        .select(col("cid"), col("idx"),
          (col("sq").cast("double") / col("n").cast("double") / lit(1e6)).as("cvi"))
        .groupBy("cid")
        .agg(sort_array(collect_list(struct(col("idx"), col("cvi")))).as("a"))
        .select(col("cid"), expr("transform(a, x -> x.cvi)").as("cv"))
        // materialize each iteration's k rows: without this, iteration i
        // re-executes iterations 1..i-1 embedded in its plan (measured
        // 2.66s -> 2.31s on q62 at sf0.1; the avoided recompute grows
        // quadratically with iteration count)
        .localCheckpoint(true)
    }
    cents
  }

  /** Oracle twin of kmeansCentroids: unrolled CTE chain ending in a
    * centroid relation named `${p}cents$iters`(cid, cv). `rel` is the
    * (vec_id, v) source relation; `p` prefixes every CTE name so several
    * instances (one per PQ subspace) can coexist in one WITH clause;
    * `byL2` mirrors kmeansCentroids' metric switch.
    */
  private def kmeansSql(k: Int = 8, iters: Int = 3, p: String = "",
      rel: String = "e", byL2: Boolean = false): String = {
    val base =
      s"""${p}ex AS (SELECT vec_id, CAST(generate_subscripts(v, 1) AS INT) AS idx,
                        CAST(floor(unnest(v) * 1e6 + 0.5) AS BIGINT) AS q
                 FROM $rel),
          ${p}seedb AS (SELECT vec_id, v, md5(CAST(vec_id AS VARCHAR)) AS h
                    FROM $rel ORDER BY h, vec_id LIMIT $k),
          ${p}cents0 AS (SELECT ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS cid,
                            v AS cv
                     FROM ${p}seedb)"""
    val steps = (1 to iters).map { i =>
      s"""${p}asg$i AS (${nearestSql(rel, s"${p}cents${i - 1}", byL2, "vec_id, cid")}),
          ${p}cents$i AS (SELECT cid, list(cvi ORDER BY idx) AS cv FROM (
                       SELECT cid, idx,
                              CAST(CAST(SUM(q) AS BIGINT) AS DOUBLE)
                                / CAST(COUNT(*) AS DOUBLE) / 1e6 AS cvi
                       FROM ${p}asg$i JOIN ${p}ex ON ${p}asg$i.vec_id = ${p}ex.vec_id
                       GROUP BY cid, idx) y
                      GROUP BY cid)"""
    }
    (base +: steps).mkString(",\n")
  }

  /** ANN via IVF (inverted-file) coarse quantization — the other classic
    * scale path next to LSH (q37): assign every vector to its nearest of 8
    * k-means coarse centroids (deterministic hash-seeded, 3 exact Lloyd
    * iterations — see kmeansCentroids), then probe the query's 2 nearest
    * cells (nprobe, the recall/cost dial) and exact-rerank only those
    * cells' members. Centroid quality was measured against brute-force
    * ground truth at sf0.1 on NEUTRAL queries (vectors that are not
    * centroids of either variant): recall@5 is 9/25 with the previous
    * vec_id<8 init vs 15/25 with the k-means centroids at the same
    * nprobe=2 (19/25 at nprobe=3). The old init looked perfect (25/25)
    * only on q62's own query set — an artifact of the query vectors
    * being the centroids, so each query's cell collected its own
    * neighborhood.
    *
    * Scale shape: centroids are broadcast (8 rows), assignment is a
    * broadcast join + per-vector 8-row argmax — linear, no shuffle of the
    * corpus beyond the cell groupBy; candidate scoring touches only the
    * probed cells instead of the whole corpus. Recall improves with nprobe;
    * cost is proportional to the probed fraction.
    */
  private val q62 = QueryDef(
    "q62_ann_ivf",
    (s, d) => {
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val cents = kmeansCentroids(e)
      val aff = e.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("v"), col("cid"),
          cosine(col("v"), col("cv")).as("aff"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("aff").desc, col("cid").asc)
      val ranked = aff.withColumn("crn", row_number().over(w))
      val cells = ranked.filter(col("crn") === 1)
        .select(col("vec_id"), col("v"), col("cid").as("cell"))
      val qcells = ranked.filter(col("vec_id") < 5 && col("crn") <= 2)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("cid").as("cell"))
      val scored = cells.join(broadcast(qcells),
          cells("cell") === qcells("cell") && col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nid"),
          cosine(col("qv"), col("v")).as("sim"))
      val wr = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("nid").asc)
      scored.withColumn("rank", row_number().over(wr))
        .filter(col("rank") <= 5)
        .select(col("qid").as("query_id"), col("nid").as("neighbor_id"),
          col("rank"), col("sim").as("cos_sim"))
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                  ${kmeansSql()},
                  ranked AS (SELECT vec_id, v, cid, aff,
                               ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY aff DESC, cid ASC) AS crn
                             FROM (SELECT e.vec_id, e.v, cid, ${cosSql("v", "cv")} AS aff
                                   FROM e CROSS JOIN cents3)),
                  cells AS (SELECT vec_id, v, cid AS cell FROM ranked WHERE crn = 1),
                  qcells AS (SELECT vec_id AS qid, v AS qv, cid AS cell
                             FROM ranked WHERE vec_id < 5 AND crn <= 2),
                  scored AS (SELECT qid, cells.vec_id AS nid, ${cosSql("qv", "v")} AS sim
                             FROM cells JOIN qcells ON cells.cell = qcells.cell
                                                   AND cells.vec_id <> qid)
             SELECT qid AS query_id, nid AS neighbor_id, rn AS rank, sim AS cos_sim
             FROM (SELECT qid, nid, sim,
                          ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rn
                   FROM scored) t
             WHERE rn <= 5 ORDER BY query_id, rank"""))

  /** Embedding-space diagnostics by label: the exact per-label centroid
    * (same integer-quantized mean as the k-means refinement — bit-identical
    * across engines) and the min/max cosine of members to their centroid.
    * Min/max are order-insensitive, so the report hash-matches without the
    * decimal detour that an AVG of cosines would break on.
    *
    * Scale shape: centroids are one broadcast row per label; the member
    * scan is map-only — the standard embedding-quality report (tight
    * clusters → high min cosine) at any corpus size.
    */
  /** Per-label centroid arrays from integer-quantized (1e-6) coordinate
    * sums — exact in any aggregation order, so both engines agree — as
    * (label, cv DOUBLE[]). Shared by q81 (intra-label stats) and q123
    * (label-noise outliers); `labelCentCteSql` is the oracle twin.
    */
  private def labelCentroids(e: org.apache.spark.sql.DataFrame) = {
    val ex = e.select(col("vec_id"), col("label"), posexplode(col("v")))
      .toDF("vec_id", "label", "idx", "vv")
      .select(col("vec_id"), col("label"), col("idx"),
        floor(col("vv") * lit(1e6) + lit(0.5)).cast("long").as("q"))
    ex.groupBy("label", "idx")
      .agg(sum("q").as("sq"), count(lit(1)).as("n"))
      .select(col("label"), col("idx"),
        (col("sq").cast("double") / col("n").cast("double") / lit(1e6)).as("cvi"))
      .groupBy("label")
      .agg(sort_array(collect_list(struct(col("idx"), col("cvi")))).as("a"))
      .select(col("label"), expr("transform(a, x -> x.cvi)").as("cv"))
  }

  private val labelCentCteSql =
    s"""e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        ex AS (SELECT vec_id, label,
                 CAST(generate_subscripts(v, 1) AS INT) AS idx,
                 CAST(floor(unnest(v) * 1e6 + 0.5) AS BIGINT) AS q
               FROM e),
        comp AS (SELECT label, idx,
                   CAST(CAST(SUM(q) AS BIGINT) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE) / 1e6 AS cvi
                 FROM ex GROUP BY label, idx),
        cents AS (SELECT label, list(cvi ORDER BY idx) AS cv
                  FROM comp GROUP BY label)"""

  private val q81 = QueryDef(
    "q81_label_centroid_stats",
    (s, d) => {
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      val cents = labelCentroids(e)
      e.join(broadcast(cents), "label")
        .select(col("label"), cosine(col("v"), col("cv")).as("cos"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          min(col("cos")).as("min_intra_cos"),
          max(col("cos")).as("max_intra_cos"))
        .orderBy("label")
    },
    Some(s"""WITH $labelCentCteSql
             SELECT e.label, COUNT(*) AS n_vecs,
                    MIN(${cosSql("v", "cv")}) AS min_intra_cos,
                    MAX(${cosSql("v", "cv")}) AS max_intra_cos
             FROM e JOIN cents ON e.label = cents.label
             GROUP BY e.label ORDER BY e.label"""))

  /** Label-noise detection: for every label, the `k` member vectors
    * LEAST cosine-similar to their own label centroid — the mislabeled-
    * sample shortlist a training-data audit reviews (a vector far from
    * its class center is either noise or a labeling error; curated
    * datasets prune or re-queue these). Centroids are q81's exact
    * integer-quantized means.
    *
    * Scale shape: centroids are #labels tiny rows, broadcast; scoring is
    * map-side over one corpus scan; the per-label bottom-k runs through
    * [[graft.operators.GroupTopK]] (ascending order — "top-k worst"),
    * so a label owning most of the corpus still never funnels one task.
    */
  private val q123 = QueryDef(
    "q123_label_outliers",
    (s, d) => {
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      val scored = e.join(broadcast(labelCentroids(e)), "label")
        .select(col("label"), col("vec_id"),
          cosine(col("v"), col("cv")).as("cos_to_centroid"))
      graft.operators.GroupTopK.topK(scored, Seq(col("label")),
          Seq(col("cos_to_centroid").asc, col("vec_id").asc),
          col("vec_id"), 3)
        .select("label", "rank", "vec_id", "cos_to_centroid")
        .orderBy("label", "rank")
    },
    Some(s"""WITH $labelCentCteSql,
                  scored AS (SELECT e.label, vec_id,
                               ${cosSql("v", "cv")} AS cos_to_centroid
                             FROM e JOIN cents ON e.label = cents.label)
             SELECT label, rank, vec_id, cos_to_centroid FROM (
               SELECT label, vec_id, cos_to_centroid,
                      ROW_NUMBER() OVER (PARTITION BY label
                        ORDER BY cos_to_centroid ASC, vec_id ASC) AS rank
               FROM scored) t
             WHERE rank <= 3 ORDER BY label, rank"""))

  /** SemDeDup-style semantic deduplication (cluster-then-prune): vectors
    * are assigned to their nearest k-means cell (the q62 coarse quantizer,
    * deterministic hash-seeded Lloyd), and within each cell a vector is
    * dropped when ANY lower-id member of the same cell is closer than the
    * cosine threshold. This "dominance" rule is the deterministic,
    * join-expressible variant of the paper's greedy ε-ball sweep: it
    * prunes at least as much as greedy (a dropped doc can still disqualify
    * its own neighbors), which is the conservative direction for corpus
    * dedup, and it needs no sequential pass. Output is the per-cell audit
    * (members / dropped / kept) a curation run publishes.
    *
    * Scale shape: the pair space is confined to same-cell pairs by an
    * equality join on the cell id — never a corpus cross join. Per-cell
    * pair cost is quadratic in cell size, so at scale k grows with the
    * corpus (k ≈ N/targetCellSize keeps total pairs linear in N), exactly
    * how SemDeDup runs in production; the k-means assignment itself is a
    * broadcast of k centroid rows + a map-side argmax. `cellCap` is the
    * defensive bound (the q32 bucket-cap move): a cell the k growth
    * didn't anticipate — a dense boilerplate mode collapsing onto one
    * centroid — skips pair scoring entirely and is REPORTED as
    * capped=true (action: re-cluster it with a larger k or drop it
    * wholesale) instead of silently going quadratic. The default (10⁴ ≈
    * the targetCellSize the k guidance above aims for, ~5·10⁷ pairs)
    * trips BEFORE a runaway cell stalls the job — a bound of 10⁵ would
    * permit ~5·10⁹ cosine evaluations in one cell, far past pathological;
    * callers with bigger appetites opt in explicitly.
    */
  def semanticDedup(e: org.apache.spark.sql.DataFrame, tau: Double = 0.3,
      cellCap: Long = 10000L): org.apache.spark.sql.DataFrame = {
    val cents = kmeansCentroids(e)
    // materialized once: the assignment scan feeds FOUR consumers (sizes,
    // both sides of the dominance join, the final aggregate) — without
    // the checkpoint each re-executes the broadcast argmax over the
    // corpus (the kmeansCentroids-loop move applied here)
    val cells = nearestCentroid(e, cents)
      .select(col("vec_id"), col("v"), col("cid").as("cell"))
      .localCheckpoint(true)
    val sizes = cells.groupBy("cell").agg(count(lit(1)).as("cn"))
    val small = cells.join(
      broadcast(sizes.filter(col("cn") <= cellCap).select("cell")),
      Seq("cell"), "left_semi")
    val dropped = small.as("a").join(small.as("b"),
        col("a.cell") === col("b.cell")
          && col("b.vec_id") < col("a.vec_id")
          && cosine(col("a.v"), col("b.v")) >= lit(tau),
        "left_semi")
      .select(col("vec_id"), lit(1L).as("dr"))
    cells.join(dropped, Seq("vec_id"), "left")
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_members"),
        sum(coalesce(col("dr"), lit(0L))).as("n_dropped"))
      .select(col("cell").cast("long").as("cell"),
        col("n_members"), col("n_dropped"),
        (col("n_members") - col("n_dropped")).as("n_kept"),
        (col("n_members") > cellCap).as("capped"))
      .orderBy("cell")
  }

  private val q101 = QueryDef(
    "q101_semantic_dedup",
    (s, d) => semanticDedup(Tables(s, d, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))),
    Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                  ${kmeansSql()},
                  cells AS (${nearestSql("e", "cents3", byL2 = false,
                    "vec_id, v, cid AS cell")}),
                  small AS (SELECT cells.* FROM cells
                            SEMI JOIN (SELECT cell FROM cells
                                       GROUP BY cell HAVING COUNT(*) <= 10000) s
                              ON cells.cell = s.cell),
                  dropped AS (SELECT DISTINCT a.vec_id
                              FROM small a JOIN small b
                                ON a.cell = b.cell AND b.vec_id < a.vec_id
                               AND ${cosSql("a.v", "b.v")} >= 0.3)
             SELECT CAST(cells.cell AS BIGINT) AS cell,
                    COUNT(*) AS n_members,
                    CAST(SUM(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
                    COUNT(*) - CAST(SUM(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                    COUNT(*) > 10000 AS capped
             FROM cells LEFT JOIN dropped d ON cells.vec_id = d.vec_id
             GROUP BY cells.cell ORDER BY cell"""))

  /** Int8 scalar quantization fidelity report: each vector is quantized to
    * 8-bit codes with a per-vector scale (max|v| / 127 — symmetric absmax,
    * the standard embedding-compression scheme: 4x less memory and 4x more
    * ANN candidates per cache line), reconstructed, and scored by the
    * cosine between the original and the reconstruction. The per-label
    * min/max fidelity and the count below the action threshold are the
    * go/no-go report for switching an ANN index to int8.
    *
    * Determinism: scale uses max (order-insensitive), quantize/reconstruct
    * are elementwise IEEE ops written identically in the oracle, and the
    * cosine is the sequential fold shared with q36 — so scores hash-match
    * without rounding. A vector with max|v| below the 1e-300 scale floor
    * (including all-zero padding rows) reports fidelity 0.0 explicitly:
    * the floored divisor keeps NaN out of the bigint CAST (where the
    * engines diverge), and the CASE keeps the degenerate cosine out of
    * the aggregates — degenerate either because every component
    * quantizes to code 0 (all-zero rv, 0/0) or, for magnitudes just
    * under the floor, because the v·rv products (~1e-600) underflow to
    * 0 and the cosine is again 0/0.
    * Scale shape: map-only scan + one 10-row aggregate; nothing here
    * shuffles the corpus.
    */
  private val q102 = QueryDef(
    "q102_int8_quant_fidelity",
    (s, d) => {
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      // the GREATEST floor keeps x/scale finite for an all-zero vector
      // (otherwise 0/0 = NaN flows into a bigint CAST, where the engines
      // diverge: Spark yields 0, DuckDB errors); the explicit CASE then
      // reports fidelity 0.0 for zero vectors — flagged, never NaN
      val r = e
        .withColumn("maxabs", expr("array_max(transform(v, x -> abs(x)))"))
        .withColumn("scale", greatest(col("maxabs"), lit(1e-300)) / lit(127.0))
        .withColumn("rv", expr(
          "transform(transform(v, x -> CAST(floor(x / scale + 0.5D) AS BIGINT)), q -> CAST(q AS DOUBLE) * scale)"))
        // guard at the floor boundary, not at zero: below 1e-300 the
        // cosine degenerates to 0/0 (all components quantize to 0, or
        // the v*rv products underflow), so those vectors take the
        // flagged-0.0 branch too
        .withColumn("fid",
          when(col("maxabs") >= lit(1e-300), cosine(col("v"), col("rv")))
            .otherwise(lit(0.0)))
      r.groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          min(col("fid")).as("min_fidelity"),
          max(col("fid")).as("max_fidelity"),
          sum(when(col("fid") < lit(0.99997), lit(1L)).otherwise(lit(0L))).as("n_low"))
        .orderBy("label")
    },
    Some {
      val fid = s"CASE WHEN maxabs >= 1e-300 THEN ${cosSql("v", "rv")} ELSE 0.0 END"
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              q AS (SELECT label, v,
                      list_max(list_transform(v, x -> abs(x))) AS maxabs,
                      GREATEST(list_max(list_transform(v, x -> abs(x))), 1e-300) / 127.0 AS scale
                    FROM e),
              r AS (SELECT label, v, maxabs,
                      list_transform(list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT)),
                                     qq -> CAST(qq AS DOUBLE) * scale) AS rv
                    FROM q)
         SELECT label, COUNT(*) AS n_vecs,
                MIN($fid) AS min_fidelity,
                MAX($fid) AS max_fidelity,
                CAST(SUM(CASE WHEN $fid < 0.99997 THEN 1 ELSE 0 END) AS BIGINT) AS n_low
         FROM r GROUP BY label ORDER BY label"""
    })

  /** A trained PQ index: the per-subspace codebooks PLUS the geometry
    * they were trained with — carried together so an encode or search
    * can never slice vectors at a different subDim than the codebooks
    * were built from (a mismatch would silently truncate the dot
    * products instead of erroring). This is exactly the unit
    * [[pqSaveIndex]] persists and [[pqLoadIndex]] restores.
    */
  final case class PqIndex(
      codebooks: Seq[org.apache.spark.sql.DataFrame],
      subspaces: Int, subDim: Int) {

    /** Deterministic identity of the trained codebooks (md5 over geometry
      * and every codeword's exact bits, in (subspace, cid) order). Stamped
      * onto every [[pqCodes]] row and checked by [[pqAdcSearch]]: codes
      * persisted from a DIFFERENT training would otherwise join silently
      * on cid and produce plausible-looking but wrong ADC distances.
      * Collecting here is k×subspaces tiny rows; training already
      * materialized them (kmeansCentroids checkpoints every iteration).
      */
    lazy val fingerprint: String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(s"pq:$subspaces:$subDim".getBytes("UTF-8"))
      codebooks.zipWithIndex.foreach { case (cents, sub) =>
        md.update(s":$sub:".getBytes("UTF-8"))
        cents.select(col("cid"), col("cv")).collect()
          .sortBy(_.getInt(0))
          .foreach { r =>
            md.update(r.getInt(0).toString.getBytes("UTF-8"))
            r.getSeq[Double](1).foreach { x =>
              md.update(java.nio.ByteBuffer.allocate(8)
                .putLong(java.lang.Double.doubleToLongBits(x)).array())
            }
          }
      }
      md.digest().map("%02x".format(_)).mkString
    }
  }

  /** PQ codebook training, the library surface: one exact-L2 k-means per
    * subspace over the sliced projections of `emb`(vec_id, …, v). In
    * production this runs ONCE and the returned index is persisted
    * ([[pqSaveIndex]]) to serve BOTH the fidelity report (q107) and ADC
    * search (q108) — PqIndexSpec proves one training feeds both with
    * results identical to the standalone queries (everything here is
    * deterministic, so equality is exact).
    */
  def pqTrain(emb: org.apache.spark.sql.DataFrame, subspaces: Int = 4,
      subDim: Int = 16, k: Int = 8, iters: Int = 2): PqIndex =
    // r15 (guide §2.6): the per-subspace codebooks train on DISJOINT
    // vector slices with no cross-subspace dependence — running the 4
    // Lloyd chains on the probe pool overlaps each iteration's tiny
    // assignment/update jobs across subspaces. Each chain is internally
    // unchanged (same seeds, same per-iteration checkpoints), so the
    // trained artifact is bit-identical to the sequential loop's; the
    // pool preserves subspace order in the returned codebook seq.
    PqIndex(graft.operators.Parallel.shards(subspaces) { sub =>
      kmeansCentroids(emb.select(col("vec_id"),
        expr(s"slice(v, ${sub * subDim + 1}, $subDim)").as("v")),
        k, iters, byL2 = true)
    }, subspaces, subDim)

  /** The one encoder behind both persisted forms: slice `emb`(vec_id, v)
    * into the index's subspaces (vector length validated against the
    * geometry — a short array would silently slice to nothing) and keep
    * the nearest-codeword row per (vec_id, subspace), projecting `out`
    * ("cid" or "cv") — a tie-break or metric change lands here once,
    * never in one form only. Taking the vectors as an argument (not
    * storing them in the index) is what makes a LOADED index encode a
    * fresh increment — the append half of the persisted lifecycle.
    */
  private def pqEncode(index: PqIndex, emb: org.apache.spark.sql.DataFrame,
      out: String): org.apache.spark.sql.DataFrame = {
    val dims = index.subspaces * index.subDim
    val checked = emb.filter(
      assert_true(size(col("v")) === lit(dims),
        lit(s"pqEncode: vector length must be $dims")).isNull)
    index.codebooks.zipWithIndex.map { case (cents, sub) =>
      val sv = checked.select(col("vec_id"),
        expr(s"slice(v, ${sub * index.subDim + 1}, ${index.subDim})").as("v"))
      nearestCentroid(sv, cents, byL2 = true)
        .select(col("vec_id"), lit(sub).as("sub"), col(out))
    }.reduce(_ unionAll _)
  }

  /** Encode `emb` against the trained index, code-ID form: one row per
    * (vec_id, subspace) carrying the nearest code id plus the index
    * fingerprint — the compressed representation an index PERSISTS, and
    * the input ADC search consumes (which asserts the fingerprint). The
    * broadcast argmin is map-only over the corpus; at 4 subspaces × 8
    * codes this is 12 bits per vector (the constant fp column is
    * dictionary-encoded to nothing in parquet).
    */
  def pqCodes(index: PqIndex, emb: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    pqEncode(index, emb, "cid").withColumn("fp", lit(index.fingerprint))

  /** Encode `emb` against the trained index, codeword form: the nearest
    * codeword VECTOR per (vec_id, subspace) — what reconstruction
    * (q107's fidelity report) consumes.
    */
  def pqCodewords(index: PqIndex, emb: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    pqEncode(index, emb, "cv")

  /** Persists a trained PQ index: codebooks + geometry + fingerprint at
    * `path`/codebooks (k×subspaces tiny rows), the corpus codes at
    * `path`/codes — the signature-index lifecycle (build once, search
    * forever, append increments via [[pqCodes]] on a loaded index +
    * parquet append) applied to ANN. PqIndexSpec proves the round-trip
    * and that a loaded search reads ONLY the persisted codes.
    */
  def pqSaveIndex(index: PqIndex, codes: org.apache.spark.sql.DataFrame,
      path: String): Unit = {
    pqCodebookRows(index)
      .coalesce(1) // k×subspaces rows — one footer beats 32
      .write.mode("overwrite").parquet(s"$path/codebooks")
    codes.write.mode("overwrite").parquet(s"$path/codes")
    // a full save is the tombstone compaction + re-admission point
    graft.operators.IndexTombstones.clear(codes.sparkSession, path)
  }

  /** The flat codebook relation BOTH persisted forms write: one row per
    * (sub, cid) carrying the codeword plus the geometry and fingerprint
    * — shared so the rename and manifest families can never drift on
    * what a stored codebook looks like (the [[sqMetaChecked]] move).
    */
  private def pqCodebookRows(index: PqIndex): org.apache.spark.sql.DataFrame =
    index.codebooks.zipWithIndex.map { case (cents, sub) =>
      cents.select(lit(sub).as("sub"), col("cid"), col("cv"))
    }.reduce(_ unionAll _)
      .withColumn("subspaces", lit(index.subspaces))
      .withColumn("sub_dim", lit(index.subDim))
      .withColumn("fp", lit(index.fingerprint))

  /** Load-side gate shared by [[pqLoadIndex]] and
    * [[pqLoadIndexVersioned]]: rebuild the [[PqIndex]] from the flat
    * codebook relation and RECOMPUTE its fingerprint against the stored
    * one — a truncated or hand-edited codebook relation fails here
    * instead of skewing every subsequent distance.
    */
  private def pqGateLoaded(cb0: org.apache.spark.sql.DataFrame,
      verb: String, where: String): PqIndex = {
    val cb = cb0.localCheckpoint(true)
    val meta = cb.select("subspaces", "sub_dim", "fp").take(1)
    require(meta.nonEmpty,
      s"$verb: codebook store at $where is empty — " +
        "interrupted save or wrong path")
    val head = meta(0)
    val index = PqIndex(
      (0 until head.getInt(0)).map(sub =>
        cb.filter(col("sub") === sub).select("cid", "cv")),
      head.getInt(0), head.getInt(1))
    require(index.fingerprint == head.getString(2),
      s"$verb: stored fingerprint ${head.getString(2)} does not match " +
        s"recomputed ${index.fingerprint} — codebooks at $where " +
        "are corrupt or were overwritten by a different training")
    index
  }

  /** DELETE verb of the PQ-store lifecycle: tombstone `ids`(vec_id) —
    * masked out of every subsequent [[pqLoadIndex]], sticky across a
    * replayed [[pqAppendCodes]] (see [[graft.operators.IndexTombstones]]).
    */
  def pqDeleteVectors(ids: org.apache.spark.sql.DataFrame, path: String): Unit = {
    require(ids.sparkSession.read.parquet(s"$path/codebooks")
        .select("fp").take(1).nonEmpty,
      s"pqDeleteVectors: codebook store at $path/codebooks is empty — " +
        "nothing to delete from")
    graft.operators.IndexTombstones.append(ids, path)
  }

  /** Restores a persisted PQ index and its codes. The codebook relation
    * is tiny and checkpointed on load; the fingerprint is RECOMPUTED
    * from the loaded codewords and checked against the stored one, so a
    * truncated or hand-edited codebook file fails here instead of
    * skewing every subsequent distance.
    */
  def pqLoadIndex(spark: org.apache.spark.sql.SparkSession, path: String)
      : (PqIndex, org.apache.spark.sql.DataFrame) = {
    val index = pqGateLoaded(spark.read.parquet(s"$path/codebooks"),
      "pqLoadIndex", s"$path/codebooks")
    (index, graft.operators.IndexTombstones.mask(
      spark.read.parquet(s"$path/codes"), path))
  }

  /** The APPEND verb of the persisted-PQ lifecycle — build / probe /
    * append, the q82 signature-index trilogy applied to ANN: encode a
    * NEW batch with a LOADED (or otherwise in-hand) index and append its
    * codes to the store, no retraining. The store's codebook fingerprint
    * is checked against `index` FIRST: appending codes from a different
    * training would poison every subsequent search silently (ADC joins
    * on colliding code ids), and the row-wise stamp check at load would
    * then reject the whole store — fail here, before the store is
    * damaged. Appended codes carry the stamp [[pqCodes]] embeds, so
    * load/search validation covers increments exactly like the original
    * build.
    */
  def pqAppendCodes(index: PqIndex, emb: org.apache.spark.sql.DataFrame,
      path: String): Unit = {
    val spark = emb.sparkSession
    val meta = spark.read.parquet(s"$path/codebooks").select("fp").take(1)
    require(meta.nonEmpty,
      s"pqAppendCodes: codebook store at $path/codebooks is empty — " +
        "save the index first (pqSaveIndex)")
    require(meta(0).getString(0) == index.fingerprint,
      s"pqAppendCodes: index fingerprint ${index.fingerprint} does not " +
        s"match the store's (${meta(0).getString(0)}) — appending codes " +
        "from a different training would poison every search")
    // idempotent on vec_id: a retried append must not encode the same
    // vectors twice — duplicate (vec_id, sub) rows would DOUBLE those
    // vectors' summed ADC distances and silently demote them from every
    // top-k. The probe reads one parquet column of the store.
    val existing = spark.read.parquet(s"$path/codes").select("vec_id").distinct()
    pqCodes(index, emb.join(existing, Seq("vec_id"), "left_anti"))
      .write.mode("append").parquet(s"$path/codes")
  }

  /** ADC search: `queries`(qid, qv) are EXTERNAL full-dimension exact
    * vectors (any source — they need not be corpus members); the corpus
    * side is only its persisted `codes` (from [[pqCodes]] — computed once,
    * not re-derived here); distance is the sum over subspaces of
    * l2(query-subvector, codeword) read from broadcast per-query LUTs.
    * Query vectors are validated against the index geometry (assert_true
    * on the small queries side — a wrong-dimension vector fails loudly
    * instead of silently truncating the dot products). `excludeSelfMatches`
    * drops a corpus vector whose vec_id equals the qid — set it ONLY when
    * queries are corpus members (q108); external qids that happen to
    * collide with corpus ids must not lose candidates. Per-subspace
    * distances pivot into fixed-order-summed columns (see q108's
    * determinism note).
    */
  def pqAdcSearch(index: PqIndex,
      codes: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame,
      topK: Int = 5,
      excludeSelfMatches: Boolean = false): org.apache.spark.sql.DataFrame = {
    val dims = index.subspaces * index.subDim
    val checked = queries.filter(
      assert_true(size(col("qv")) === lit(dims),
        lit(s"pqAdcSearch: query vector length must be $dims")).isNull)
    val codesChecked = fpChecked(index, codes)
    val scored = index.codebooks.zipWithIndex.map { case (cents, sub) =>
      codesChecked.filter(col("sub") === sub).drop("sub")
        .join(broadcast(adcLut(index, checked, cents, sub)), "cid")
        .select(col("qid"), col("vec_id"), lit(sub).as("sub"), col("dd"))
    }.reduce(_ unionAll _)
    adcRank(scored, index.subspaces, topK, excludeSelfMatches)
  }

  // ------------------------------------------------------------------
  // MANIFEST-COMMITTED PQ store — the codebook-family migration off the
  // rename-based commit protocol (SCALING.md "commit-protocol fork";
  // q201's params+codes template with the trained artifact richer than
  // one row: the flat codebook relation and the stamped codes live
  // inside one [[graft.operators.VersionedStore]]). Build is ONE
  // manifest PUT spanning both relations (the rename family orders two
  // directory writes), append encodes under the FROZEN stored codebooks
  // and adds one dir (never rewrites), delete is a manifest tombstone,
  // and every verb is object-store-safe (no directory rename anywhere).
  // The provenance gates are IDENTICAL to the rename family
  // ([[pqCodebookRows]]/[[pqGateLoaded]] — shared bodies, so the two
  // families cannot drift) and the semantics carry over exactly:
  // retraining is the rebuild path, deletion is STICKY for a
  // re-appended same vec_id until [[graft.operators.VersionedStore
  // .compact]] folds the tombstone out, and `asOf` reproduces last
  // week's ADC results bit-exactly after the corpus has moved on.
  // ------------------------------------------------------------------

  /** Build the manifest-committed PQ store: ONE revision commits the
    * flat codebook relation and the stamped codes together.
    */
  def pqSaveIndexVersioned(index: PqIndex,
      codes: org.apache.spark.sql.DataFrame, path: String,
      extra: Map[String, org.apache.spark.sql.DataFrame] = Map.empty): Long =
    graft.operators.VersionedStore.save(Map(
      "codebooks" -> pqCodebookRows(index).coalesce(1),
      "codes" -> codes) ++ extra, path)

  /** Restore (index, codes) at the current — or `asOf` — revision,
    * through the SAME fingerprint-recompute gate as [[pqLoadIndex]].
    * No tombstone sidecar to mask: deletes are manifest tombstones,
    * already applied by the versioned read.
    */
  def pqLoadIndexVersioned(spark: org.apache.spark.sql.SparkSession,
      path: String, asOf: Option[Long] = None)
      : (PqIndex, org.apache.spark.sql.DataFrame) = {
    val index = pqGateLoaded(
      graft.operators.VersionedStore.read(spark, path, "codebooks", asOf),
      "pqLoadIndexVersioned", path)
    (index, graft.operators.VersionedStore.read(spark, path, "codes", asOf))
  }

  /** APPEND: encode the batch under the STORE's frozen codebooks —
    * `index` is fingerprint-checked against the store FIRST, exactly
    * like [[pqAppendCodes]] — idempotent on vec_id against the visible
    * code set, committed as a delta revision. A batch that nets to
    * zero fresh vectors commits nothing and returns the current
    * revision (an empty data dir would poison the multi-dir read).
    */
  def pqAppendCodesVersioned(index: PqIndex,
      emb: org.apache.spark.sql.DataFrame, path: String): Long = {
    val spark = emb.sparkSession
    val (stored, existing) = pqLoadIndexVersioned(spark, path)
    require(stored.fingerprint == index.fingerprint,
      s"pqAppendCodesVersioned: index fingerprint ${index.fingerprint} " +
        s"does not match the store's (${stored.fingerprint}) — appending " +
        "codes from a different training would poison every search")
    val fresh = pqCodes(index,
      emb.join(existing.select("vec_id").distinct(), Seq("vec_id"),
        "left_anti")).localCheckpoint(true)
    if (fresh.isEmpty)
      graft.operators.VersionedStore.currentVersion(spark, path).get
    else
      graft.operators.VersionedStore.append(Map("codes" -> fresh), path)
  }

  /** DELETE: one manifest tombstone revision on `codes` — every
    * (vec_id, sub) row of the vector vanishes from subsequent reads.
    * Idempotent; sticky for a re-appended same vec_id until compact.
    */
  def pqDeleteVectorsVersioned(ids: org.apache.spark.sql.DataFrame,
      path: String): Long =
    graft.operators.VersionedStore.delete(ids.select("vec_id"), "codes",
      path)

  /** ADC search over the store's visible (or `asOf`) revision —
    * [[pqAdcSearch]]'s exact plan, bit-identical to the rename family
    * over the same corpus (VersionedPqSpec pins it).
    */
  def pqAdcSearchVersioned(spark: org.apache.spark.sql.SparkSession,
      queries: org.apache.spark.sql.DataFrame, path: String,
      topK: Int = 5, excludeSelfMatches: Boolean = false,
      asOf: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    val (index, codes) = pqLoadIndexVersioned(spark, path, asOf)
    pqAdcSearch(index, codes, queries, topK, excludeSelfMatches)
  }

  /** SYNC with a versioned embedding corpus — [[sqSyncVersionedWithStore]]'s
    * contract on the codebook family: bootstrap trains + saves from
    * read(current); every later call absorbs the pending revision
    * window as ONE [[graft.operators.VersionedStore.commitDelta]]
    * (tombstones and frozen-codebook codes visible at the same
    * instant); the checkpoint lives beside `_versions`; replays are
    * no-ops. Retraining is the rebuild path, never maintenance.
    */
  def pqSyncVersionedWithStore(spark: org.apache.spark.sql.SparkSession,
      storePath: String, rel: String, path: String,
      retain: Option[Int] = None): Option[(Long, Long)] =
    graft.operators.CdcBridge.sync(spark, storePath, path,
      "pqSyncVersionedWithStore", retain)(
      graft.operators.VersionedStore.currentVersion(spark, path).isDefined)(
      cur => {
        val e = graft.operators.VersionedStore
          .read(spark, storePath, rel, Some(cur)).select("vec_id", "v")
        val index = pqTrain(e)
        pqSaveIndexVersioned(index, pqCodes(index, e), path)
      })(
      (from, to) =>
        graft.operators.CdcBridge.maintainAtomic(spark, storePath, rel,
          from, to, "vec_id", Seq("vec_id", "v"),
          "pqSyncVersionedWithStore") { (del, ins) =>
          val (index, existing) = pqLoadIndexVersioned(spark, path)
          val appends = ins.map(e => pqCodes(index,
              e.join(existing.select("vec_id").distinct(), Seq("vec_id"),
                "left_anti")).localCheckpoint(true))
            .filterNot(_.isEmpty)
            .map(f => Map("codes" -> f))
            .getOrElse(Map.empty[String, org.apache.spark.sql.DataFrame])
          val deletes = del.map(k =>
              Map("codes" -> k.select("vec_id")))
            .getOrElse(Map.empty[String, org.apache.spark.sql.DataFrame])
          if (appends.nonEmpty || deletes.nonEmpty)
            graft.operators.VersionedStore.commitDelta(appends, deletes,
              path)
          ()
        })

  /** Codes from a DIFFERENT training would join silently on colliding
    * code ids and produce plausible-looking but wrong distances — so
    * every search requires the [[pqCodes]] fingerprint column and checks
    * it row-wise (a codegen'd literal compare, map-side; no extra pass
    * over the codes).
    */
  private def fpChecked(index: PqIndex, codes: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    require(codes.columns.contains("fp"),
      "ADC search: codes must carry the index fingerprint column fp " +
        "(encode with pqCodes, or load with pqLoadIndex)")
    codes.filter(
      assert_true(col("fp") === lit(index.fingerprint),
        lit("ADC search: codes were encoded by a DIFFERENT index " +
          "(fingerprint mismatch)")).isNull)
      .drop("fp")
  }

  /** Per-query distance lookup table for one subspace: l2(query
    * subvector, codeword) for every (qid, cid) — k×queries rows, always
    * broadcast. Shared by flat ADC (q108) and IVF-PQ (q112).
    */
  private def adcLut(index: PqIndex, queries: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame, sub: Int)
      : org.apache.spark.sql.DataFrame =
    queries
      .select(col("qid"),
        expr(s"slice(qv, ${sub * index.subDim + 1}, ${index.subDim})").as("qv"))
      .crossJoin(broadcast(cents))
      .select(col("qid"), col("cid"), l2(col("qv"), col("cv")).as("dd"))

  /** The deterministic ADC tail shared by q108 and q112: pivot the one
    * row per (query, doc, subspace) into fixed-order columns (a single
    * non-null value per sum — no FP reordering exists), sum d0+…+dn in
    * column order, rank per query with the vec_id tiebreak.
    */
  private def adcRank(scored: org.apache.spark.sql.DataFrame, nSub: Int,
      topK: Int, excludeSelfMatches: Boolean)
      : org.apache.spark.sql.DataFrame = {
    val pivots = (0 until nSub).map(s =>
      sum(when(col("sub") === s, col("dd"))).as(s"d$s"))
    val adc = scored.groupBy("qid", "vec_id")
      .agg(pivots.head, pivots.tail: _*)
      .select(col("qid"), col("vec_id"),
        (0 until nSub).map(s => col(s"d$s")).reduce(_ + _).as("adc"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adc").asc, col("vec_id").asc)
    (if (excludeSelfMatches) adc.filter(col("qid") =!= col("vec_id")) else adc)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), col("adc").as("adc_dist"))
      .orderBy("query_id", "rank")
  }

  /** Product quantization fidelity report: the 64-dim space is cut into 4
    * subspaces of 16 dims; each trains an 8-code exact-L2 codebook
    * (pqTrain — the q62 k-means with the metric switched, because
    * subvector NORMS must count in a reconstruction codebook), every
    * vector is encoded as its 4 nearest codewords (pqCodewords), and the
    * report scores the reconstruction against the original by cosine, per
    * label. 4 codes × 3 bits ≈ 64× compression here; production PQ is
    * the same shape at 8-16 subspaces × 256 codes. Compare with q102:
    * int8 SQ is 4× smaller at ~0.99995 fidelity, PQ far smaller and far
    * coarser — the two reports together are the compression decision.
    *
    * Scale shape: codebooks are k×S tiny broadcast relations; encoding is
    * a per-subspace broadcast argmin (map-only over the corpus); the only
    * corpus shuffle is the vec_id regroup that concatenates the 4
    * codewords (production encoders keep subspaces columnar and skip
    * even that).
    */
  private val q107 = QueryDef(
    "q107_pq_fidelity",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
        .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      // codebook training is the persistable artifact (the PqIndex store
      // is the production route) — bracketed so the bench splits it out
      val coded = pqCodewords(graft.BenchPhases.build { pqTrain(emb) }, emb)
      val recon = coded.groupBy("vec_id")
        .agg(sort_array(collect_list(struct(col("sub"), col("cv")))).as("a"))
        .select(col("vec_id"),
          expr("flatten(transform(a, x -> x.cv))").as("rv"))
      emb.join(recon, "vec_id")
        .select(col("label"), cosine(col("v"), col("rv")).as("fid"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          min(col("fid")).as("min_fidelity"),
          max(col("fid")).as("max_fidelity"))
        .orderBy("label")
    },
    Some {
      val subCtes = (0 until 4).map { sub =>
        val rel = s"s${sub}v"
        val p = s"s${sub}_"
        s"""$rel AS (SELECT vec_id, v[${sub * 16 + 1}:${sub * 16 + 16}] AS v FROM e),
            ${kmeansSql(k = 8, iters = 2, p = p, rel = rel, byL2 = true)}"""
      }.mkString(",\n")
      val codedSelects = (0 until 4).map { sub =>
        nearestSql(s"s${sub}v", s"s${sub}_cents2", byL2 = true,
          s"vec_id, $sub AS sub, cv")
      }.mkString("\nUNION ALL\n")
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              $subCtes,
              coded AS ($codedSelects),
              recon AS (SELECT vec_id, flatten(list(cv ORDER BY sub)) AS rv
                        FROM coded GROUP BY vec_id)
         SELECT label, COUNT(*) AS n_vecs,
                MIN(${cosSql("v", "rv")}) AS min_fidelity,
                MAX(${cosSql("v", "rv")}) AS max_fidelity
         FROM e JOIN recon ON e.vec_id = recon.vec_id
         GROUP BY label ORDER BY label"""
    })

  /** ADC search — the query-time half of an IVF-PQ index (q107 is the
    * build-time half; q112 adds the IVF cell pruning that bounds the
    * candidate set): queries stay exact, the corpus is only its PQ
    * codes, and distance is the sum over subspaces of l2(query-subvector,
    * codeword) read from a per-query lookup table (here 5 queries × 4
    * subspaces × 8 codes = 160 broadcast rows; production is the same
    * shape with the LUT in L1 cache). The corpus-side cost per candidate
    * is 4 LUT reads and 3 adds — the whole point of PQ search.
    *
    * Determinism: each (query, doc) group has exactly ONE row per
    * subspace, pivoted into four columns (a single non-null value per
    * sum — no FP reordering exists), then summed in fixed column order
    * d0+d1+d2+d3; ties on the ADC distance break on vec_id. So both
    * engines rank identically.
    *
    * Scale shape: codebooks and LUTs broadcast; the per-subspace code
    * join is a broadcast hash join on the code id (map-only over the
    * corpus); the single corpus shuffle is the (qid, vec_id) regroup
    * that sums the four partial distances — production keeps codes
    * columnar (one row per doc) and skips even that.
    */
  /** Run `body` against a throwaway store root, clean up, return the
    * checkpointed result — the harness move the store-served queries
    * share (q176/q201's helper, local to this module).
    */
  private def withThrowawayStore(body: String => org.apache.spark.sql
      .DataFrame)(s: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    val root = graft.BenchPhases.storeDir("graft-vsim")
    val res = body(root + "/idx").localCheckpoint(true)
    graft.BenchPhases.discard(s, root)
    res
  }

  private val q108 = QueryDef(
    "q108_pq_adc_search",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      // training is the persistable artifact — bench-bracketed
      val index = graft.BenchPhases.build { pqTrain(emb) }
      pqAdcSearch(index, pqCodes(index, emb),
        emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("v").as("qv")),
        excludeSelfMatches = true) // queries ARE corpus members here
    },
    Some(pqAdcOracleSql))

  /** q202: q108's flat-ADC arithmetic served from the MANIFEST-COMMITTED
    * PQ store driven through its own verbs — train once on the full
    * corpus, ONE PUT commits codebooks + the bootstrap slice's codes,
    * the remaining slice appends as a delta revision encoded under the
    * FROZEN stored codebooks (bit-identical codes, so the oracle is
    * q108's SQL VERBATIM — swapping the commit protocol under the code
    * store must change NOTHING about what the search returns).
    * VersionedPqSpec additionally pins bit-equality against the rename
    * family across the delete/sticky/compact lifecycle and `asOf` time
    * travel.
    */
  private val q202 = QueryDef(
    "q202_versioned_pq_search",
    (s, d) => {
      val emb = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val boot = emb.filter(col("vec_id") % 4 =!= 3)
      if (boot.isEmpty)
        emb.select(col("vec_id").as("query_id"),
          col("vec_id").as("neighbor_id"), lit(1).as("rank"),
          lit(0.0).as("adc_dist")).limit(0)
      else
        withThrowawayStore { idx =>
          val index = graft.BenchPhases.build {
            val trained = pqTrain(emb)
            pqSaveIndexVersioned(trained, pqCodes(trained, boot), idx)
            pqAppendCodesVersioned(trained,
              emb.filter(col("vec_id") % 4 === 3), idx)
            trained
          }
          pqAdcSearchVersioned(s, q, idx, topK = 5,
            excludeSelfMatches = true)
        }(s)
    },
    Some(pqAdcOracleSql))

  private lazy val pqAdcOracleSql: String = {
      val subCtes = (0 until 4).map { sub =>
        val rel = s"s${sub}v"
        val p = s"s${sub}_"
        s"""$rel AS (SELECT vec_id, v[${sub * 16 + 1}:${sub * 16 + 16}] AS v FROM e),
            ${kmeansSql(k = 8, iters = 2, p = p, rel = rel, byL2 = true)},
            ${p}cd AS (${nearestSql(rel, s"${p}cents2", byL2 = true, "vec_id, cid")}),
            ${p}lut AS (SELECT qid, cid, ${l2Sql("qv", "cv")} AS dd
                        FROM (SELECT vec_id AS qid, v AS qv FROM $rel
                              WHERE vec_id < 5) q
                        CROSS JOIN ${p}cents2),
            ${p}part AS (SELECT qid, ${p}cd.vec_id, $sub AS sub, dd
                         FROM ${p}cd JOIN ${p}lut ON ${p}cd.cid = ${p}lut.cid)"""
      }.mkString(",\n")
      val unions = (0 until 4).map(sub => s"SELECT * FROM s${sub}_part")
        .mkString("\nUNION ALL\n")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              $subCtes,
              parts AS ($unions),
              adc AS (SELECT qid, vec_id,
                        SUM(CASE WHEN sub = 0 THEN dd END)
                          + SUM(CASE WHEN sub = 1 THEN dd END)
                          + SUM(CASE WHEN sub = 2 THEN dd END)
                          + SUM(CASE WHEN sub = 3 THEN dd END) AS adc
                      FROM parts GROUP BY qid, vec_id)
         SELECT qid AS query_id, vec_id AS neighbor_id, rn AS rank, adc AS adc_dist
         FROM (SELECT qid, vec_id, adc,
                      ROW_NUMBER() OVER (PARTITION BY qid
                        ORDER BY adc ASC, vec_id ASC) AS rn
               FROM adc WHERE qid <> vec_id) t
         WHERE rn <= 5 ORDER BY query_id, rank"""
  }

  /** Trains the coarse (IVF) quantizer: the deterministic hash-seeded
    * k-means of q62 plus the corpus cell assignment, returned as
    * (centroids(cid, cv), cells(vec_id, cell)) — the two relations
    * [[ivfPqSearch]] consumes. In production both persist (centroids
    * beside the PQ codebooks, cells as the codes' partition key) and
    * train once; this is the public surface for building them.
    */
  def ivfTrain(e: org.apache.spark.sql.DataFrame, k: Int = 8,
      iters: Int = 3, byL2: Boolean = false): (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame) = {
    val cents = kmeansCentroids(e, k, iters, byL2)
    (cents, ivfAssign(e, cents, byL2))
  }

  /** Cell assignment against an EXISTING coarse quantizer — the encode
    * half [[ivfTrain]] runs at training time, exposed so an increment
    * can be assigned by LOADED centroids without retraining. Provenance
    * is stamped at ASSIGNMENT time (the pqCodes move): every cell row
    * carries the fingerprint of the centroids that produced it, so a
    * later mis-paired save (cells from training B, centroids from
    * training A) is detectable instead of silently pruning the wrong
    * cells.
    */
  def ivfAssign(e: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame,
      byL2: Boolean = false): org.apache.spark.sql.DataFrame =
    nearestCentroid(e, cents, byL2)
      .select(col("vec_id"), col("cid").as("cell"))
      .withColumn("fp", lit(centsFingerprint(cents, byL2)))

  /** The IVF half of the append verb: assign a new batch with the
    * store's own centroids and append the stamped cells. The centroid
    * fingerprint must match the store FIRST — an increment assigned by
    * different centroids would make every row-wise load check reject
    * the whole store (by design: that is the splice the load check
    * exists to catch), so the mistake fails here before the store is
    * damaged.
    */
  def ivfAppendCells(cents: org.apache.spark.sql.DataFrame,
      e: org.apache.spark.sql.DataFrame, path: String,
      byL2: Boolean = false): Unit = {
    val spark = e.sparkSession
    val stored = spark.read.parquet(s"$path/centroids").select("fp").take(1)
    require(stored.nonEmpty,
      s"ivfAppendCells: centroid store at $path/centroids is empty — " +
        "save the index first (ivfSaveIndex)")
    val fp = centsFingerprint(cents.select("cid", "cv"), byL2)
    require(stored(0).getString(0) == fp,
      s"ivfAppendCells: centroids (fingerprint $fp) do not match the " +
        s"store's (${stored(0).getString(0)}) — an increment assigned by " +
        "different centroids OR a different metric (the fingerprint's " +
        "suffix) would prune the wrong cells")
    // idempotent on vec_id (the Load.appendIfAbsent move): a retried
    // append after a crash-after-write must not assign the same vectors
    // twice — duplicate cell rows would double their candidate fan-out
    // silently. The probe reads ONE parquet column of the store.
    val existing = spark.read.parquet(s"$path/cells").select("vec_id").distinct()
    ivfAssign(e.join(existing, Seq("vec_id"), "left_anti"),
        cents.select("cid", "cv"), byL2)
      .write.mode("append").parquet(s"$path/cells")
  }

  /** Deterministic identity of a coarse-centroid relation (md5 over every
    * centroid's exact bits in cid order) — the [[PqIndex.fingerprint]]
    * move for the IVF half: cells persisted from DIFFERENT centroids
    * would prune the wrong candidates silently.
    */
  private def centsFingerprint(cents: org.apache.spark.sql.DataFrame,
      byL2: Boolean): String = {
    // the ASSIGNMENT METRIC is part of the index identity: the same
    // centroid values assign different cells under cosine vs L2 on
    // non-normalized vectors, so a metric-mismatched append or probe
    // must fail the same provenance checks a foreign training does. The
    // tag is hashed into the seed AND appended readably so save/load/
    // append can recover the metric from a stamp without a side channel.
    val tag = if (byL2) "l2" else "cos"
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(s"ivf:$tag:".getBytes("UTF-8"))
    cents.select(col("cid"), col("cv")).collect()
      .sortBy(_.getInt(0))
      .foreach { r =>
        md.update(r.getInt(0).toString.getBytes("UTF-8"))
        r.getSeq[Double](1).foreach { x =>
          md.update(java.nio.ByteBuffer.allocate(8)
            .putLong(java.lang.Double.doubleToLongBits(x)).array())
        }
      }
    md.digest().map("%02x".format(_)).mkString + ":" + tag
  }

  /** Persists the coarse (IVF) half of an index: centroids at
    * `path`/centroids (k tiny rows), the corpus cell assignment at
    * `path`/cells. The cells' provenance stamp — embedded by [[ivfTrain]]
    * at assignment time — is VERIFIED against the centroids here, never
    * re-stamped: a mis-paired save (cells assigned by a different
    * training than the centroids being saved) fails at save, and a
    * post-save file splice still fails at load. Together with
    * [[pqSaveIndex]] this persists everything [[ivfPqSearch]] consumes.
    */
  def ivfSaveIndex(cents: org.apache.spark.sql.DataFrame,
      cells: org.apache.spark.sql.DataFrame, path: String): Unit = {
    val fp = ivfSaveChecked(cents, cells, "ivfSaveIndex")
    cents.select(col("cid"), col("cv")).withColumn("fp", lit(fp))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    cells.select("vec_id", "cell", "fp")
      .write.mode("overwrite").parquet(s"$path/cells")
    // a full save is the tombstone compaction + re-admission point
    graft.operators.IndexTombstones.clear(cells.sparkSession, path)
  }

  /** Save-side gate shared by [[ivfSaveIndex]] and
    * [[ivfSaveIndexVersioned]]: the cells' provenance stamp — embedded
    * by [[ivfTrain]] at assignment time — is VERIFIED against the
    * centroids being saved, never re-stamped: a mis-paired save fails
    * here; an empty assignment fails here with the real reason (load
    * cannot tell "legitimately empty" from "interrupted"). Returns the
    * centroid fingerprint (recomputed under the cells' own claimed
    * metric — a forged suffix changes the hashed seed, so it cannot
    * pass).
    */
  private def ivfSaveChecked(cents: org.apache.spark.sql.DataFrame,
      cells: org.apache.spark.sql.DataFrame, verb: String): String = {
    require(cells.columns.contains("fp"),
      s"$verb: cells carry no provenance stamp — assign them with " +
        "ivfTrain so each row records which centroids produced it")
    val stamps = cells.select("fp").distinct().collect()
      .map(_.getString(0)).toSeq
    require(stamps.nonEmpty,
      s"$verb: refusing to persist an EMPTY cell assignment — " +
        "assign the corpus with ivfTrain/ivfAssign first (an empty store " +
        "would be rejected at load as interrupted)")
    val fp = centsFingerprint(cents, stamps.head.endsWith(":l2"))
    require(stamps == Seq(fp),
      s"$verb: cells were assigned by a different centroid set " +
        s"(${stamps.mkString(", ")}) than the centroids being saved ($fp) " +
        "— a mis-paired store would silently prune the wrong cells")
    fp
  }

  /** Load-side gates shared by [[ivfLoadIndex]] and
    * [[ivfLoadIndexVersioned]]: the centroid fingerprint is recomputed
    * from the loaded codewords and checked against BOTH stored stamps —
    * corrupt centroids and mixed centroid/cell stores fail here, not as
    * wrongly-pruned candidates. Returns (bare cents, storedFp).
    */
  private def ivfGateLoaded(cents: org.apache.spark.sql.DataFrame,
      cells: org.apache.spark.sql.DataFrame, verb: String, where: String)
      : (org.apache.spark.sql.DataFrame, String) = {
    val centFp = cents.select("fp").take(1)
    require(centFp.nonEmpty,
      s"$verb: centroid store at $where is empty — " +
        "interrupted save or wrong path")
    val storedFp = centFp(0).getString(0)
    val bare = cents.select("cid", "cv")
    val recomputed = centsFingerprint(bare, storedFp.endsWith(":l2"))
    require(recomputed == storedFp,
      s"$verb: stored centroid fingerprint $storedFp does not match " +
        s"recomputed $recomputed — centroids at $where are corrupt")
    // EVERY cell row must carry the centroid stamp: a store that mixes
    // assignments from two trainings must fail here, not prune the
    // wrong cells — so the check is over the distinct fp set, never
    // one sampled row (one map-combined aggregate, cheap at any size).
    val cellFps = cells.select("fp").distinct().collect().map(_.getString(0))
    require(cellFps.nonEmpty,
      s"$verb: cell store at $where is empty — " +
        "interrupted save or wrong path")
    require(cellFps.sameElements(Array(storedFp)),
      s"$verb: cells at $where were assigned by a different " +
        s"centroid set (${cellFps.filterNot(_ == storedFp).mkString(", ")}) " +
        s"than the stored centroids ($storedFp)")
    (bare, storedFp)
  }

  /** DELETE verb of the IVF-store lifecycle: tombstone `ids`(vec_id) —
    * their cell rows are masked out of every subsequent [[ivfLoadIndex]],
    * so deleted vectors never appear in a probed candidate list; sticky
    * across a replayed [[ivfAppendCells]].
    */
  def ivfDeleteVectors(ids: org.apache.spark.sql.DataFrame, path: String): Unit = {
    require(ids.sparkSession.read.parquet(s"$path/centroids")
        .select("fp").take(1).nonEmpty,
      s"ivfDeleteVectors: centroid store at $path/centroids is empty — " +
        "nothing to delete from")
    graft.operators.IndexTombstones.append(ids, path)
  }

  /** Restores a persisted coarse index as the (cents, cells) pair
    * [[ivfPqSearch]] takes. The centroid fingerprint is recomputed from
    * the loaded codewords and checked against BOTH stored stamps —
    * corrupt centroids and mixed centroid/cell stores fail here.
    */
  def ivfLoadIndex(spark: org.apache.spark.sql.SparkSession, path: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val cents = spark.read.parquet(s"$path/centroids").localCheckpoint(true)
    val cells = spark.read.parquet(s"$path/cells")
    val (bare, _) = ivfGateLoaded(cents, cells, "ivfLoadIndex", path)
    // the stamp stays on the returned cells: a load → save round-trip
    // re-verifies it, and ivfPqSearch projects it away after its join
    (bare, graft.operators.IndexTombstones.mask(cells, path))
  }

  // ------------------------------------------------------------------
  // MANIFEST-COMMITTED IVF store — the coarse-quantizer half on the
  // rename-free protocol. Gates shared with the rename family
  // ([[ivfSaveChecked]]/[[ivfGateLoaded]]); the assignment metric rides
  // in the fingerprint suffix exactly as before.
  // ------------------------------------------------------------------

  /** Build the manifest-committed IVF store: ONE revision commits the
    * stamped centroids and the corpus cell assignment together.
    */
  def ivfSaveIndexVersioned(cents: org.apache.spark.sql.DataFrame,
      cells: org.apache.spark.sql.DataFrame, path: String,
      extra: Map[String, org.apache.spark.sql.DataFrame] = Map.empty): Long = {
    val fp = ivfSaveChecked(cents, cells, "ivfSaveIndexVersioned")
    graft.operators.VersionedStore.save(Map(
      "centroids" -> cents.select(col("cid"), col("cv"))
        .withColumn("fp", lit(fp)).coalesce(1),
      "cells" -> cells.select("vec_id", "cell", "fp")) ++ extra, path)
  }

  /** Restore (cents, cells) at the current — or `asOf` — revision
    * through the SAME gates as [[ivfLoadIndex]].
    */
  def ivfLoadIndexVersioned(spark: org.apache.spark.sql.SparkSession,
      path: String, asOf: Option[Long] = None)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val cents = graft.operators.VersionedStore
      .read(spark, path, "centroids", asOf).localCheckpoint(true)
    val cells = graft.operators.VersionedStore.read(spark, path, "cells",
      asOf)
    val (bare, _) = ivfGateLoaded(cents, cells, "ivfLoadIndexVersioned",
      path)
    (bare, cells)
  }

  /** APPEND: assign the batch with the STORE's own frozen centroids
    * (`cents` is fingerprint-checked against the store FIRST, exactly
    * like [[ivfAppendCells]]), idempotent on vec_id, committed as a
    * delta revision. Zero-fresh batches commit nothing.
    */
  def ivfAppendCellsVersioned(cents: org.apache.spark.sql.DataFrame,
      e: org.apache.spark.sql.DataFrame, path: String,
      byL2: Boolean = false): Long = {
    val spark = e.sparkSession
    val stored = graft.operators.VersionedStore
      .read(spark, path, "centroids").select("fp").take(1)
    require(stored.nonEmpty,
      s"ivfAppendCellsVersioned: centroid relation at $path is empty — " +
        "save the index first (ivfSaveIndexVersioned)")
    val fp = centsFingerprint(cents.select("cid", "cv"), byL2)
    require(stored(0).getString(0) == fp,
      s"ivfAppendCellsVersioned: centroids (fingerprint $fp) do not " +
        s"match the store's (${stored(0).getString(0)}) — an increment " +
        "assigned by different centroids OR a different metric (the " +
        "fingerprint's suffix) would prune the wrong cells")
    val existing = graft.operators.VersionedStore
      .read(spark, path, "cells").select("vec_id").distinct()
    val fresh = ivfAssign(e.join(existing, Seq("vec_id"), "left_anti"),
        cents.select("cid", "cv"), byL2)
      .select("vec_id", "cell", "fp").localCheckpoint(true)
    if (fresh.isEmpty)
      graft.operators.VersionedStore.currentVersion(spark, path).get
    else
      graft.operators.VersionedStore.append(Map("cells" -> fresh), path)
  }

  /** DELETE: one manifest tombstone revision on `cells`. Idempotent;
    * sticky for a re-appended same vec_id until compact.
    */
  def ivfDeleteVectorsVersioned(ids: org.apache.spark.sql.DataFrame,
      path: String): Long =
    graft.operators.VersionedStore.delete(ids.select("vec_id"), "cells",
      path)

  /** SYNC with a versioned embedding corpus — the frozen-artifact dance
    * on the coarse half: bootstrap trains + assigns from read(current);
    * every later window assigns under the FROZEN stored centroids and
    * lands as ONE commitDelta. Retraining is the rebuild path (cell
    * balance drift is the retrain signal, not a sync concern).
    */
  def ivfSyncVersionedWithStore(spark: org.apache.spark.sql.SparkSession,
      storePath: String, rel: String, path: String, k: Int = 8,
      byL2: Boolean = false,
      retain: Option[Int] = None): Option[(Long, Long)] =
    graft.operators.CdcBridge.sync(spark, storePath, path,
      "ivfSyncVersionedWithStore", retain)(
      graft.operators.VersionedStore.currentVersion(spark, path).isDefined)(
      cur => {
        val e = graft.operators.VersionedStore
          .read(spark, storePath, rel, Some(cur)).select("vec_id", "v")
        val (cents, cells) = ivfTrain(e, k, byL2 = byL2)
        ivfSaveIndexVersioned(cents, cells.localCheckpoint(true), path)
      })(
      (from, to) =>
        graft.operators.CdcBridge.maintainAtomic(spark, storePath, rel,
          from, to, "vec_id", Seq("vec_id", "v"),
          "ivfSyncVersionedWithStore") { (del, ins) =>
          val (cents, existing) = ivfLoadIndexVersioned(spark, path)
          // the stored stamp's suffix carries the assignment metric
          val metric = graft.operators.VersionedStore
            .read(spark, path, "centroids").select("fp").take(1)(0)
            .getString(0).endsWith(":l2")
          val appends = ins.map(e => ivfAssign(
              e.join(existing.select("vec_id").distinct(), Seq("vec_id"),
                "left_anti"), cents, metric)
              .select("vec_id", "cell", "fp").localCheckpoint(true))
            .filterNot(_.isEmpty)
            .map(f => Map("cells" -> f))
            .getOrElse(Map.empty[String, org.apache.spark.sql.DataFrame])
          val deletes = del.map(k2 =>
              Map("cells" -> k2.select("vec_id")))
            .getOrElse(Map.empty[String, org.apache.spark.sql.DataFrame])
          if (appends.nonEmpty || deletes.nonEmpty)
            graft.operators.VersionedStore.commitDelta(appends, deletes,
              path)
          ()
        })

  /** IVF-PQ search — the composition of the coarse quantizer (q62) with
    * ADC scoring (q108), i.e. the actual shape of a production
    * billion-vector index: the query probes its `nprobe` nearest coarse
    * cells and ADC-scores ONLY the PQ codes of vectors assigned to those
    * cells, closing flat ADC's "ranks every corpus code" caveat. `cells`
    * is the materialized corpus assignment (vec_id → cell, from
    * [[nearestCentroid]] over the same `cents` the queries probe);
    * `codes` must carry [[pqCodes]]' fingerprint for `index`.
    *
    * Scale shape: coarse centroids and per-query LUTs broadcast; the
    * candidate list is (queries × probed-cell occupancy)-sized and
    * broadcast-joined into the codes — at the 100 TB target the codes
    * are PARTITIONED by cell id (the q98 layout move), so probing reads
    * only the probed cells' files instead of filtering a full scan; the
    * one shuffle is the (qid, vec_id) regroup shared with q108.
    * Production refinement not modeled here: encoding residuals
    * (v − coarse centroid) instead of raw vectors tightens ADC at the
    * same code budget — same plan shape, one extra subtraction before
    * encode.
    */
  def ivfPqSearch(cells: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame,
      index: PqIndex,
      codes: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame,
      nprobe: Int = 2, topK: Int = 5,
      excludeSelfMatches: Boolean = false,
      probeByL2: Boolean = false): org.apache.spark.sql.DataFrame = {
    val vdims = index.subspaces * index.subDim
    val checked = queries.filter(
      assert_true(size(col("qv")) === lit(vdims),
        lit(s"ivfPqSearch: query vector length must be $vdims")).isNull)
    // probe metric mirrors the coarse quantizer's assignment metric
    // (ivfTrain byL2): an L2-assigned store probed by cosine would
    // systematically miss the cells its vectors actually live in
    val wq =
      if (probeByL2)
        Window.partitionBy("qid").orderBy(col("aff").asc, col("cid").asc)
      else
        Window.partitionBy("qid").orderBy(col("aff").desc, col("cid").asc)
    val aff =
      if (probeByL2) l2(col("qv"), col("cv")) else cosine(col("qv"), col("cv"))
    val qcells = checked.crossJoin(broadcast(cents))
      .select(col("qid"), col("cid"), aff.as("aff"))
      .withColumn("crn", row_number().over(wq))
      .filter(col("crn") <= nprobe)
      .select(col("qid"), col("cid").as("cell"))
    val candidates = cells.join(broadcast(qcells), "cell")
      .select(col("qid"), col("vec_id"))
    val candCodes = fpChecked(index, codes)
      .join(broadcast(candidates), "vec_id")
    val scored = index.codebooks.zipWithIndex.map { case (cents2, sub) =>
      candCodes.filter(col("sub") === sub).drop("sub")
        .join(broadcast(adcLut(index, checked, cents2, sub)), Seq("qid", "cid"))
        .select(col("qid"), col("vec_id"), lit(sub).as("sub"), col("dd"))
    }.reduce(_ unionAll _)
    adcRank(scored, index.subspaces, topK, excludeSelfMatches)
  }

  private val q112 = QueryDef(
    "q112_ivf_pq_search",
    (s, d) => {
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      // coarse + PQ training are the persistable artifacts (the PqIndex
      // store is the production route, documented since r6) — bracketed
      // so the bench attributes them to build_s, not query_s
      val ((cents, cells), index) =
        graft.BenchPhases.build { (ivfTrain(e), pqTrain(e)) }
      ivfPqSearch(cells, cents, index, pqCodes(index, e),
        e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("v").as("qv")),
        excludeSelfMatches = true) // queries ARE corpus members here
    },
    Some {
      val subCtes = (0 until 4).map { sub =>
        val rel = s"s${sub}v"
        val p = s"s${sub}_"
        s"""$rel AS (SELECT vec_id, v[${sub * 16 + 1}:${sub * 16 + 16}] AS v FROM e),
            ${kmeansSql(k = 8, iters = 2, p = p, rel = rel, byL2 = true)},
            ${p}cd AS (${nearestSql(rel, s"${p}cents2", byL2 = true, "vec_id, cid")}),
            ${p}lut AS (SELECT qid, cid, ${l2Sql("qv", "cv")} AS dd
                        FROM (SELECT vec_id AS qid, v AS qv FROM $rel
                              WHERE vec_id < 5) q
                        CROSS JOIN ${p}cents2),
            ${p}part AS (SELECT cand.qid, cand.vec_id, $sub AS sub, dd
                         FROM cand
                         JOIN ${p}cd ON cand.vec_id = ${p}cd.vec_id
                         JOIN ${p}lut ON ${p}lut.qid = cand.qid
                                     AND ${p}lut.cid = ${p}cd.cid)"""
      }.mkString(",\n")
      val unions = (0 until 4).map(sub => s"SELECT * FROM s${sub}_part")
        .mkString("\nUNION ALL\n")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              ${kmeansSql()},
              ranked AS (SELECT vec_id, v, cid, aff,
                           ROW_NUMBER() OVER (PARTITION BY vec_id
                             ORDER BY aff DESC, cid ASC) AS crn
                         FROM (SELECT e.vec_id, e.v, cid, ${cosSql("v", "cv")} AS aff
                               FROM e CROSS JOIN cents3)),
              cells AS (SELECT vec_id, cid AS cell FROM ranked WHERE crn = 1),
              qcells AS (SELECT vec_id AS qid, cid AS cell
                         FROM ranked WHERE vec_id < 5 AND crn <= 2),
              cand AS (SELECT qid, cells.vec_id
                       FROM cells JOIN qcells ON cells.cell = qcells.cell),
              $subCtes,
              parts AS ($unions),
              adc AS (SELECT qid, vec_id,
                        SUM(CASE WHEN sub = 0 THEN dd END)
                          + SUM(CASE WHEN sub = 1 THEN dd END)
                          + SUM(CASE WHEN sub = 2 THEN dd END)
                          + SUM(CASE WHEN sub = 3 THEN dd END) AS adc
                      FROM parts GROUP BY qid, vec_id)
         SELECT qid AS query_id, vec_id AS neighbor_id, rn AS rank, adc AS adc_dist
         FROM (SELECT qid, vec_id, adc,
                      ROW_NUMBER() OVER (PARTITION BY qid
                        ORDER BY adc ASC, vec_id ASC) AS rn
               FROM adc WHERE qid <> vec_id) t
         WHERE rn <= 5 ORDER BY query_id, rank"""
    })

  /** Multi-table (OR-amplified) LSH ANN — the production fix for the
    * single-table recall floor SCALING.md measures honestly for q37
    * (7/125 @ 6 planes, single probe): L independent hyperplane tables
    * (disjoint plane-id ranges, see lshBucket's `table` parameter), a
    * candidate is any corpus vector sharing the query's bucket in ANY
    * table, so per-pair hit probability amplifies to 1−(1−r)^L while
    * every table keeps an equality-joinable bucket id. Candidates from
    * several tables dedupe before the exact cosine re-rank.
    *
    * Scale shape: ONE corpus scan computes all L bucket ids; the L-way
    * explode is map-local and feeds a broadcast join against the (tiny,
    * also-L-exploded) query buckets — the corpus never shuffles; only
    * the candidate set (bounded by L × bucket occupancy, each table's
    * 2^planes dial) shuffles for the dedupe and per-query top-k. At the
    * 100 TB target the L bucket ids are persisted columns beside the
    * vectors (the q82 signature-index lifecycle), so amplification costs
    * L small-int columns, not L corpus scans.
    *
    * `excludeSelfMatches` follows the [[pqAdcSearch]] contract: set it
    * ONLY when queries are corpus members (q111 does) — an external qid
    * that happens to collide with a corpus vec_id must not lose that
    * corpus vector from its candidates.
    */
  def lshMultiAnn(e: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame,
      tables: Int = 4, planes: Int = 6, topK: Int = 5,
      vdims: Int = dims,
      excludeSelfMatches: Boolean = false): org.apache.spark.sql.DataFrame = {
    def bucketed(in: org.apache.spark.sql.DataFrame,
        idCol: String, vCol: String) =
      in.select(col(idCol), col(vCol),
        posexplode(array((0 until tables).map(t =>
          lshBucket(col(vCol), planes, vdims, t)): _*)))
        .toDF(idCol, vCol, "tbl", "bucket")
    val hits = bucketed(e, "vec_id", "v")
      .join(broadcast(bucketed(queries, "qid", "qv")), Seq("tbl", "bucket"))
    val cand = (if (excludeSelfMatches) hits.filter(col("qid") =!= col("vec_id"))
      else hits)
      .select(col("qid"), col("vec_id").as("nid"),
        cosine(col("qv"), col("v")).as("sim"))
      .distinct() // a pair found by several tables scores identically
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("nid").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("qid").as("query_id"), col("nid").as("neighbor_id"),
        col("rank"), col("sim").as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  /** Spec identity of an LSH bucket store. Unlike PQ/IVF there is no
    * TRAINING to fingerprint — the hyperplanes are derived
    * deterministically from md5 of the global plane id (VectorFunctions
    * .signProjection) — so the stamp pins the GEOMETRY and projection
    * convention: a store bucketed under different (tables, planes, dims)
    * or by a changed projection would equality-join the wrong candidate
    * sets silently. The bin-family lesson (format identity, not training
    * identity) applied to the fourth index family.
    */
  private def lshFingerprint(tables: Int, planes: Int, vdims: Int): String =
    s"lsh:dims=$vdims:tables=$tables:planes=$planes:proj=md5-sign-q1e6"

  /** Multi-table bucket assignment in persistable form: one row per
    * (vec_id, table) carrying the small-int bucket id plus the spec
    * stamp — the relation [[lshMultiAnn]] computes on the fly, exposed
    * so it can be built ONCE and persisted beside the vectors (the q98
    * layout move; at 100 TB the bucket columns are a few bytes against
    * a 256-byte vector, and candidate generation then reads only them).
    */
  def lshBuckets(emb: org.apache.spark.sql.DataFrame,
      tables: Int = 4, planes: Int = 6, vdims: Int = dims)
      : org.apache.spark.sql.DataFrame =
    emb.filter(
        assert_true(size(col("v")) === lit(vdims),
          lit(s"lshBuckets: vector length must be $vdims")).isNull)
      .select(col("vec_id"),
        posexplode(array((0 until tables).map(t =>
          lshBucket(col("v"), planes, vdims, t)): _*)))
      .toDF("vec_id", "tbl", "bucket")
      .withColumn("fp", lit(lshFingerprint(tables, planes, vdims)))

  /** Persists a multi-table LSH bucket assignment at `path`/buckets with
    * a 1-row geometry relation at `path`/meta — build once, search
    * forever, append increments: the store lifecycle of the other three
    * index families applied to LSH. The stamp is verified against the
    * declared geometry BEFORE anything is written (a mis-declared save
    * would poison every candidate join).
    */
  def lshSaveIndex(buckets: org.apache.spark.sql.DataFrame,
      tables: Int, planes: Int, path: String, vdims: Int = dims): Unit = {
    val fp = lshSaveChecked(buckets, tables, planes, vdims, "lshSaveIndex")
    lshMetaRow(buckets.sparkSession, fp, tables, planes, vdims)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    buckets.select("vec_id", "tbl", "bucket", "fp")
      .write.mode("overwrite").parquet(s"$path/buckets")
    // a full save is the tombstone compaction + re-admission point
    graft.operators.IndexTombstones.clear(buckets.sparkSession, path)
  }

  /** The 1-row geometry relation BOTH persisted forms write. */
  private def lshMetaRow(spark: org.apache.spark.sql.SparkSession,
      fp: String, tables: Int, planes: Int, vdims: Int)
      : org.apache.spark.sql.DataFrame =
    spark.range(1).select(lit(fp).as("fp"), lit(tables).as("tables"),
      lit(planes).as("planes"), lit(vdims).as("dims"))

  /** Save-side gate shared by [[lshSaveIndex]] and
    * [[lshSaveIndexVersioned]]: the stamp is verified against the
    * declared geometry BEFORE anything is written (a mis-declared save
    * would poison every candidate join). Returns the fingerprint.
    */
  private def lshSaveChecked(buckets: org.apache.spark.sql.DataFrame,
      tables: Int, planes: Int, vdims: Int, verb: String): String = {
    require(buckets.columns.contains("fp"),
      s"$verb: buckets carry no spec stamp — build them with lshBuckets")
    val fp = lshFingerprint(tables, planes, vdims)
    val stamps = buckets.select("fp").distinct().collect()
      .map(_.getString(0)).toSeq
    require(stamps.nonEmpty,
      s"$verb: refusing to persist an EMPTY bucket assignment — " +
        "bucket the corpus with lshBuckets first (an empty store would " +
        "be rejected at load as interrupted)")
    require(stamps == Seq(fp),
      s"$verb: buckets were built under a different spec " +
        s"(${stamps.mkString(", ")}) than the declared geometry ($fp) — " +
        "a mis-declared store would equality-join the wrong candidates")
    fp
  }

  /** Load-side gates shared by [[lshLoadIndex]] and
    * [[lshLoadIndexVersioned]]: the meta stamp is recomputed from the
    * stored geometry and checked, and every bucket row's stamp is
    * checked against it. Returns (tables, planes).
    */
  private def lshGateLoaded(meta: Array[org.apache.spark.sql.Row],
      buckets: org.apache.spark.sql.DataFrame, verb: String,
      where: String): (Int, Int) = {
    require(meta.nonEmpty,
      s"$verb: meta store at $where is empty — interrupted " +
        "save or wrong path")
    val m = meta(0)
    val (fp, tables, planes, vd) =
      (m.getString(0), m.getInt(1), m.getInt(2), m.getInt(3))
    require(fp == lshFingerprint(tables, planes, vd),
      s"$verb: stored stamp $fp does not match its own declared " +
        s"geometry (tables=$tables, planes=$planes, dims=$vd) — the " +
        "meta row is corrupt or hand-edited")
    val stamps = buckets.select("fp").distinct().collect()
      .map(_.getString(0)).toSeq
    require(stamps == Seq(fp),
      s"$verb: bucket rows carry stamps ${stamps.mkString(", ")} " +
        s"— the store at $where mixes geometries or is corrupt")
    (tables, planes)
  }

  /** DELETE verb of the LSH-store lifecycle: tombstone `ids`(vec_id) —
    * ALL of a vector's bucket rows (one per table) are masked out of
    * every subsequent [[lshLoadIndex]]; sticky across a replayed
    * [[lshAppendBuckets]].
    */
  def lshDeleteVectors(ids: org.apache.spark.sql.DataFrame, path: String): Unit = {
    require(ids.sparkSession.read.parquet(s"$path/meta")
        .select("fp").take(1).nonEmpty,
      s"lshDeleteVectors: meta store at $path/meta is empty — nothing " +
        "to delete from")
    graft.operators.IndexTombstones.append(ids, path)
  }

  /** Restores a persisted LSH index as (buckets, tables, planes). The
    * meta stamp is recomputed from the stored geometry and checked, and
    * every bucket row's stamp is checked against it (the IVF cells
    * move) — a store spliced from two geometries fails loudly instead
    * of joining wrong candidate sets.
    */
  def lshLoadIndex(spark: org.apache.spark.sql.SparkSession, path: String)
      : (org.apache.spark.sql.DataFrame, Int, Int) = {
    val buckets = spark.read.parquet(s"$path/buckets")
    val (tables, planes) = lshGateLoaded(
      spark.read.parquet(s"$path/meta")
        .select("fp", "tables", "planes", "dims").take(1),
      buckets, "lshLoadIndex", path)
    (graft.operators.IndexTombstones.mask(buckets, path), tables, planes)
  }

  // ------------------------------------------------------------------
  // MANIFEST-COMMITTED LSH store — the bucket family on the rename-free
  // protocol. Like the binary family the artifact is a fixed GEOMETRY,
  // not a training — the meta row guards mis-declared geometry. Gates
  // shared with the rename family ([[lshSaveChecked]]/[[lshGateLoaded]]).
  // ------------------------------------------------------------------

  /** Build the manifest-committed LSH store: ONE revision commits the
    * geometry row and the bucket assignment together.
    */
  def lshSaveIndexVersioned(buckets: org.apache.spark.sql.DataFrame,
      tables: Int, planes: Int, path: String, vdims: Int = dims,
      extra: Map[String, org.apache.spark.sql.DataFrame] = Map.empty): Long = {
    val fp = lshSaveChecked(buckets, tables, planes, vdims,
      "lshSaveIndexVersioned")
    graft.operators.VersionedStore.save(Map(
      "meta" -> lshMetaRow(buckets.sparkSession, fp, tables, planes,
        vdims).coalesce(1),
      "buckets" -> buckets.select("vec_id", "tbl", "bucket", "fp")) ++ extra,
      path)
  }

  /** Restore (buckets, tables, planes) at the current — or `asOf` —
    * revision through the SAME gates as [[lshLoadIndex]].
    */
  def lshLoadIndexVersioned(spark: org.apache.spark.sql.SparkSession,
      path: String, asOf: Option[Long] = None)
      : (org.apache.spark.sql.DataFrame, Int, Int) = {
    val buckets = graft.operators.VersionedStore.read(spark, path,
      "buckets", asOf)
    val (tables, planes) = lshGateLoaded(
      graft.operators.VersionedStore.read(spark, path, "meta", asOf)
        .select("fp", "tables", "planes", "dims").take(1),
      buckets, "lshLoadIndexVersioned", path)
    (buckets, tables, planes)
  }

  /** APPEND: bucket the batch under the STORE'S OWN geometry (read from
    * the meta relation, so the caller cannot drift it), idempotent on
    * vec_id, committed as a delta revision. Zero-fresh batches commit
    * nothing.
    */
  def lshAppendBucketsVersioned(emb: org.apache.spark.sql.DataFrame,
      path: String): Long = {
    val spark = emb.sparkSession
    val meta = graft.operators.VersionedStore.read(spark, path, "meta")
      .select("tables", "planes", "dims").take(1)
    require(meta.nonEmpty,
      s"lshAppendBucketsVersioned: meta relation at $path is empty — " +
        "save the index first (lshSaveIndexVersioned)")
    val m = meta(0)
    val existing = graft.operators.VersionedStore
      .read(spark, path, "buckets").select("vec_id").distinct()
    val fresh = lshBuckets(emb.join(existing, Seq("vec_id"), "left_anti"),
      m.getInt(0), m.getInt(1), m.getInt(2)).localCheckpoint(true)
    if (fresh.isEmpty)
      graft.operators.VersionedStore.currentVersion(spark, path).get
    else
      graft.operators.VersionedStore.append(Map("buckets" ->
        fresh.select("vec_id", "tbl", "bucket", "fp")), path)
  }

  /** DELETE: one manifest tombstone revision on `buckets` — ALL of a
    * vector's bucket rows (one per table) vanish, the anti join keying
    * on vec_id alone. Idempotent; sticky until compact.
    */
  def lshDeleteVectorsVersioned(ids: org.apache.spark.sql.DataFrame,
      path: String): Long =
    graft.operators.VersionedStore.delete(ids.select("vec_id"), "buckets",
      path)

  /** ANN search from the store's visible (or `asOf`) revision —
    * [[lshSearchIndex]]'s exact plan over the stored buckets.
    */
  def lshSearchIndexVersioned(spark: org.apache.spark.sql.SparkSession,
      e: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, path: String,
      topK: Int = 5, excludeSelfMatches: Boolean = false,
      asOf: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    val (buckets, tables, planes) = lshLoadIndexVersioned(spark, path, asOf)
    lshSearchIndex(buckets, e, queries, tables, planes, topK,
      excludeSelfMatches = excludeSelfMatches)
  }

  /** SYNC with a versioned embedding corpus — the no-trained-artifact
    * dance ([[binSyncVersionedWithStore]]) on the bucket family: the
    * geometry is pinned at bootstrap and increments bucket under it.
    */
  def lshSyncVersionedWithStore(spark: org.apache.spark.sql.SparkSession,
      storePath: String, rel: String, path: String,
      tables: Int = 4, planes: Int = 6, vdims: Int = dims,
      retain: Option[Int] = None)
      : Option[(Long, Long)] =
    graft.operators.CdcBridge.sync(spark, storePath, path,
      "lshSyncVersionedWithStore", retain)(
      graft.operators.VersionedStore.currentVersion(spark, path).isDefined)(
      cur => {
        val e = graft.operators.VersionedStore
          .read(spark, storePath, rel, Some(cur)).select("vec_id", "v")
        lshSaveIndexVersioned(lshBuckets(e, tables, planes, vdims),
          tables, planes, path, vdims)
      })(
      (from, to) =>
        graft.operators.CdcBridge.maintainAtomic(spark, storePath, rel,
          from, to, "vec_id", Seq("vec_id", "v"),
          "lshSyncVersionedWithStore") { (del, ins) =>
          val meta = graft.operators.VersionedStore
            .read(spark, path, "meta")
            .select("tables", "planes", "dims").take(1)(0)
          val existing = graft.operators.VersionedStore
            .read(spark, path, "buckets").select("vec_id").distinct()
          val appends = ins.map(e => lshBuckets(
              e.join(existing, Seq("vec_id"), "left_anti"),
              meta.getInt(0), meta.getInt(1), meta.getInt(2))
              .select("vec_id", "tbl", "bucket", "fp")
              .localCheckpoint(true))
            .filterNot(_.isEmpty)
            .map(f => Map("buckets" -> f))
            .getOrElse(Map.empty[String, org.apache.spark.sql.DataFrame])
          val deletes = del.map(k =>
              Map("buckets" -> k.select("vec_id")))
            .getOrElse(Map.empty[String, org.apache.spark.sql.DataFrame])
          if (appends.nonEmpty || deletes.nonEmpty)
            graft.operators.VersionedStore.commitDelta(appends, deletes,
              path)
          ()
        })

  /** The APPEND verb of the LSH-store lifecycle: bucket a new batch
    * under the STORE'S OWN geometry (read from meta, so the caller
    * cannot drift it) and append, idempotent on vec_id — the same
    * retried-append guard as the other three families.
    */
  def lshAppendBuckets(emb: org.apache.spark.sql.DataFrame,
      path: String): Unit = {
    val spark = emb.sparkSession
    val meta = spark.read.parquet(s"$path/meta")
      .select("tables", "planes", "dims").take(1)
    require(meta.nonEmpty,
      s"lshAppendBuckets: meta store at $path/meta is empty — save the " +
        "index first (lshSaveIndex)")
    val m = meta(0)
    val existing = spark.read.parquet(s"$path/buckets")
      .select("vec_id").distinct()
    lshBuckets(emb.join(existing, Seq("vec_id"), "left_anti"),
        m.getInt(0), m.getInt(1), m.getInt(2))
      .write.mode("append").parquet(s"$path/buckets")
  }

  /** ANN search from a PERSISTED bucket store: candidates come from the
    * stored (tbl, bucket) equality join — the corpus is never
    * re-bucketed — and only the candidate set (queries × bucket
    * occupancy, broadcast) joins back into the vector relation for the
    * exact cosine rerank. Results are identical to [[lshMultiAnn]] at
    * the same geometry (the bucket function is deterministic), proven
    * in LshIndexSpec against q111. Bucket rows are stamp-checked
    * row-wise (the fpChecked move): a foreign-geometry store fails at
    * the first row, not as silently-wrong candidates.
    */
  def lshSearchIndex(buckets: org.apache.spark.sql.DataFrame,
      e: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame,
      tables: Int = 4, planes: Int = 6, topK: Int = 5, vdims: Int = dims,
      excludeSelfMatches: Boolean = false): org.apache.spark.sql.DataFrame = {
    val fp = lshFingerprint(tables, planes, vdims)
    require(buckets.columns.contains("fp"),
      "lshSearchIndex: buckets must carry the spec stamp column fp " +
        "(build with lshBuckets, or load with lshLoadIndex)")
    val checked = buckets.filter(
      assert_true(col("fp") === lit(fp),
        concat(lit("lshSearchIndex: bucket stamp "), col("fp"),
          lit(s" does not match the declared geometry ($fp)"))).isNull)
    val qb = queries.select(col("qid"), col("qv"),
        posexplode(array((0 until tables).map(t =>
          lshBucket(col("qv"), planes, vdims, t)): _*)))
      .toDF("qid", "qv", "tbl", "bucket")
    val hits = checked.select("vec_id", "tbl", "bucket")
      .join(broadcast(qb), Seq("tbl", "bucket"))
    val cand = (if (excludeSelfMatches) hits.filter(col("qid") =!= col("vec_id"))
      else hits)
      .select("qid", "vec_id").distinct()
    val scored = e.join(broadcast(cand), "vec_id")
      .join(broadcast(queries.select(col("qid"), col("qv"))), "qid")
      .select(col("qid"), col("vec_id").as("nid"),
        cosine(col("qv"), col("v")).as("sim"))
    graft.operators.GroupTopK.topK(scored, Seq(col("qid")),
        Seq(col("sim").desc, col("nid").asc), col("nid"), topK,
        rankName = "rank")
      .select(col("qid").as("query_id"), col("nid").as("neighbor_id"),
        col("rank"), col("sim").as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  /** Residual vectors for residual-encoded IVF-PQ: every corpus vector
    * minus the coarse centroid of its cell, v − cv[cell] — the standard
    * production refinement that q112's flat composition documents:
    * within a cell the residuals span a far tighter ball than the raw
    * vectors, so the SAME code budget quantizes them with much smaller
    * error and ADC recall escapes the shared-codeword tie floor
    * (measured in SCALING.md's code-budget table).
    *
    * Scale shape: `cells` joins `e` on vec_id — at the 100 TB target the
    * cell id is a persisted column beside the vector (written at
    * [[ivfTrain]] assignment time, the q98 layout move), so this join
    * disappears into the scan; the centroid side is k rows, broadcast.
    * The subtraction is one codegen'd zip_with, map-only. Elementwise
    * a − b is a single exact FP op on both engines, so residuals (and
    * everything trained on them) stay oracle-able bit-for-bit.
    */
  def ivfResiduals(e: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame,
      cells: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    e.join(cells.select("vec_id", "cell"), "vec_id")
      .join(broadcast(cents.select(col("cid").as("cell"), col("cv"))), "cell")
      .select(col("vec_id"), col("cell"),
        zip_with(col("v"), col("cv"), (x, y) => x - y).as("v"))

  /** Per-(query, probed-cell) residual distance LUT for one subspace:
    * l2(query-residual subvector, codeword) for every (qid, cell, cid) —
    * queries × nprobe × k rows, always broadcast. The cell key is what
    * distinguishes residual ADC from flat ADC's [[adcLut]]: the same
    * query has a DIFFERENT residual (and so a different table) in each
    * probed cell.
    */
  private def residualLut(index: PqIndex,
      qres: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame, sub: Int)
      : org.apache.spark.sql.DataFrame =
    qres
      .select(col("qid"), col("cell"),
        expr(s"slice(qrv, ${sub * index.subDim + 1}, ${index.subDim})").as("qv"))
      .crossJoin(broadcast(cents))
      .select(col("qid"), col("cell"), col("cid"), l2(col("qv"), col("cv")).as("dd"))

  /** Residual-encoded IVF-PQ search — [[ivfPqSearch]] with the
    * production encoding: `codes` are PQ codes of RESIDUALS (train with
    * [[pqTrain]] over [[ivfResiduals]] output, encode the same), and the
    * query's ADC tables are built from its per-cell residual qv − cv so
    * code distances and query distances live in the same residual space.
    * Everything else — nprobe cell pruning, broadcast LUTs, the one
    * (qid, vec_id) regroup, fingerprint row-checks — is the q112 shape;
    * the only structural delta is the LUT keyed by (qid, cell, cid)
    * instead of (qid, cid). Exactness caveat inherited from ADC; recall
    * vs the flat encoding at the same code budget is measured in
    * SCALING.md (the entire point of the residual form).
    */
  def ivfPqSearchResidual(cells: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame,
      index: PqIndex,
      codes: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame,
      nprobe: Int = 2, topK: Int = 5,
      excludeSelfMatches: Boolean = false,
      probeByL2: Boolean = false): org.apache.spark.sql.DataFrame = {
    val vdims = index.subspaces * index.subDim
    val checked = queries.filter(
      assert_true(size(col("qv")) === lit(vdims),
        lit(s"ivfPqSearchResidual: query vector length must be $vdims")).isNull)
    // probe metric mirrors the coarse quantizer's assignment metric
    // (ivfTrain byL2): cosine cells probe by cosine, L2 cells by L2
    val wq =
      if (probeByL2)
        Window.partitionBy("qid").orderBy(col("aff").asc, col("cid").asc)
      else
        Window.partitionBy("qid").orderBy(col("aff").desc, col("cid").asc)
    val aff =
      if (probeByL2) l2(col("qv"), col("cv")) else cosine(col("qv"), col("cv"))
    val qres = checked.crossJoin(broadcast(cents))
      .select(col("qid"), col("qv"), col("cid"), col("cv"), aff.as("aff"))
      .withColumn("crn", row_number().over(wq))
      .filter(col("crn") <= nprobe)
      .select(col("qid"), col("cid").as("cell"),
        zip_with(col("qv"), col("cv"), (x, y) => x - y).as("qrv"))
      // queries×nprobe tiny rows feeding FIVE consumers (candidates + one
      // LUT per subspace, each its own broadcast exchange embedding this
      // subplan — the slices differ, so exchange reuse cannot dedupe):
      // materialize once, the q72 discipline
      .localCheckpoint(true)
    val candidates = cells.select("vec_id", "cell")
      .join(broadcast(qres.select("qid", "cell")), "cell")
      .select(col("qid"), col("cell"), col("vec_id"))
    val candCodes = fpChecked(index, codes)
      .join(broadcast(candidates), "vec_id")
    val scored = index.codebooks.zipWithIndex.map { case (cb, sub) =>
      candCodes.filter(col("sub") === sub).drop("sub")
        .join(broadcast(residualLut(index, qres, cb, sub)),
          Seq("qid", "cell", "cid"))
        .select(col("qid"), col("vec_id"), lit(sub).as("sub"), col("dd"))
    }.reduce(_ unionAll _)
    adcRank(scored, index.subspaces, topK, excludeSelfMatches)
  }

  /** Persists the COMPOSED residual IVF-PQ index — the production form
    * of q127. The halves reuse the existing stores verbatim
    * (`path`/ivf from [[ivfSaveIndex]], `path`/pq from [[pqSaveIndex]] —
    * codebooks and codes in RESIDUAL space), plus a 1-row `path`/meta
    * stamping the PAIRING: the centroid fingerprint, the PQ fingerprint,
    * and md5 over both under the "residual" tag. Each half already
    * rejects in-family corruption on load; the composed stamp catches
    * the CROSS-family splice — e.g. `path`/pq overwritten with a
    * flat-encoded store of identical geometry, which passes the PQ
    * half's own checks and would then silently score raw-space codes
    * against residual-space query LUTs. Without this verb the persisted
    * index was the flat 5/125-recall one while the in-session pipeline
    * (q127) was the residual 11/125 one — the store now carries the
    * production encoding.
    */
  def residualSaveIndex(cents: org.apache.spark.sql.DataFrame,
      cells: org.apache.spark.sql.DataFrame,
      index: PqIndex, codes: org.apache.spark.sql.DataFrame,
      path: String): Unit = {
    ivfSaveIndex(cents, cells, s"$path/ivf")
    pqSaveIndex(index, codes, s"$path/pq")
    val spark = cents.sparkSession
    // the saved centroid stamp (metric tag included) is the half's own
    // identity — read it back rather than recomputing, so meta can never
    // disagree with what was actually written
    val centsFp = spark.read.parquet(s"$path/ivf/centroids")
      .select("fp").take(1)(0).getString(0)
    val s2 = spark
    import s2.implicits._
    Seq((centsFp, index.fingerprint,
        composedResidualFp(centsFp, index.fingerprint), "residual"))
      .toDF("cents_fp", "pq_fp", "composed_fp", "encoding")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** DELETE verb of the composed residual lifecycle: tombstone
    * `ids`(vec_id) in BOTH halves — the ivf/ cells (candidate
    * generation) and the pq/ codes (scoring) — so a forgotten vector
    * neither surfaces as a candidate nor carries dormant codes that a
    * half-store reuse could resurrect. Masked by [[residualLoadIndex]]
    * through the half loads; sticky across [[residualAppendVectors]]
    * (its idempotence probes read the raw stores).
    */
  def residualDeleteVectors(ids: org.apache.spark.sql.DataFrame,
      path: String): Unit = {
    require(ids.sparkSession.read.parquet(s"$path/meta").take(1).nonEmpty,
      s"residualDeleteVectors: meta store at $path/meta is empty — " +
        "nothing to delete from")
    graft.operators.IndexTombstones.append(ids, s"$path/ivf")
    graft.operators.IndexTombstones.append(ids, s"$path/pq")
  }

  /** The pairing identity of a composed residual store: both halves'
    * fingerprints hashed under the residual tag. Swapping EITHER half
    * for a same-shaped foreign (or flat-trained) one changes it.
    */
  private def composedResidualFp(centsFp: String, pqFp: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(s"residual:$centsFp:$pqFp".getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Restores a composed residual store as the four relations
    * [[ivfPqSearchResidual]] takes: (cents, cells, index, residual
    * codes). Both halves run their own load validation (centroid/
    * codebook fingerprints recomputed from loaded values, row-wise cell
    * stamps), then the meta pairing is verified against the RELOADED
    * halves — a store whose pq/ tree was overwritten by a flat encoding
    * of the same geometry fails here, before any distance is computed.
    */
  def residualLoadIndex(spark: org.apache.spark.sql.SparkSession, path: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
         PqIndex, org.apache.spark.sql.DataFrame) = {
    val meta = spark.read.parquet(s"$path/meta").take(1)
    require(meta.nonEmpty,
      s"residualLoadIndex: meta store at $path/meta is empty — " +
        "interrupted save or wrong path")
    val m = meta(0)
    val (cents, cells) = ivfLoadIndex(spark, s"$path/ivf")
    val (index, codes) = pqLoadIndex(spark, s"$path/pq")
    val centsFp = spark.read.parquet(s"$path/ivf/centroids")
      .select("fp").take(1)(0).getString(0)
    val pairing = composedResidualFp(centsFp, index.fingerprint)
    require(m.getAs[String]("composed_fp") == pairing &&
        m.getAs[String]("cents_fp") == centsFp &&
        m.getAs[String]("pq_fp") == index.fingerprint,
      s"residualLoadIndex: store halves at $path do not match the " +
        s"composed stamp (meta ${m.getAs[String]("composed_fp")}, " +
        s"recomputed $pairing) — one half was overwritten by a " +
        "different training (a flat-encoded pq/ tree scores raw-space " +
        "codes against residual-space query LUTs, silently)")
    (cents, cells, index, codes)
  }

  /** The APPEND verb of the composed residual lifecycle: assign the new
    * batch with the store's own centroids, subtract, encode the
    * RESIDUALS with the store's own codebooks, and append both halves.
    * The composed meta pairing is checked FIRST (a foreign index or
    * centroid set fails before the store is touched); per-half
    * idempotence probes then make a retried append a no-op. Codes land
    * before cells: a crash between the writes leaves the increment
    * invisible (candidates come from cells) rather than candidates
    * without codes, and the retry completes both halves.
    */
  def residualAppendVectors(cents: org.apache.spark.sql.DataFrame,
      index: PqIndex, e: org.apache.spark.sql.DataFrame,
      path: String, byL2: Boolean = false): Unit = {
    val spark = e.sparkSession
    val meta = spark.read.parquet(s"$path/meta").take(1)
    require(meta.nonEmpty,
      s"residualAppendVectors: meta store at $path/meta is empty — " +
        "save the composed index first (residualSaveIndex)")
    val m = meta(0)
    val centsFp = centsFingerprint(cents.select("cid", "cv"), byL2)
    require(m.getAs[String]("cents_fp") == centsFp &&
        m.getAs[String]("pq_fp") == index.fingerprint,
      s"residualAppendVectors: in-hand halves (cents $centsFp, pq " +
        s"${index.fingerprint}) do not match the store's pairing " +
        s"(${m.getAs[String]("cents_fp")}, ${m.getAs[String]("pq_fp")}) — " +
        "an increment encoded in a different residual space would " +
        "poison every search")
    // residuals of ONLY the not-yet-stored increment (the half verbs
    // re-probe for idempotence; this pre-filter just avoids computing
    // residuals for vectors already encoded)
    val inc = e.join(
      spark.read.parquet(s"$path/pq/codes").select("vec_id").distinct(),
      Seq("vec_id"), "left_anti")
    val rv = ivfResiduals(inc, cents,
        ivfAssign(inc, cents.select("cid", "cv"), byL2))
      .select("vec_id", "v")
    pqAppendCodes(index, rv, s"$path/pq")
    ivfAppendCells(cents, e, s"$path/ivf", byL2)
  }

  // ------------------------------------------------------------------
  // MANIFEST-COMMITTED composed residual store — the one family the
  // protocol genuinely IMPROVES rather than merely ports: the rename
  // form is TWO subtree stores whose writes must be ordered (codes
  // before cells, so a crash between them leaves the increment
  // invisible rather than candidates without codes) and whose delete
  // appends two tombstone sidecars non-atomically. Here all five
  // relations — centroids, cells, codebooks, codes, and the pairing
  // meta row — live in ONE VersionedStore: build, append, and delete
  // each land as a SINGLE manifest PUT spanning both halves, so no
  // reader can ever observe candidates without codes, codes without
  // candidates, or a half-deleted vector. Gates are the rename
  // family's, shared ([[ivfSaveChecked]]/[[ivfGateLoaded]]/
  // [[pqGateLoaded]] + the composed pairing check).
  // ------------------------------------------------------------------

  /** Build the manifest-committed composed residual store: ONE revision
    * commits both halves and their pairing stamp together.
    */
  def residualSaveIndexVersioned(cents: org.apache.spark.sql.DataFrame,
      cells: org.apache.spark.sql.DataFrame,
      index: PqIndex, codes: org.apache.spark.sql.DataFrame,
      path: String,
      extra: Map[String, org.apache.spark.sql.DataFrame] = Map.empty): Long = {
    val centsFp = ivfSaveChecked(cents, cells,
      "residualSaveIndexVersioned")
    val spark = cents.sparkSession
    import spark.implicits._
    val meta = Seq((centsFp, index.fingerprint,
        composedResidualFp(centsFp, index.fingerprint), "residual"))
      .toDF("cents_fp", "pq_fp", "composed_fp", "encoding")
    graft.operators.VersionedStore.save(Map(
      "centroids" -> cents.select(col("cid"), col("cv"))
        .withColumn("fp", lit(centsFp)).coalesce(1),
      "cells" -> cells.select("vec_id", "cell", "fp"),
      "codebooks" -> pqCodebookRows(index).coalesce(1),
      "codes" -> codes,
      "meta" -> meta.coalesce(1)) ++ extra, path)
  }

  /** Restore the four relations [[ivfPqSearchResidual]] takes at the
    * current — or `asOf` — revision. Both halves run their own load
    * gates, then the meta pairing is verified against the RELOADED
    * halves — a codebook relation replaced by a flat encoding of the
    * same geometry fails here, before any distance is computed.
    */
  def residualLoadIndexVersioned(spark: org.apache.spark.sql.SparkSession,
      path: String, asOf: Option[Long] = None)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
         PqIndex, org.apache.spark.sql.DataFrame) = {
    val meta = graft.operators.VersionedStore.read(spark, path, "meta",
      asOf).take(1)
    require(meta.nonEmpty,
      s"residualLoadIndexVersioned: meta relation at $path is empty — " +
        "interrupted save or wrong path")
    val m = meta(0)
    val centsDf = graft.operators.VersionedStore
      .read(spark, path, "centroids", asOf).localCheckpoint(true)
    val cells = graft.operators.VersionedStore.read(spark, path, "cells",
      asOf)
    val (bare, centsFp) = ivfGateLoaded(centsDf, cells,
      "residualLoadIndexVersioned", path)
    val index = pqGateLoaded(
      graft.operators.VersionedStore.read(spark, path, "codebooks", asOf),
      "residualLoadIndexVersioned", path)
    val codes = graft.operators.VersionedStore.read(spark, path, "codes",
      asOf)
    val pairing = composedResidualFp(centsFp, index.fingerprint)
    require(m.getAs[String]("composed_fp") == pairing &&
        m.getAs[String]("cents_fp") == centsFp &&
        m.getAs[String]("pq_fp") == index.fingerprint,
      s"residualLoadIndexVersioned: store halves at $path do not match " +
        s"the composed stamp (meta ${m.getAs[String]("composed_fp")}, " +
        s"recomputed $pairing) — one half was overwritten by a " +
        "different training (a flat-encoded codebook relation scores " +
        "raw-space codes against residual-space query LUTs, silently)")
    (bare, cells, index, codes)
  }

  /** APPEND: assign, subtract, encode the residuals under the store's
    * frozen halves (pairing checked FIRST, mirroring
    * [[residualAppendVectors]]), and commit codes AND cells in ONE
    * delta revision — the crash window the rename family's write
    * ordering only narrows is gone entirely. Idempotent on vec_id;
    * zero-fresh batches commit nothing.
    */
  def residualAppendVectorsVersioned(cents: org.apache.spark.sql.DataFrame,
      index: PqIndex, e: org.apache.spark.sql.DataFrame,
      path: String, byL2: Boolean = false): Long = {
    val spark = e.sparkSession
    val meta = graft.operators.VersionedStore.read(spark, path, "meta")
      .take(1)
    require(meta.nonEmpty,
      s"residualAppendVectorsVersioned: meta relation at $path is " +
        "empty — save the composed index first (residualSaveIndexVersioned)")
    val m = meta(0)
    val centsFp = centsFingerprint(cents.select("cid", "cv"), byL2)
    require(m.getAs[String]("cents_fp") == centsFp &&
        m.getAs[String]("pq_fp") == index.fingerprint,
      s"residualAppendVectorsVersioned: in-hand halves (cents $centsFp, " +
        s"pq ${index.fingerprint}) do not match the store's pairing " +
        s"(${m.getAs[String]("cents_fp")}, ${m.getAs[String]("pq_fp")}) — " +
        "an increment encoded in a different residual space would " +
        "poison every search")
    // the atomic commit keeps the halves in lockstep, so ONE visibility
    // probe (the codes) decides idempotence for both
    val existing = graft.operators.VersionedStore
      .read(spark, path, "codes").select("vec_id").distinct()
    val inc = e.join(existing, Seq("vec_id"), "left_anti")
      .localCheckpoint(true)
    if (inc.isEmpty)
      return graft.operators.VersionedStore.currentVersion(spark, path).get
    val freshCells = ivfAssign(inc, cents.select("cid", "cv"), byL2)
      .select("vec_id", "cell", "fp").localCheckpoint(true)
    val rv = ivfResiduals(inc, cents, freshCells).select("vec_id", "v")
    val freshCodes = pqCodes(index, rv).localCheckpoint(true)
    graft.operators.VersionedStore.commitDelta(
      Map("codes" -> freshCodes, "cells" -> freshCells),
      Map.empty, path)
  }

  /** DELETE: tombstone `ids`(vec_id) in BOTH halves — candidate
    * generation and scoring — in ONE revision (the rename family
    * appends two sidecars, a torn instant between them observable).
    * Idempotent; sticky until compact.
    */
  def residualDeleteVectorsVersioned(ids: org.apache.spark.sql.DataFrame,
      path: String): Long =
    graft.operators.VersionedStore.commitDelta(Map.empty,
      Map("cells" -> ids.select("vec_id"),
        "codes" -> ids.select("vec_id")), path)

  /** Residual IVF-PQ search over the store's visible (or `asOf`)
    * revision — [[ivfPqSearchResidual]]'s exact plan.
    */
  def residualSearchVersioned(spark: org.apache.spark.sql.SparkSession,
      queries: org.apache.spark.sql.DataFrame, path: String,
      nprobe: Int = 2, topK: Int = 5,
      excludeSelfMatches: Boolean = false, probeByL2: Boolean = false,
      asOf: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    val (cents, cells, index, codes) =
      residualLoadIndexVersioned(spark, path, asOf)
    ivfPqSearchResidual(cells, cents, index, codes, queries, nprobe, topK,
      excludeSelfMatches, probeByL2)
  }

  /** SYNC with a versioned embedding corpus — the composed store's CDC
    * catch-up: bootstrap trains BOTH halves on read(current) and commits
    * the five relations in one PUT; every later window assigns,
    * subtracts, and residual-encodes under the FROZEN halves and lands
    * appends to BOTH relations plus tombstones on BOTH relations as ONE
    * commitDelta — the whole CDC window is a single commit instant.
    */
  def residualSyncVersionedWithStore(
      spark: org.apache.spark.sql.SparkSession, storePath: String,
      rel: String, path: String, k: Int = 8, byL2: Boolean = false,
      retain: Option[Int] = None)
      : Option[(Long, Long)] =
    graft.operators.CdcBridge.sync(spark, storePath, path,
      "residualSyncVersionedWithStore", retain)(
      graft.operators.VersionedStore.currentVersion(spark, path).isDefined)(
      cur => {
        val e = graft.operators.VersionedStore
          .read(spark, storePath, rel, Some(cur)).select("vec_id", "v")
        val (cents, cells0) = ivfTrain(e, k, byL2 = byL2)
        val cells = cells0.localCheckpoint(true)
        val rv = ivfResiduals(e, cents, cells).select("vec_id", "v")
          .localCheckpoint(true)
        val index = pqTrain(rv)
        residualSaveIndexVersioned(cents, cells, index, pqCodes(index, rv),
          path)
      })(
      (from, to) =>
        graft.operators.CdcBridge.maintainAtomic(spark, storePath, rel,
          from, to, "vec_id", Seq("vec_id", "v"),
          "residualSyncVersionedWithStore") { (del, ins) =>
          val (cents, _, index, codes) =
            residualLoadIndexVersioned(spark, path)
          val metric = graft.operators.VersionedStore
            .read(spark, path, "centroids").select("fp").take(1)(0)
            .getString(0).endsWith(":l2")
          val appends = ins.map { e =>
              val inc = e.join(codes.select("vec_id").distinct(),
                Seq("vec_id"), "left_anti").localCheckpoint(true)
              if (inc.isEmpty)
                Map.empty[String, org.apache.spark.sql.DataFrame]
              else {
                val freshCells = ivfAssign(inc, cents, metric)
                  .select("vec_id", "cell", "fp").localCheckpoint(true)
                val rv = ivfResiduals(inc, cents, freshCells)
                  .select("vec_id", "v")
                Map("codes" -> pqCodes(index, rv).localCheckpoint(true),
                  "cells" -> freshCells)
              }
            }.getOrElse(Map.empty[String, org.apache.spark.sql.DataFrame])
          val deletes = del.map(d =>
              Map("cells" -> d.select("vec_id"),
                "codes" -> d.select("vec_id")))
            .getOrElse(Map.empty[String, org.apache.spark.sql.DataFrame])
          if (appends.nonEmpty || deletes.nonEmpty)
            graft.operators.VersionedStore.commitDelta(appends, deletes,
              path)
          ()
        })

  /** q127 ships the residual pipeline at 32 coarse cells (vs q112's 8)
    * because the residual gain tracks the variance the coarse quantizer
    * explains: on this near-uniform unit-sphere corpus 8 cells explain
    * 4.7% of ||v||² and residual ≈ flat, while 32 cells explain 10.4%
    * and residual encoding doubles recall@5 at the 4×8 code budget
    * (SCALING.md's residual table). Production corpora cluster far more
    * (k ≈ √n cells), so the gap widens with scale.
    */
  private val q127 = QueryDef(
    "q127_ivf_pq_residual",
    (s, d) => {
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      // coarse training, residual materialization, and residual-PQ
      // training are the persistable artifacts — bench-bracketed as one
      // build span. The checkpoints inside follow the q72 one-relation-
      // many-consumers discipline: the cell assignment feeds BOTH the
      // residual computation and the candidate pruning; the residual
      // frame feeds BOTH PQ training and encoding.
      val (cents, cells, rv, index) = graft.BenchPhases.build {
        val (cents0, cells0) = ivfTrain(e, k = 32)
        val cls = cells0.localCheckpoint(true)
        val r = ivfResiduals(e, cents0, cls).select("vec_id", "v")
          .localCheckpoint(true)
        (cents0, cls, r, pqTrain(r))
      }
      ivfPqSearchResidual(cells, cents, index, pqCodes(index, rv),
        e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("v").as("qv")),
        excludeSelfMatches = true) // queries ARE corpus members here
    },
    Some(residualOracleSql))

  /** q206: q127's residual IVF-PQ search served from the MANIFEST-
    * COMMITTED composed store driven through its own verbs — ONE PUT
    * commits centroids, cells, codebooks, codes, and the pairing row;
    * the remaining slice appends as ONE delta revision spanning BOTH
    * halves (assigned and residual-encoded under the frozen artifacts,
    * so the union equals the from-scratch encode and the oracle is
    * q127's SQL VERBATIM). The atomicity is the family's migration
    * payoff: the rename form orders two subtree writes per append; here
    * no reader can ever observe candidates without codes.
    * VersionedIvfResidualSpec pins rename-equality, single-revision
    * verbs, the composed pairing gate, and `asOf`.
    */
  private val q206 = QueryDef(
    "q206_versioned_residual_search",
    (s, d) => {
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val boot = e.filter(col("vec_id") % 4 =!= 3)
      if (boot.isEmpty)
        e.select(col("vec_id").as("query_id"),
          col("vec_id").as("neighbor_id"), lit(1).as("rank"),
          lit(0.0).as("adc_dist")).limit(0)
      else
        withThrowawayStore { idx =>
          graft.BenchPhases.build {
            // halves trained ONCE on the full corpus (q127's artifacts);
            // the store is bootstrapped on a slice and caught up through
            // the frozen-halves append
            val (cents0, cells0) = ivfTrain(e, k = 32)
            val cls = cells0.localCheckpoint(true)
            val rv = ivfResiduals(e, cents0, cls).select("vec_id", "v")
              .localCheckpoint(true)
            val index = pqTrain(rv)
            val bootIds = boot.select("vec_id")
            residualSaveIndexVersioned(cents0,
              cls.join(bootIds, Seq("vec_id"), "left_semi"),
              index,
              pqCodes(index, rv.join(bootIds, Seq("vec_id"), "left_semi")),
              idx)
            residualAppendVectorsVersioned(cents0, index,
              e.filter(col("vec_id") % 4 === 3), idx)
          }
          residualSearchVersioned(s, q, idx, excludeSelfMatches = true)
        }(s)
    },
    Some(residualOracleSql))

  private lazy val residualOracleSql: String = {
      val subCtes = (0 until 4).map { sub =>
        val rel = s"s${sub}v"
        val p = s"s${sub}_"
        val lo = sub * 16 + 1; val hi = sub * 16 + 16
        s"""$rel AS (SELECT vec_id, v[$lo:$hi] AS v FROM rv),
            ${kmeansSql(k = 8, iters = 2, p = p, rel = rel, byL2 = true)},
            ${p}cd AS (${nearestSql(rel, s"${p}cents2", byL2 = true, "vec_id, cid")}),
            ${p}lut AS (SELECT qid, cell, cid, ${l2Sql("qv", "cv")} AS dd
                        FROM (SELECT qid, cell, qv[$lo:$hi] AS qv FROM qr) q
                        CROSS JOIN ${p}cents2),
            ${p}part AS (SELECT cand.qid, cand.vec_id, $sub AS sub, dd
                         FROM cand
                         JOIN ${p}cd ON cand.vec_id = ${p}cd.vec_id
                         JOIN ${p}lut ON ${p}lut.qid = cand.qid
                                     AND ${p}lut.cell = cand.cell
                                     AND ${p}lut.cid = ${p}cd.cid)"""
      }.mkString(",\n")
      val unions = (0 until 4).map(sub => s"SELECT * FROM s${sub}_part")
        .mkString("\nUNION ALL\n")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              ${kmeansSql(k = 32)},
              ranked AS (SELECT vec_id, v, cid, aff,
                           ROW_NUMBER() OVER (PARTITION BY vec_id
                             ORDER BY aff DESC, cid ASC) AS crn
                         FROM (SELECT e.vec_id, e.v, cid, ${cosSql("v", "cv")} AS aff
                               FROM e CROSS JOIN cents3)),
              cells AS (SELECT vec_id, cid AS cell FROM ranked WHERE crn = 1),
              qcells AS (SELECT vec_id AS qid, cid AS cell
                         FROM ranked WHERE vec_id < 5 AND crn <= 2),
              rv AS (SELECT e.vec_id,
                            list_transform(range(1, 65), i -> v[i] - cv[i]) AS v
                     FROM e JOIN cells ON e.vec_id = cells.vec_id
                            JOIN cents3 ON cells.cell = cents3.cid),
              qr AS (SELECT qid, qcells.cell,
                            list_transform(range(1, 65), i -> e.v[i] - cv[i]) AS qv
                     FROM qcells JOIN e ON qcells.qid = e.vec_id
                            JOIN cents3 ON qcells.cell = cents3.cid),
              cand AS (SELECT qid, qcells.cell, cells.vec_id
                       FROM cells JOIN qcells ON cells.cell = qcells.cell),
              $subCtes,
              parts AS ($unions),
              adc AS (SELECT qid, vec_id,
                        SUM(CASE WHEN sub = 0 THEN dd END)
                          + SUM(CASE WHEN sub = 1 THEN dd END)
                          + SUM(CASE WHEN sub = 2 THEN dd END)
                          + SUM(CASE WHEN sub = 3 THEN dd END) AS adc
                      FROM parts GROUP BY qid, vec_id)
         SELECT qid AS query_id, vec_id AS neighbor_id, rn AS rank, adc AS adc_dist
         FROM (SELECT qid, vec_id, adc,
                      ROW_NUMBER() OVER (PARTITION BY qid
                        ORDER BY adc ASC, vec_id ASC) AS rn
               FROM adc WHERE qid <> vec_id) t
         WHERE rn <= 5 ORDER BY query_id, rank"""
  }

  /** Oracle twin of the multi-table bucket assignment inside
    * [[lshMultiAnn]]: one row per (vec_id, table) over relation
    * `e`(vec_id, v) — global plane id p spans `tables × planes`, table =
    * p DIV planes, bit = p MOD planes, signs from md5(p ':' i) exactly
    * like lshBucket's `table` parameter. Shared by q111 and q93's dense
    * candidate oracle so the two never drift.
    */
  private[queries] def multiBucketSql(tables: Int, planes: Int): String =
    s"""SELECT vec_id, p // $planes AS tbl,
          CAST(SUM(CASE WHEN proj > 0 THEN (CAST(1 AS BIGINT) << (p % $planes)) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
        FROM (SELECT vec_id, p,
                list_sum(list_transform(range(1, 65),
                  i -> (CASE WHEN substring(md5(p || ':' || i), 1, 1) <= '7' THEN 1 ELSE -1 END)
                       * CAST(floor(v[i] * 1000000.0 + 0.5) AS BIGINT))) AS proj
              FROM e, range(${tables * planes}) r(p)) t
        GROUP BY vec_id, p // $planes"""

  /** Shared oracle fragment: cosine between DOUBLE[] columns — exposed to
    * sibling query modules (q93's fused dense side) so the expression
    * stays bit-identical with [[cosSql]] here.
    */
  private[queries] def cosSqlShared(a: String, b: String): String = cosSql(a, b)

  private val q111 = QueryDef(
    "q111_ann_lsh_multitable",
    (s, d) => {
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      lshMultiAnn(e, e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv")),
        excludeSelfMatches = true)
    },
    Some(lshAnnOracleSql))

  private lazy val lshAnnOracleSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                  mbk AS (${multiBucketSql(4, 6)}),
                  ev AS (SELECT e.vec_id, v, tbl, bucket
                         FROM e JOIN mbk ON e.vec_id = mbk.vec_id),
                  qs AS (SELECT vec_id AS qid, v AS qv, tbl, bucket
                         FROM ev WHERE vec_id < 5),
                  cand AS (SELECT DISTINCT qid, ev.vec_id AS nid,
                                  ${cosSql("qv", "v")} AS sim
                           FROM ev JOIN qs ON ev.tbl = qs.tbl
                                          AND ev.bucket = qs.bucket
                                          AND qid <> ev.vec_id)
             SELECT qid AS query_id, nid AS neighbor_id, rn AS rank, sim AS cos_sim
             FROM (SELECT qid, nid, sim,
                          ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY sim DESC, nid ASC) AS rn
                   FROM cand) t
             WHERE rn <= 5 ORDER BY query_id, rank"""

  /** q203: q111's multi-table ANN served from the MANIFEST-COMMITTED
    * LSH store driven through its own verbs — ONE PUT commits geometry
    * + the bootstrap slice's buckets, the remaining slice appends as a
    * delta revision bucketed under the STORE's own geometry (the
    * bucket function is deterministic, so the union equals a
    * from-scratch bucketing and the oracle is q111's SQL VERBATIM).
    * VersionedLshSpec pins bit-equality against the rename family
    * across the delete/sticky/compact lifecycle and `asOf`.
    */
  private val q203 = QueryDef(
    "q203_versioned_lsh_search",
    (s, d) => {
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val boot = e.filter(col("vec_id") % 4 =!= 3)
      if (boot.isEmpty)
        e.select(col("vec_id").as("query_id"),
          col("vec_id").as("neighbor_id"), lit(1).as("rank"),
          lit(0.0).as("cos_sim")).limit(0)
      else
        withThrowawayStore { idx =>
          graft.BenchPhases.build {
            lshSaveIndexVersioned(lshBuckets(boot), 4, 6, idx)
            lshAppendBucketsVersioned(e.filter(col("vec_id") % 4 === 3),
              idx)
          }
          lshSearchIndexVersioned(s, e, q, idx, topK = 5,
            excludeSelfMatches = true)
        }(s)
    },
    Some(lshAnnOracleSql))

  /** Hard-negative mining for contrastive/embedding training: for each
    * query vector the top-5 most-cosine-similar vectors carrying a
    * DIFFERENT label — the "looks like the positive but isn't" examples
    * that make retrieval training data effective. Positives (same label)
    * and the query itself are excluded by the label filter.
    *
    * Scale shape: the query side is broadcast (queries are few by
    * definition); scoring is one corpus scan. The per-query top-k runs
    * through [[graft.operators.GroupTopK]] — the exact two-stage form
    * (local top-5 within hash cells of each query's candidates, then
    * global top-5 over the <= 5*256 survivors) — because a single
    * `Window.partitionBy(qid)` would funnel corpus/#queries rows through
    * one task (the q105 lesson). At 100 TB the candidate generator is
    * the ANN index (q111 multi-table LSH or q112 IVF-PQ) rather than the
    * brute scan; the mining shape is unchanged.
    */
  private val q114 = QueryDef(
    "q114_hard_negatives",
    (s, d) => {
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"), col("label"))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("label").as("q_label"))
      val cand = e.crossJoin(broadcast(q))
        .filter(col("label") =!= col("q_label"))
        .select(col("qid"), col("q_label"), col("vec_id").as("neg_id"),
          col("label").as("neg_label"), cosine(col("v"), col("qv")).as("sim"))
      graft.operators.GroupTopK.topK(cand, Seq(col("qid")),
          Seq(col("sim").desc, col("neg_id").asc), col("neg_id"), 5)
        .select("qid", "rank", "neg_id", "q_label", "neg_label", "sim")
        .orderBy("qid", "rank")
    },
    Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
                        FROM embeddings),
                  q AS (SELECT vec_id AS qid, v AS qv, label AS q_label
                        FROM e WHERE vec_id < 10),
                  cand AS (SELECT qid, q_label, e.vec_id AS neg_id,
                             e.label AS neg_label, ${cosSql("v", "qv")} AS sim
                           FROM e CROSS JOIN q WHERE e.label <> q.q_label),
                  r AS (SELECT qid, q_label, neg_id, neg_label, sim,
                          ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY sim DESC, neg_id ASC) AS rank
                        FROM cand)
             SELECT qid, rank, neg_id, q_label, neg_label, sim
             FROM r WHERE rank <= 5 ORDER BY qid, rank"""))

  /** Mutual-kNN graph construction: edges (a, b) where b is in a's cosine
    * top-3 AND a is in b's top-3 — the symmetric neighbor graph that
    * drives density-based semantic clustering and graph dedup (mutuality
    * prunes the hub vectors that one-directional kNN over-connects). Each
    * edge carries the similarity and both directed ranks. Demo-bounded to
    * vec_id < 300 because all-pairs scoring is quadratic by nature; at
    * scale the directed top-k lists come from the ANN index (q111/q112)
    * and only the candidate-sized mutuality join below remains.
    *
    * Scale shape of what ships: one broadcast nested-loop score (the
    * 300-vector side is broadcast), per-vector top-3 by window over the
    * bounded candidate set, then the mutuality self-join — top-k-list
    * sized (3N rows), joined on the reversed (a, b) key — and the a < b
    * canonicalization halves the edge list.
    */
  /** Contrastive TRIPLET assembly — the training artifact q114's mining
    * feeds: for each query vector, its best positive (most-similar SAME
    * label, self excluded) crossed with its top-3 hard negatives
    * (most-similar DIFFERENT label), each triplet carrying both
    * similarities and the margin pos_sim − neg_sim (the quantity a
    * triplet/InfoNCE loss pushes apart; near-zero or negative margins are
    * the valuable hard triplets).
    *
    * Scale shape: ONE corpus scan scores both sides — candidates carry an
    * is_pos flag and rank within (qid, is_pos) instead of scanning the
    * corpus once for positives and again for negatives. The rank runs
    * through [[graft.operators.GroupTopK]] (exact two-stage top-3 per
    * (qid, is_pos) group); the final pos × neg join is
    * triplet-list-sized (queries × 3 rows).
    */
  private val q119 = QueryDef(
    "q119_contrastive_triplets",
    (s, d) => {
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"), col("label"))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("label").as("q_label"))
      val cand = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cid"),
          (col("label") === col("q_label")).as("is_pos"),
          cosine(col("v"), col("qv")).as("sim"))
      val ranked = graft.operators.GroupTopK.topK(cand,
        Seq(col("qid"), col("is_pos")),
        Seq(col("sim").desc, col("cid").asc), col("cid"), 3,
        rankName = "rn")
      val pos = ranked.filter(col("is_pos") && col("rn") === 1)
        .select(col("qid"), col("cid").as("pos_id"), col("sim").as("pos_sim"))
      val neg = ranked.filter(!col("is_pos"))
        .select(col("qid"), col("cid").as("neg_id"), col("sim").as("neg_sim"),
          col("rn").as("neg_rank"))
      pos.join(neg, "qid")
        .withColumn("margin", col("pos_sim") - col("neg_sim"))
        .select("qid", "pos_id", "neg_id", "neg_rank", "pos_sim", "neg_sim",
          "margin")
        .orderBy("qid", "neg_rank")
    },
    Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
                        FROM embeddings),
                  q AS (SELECT vec_id AS qid, v AS qv, label AS q_label
                        FROM e WHERE vec_id < 10),
                  cand AS (SELECT qid, e.vec_id AS cid,
                             (e.label = q.q_label) AS is_pos,
                             ${cosSql("v", "qv")} AS sim
                           FROM e CROSS JOIN q WHERE e.vec_id <> q.qid),
                  r AS (SELECT qid, cid, is_pos, sim,
                          ROW_NUMBER() OVER (PARTITION BY qid, is_pos
                            ORDER BY sim DESC, cid ASC) AS rn
                        FROM cand),
                  pos AS (SELECT qid, cid AS pos_id, sim AS pos_sim
                          FROM r WHERE is_pos AND rn = 1),
                  neg AS (SELECT qid, cid AS neg_id, sim AS neg_sim,
                                 rn AS neg_rank
                          FROM r WHERE NOT is_pos AND rn <= 3)
             SELECT qid, pos_id, neg_id, neg_rank, pos_sim, neg_sim,
                    pos_sim - neg_sim AS margin
             FROM pos JOIN neg USING (qid)
             ORDER BY qid, neg_rank"""))

  /** Mutual top-`k` cosine edges over `e`(vec_id, v): (a, b, sim,
    * rank_ab, rank_ba) with a < b — the shared candidate generator for
    * q116's edge list and q117's cluster labels.
    */
  private def mutualKnnEdges(e: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame =
    mutualKnnEdgesFromCandidates(bruteTopLists(e, k))

  /** Per-node brute-force cosine top-`k` lists (aid, bid, sim, rn) over a
    * BOUNDED `e`(vec_id, v) — the demo candidate generator behind q116's
    * mutual graph and the content a [[knnSaveLists]] store persists at
    * demo scale. The broadcast cross join is quadratic by nature: at
    * corpus scale the directed lists come from an ANN index
    * ([[lshMultiAnn]] / [[binHammingSearch]] output renamed to
    * aid/bid/rn), which is the entire point of decoupling list
    * generation from [[mutualKnnEdgesFromCandidates]] and the store.
    */
  def bruteTopLists(e: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    val b = e.select(col("vec_id").as("bid"), col("v").as("bv"))
    val w = Window.partitionBy("aid").orderBy(col("sim").desc, col("bid").asc)
    e.select(col("vec_id").as("aid"), col("v"))
      .crossJoin(broadcast(b))
      .filter(col("aid") =!= col("bid"))
      .select(col("aid"), col("bid"), cosine(col("v"), col("bv")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("aid", "bid", "sim", "rn")
  }

  /** Spec identity of a persisted kNN candidate-list store. Like the
    * LSH/bin families the stamp pins FORMAT + PROVENANCE, not training:
    * `k` (the list depth every consumer's bounds reasoning relies on)
    * and the free-form `generator` tag naming what produced the lists
    * (`brute-cos`, `lsh:4x6`, `bin:R25`, ...). Mixing lists from two
    * generators in one store would silently change candidate semantics
    * — the stamp makes a splice fail at load instead.
    */
  private def knnFingerprint(k: Int, generator: String): String = {
    require(generator.nonEmpty && !generator.contains(":"),
      s"knn generator tag must be non-empty and ':'-free, got '$generator'")
    s"knn:k=$k:gen=$generator"
  }

  /** Persists per-node ranked candidate lists (aid, bid, sim, rn) as the
    * SEVENTH store family — the graph artifact. The mutual-kNN edge set,
    * semantic clusters (q117), label propagation (q142) and graph-
    * expanded search (q147) all DERIVE from these lists with list-sized
    * joins, so the expensive part — candidate generation over the corpus
    * — is computed once and persisted, and every graph consumer replays
    * only the cheap tail. Layout: `path`/meta (1 row: fp, k, generator) +
    * `path`/lists (stamped rows).
    *
    * Append semantics are stated honestly: [[knnAppendLists]] adds NEW
    * anchors' lists; EXISTING anchors' lists are not revisited, so after
    * appends an old node's list may miss newer near neighbors until the
    * next full save — the standard staleness of incrementally-maintained
    * ANN graphs. Derived mutual edges remain correct FOR THE STORED
    * LISTS (mutuality needs both directions, so a stale side simply
    * yields no edge, never a wrong one).
    */
  def knnSaveLists(directed: org.apache.spark.sql.DataFrame, k: Int,
      generator: String, path: String): Unit = {
    val fp = knnSaveChecked(directed, k, generator, "knnSaveLists")
    knnMetaRow(directed.sparkSession, fp, k, generator)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    directed.select("aid", "bid", "sim", "rn").withColumn("fp", lit(fp))
      .write.mode("overwrite").parquet(s"$path/lists")
    graft.operators.IndexTombstones.clear(directed.sparkSession, path)
  }

  /** The 1-row identity relation BOTH persisted forms write. */
  private def knnMetaRow(spark: org.apache.spark.sql.SparkSession,
      fp: String, k: Int, generator: String)
      : org.apache.spark.sql.DataFrame =
    spark.range(1).select(lit(fp).as("fp"), lit(k).as("k"),
      lit(generator).as("generator"))

  /** Save-side gate shared by [[knnSaveLists]] and
    * [[knnSaveListsVersioned]]: required columns, non-empty, and the
    * declared k bounds every stored rank (a consumer's degree-bound
    * reasoning, |E| <= kN, would be wrong otherwise). Returns the stamp.
    */
  private def knnSaveChecked(directed: org.apache.spark.sql.DataFrame,
      k: Int, generator: String, verb: String): String = {
    val need = Set("aid", "bid", "sim", "rn")
    require(need.subsetOf(directed.columns.toSet),
      s"$verb: lists must carry $need, got ${directed.columns.toSet}")
    val fp = knnFingerprint(k, generator)
    val stat = directed.agg(count(lit(1)).as("n"), max("rn").as("mx")).take(1)(0)
    require(stat.getLong(0) > 0,
      s"$verb: refusing to persist an EMPTY list store — generate " +
        "candidates first (an empty store would be rejected at load as " +
        "interrupted)")
    require(stat.getInt(1) <= k,
      s"$verb: lists carry rank ${stat.getInt(1)} > declared k=$k — " +
        "a consumer's degree-bound reasoning (|E| <= kN) would be wrong")
    fp
  }

  /** Load-side gates shared by [[knnLoadLists]] and
    * [[knnLoadListsVersioned]]: the meta stamp is recomputed from the
    * stored (k, generator) and every list row's stamp checked against
    * it. Returns (fp, k, generator).
    */
  private def knnGateLoaded(meta: Array[org.apache.spark.sql.Row],
      lists: org.apache.spark.sql.DataFrame, verb: String,
      where: String): (String, Int, String) = {
    require(meta.nonEmpty,
      s"$verb: meta store at $where is empty — interrupted " +
        "save or wrong path")
    val (fp, k, gen) = (meta(0).getString(0), meta(0).getInt(1),
      meta(0).getString(2))
    require(fp == knnFingerprint(k, gen),
      s"$verb: stored stamp $fp does not match its own declared " +
        s"(k=$k, generator=$gen) — the meta row is corrupt or hand-edited")
    val stamps = lists.select("fp").distinct().collect()
      .map(_.getString(0)).toSeq
    require(stamps == Seq(fp),
      s"$verb: list rows carry stamps ${stamps.mkString(", ")} — " +
        s"the store at $where mixes generators or is corrupt")
    (fp, k, gen)
  }

  /** Restores (lists, k) from a persisted kNN-list store. The meta stamp
    * is recomputed from the stored (k, generator) and checked, every
    * list row's stamp is checked against it, and tombstoned nodes are
    * masked out of BOTH columns — a forgotten vector vanishes as an
    * anchor and as everyone's neighbor, so no derived edge can resurrect
    * it.
    */
  def knnLoadLists(spark: org.apache.spark.sql.SparkSession, path: String)
      : (org.apache.spark.sql.DataFrame, Int) = {
    val lists = spark.read.parquet(s"$path/lists")
    val (_, k, _) = knnGateLoaded(
      spark.read.parquet(s"$path/meta")
        .select("fp", "k", "generator").take(1),
      lists, "knnLoadLists", path)
    (graft.operators.IndexTombstones.maskOn(lists, path, Seq("aid", "bid")),
      k)
  }

  // ------------------------------------------------------------------
  // MANIFEST-COMMITTED kNN-list store — the graph family on the
  // rename-free protocol. One protocol difference forced by the
  // family's shape: deletion must mask a node out of BOTH columns (as
  // an anchor and as everyone's neighbor), which a manifest tombstone's
  // single-key anti join cannot express — so the dead-node set is a
  // normal append-only `dead` relation and [[knnLoadListsVersioned]]
  // applies the two-column mask, exactly as the rename family's
  // [[graft.operators.IndexTombstones.maskOn]] does. Sticky semantics
  // carry over: `dead` survives appends and re-knits (a forgotten node
  // stays forgotten across replays) and resets only at a fresh save.
  // The re-knit repair commits as ONE replaceRelation — a single
  // manifest PUT where the rename family rewrites the whole lists
  // directory.
  // ------------------------------------------------------------------

  /** Build the manifest-committed kNN-list store: ONE revision commits
    * the identity row and the stamped directed lists together.
    */
  def knnSaveListsVersioned(directed: org.apache.spark.sql.DataFrame,
      k: Int, generator: String, path: String,
      extra: Map[String, org.apache.spark.sql.DataFrame] = Map.empty): Long = {
    val fp = knnSaveChecked(directed, k, generator,
      "knnSaveListsVersioned")
    graft.operators.VersionedStore.save(Map(
      "meta" -> knnMetaRow(directed.sparkSession, fp, k, generator)
        .coalesce(1),
      "lists" -> directed.select("aid", "bid", "sim", "rn")
        .withColumn("fp", lit(fp))) ++ extra, path)
  }

  /** Restore (lists, k) at the current — or `asOf` — revision through
    * the SAME gates as [[knnLoadLists]], dead nodes masked out of BOTH
    * columns.
    */
  def knnLoadListsVersioned(spark: org.apache.spark.sql.SparkSession,
      path: String, asOf: Option[Long] = None)
      : (org.apache.spark.sql.DataFrame, Int) = {
    val lists = graft.operators.VersionedStore.read(spark, path, "lists",
      asOf)
    val (_, k, _) = knnGateLoaded(
      graft.operators.VersionedStore.read(spark, path, "meta", asOf)
        .select("fp", "k", "generator").take(1),
      lists, "knnLoadListsVersioned", path)
    (knnMaskDead(spark, lists, path, asOf), k)
  }

  /** Mask the `dead` relation (if any) out of both list columns. */
  private def knnMaskDead(spark: org.apache.spark.sql.SparkSession,
      lists: org.apache.spark.sql.DataFrame, path: String,
      asOf: Option[Long]): org.apache.spark.sql.DataFrame =
    if (!graft.operators.VersionedStore.relations(spark, path, asOf)
        .contains("dead")) lists
    else {
      val dead = graft.operators.VersionedStore
        .read(spark, path, "dead", asOf).select("vec_id").distinct()
        .localCheckpoint(true) // forgotten-node set: small by contract
      lists
        .join(dead.select(col("vec_id").as("aid")), Seq("aid"), "left_anti")
        .join(dead.select(col("vec_id").as("bid")), Seq("bid"), "left_anti")
        .select("aid", "bid", "sim", "rn", "fp")
    }

  /** APPEND: add NEW anchors' ranked lists under the store's own stamp
    * as a delta revision — generator declared (the splice guard),
    * ranks bounds-checked, idempotent on aid against the RAW stored
    * lists so deletion stays sticky. Zero-fresh batches commit nothing.
    */
  def knnAppendListsVersioned(increment: org.apache.spark.sql.DataFrame,
      generator: String, path: String): Long = {
    val spark = increment.sparkSession
    val meta = graft.operators.VersionedStore.read(spark, path, "meta")
      .select("fp", "k", "generator").take(1)
    require(meta.nonEmpty,
      s"knnAppendListsVersioned: meta relation at $path is empty — " +
        "save the store first (knnSaveListsVersioned)")
    val (fp, k) = (meta(0).getString(0), meta(0).getInt(1))
    require(meta(0).getString(2) == generator,
      s"knnAppendListsVersioned: increment declares generator " +
        s"'$generator' but the store was built by " +
        s"'${meta(0).getString(2)}' — appending lists from a different " +
        "generator would silently change what a stored neighborhood " +
        "means; rebuild with knnSaveListsVersioned instead")
    val stat = increment.agg(count(lit(1)).as("n"), max("rn").as("mx"))
      .take(1)(0)
    if (stat.getLong(0) == 0)
      return graft.operators.VersionedStore.currentVersion(spark, path).get
    require(stat.getInt(1) <= k,
      s"knnAppendListsVersioned: increment carries rank " +
        s"${stat.getInt(1)} > the store's k=$k")
    val existing = graft.operators.VersionedStore
      .read(spark, path, "lists").select("aid").distinct()
    val fresh = increment.select("aid", "bid", "sim", "rn")
      .join(existing, Seq("aid"), "left_anti")
      .withColumn("fp", lit(fp)).localCheckpoint(true)
    if (fresh.isEmpty)
      graft.operators.VersionedStore.currentVersion(spark, path).get
    else
      graft.operators.VersionedStore.append(Map("lists" -> fresh), path)
  }

  /** DELETE: record `ids` in the `dead` relation (created on first
    * delete) — masked out of BOTH columns by every subsequent load, so
    * no derived edge can resurrect a forgotten node. One manifest PUT;
    * idempotent (the mask distincts); sticky until a fresh save.
    */
  def knnDeleteNodesVersioned(ids: org.apache.spark.sql.DataFrame,
      path: String): Long = {
    val spark = ids.sparkSession
    require(graft.operators.VersionedStore
        .relations(spark, path).contains("meta"),
      s"knnDeleteNodesVersioned: no store at $path — nothing to " +
        "delete from")
    graft.operators.VersionedStore.append(
      Map("dead" -> ids.select("vec_id")), path)
  }

  /** RE-KNIT — [[knnReknit]]'s exact merge argument on the rename-free
    * form: stale anchors' true top-k over (old ∪ new) is the top-k of
    * (stored exact lists ∪ sims to the new nodes), committed as ONE
    * replaceRelation instead of a whole-directory rewrite.
    * VersionedKnnSpec pins byte-equality with both the rename re-knit
    * and the full rebuild. Only `brute-cos` stores re-knit (the merge
    * preserves — not repairs — an ANN store's approximation).
    */
  def knnReknitVersioned(e: org.apache.spark.sql.DataFrame,
      newIds: org.apache.spark.sql.DataFrame, path: String,
      maxBatch: Int = 100000): Long = {
    val spark = e.sparkSession
    val meta = graft.operators.VersionedStore.read(spark, path, "meta")
      .select("fp", "k", "generator").take(1)
    require(meta.nonEmpty,
      s"knnReknitVersioned: meta relation at $path is empty — save the " +
        "store first (knnSaveListsVersioned)")
    val (fp, k, gen) =
      (meta(0).getString(0), meta(0).getInt(1), meta(0).getString(2))
    require(gen == "brute-cos",
      s"knnReknitVersioned: store was generated by '$gen' — the " +
        "stored-list merge is exact only over exact lists; rebuild " +
        "ANN-generated stores with knnSaveListsVersioned")
    val ids = newIds.select("vec_id").localCheckpoint(true)
    val nBatch = ids.count()
    require(nBatch <= maxBatch,
      s"knnReknitVersioned: the appended batch carries $nBatch vectors " +
        s"(> maxBatch=$maxBatch) — re-knit broadcasts the batch against " +
        "every stale anchor, the wrong shape after a corpus-scale " +
        "append; rebuild with knnSaveListsVersioned(bruteTopLists(...)) " +
        "instead, or raise maxBatch deliberately")
    val lists = graft.operators.VersionedStore.read(spark, path, "lists")
    graft.operators.VersionedStore.replaceRelation(
      knnReknitMerged(e, ids, lists, k).withColumn("fp", lit(fp))
        .select("aid", "bid", "sim", "rn", "fp"),
      "lists", path)
  }

  /** The re-knit merge both protocols share: stale anchors (stored
    * before `ids` existed) get top-k over (stored rows ∪ sims to the
    * batch); the batch's own anchors pass through untouched. Exactness
    * argument in [[knnReknit]]'s scaladoc.
    */
  private def knnReknitMerged(e: org.apache.spark.sql.DataFrame,
      ids: org.apache.spark.sql.DataFrame,
      lists: org.apache.spark.sql.DataFrame, k: Int)
      : org.apache.spark.sql.DataFrame = {
    val aidsNew = ids.withColumnRenamed("vec_id", "aid")
    val stale = lists.select("aid").distinct()
      .join(aidsNew, Seq("aid"), "left_anti")
    val nv = e.join(ids, Seq("vec_id"))
      .select(col("vec_id").as("bid"), col("v").as("bv"))
    val freshSims = e.select(col("vec_id").as("aid"), col("v"))
      .join(stale, Seq("aid"))
      .join(broadcast(nv), col("aid") =!= col("bid"))
      .select(col("aid"), col("bid"), cosine(col("v"), col("bv")).as("sim"))
    val staleRows = lists.join(stale, Seq("aid"))
      .select("aid", "bid", "sim")
    // dedupe (a replayed re-knit's stored lists already contain the new
    // nodes; both sides compute the same cosine on the same operands,
    // so max == either copy)
    val cand = staleRows.unionAll(freshSims)
      .groupBy("aid", "bid").agg(max("sim").as("sim"))
    val merged = graft.operators.GroupTopK.topK(cand, Seq(col("aid")),
        Seq(col("sim").desc, col("bid").asc), col("bid"), k,
        rankName = "rn")
      .select("aid", "bid", "sim", "rn")
    val keptNew = lists.join(aidsNew, Seq("aid"), "left_semi")
      .select("aid", "bid", "sim", "rn")
    keptNew.unionAll(merged)
  }

  /** CDC maintenance of the versioned kNN-list store — the graph
    * family's window applied as ONE commit: the rename bridge
    * ([[knnMaintainFromStore]]) lands a window as tombstones, a repair
    * rewrite, an append, and a re-knit rewrite — four separate writes a
    * reader can interleave; here the whole window (dead-node append +
    * the fully merged lists relation) is a single `commitMixed` PUT.
    * The merged relation composes the same three exact pieces the
    * rename bridge proves rebuilt-equal: anchors referencing a deleted
    * node get EXACT fresh lists against the live corpus (the
    * delete-repair — masking alone would leave their lists short), new
    * anchors get exact fresh lists, and every other stored anchor gets
    * the re-knit merge (exact by [[knnReknit]]'s argument; their stored
    * rows reference no deleted node, else they would be in the repair
    * set). `brute-cos` stores only — the merge is exact only over
    * exact lists; ANN-generated versioned stores rebuild through
    * [[knnSaveListsVersioned]] (the rename-family sync routes lsh
    * generators).
    */
  def knnMaintainFromStoreVersioned(
      spark: org.apache.spark.sql.SparkSession, storePath: String,
      rel: String, fromRev: Long, toRev: Long, path: String,
      maxBatch: Int = 100000): Unit = {
    val meta = graft.operators.VersionedStore.read(spark, path, "meta")
      .select("fp", "k", "generator").take(1)
    require(meta.nonEmpty,
      s"knnMaintainFromStoreVersioned: meta relation at $path is empty " +
        "— save the store first (knnSaveListsVersioned)")
    val (fp, k, gen) =
      (meta(0).getString(0), meta(0).getInt(1), meta(0).getString(2))
    require(gen == "brute-cos",
      s"knnMaintainFromStoreVersioned: store was generated by '$gen' — " +
        "the window merge is exact only over exact lists; rebuild " +
        "ANN-generated versioned stores with knnSaveListsVersioned, or " +
        "keep them on the rename-family sync (knnSyncWithStore) which " +
        "routes lsh generators")
    val live = graft.operators.VersionedStore
      .read(spark, storePath, rel, Some(toRev)).select("vec_id", "v")
    graft.operators.CdcBridge.maintainAtomic(spark, storePath, rel,
      fromRev, toRev, "vec_id", Seq("vec_id", "v"),
      "knnMaintainFromStoreVersioned") { (del, ins) =>
      val lists = graft.operators.VersionedStore.read(spark, path, "lists")
      val doomed = del.map(_.select("vec_id").localCheckpoint(true))
      val newIds = ins.map(_.select("vec_id").localCheckpoint(true))
        .filterNot(_.isEmpty)
      newIds.foreach { ids =>
        val n = ids.count()
        require(n <= maxBatch,
          s"knnMaintainFromStoreVersioned: the window nets $n new " +
            s"vectors (> maxBatch=$maxBatch) — the batch is broadcast " +
            "against the corpus; after a corpus-scale append rebuild " +
            "with knnSaveListsVersioned instead, or raise maxBatch " +
            "deliberately")
      }
      if (doomed.isEmpty && newIds.isEmpty) ()
      else {
        // anchors whose STORED lists reference a deleted node — found
        // on the raw relation so a crash-replay still finds them
        val affected = doomed.map { d =>
          lists.join(d.select(col("vec_id").as("bid")), Seq("bid"),
              "left_semi")
            .select(col("aid").as("vec_id")).distinct()
            .join(d, Seq("vec_id"), "left_anti")
        }
        val recompute = (affected.toSeq ++ newIds.toSeq)
          .reduceOption(_ unionAll _)
          .map(_.distinct().localCheckpoint(true))
        val fresh = recompute.map(r =>
          bruteListsForAnchors(live, r, k)).toSeq
        val untouched0 = recompute.map(r =>
            lists.join(r.select(col("vec_id").as("aid")), Seq("aid"),
              "left_anti"))
          .getOrElse(lists)
        val untouched = doomed.map(d =>
            untouched0.join(d.select(col("vec_id").as("aid")), Seq("aid"),
              "left_anti"))
          .getOrElse(untouched0)
          .select("aid", "bid", "sim", "rn")
        // the re-knit merge for every other stored anchor (exact: their
        // rows reference no deleted node); delete-only windows pass
        // them through verbatim
        // untouched already excludes the recompute set, so inside the
        // merge every anchor is stale and keptNew is empty
        val others = newIds match {
          case Some(ids) => knnReknitMerged(live, ids, untouched, k)
          case None => untouched
        }
        val merged = (others +: fresh).reduce(_ unionAll _)
          .withColumn("fp", lit(fp))
          .select("aid", "bid", "sim", "rn", "fp")
        graft.operators.VersionedStore.commitMixed(
          doomed.map(d => Map("dead" -> d.select("vec_id")))
            .getOrElse(Map.empty),
          Map.empty,
          Map("lists" -> merged), path)
        ()
      }
    }
  }

  /** One-verb sync of the versioned kNN-list store with its versioned
    * embedding corpus — [[knnSyncWithStore]]'s contract on the
    * rename-free form (brute-cos generator; see
    * [[knnMaintainFromStoreVersioned]] for the routing refusal).
    */
  def knnSyncVersionedWithStore(spark: org.apache.spark.sql.SparkSession,
      storePath: String, rel: String, path: String, k: Int = 10,
      maxBatch: Int = 100000,
      retain: Option[Int] = None): Option[(Long, Long)] =
    graft.operators.CdcBridge.sync(spark, storePath, path,
      "knnSyncVersionedWithStore", retain)(
      graft.operators.VersionedStore.currentVersion(spark, path).isDefined)(
      cur => {
        val e = graft.operators.VersionedStore
          .read(spark, storePath, rel, Some(cur)).select("vec_id", "v")
        knnSaveListsVersioned(bruteTopLists(e, k), k, "brute-cos", path)
      })(
      (from, to) => knnMaintainFromStoreVersioned(spark, storePath, rel,
        from, to, path, maxBatch))

  /** APPEND verb: add NEW anchors' ranked lists under the store's own
    * stamp, idempotent on aid (a replayed append of the same anchors is
    * a no-op — the raw store is probed, so deletion stays sticky). The
    * increment's ranks are bounds-checked against the store's k; its
    * aid set must be disjoint from the store's (existing anchors' lists
    * are immutable between full saves — see [[knnSaveLists]] staleness
    * note).
    */
  def knnAppendLists(increment: org.apache.spark.sql.DataFrame,
      generator: String, path: String): Unit = {
    val spark = increment.sparkSession
    val meta = spark.read.parquet(s"$path/meta")
      .select("fp", "k", "generator").take(1)
    require(meta.nonEmpty,
      s"knnAppendLists: meta store at $path/meta is empty — save the " +
        "store first (knnSaveLists)")
    val (fp, k) = (meta(0).getString(0), meta(0).getInt(1))
    // the caller must DECLARE which generator produced the increment:
    // without this, lists from a different generator (LSH output appended
    // into a brute-cos store) would be silently admitted under the
    // store's own stamp — the exact splice the knnFingerprint
    // 'mixes generators' load guard exists to catch, introduced through
    // the official verb and invisible at load forever after
    require(meta(0).getString(2) == generator,
      s"knnAppendLists: increment declares generator '$generator' but " +
        s"the store was built by '${meta(0).getString(2)}' — appending " +
        "lists from a different generator would silently change what a " +
        "stored neighborhood means; rebuild with knnSaveLists instead")
    val stat = increment.agg(count(lit(1)).as("n"), max("rn").as("mx")).take(1)(0)
    if (stat.getLong(0) == 0) return
    require(stat.getInt(1) <= k,
      s"knnAppendLists: increment carries rank ${stat.getInt(1)} > the " +
        s"store's k=$k")
    val existing = spark.read.parquet(s"$path/lists")
      .select("aid").distinct()
    increment.select("aid", "bid", "sim", "rn")
      .join(existing, Seq("aid"), "left_anti")
      .withColumn("fp", lit(fp))
      .write.mode("append").parquet(s"$path/lists")
  }

  /** RE-KNIT verb: repair the append staleness [[knnSaveLists]]
    * documents — after [[knnAppendLists]] adds new anchors, EXISTING
    * anchors' stored lists still predate the new nodes and may miss
    * nearer neighbors. A full rebuild rescans |corpus|² pairs; re-knit
    * exploits that the true top-k over (old ∪ new) is exactly the
    * top-k of (stored top-k over old) ∪ (sims to the new nodes) — so
    * only the stale-anchor × new-batch sims are computed (linear in
    * corpus × batch, batch side broadcast), merged with the stored
    * lists, and re-ranked. KnnStoreSpec proves byte-equality with the
    * full rebuild, the q139/q155 incremental-equals-full discipline.
    *
    * Only `brute-cos` stores re-knit: the merge argument above needs
    * the stored lists to be EXACT top-k (an ANN-generated store's lists
    * may already miss old neighbors, so merging preserves — not
    * repairs — that approximation); ANN stores refresh through their
    * own generator instead.
    *
    * `newIds`(vec_id) names the appended batch; `e`(vec_id, v) is the
    * full corpus vector relation (the store holds no vectors). The
    * lists store is rewritten through [[graft.operators.StoreRewrite]]
    * (crash-durable); meta is untouched (same k, generator, stamp).
    * Idempotent: candidates dedupe on (aid, bid), so a replayed re-knit
    * of the same batch rewrites identical rows.
    */
  def knnReknit(e: org.apache.spark.sql.DataFrame,
      newIds: org.apache.spark.sql.DataFrame, path: String,
      maxBatch: Int = 100000): Unit = {
    val spark = e.sparkSession
    val meta = spark.read.parquet(s"$path/meta")
      .select("fp", "k", "generator").take(1)
    require(meta.nonEmpty,
      s"knnReknit: meta store at $path/meta is empty — save the store " +
        "first (knnSaveLists)")
    val (fp, k, gen) =
      (meta(0).getString(0), meta(0).getInt(1), meta(0).getString(2))
    require(gen == "brute-cos",
      s"knnReknit: store was generated by '$gen' — the stored-list merge " +
        "is exact only over exact lists; ANN-generated stores refresh " +
        "through their own generator (knnRefreshAnn)")
    val ids = newIds.select("vec_id").localCheckpoint(true)
    // the batch side is BROADCAST against every stale anchor below —
    // sized for an incremental append, not a corpus. Re-knitting after
    // a corpus-scale append would silently materialize stale × batch
    // work approaching |corpus|²; fail loudly with the right tool
    val nBatch = ids.count()
    require(nBatch <= maxBatch,
      s"knnReknit: the appended batch carries $nBatch vectors " +
        s"(> maxBatch=$maxBatch) — re-knit broadcasts the batch against " +
        "every stale anchor, the wrong shape after a corpus-scale " +
        "append; rebuild with knnSaveLists(bruteTopLists(...)) instead, " +
        "or raise maxBatch deliberately if the broadcast is truly " +
        "affordable")
    val lists = spark.read.parquet(s"$path/lists")
    graft.operators.StoreRewrite.atomicOverwrite(
      knnReknitMerged(e, ids, lists, k).withColumn("fp", lit(fp))
        .select("aid", "bid", "sim", "rn", "fp"),
      s"$path/lists")
  }

  /** Directed per-anchor ANN top-k lists over the full corpus through
    * the multi-table LSH generator — the ANN twin of [[bruteTopLists]]
    * and the canonical content of a `lsh-multi-<T>x<P>` list store
    * ([[knnRefreshAnn]] parses that tag to re-probe with the same
    * geometry). Anchor roles: every corpus vector queries the index
    * once; candidates are bucket collisions in any of the T tables,
    * reranked by exact cosine to the directed top-k.
    */
  def lshTopLists(e: org.apache.spark.sql.DataFrame, k: Int,
      tables: Int = 4, planes: Int = 6): org.apache.spark.sql.DataFrame =
    lshMultiAnn(e, e.select(col("vec_id").as("qid"), col("v").as("qv")),
        tables, planes, topK = k, excludeSelfMatches = true)
      .select(col("query_id").as("aid"), col("neighbor_id").as("bid"),
        col("cos_sim").as("sim"), col("rank").as("rn"))

  /** Generator-side REFRESH for ANN-built list stores — the maintenance
    * verb [[knnReknit]] deliberately refuses (its exact-merge argument
    * needs exact stored lists). The same merge IS exact at the
    * candidate-set level, though: an LSH anchor's full-regeneration
    * list is top-k(candidates among old ∪ candidates among new), any
    * old candidate in that top-k already sat in the stored top-k, and
    * bucket collision is a per-pair deterministic predicate — so
    * merging the STORED lists with the stale-anchor × new-batch bucket
    * collisions and re-ranking reproduces the full regeneration
    * BYTE-EQUAL (KnnStoreSpec pins it), at stale × collision cost with
    * only the batch's bucket rows broadcast. Routed by the stored
    * generator tag (`lsh-multi-<T>x<P>` — same geometry re-probed);
    * brute-cos stores re-knit exactly instead.
    */
  def knnRefreshAnn(e: org.apache.spark.sql.DataFrame,
      newIds: org.apache.spark.sql.DataFrame, path: String,
      maxBatch: Int = 100000): Unit = {
    val spark = e.sparkSession
    val meta = spark.read.parquet(s"$path/meta")
      .select("fp", "k", "generator").take(1)
    require(meta.nonEmpty,
      s"knnRefreshAnn: meta store at $path/meta is empty — save the " +
        "store first (knnSaveLists)")
    val (fp, k, gen) =
      (meta(0).getString(0), meta(0).getInt(1), meta(0).getString(2))
    val lshGen = "^lsh-multi-(\\d+)x(\\d+)$".r
    val (tables, planes) = gen match {
      case lshGen(t, p) => (t.toInt, p.toInt)
      case other => throw new IllegalArgumentException(
        s"knnRefreshAnn: store generator '$other' has no routed " +
          "refresh — brute-cos stores re-knit exactly (knnReknit); " +
          "rebuild other generators' stores with knnSaveLists")
    }
    val ids = newIds.select("vec_id").localCheckpoint(true)
    val nBatch = ids.count()
    if (nBatch == 0) return
    require(nBatch <= maxBatch,
      s"knnRefreshAnn: the appended batch carries $nBatch vectors " +
        s"(> maxBatch=$maxBatch) — the batch's bucket rows are " +
        "broadcast; rebuild with knnSaveLists(lshTopLists(...)) after " +
        "a corpus-scale append")
    val lists = spark.read.parquet(s"$path/lists")
    val aidsNew = ids.withColumnRenamed("vec_id", "aid")
    // stale = every anchor outside the batch, from the vector relation
    // UNION the stored anchor set: the vector side alone would miss
    // nothing in a correct call, but (a) an anchor whose old candidate
    // set was EMPTY has no stored rows yet may gain its first
    // neighbors from the batch (vector side catches it), and (b) a
    // caller passing a PARTIAL corpus must not silently DROP stored
    // anchors absent from it — their lists pass through unrefreshed
    // (no vectors to probe) rather than vanish
    val stale = e.select(col("vec_id").as("aid"))
      .unionByName(lists.select("aid")).distinct()
      .join(aidsNew, Seq("aid"), "left_anti")
    def bucketed(in: org.apache.spark.sql.DataFrame,
        idCol: String, vCol: String) =
      in.select(col(idCol), col(vCol),
        posexplode(array((0 until tables).map(t =>
          lshBucket(col(vCol), planes, dims, t)): _*)))
        .toDF(idCol, vCol, "tbl", "bucket")
    val staleVecs = e.select(col("vec_id").as("aid"), col("v"))
      .join(stale, Seq("aid"))
    val nv = e.join(ids, Seq("vec_id"))
      .select(col("vec_id").as("bid"), col("v").as("bv"))
    // stale anchors' NEW candidates: bucket collisions with the batch
    // in any table (aid ≠ bid holds structurally: the sets are disjoint)
    val cands = bucketed(staleVecs, "aid", "v")
      .join(broadcast(bucketed(nv, "bid", "bv")), Seq("tbl", "bucket"))
      .select(col("aid"), col("bid"), cosine(col("v"), col("bv")).as("sim"))
      .distinct()
    val staleRows = lists.join(stale, Seq("aid")).select("aid", "bid", "sim")
    // a replayed refresh re-finds pairs already in the stored lists;
    // both sides compute the same cosine on the same operands
    val merged0 = staleRows.unionAll(cands)
      .groupBy("aid", "bid").agg(max("sim").as("sim"))
    val merged = graft.operators.GroupTopK.topK(merged0, Seq(col("aid")),
        Seq(col("sim").desc, col("bid").asc), col("bid"), k,
        rankName = "rn")
      .select("aid", "bid", "sim", "rn")
    val keptNew = lists.join(aidsNew, Seq("aid"), "left_semi")
      .select("aid", "bid", "sim", "rn")
    graft.operators.StoreRewrite.atomicOverwrite(
      keptNew.unionAll(merged).withColumn("fp", lit(fp))
        .select("aid", "bid", "sim", "rn", "fp"),
      s"$path/lists")
  }

  /** DELETE verb: tombstone `ids`(vec_id) — masked out of both list
    * columns at every subsequent load; sticky across replayed appends.
    */
  def knnDeleteNodes(ids: org.apache.spark.sql.DataFrame,
      path: String): Unit = {
    require(ids.sparkSession.read.parquet(s"$path/meta")
        .select("fp").take(1).nonEmpty,
      s"knnDeleteNodes: meta store at $path/meta is empty — nothing to " +
        "delete from")
    graft.operators.IndexTombstones.append(ids, path)
  }

  private val lshGenTag = "^lsh-multi-(\\d+)x(\\d+)$".r

  /** Batch-anchored EXACT top-k lists — [[bruteTopLists]] restricted to
    * `anchorIds` at LINEAR cost: the anchors' vectors are the broadcast
    * side and the corpus streams through ONE scan (it is never the
    * broadcast side), so generating an increment's lists against a
    * 10^9-vector corpus is one map-side pass plus the bounded GroupTopK
    * — not the demo generator's |corpus|² cross join. Byte-compatible
    * with [[bruteTopLists]] row-for-row: same cosine operand order
    * (anchor first — float dot products are order-sensitive), same
    * (sim DESC, bid ASC) ranking, so appended and repaired lists are
    * indistinguishable from a from-scratch build's (CdcKnnSpec pins it).
    */
  private[graft] def bruteListsForAnchors(e: org.apache.spark.sql.DataFrame,
      anchorIds: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    val a = e.join(anchorIds.select("vec_id"), Seq("vec_id"))
      .select(col("vec_id").as("aid"), col("v").as("av"))
    val sims = e.select(col("vec_id").as("bid"), col("v").as("bv"))
      .crossJoin(broadcast(a))
      .filter(col("aid") =!= col("bid"))
      .select(col("aid"), col("bid"), cosine(col("av"), col("bv")).as("sim"))
    graft.operators.GroupTopK.topK(sims, Seq(col("aid")),
        Seq(col("sim").desc, col("bid").asc), col("bid"), k, rankName = "rn")
      .select("aid", "bid", "sim", "rn")
  }

  /** Generator-routed list generation for a bounded anchor set against
    * the live corpus — the shared engine of the CDC bridge's append and
    * delete-repair paths. Routing by the store's OWN generator tag is
    * the knnFingerprint splice guard applied at generation time:
    * maintenance can never push another family's lists under this
    * store's stamp.
    */
  private def knnListsForAnchors(e: org.apache.spark.sql.DataFrame,
      anchorIds: org.apache.spark.sql.DataFrame, k: Int,
      generator: String, verb: String): org.apache.spark.sql.DataFrame =
    generator match {
      case "brute-cos" => bruteListsForAnchors(e, anchorIds, k)
      case lshGenTag(t, p) =>
        lshMultiAnn(e,
            e.join(anchorIds.select("vec_id"), Seq("vec_id"))
              .select(col("vec_id").as("qid"), col("v").as("qv")),
            t.toInt, p.toInt, topK = k, excludeSelfMatches = true)
          .select(col("query_id").as("aid"), col("neighbor_id").as("bid"),
            col("cos_sim").as("sim"), col("rank").as("rn"))
      case other => throw new IllegalArgumentException(
        s"$verb: store generator '$other' has no routed list generation " +
          "— brute-cos and lsh-multi-<T>x<P> stores maintain; rebuild " +
          "other generators' stores with knnSaveLists")
    }

  /** Recompute `anchors`' lists against the LIVE corpus and rewrite
    * exactly their rows — the delete repair the tombstone mask cannot
    * do alone: masking a deleted neighbor at load leaves its anchors'
    * lists SHORT (k minus the holes), while a fresh rebuild would
    * refill those slots with the next-nearest live vectors. The
    * affected set is bounded (only anchors whose stored lists reference
    * a doomed id), so the repair is one anchors-broadcast corpus pass,
    * and it restores exact top-k — CDC maintenance stays rebuilt-equal
    * across DELETE windows too, not just appends.
    */
  private def knnRecomputeAnchors(e: org.apache.spark.sql.DataFrame,
      anchors: org.apache.spark.sql.DataFrame, path: String, k: Int,
      generator: String, fp: String): Unit = {
    if (anchors.isEmpty) return
    val spark = e.sparkSession
    val fresh = knnListsForAnchors(e, anchors, k, generator,
      "knnMaintainFromStore")
    val untouched = spark.read.parquet(s"$path/lists")
      .join(anchors.select(col("vec_id").as("aid")), Seq("aid"), "left_anti")
      .select("aid", "bid", "sim", "rn", "fp")
    graft.operators.StoreRewrite.atomicOverwrite(
      untouched.unionAll(fresh.withColumn("fp", lit(fp))
        .select("aid", "bid", "sim", "rn", "fp")),
      s"$path/lists")
  }

  /** Maintain a kNN-list store from a VERSIONED-STORE revision window —
    * the graph family joining the CDC discipline (q189 text, q192
    * vector, q193 signature, q194 winnow): the embedding corpus lives
    * in a [[graft.operators.VersionedStore]] relation carrying
    * (vec_id, v), and ONE call propagates any run of append/delete
    * revisions into the lists in O(corpus × batch) — no caller diffing,
    * no full rebuild. Deletes land FIRST: the doomed ids are
    * tombstoned, and every live anchor whose stored list referenced one
    * is recomputed against the live corpus ([[knnRecomputeAnchors]] —
    * without the repair a masked neighbor leaves a hole a rebuild would
    * refill). Net-new rows then get generator-routed lists
    * ([[knnListsForAnchors]], anchors broadcast, one corpus scan),
    * appended idempotently, and the stale anchors catch up through the
    * family's own merge verb — [[knnReknit]] for exact stores,
    * [[knnRefreshAnn]] for LSH stores. Result: the maintained store
    * LOADS identically to a fresh build of `read(toRev)` for the exact
    * generator (CdcKnnSpec pins byte-equality, q196 oracles it), the
    * strongest contract in the bridge family. Replay-safe: re-running a
    * window re-tombstones idempotently, finds no doomed references left
    * to repair, appends nothing (left-anti), and re-knits to the same
    * rows.
    */
  def knnMaintainFromStore(spark: org.apache.spark.sql.SparkSession,
      storePath: String, rel: String, fromRev: Long, toRev: Long,
      path: String, maxBatch: Int = 100000): Unit = {
    val meta = spark.read.parquet(s"$path/meta")
      .select("fp", "k", "generator").take(1)
    require(meta.nonEmpty,
      s"knnMaintainFromStore: meta store at $path/meta is empty — save " +
        "the store first (knnSaveLists)")
    val (fp, k, gen) =
      (meta(0).getString(0), meta(0).getInt(1), meta(0).getString(2))
    // a re-scannable PLAN, deliberately not checkpointed: each consumer
    // (delete-repair, new-anchor generation, re-knit) streams the live
    // corpus map-side once — materializing it here would spill O(corpus)
    // to executor disk for no shuffle saved
    val live = graft.operators.VersionedStore
      .read(spark, storePath, rel, Some(toRev))
      .select("vec_id", "v")
    graft.operators.CdcBridge.maintain(spark, storePath, rel, fromRev,
      toRev, "vec_id", Seq("vec_id", "v"), "knnMaintainFromStore")(
      del => {
        val doomed = del.select("vec_id").localCheckpoint(true)
        // affected anchors from the RAW stored lists (not the masked
        // load): after a crash-replay the tombstones already exist but
        // un-repaired references must still be found
        val affected = spark.read.parquet(s"$path/lists")
          .join(doomed.select(col("vec_id").as("bid")), Seq("bid"),
            "left_semi")
          .select(col("aid").as("vec_id")).distinct()
          .join(doomed, Seq("vec_id"), "left_anti")
          .localCheckpoint(true)
        knnDeleteNodes(doomed, path)
        knnRecomputeAnchors(live, affected, path, k, gen, fp)
      })(
      ins => {
        val newIds = ins.select("vec_id").localCheckpoint(true)
        val nBatch = newIds.count()
        if (nBatch > 0) {
          require(nBatch <= maxBatch,
            s"knnMaintainFromStore: the window nets $nBatch new vectors " +
              s"(> maxBatch=$maxBatch) — the batch is broadcast against " +
              "the corpus; after a corpus-scale append rebuild with " +
              "knnSaveLists instead, or raise maxBatch deliberately")
          knnAppendLists(
            knnListsForAnchors(live, newIds, k, gen,
              "knnMaintainFromStore"), gen, path)
          gen match {
            case "brute-cos" => knnReknit(live, newIds, path, maxBatch)
            case _ => knnRefreshAnn(live, newIds, path, maxBatch)
          }
        }
      })
  }

  /** SYNC the kNN-list store with its versioned embedding corpus — the
    * bookkeeping-free form of [[knnMaintainFromStore]], completing the
    * sync-verb parity across every derived-index family (text, vector,
    * signature, winnow, knn): the store checkpoints the last absorbed
    * revision ([[graft.operators.RevisionSync]]), a first call against
    * an empty path bootstraps a full build from `read(current)`
    * (generator-routed — [[bruteTopLists]] for `brute-cos` at bounded
    * demo scale, [[lshTopLists]] for `lsh-multi-<T>x<P>` at corpus
    * scale), later calls absorb every pending append/delete revision in
    * one window, and the lag-never-lead marker ordering makes a crash
    * between maintenance and bump a harmless replay. `k` and
    * `generator` are consulted ONLY at bootstrap; afterwards the
    * store's own meta stamp routes.
    */
  def knnSyncWithStore(spark: org.apache.spark.sql.SparkSession,
      storePath: String, rel: String, path: String, k: Int = 10,
      generator: String = "brute-cos",
      maxBatch: Int = 100000): Option[(Long, Long)] =
    graft.operators.CdcBridge.sync(spark, storePath, path,
      "knnSyncWithStore")({
      val mp = new org.apache.hadoop.fs.Path(s"$path/meta")
      mp.getFileSystem(spark.sessionState.newHadoopConf()).exists(mp)
    })(cur => {
      val e = graft.operators.VersionedStore
        .read(spark, storePath, rel, Some(cur)).select("vec_id", "v")
      val lists = generator match {
        case "brute-cos" => bruteTopLists(e, k)
        case lshGenTag(t, p) => lshTopLists(e, k, t.toInt, p.toInt)
        case other => throw new IllegalArgumentException(
          s"knnSyncWithStore: generator '$other' has no routed bootstrap " +
            "— use brute-cos or lsh-multi-<T>x<P>, or hand-build with " +
            "knnSaveLists and drive the explicit-window maintain verb")
      }
      knnSaveLists(lists, k, generator, path)
    })((from, to) =>
      knnMaintainFromStore(spark, storePath, rel, from, to, path, maxBatch))

  /** One-hop graph expansion of an ANN candidate set — the NSW/HNSW
    * move at one hop, distributed-friendly: a query's candidates pull in
    * their stored kNN neighbors ("a neighbor of my near neighbor is
    * probably near"), recovering true neighbors the base probe missed
    * without re-scanning the corpus. `base`(qid, vec_id) is any ANN
    * output; `lists`(aid, bid, ...) is the graph store. Output:
    * distinct (qid, vec_id), the expanded candidate set for an exact
    * rerank.
    *
    * Scale shape: the expansion join is candidate-set-sized against the
    * (aid)-keyed lists — |base| × out-degree ≤ |base| × k rows, never
    * corpus-shaped; the distinct is over the same bound. Self-matches
    * are dropped (a query's own list would otherwise re-inject it).
    */
  def graphExpandCandidates(base: org.apache.spark.sql.DataFrame,
      lists: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val b = base.select(col("qid"), col("vec_id"))
    b.union(
        b.join(lists.select(col("aid").as("vec_id"), col("bid")),
            Seq("vec_id"))
          .select(col("qid"), col("bid").as("vec_id")))
      .filter(col("vec_id") =!= col("qid"))
      .distinct()
  }

  /** Multi-hop expansion of an ANN candidate set through the stored
    * kNN-list graph — [[graphExpandCandidates]] iterated with a BEAM:
    * each hop pulls the current frontier's stored neighbors, scores the
    * NEW ones exactly against the query (candidate-bounded, queries
    * broadcast), and keeps only the top-`beam` per query as the next
    * frontier. This is NSW/HNSW best-first search in distributed form:
    * without the cap, hop h touches up to |base|·k^h vertices (the
    * closure explodes); with it, every hop's join is ≤ |queries|·beam·k
    * rows regardless of depth, so depth buys recall at FLAT per-hop
    * cost. Returns the visited set (qid, vec_id, sim, hop) — hop 0 =
    * the base probe's candidates, hop h = first discovered at hop h —
    * ready for the exact top-k rerank (sim is already the exact cosine).
    *
    * Scale shape per hop: one (vec_id)-keyed join against the lists
    * (frontier-sized), one anti-join against the visited set (visited ≤
    * |queries|·(base + hops·beam) rows — list-sized, never corpus-
    * sized), one exact [[graft.operators.GroupTopK]] over ≤ beam·k
    * candidates per query. The frontier is checkpointed per hop (the CC
    * loop discipline) so the plan does not deepen with hops.
    */
  def graphExpandMultiHop(base: org.apache.spark.sql.DataFrame,
      lists: org.apache.spark.sql.DataFrame,
      e: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame,
      hops: Int = 2, beam: Int = 8): org.apache.spark.sql.DataFrame = {
    require(hops >= 1, s"hops must be >= 1, got $hops")
    require(beam >= 1, s"beam must be >= 1, got $beam")
    val q = queries.select(col("qid"), col("qv")).localCheckpoint(true)
    val edges = lists.select(col("aid").as("vec_id"), col("bid"))
    // hop 0: the base candidates, scored exactly (the rerank needs sims
    // for every visited row anyway, and the frontier order is by sim)
    var visited = base.select("qid", "vec_id")
      .join(e, "vec_id").join(broadcast(q), "qid")
      .select(col("qid"), col("vec_id"),
        cosine(col("qv"), col("v")).as("sim"), lit(0).as("hop"))
      .localCheckpoint(true)
    var frontier = visited.select("qid", "vec_id")
    (1 to hops).foreach { h =>
      val nbrs = frontier
        .join(edges, Seq("vec_id"))
        .select(col("qid"), col("bid").as("vec_id"))
        .filter(col("vec_id") =!= col("qid"))
        .distinct()
        .join(visited.select("qid", "vec_id"), Seq("qid", "vec_id"),
          "left_anti")
      val scored = nbrs.join(e, "vec_id").join(broadcast(q), "qid")
        .select(col("qid"), col("vec_id"),
          cosine(col("qv"), col("v")).as("sim"))
      val kept = graft.operators.GroupTopK.topK(scored, Seq(col("qid")),
          Seq(col("sim").desc, col("vec_id").asc), col("vec_id"), beam,
          rankName = "brank")
        .select(col("qid"), col("vec_id"), col("sim"), lit(h).as("hop"))
        .localCheckpoint(true)
      visited = visited.unionAll(kept).localCheckpoint(true)
      frontier = kept.select("qid", "vec_id")
    }
    visited
  }

  /** The mutuality tail of mutual-kNN, decoupled from candidate
    * generation: `directed`(aid, bid, sim, rn) is ANY per-anchor ranked
    * top-k list — the bounded brute force above (q116), or at the 100 TB
    * target the ANN index's output ([[lshMultiAnn]] / [[ivfPqSearch]]
    * renamed query_id→aid, neighbor_id→bid, rank→rn) — and only the
    * top-k-list-sized reversed-pair equality join runs here. This is the
    * composition path the q116/q117 scaladocs promise: ANN candidates in,
    * mutual edges out, connected components unchanged downstream
    * (MutualKnnAnnSpec measures ANN-fed edge recall vs brute force).
    *
    * `minSim` is the similarity floor of the composed production
    * pipeline (candidates → sim floor → mutuality → CC). ANN-fed mutual
    * edges are NOT a subset of the brute-force mutual graph: when the
    * index misses an anchor's true top-k, the sparser candidate list
    * promotes lower-similarity pairs into rank <= k on BOTH sides, and
    * those spurious edges would bridge unrelated CC components
    * downstream (measured in SCALING.md: 166–232 spurious edges on the
    * 200-vector subset). True mutual edges sit high in similarity, so a
    * floor kills the spurious tail with little true-edge loss
    * (MutualKnnAnnSpec measures both sides of that trade). The default
    * keeps the floor off — the brute-force oracle path (q116) must see
    * every edge.
    *
    * The input is materialized ONCE (localCheckpoint): it feeds both
    * sides of the self-join, and without it the candidate generator —
    * scoring scan or ANN probe — would execute twice (exchange reuse
    * caches the scored exchange, not the window above it) — the q72
    * one-relation-many-consumers discipline. The floor is applied
    * BEFORE the materialization and the self-join, so the checkpointed
    * relation and both join sides shrink with it.
    */
  def mutualKnnEdgesFromCandidates(directed: org.apache.spark.sql.DataFrame,
      minSim: Double = Double.NegativeInfinity)
      : org.apache.spark.sql.DataFrame = {
    val floored =
      if (minSim == Double.NegativeInfinity) directed
      else directed.filter(col("sim") >= minSim)
    val top = floored.select("aid", "bid", "sim", "rn").localCheckpoint(true)
    val rev = top.select(col("aid").as("bid2"), col("bid").as("aid2"),
      col("rn").as("rank_ba"))
    top.join(rev, col("aid") === col("aid2") && col("bid") === col("bid2"))
      .filter(col("aid") < col("bid"))
      .select(col("aid").as("a"), col("bid").as("b"), col("sim"),
        col("rn").as("rank_ab"), col("rank_ba"))
  }

  /** Label propagation over an undirected edge list — semi-supervised
    * pseudo-labeling: seed nodes keep their true label; every other
    * node takes the MAJORITY label among its already-labeled neighbors
    * each round (ties broken by minimum label id), for `iters`
    * synchronous rounds. The label-expansion step of a semi-supervised
    * training-data pipeline: a small human-labeled seed set fans out
    * over the semantic neighborhood graph and unreachable nodes stay
    * honestly unlabeled.
    *
    * Determinism: votes are integer counts and the argmax tiebreak is
    * total, so the labeling is bit-identical on any engine — no float
    * affinity weights by design (a weighted vote would reintroduce the
    * reduction-order drift the integer disciplines here exist to kill).
    * Fixed round count, mirrored unrolled in the oracle (the q137/q141
    * rationale). Scale shape per round: one edge-keyed join against the
    * current labeling, one (node, label) count with map-side partials,
    * one argmax — linear in |E|, state checkpointed like the CC loop.
    *
    * `seeds`(vec_id, lab): the fixed labels. `edges`(a, b): undirected.
    * Returns (vec_id, lab, src) for every node that ENDS labeled, src ∈
    * {seed, propagated}.
    */
  def labelPropagation(nodes: org.apache.spark.sql.DataFrame,
      edges: org.apache.spark.sql.DataFrame,
      seeds: org.apache.spark.sql.DataFrame,
      iters: Int = 5): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.GraftCheckpointBridge
    // Round 14: the loop relations checkpoint PRE-PLACED on their join
    // keys (dedges on src; seed and the label state on vec_id) through
    // GraftCheckpointBridge, so each round's vote join, the state/pick/
    // seed three-way join and the final dedups plan without re-shuffling
    // state that is already placed — one exchange per round remains (the
    // inherent vote re-key from src to dst; see the CC loop's fuller
    // rationale in DedupQueries.connectedComponents).
    val dedges = GraftCheckpointBridge.localCheckpointKeyed(
      edges.select(col("a").as("src"), col("b").as("dst"))
        .union(edges.select(col("b").as("src"), col("a").as("dst")))
        .repartition(col("src")))
    val seed = GraftCheckpointBridge.localCheckpointKeyed(
      seeds.select(col("vec_id"), col("lab").as("seed_lab"))
        .repartition(col("vec_id")))
    var state = GraftCheckpointBridge.localCheckpointKeyed(
      nodes.repartition(col("vec_id"))
        .join(seed, Seq("vec_id"), "left")
        .select(col("vec_id"), col("seed_lab").as("lab")))
    (1 to iters).foreach { _ =>
      // state is keyed by vec_id -> renamed src: colocated with dedges,
      // no exchange on either join side; the round's ONE re-key
      // (src -> dst) is the explicit repartition, after which BOTH
      // aggregation levels run exchange-free (hash(dst) clusters
      // (dst,lab) too) and pick comes out placed on dst == the state's
      // vec_id key, so the state join below needs no state-side shuffle
      val votes = dedges
        .join(state.filter(col("lab").isNotNull)
          .select(col("vec_id").as("src"), col("lab")), "src")
        .repartition(col("dst"))
        .groupBy(col("dst"), col("lab")).agg(count(lit(1)).as("c"))
      val pick = votes.groupBy("dst")
        .agg(max(struct(col("c"), negate(col("lab")).as("nl"))).as("best"))
        .select(col("dst").as("vec_id"), negate(col("best.nl")).as("vote"))
      state = GraftCheckpointBridge.localCheckpointKeyed(
        state.join(pick, Seq("vec_id"), "left")
          .join(seed, Seq("vec_id"), "left")
          .select(col("vec_id"),
            coalesce(col("seed_lab"), col("vote"), col("lab")).as("lab")))
    }
    state.filter(col("lab").isNotNull)
      .join(seed, Seq("vec_id"), "left")
      .select(col("vec_id"), col("lab"),
        when(col("seed_lab").isNotNull, lit("seed"))
          .otherwise(lit("propagated")).as("src"))
  }

  private def knnSubset(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables(s, d, "embeddings").filter(col("vec_id") < 300)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))

  /** Oracle twin of [[mutualKnnEdges]] at k = 3 over the vec_id < 300
    * subset — a CTE chain ending in `m(a, b, sim, rank_ab, rank_ba)`.
    */
  private val mutualCteSql =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings WHERE vec_id < 300),
        p AS (SELECT a.vec_id AS aid, b.vec_id AS bid,
                ${cosSql("a.v", "b.v")} AS sim
              FROM e a CROSS JOIN e b WHERE a.vec_id <> b.vec_id),
        r AS (SELECT aid, bid, sim,
                ROW_NUMBER() OVER (PARTITION BY aid
                  ORDER BY sim DESC, bid ASC) AS rn
              FROM p),
        t AS (SELECT aid, bid, sim, rn FROM r WHERE rn <= 3),
        m AS (SELECT t1.aid AS a, t1.bid AS b, t1.sim AS sim,
                     t1.rn AS rank_ab, t2.rn AS rank_ba
              FROM t t1 JOIN t t2 ON t1.aid = t2.bid AND t1.bid = t2.aid
              WHERE t1.aid < t1.bid)"""

  /** q142: label propagation over the q116 mutual-kNN graph — every 5th
    * vector keeps its true label as the seed set (a 20% labeled corpus)
    * and the rest inherit by iterated neighbor majority. The oracle
    * unrolls the same 5 synchronous rounds over the shared mutual-graph
    * CTE, so graph and votes cannot drift between engines.
    */
  private val q142 = QueryDef(
    "q142_label_propagation",
    (s, d) => {
      val e = knnSubset(s, d)
      val lbl = Tables(s, d, "embeddings").filter(col("vec_id") < 300)
        .select(col("vec_id"), col("label"))
      labelPropagation(
          e.select("vec_id"),
          mutualKnnEdges(e, 3).select("a", "b"),
          lbl.filter(col("vec_id") % 5 === 0)
            .select(col("vec_id"), col("label").as("lab")))
        .orderBy("vec_id")
    },
    Some {
      val rounds = (0 until 5).map { k =>
        s"""v$k AS MATERIALIZED (SELECT dst, lab, COUNT(*) AS c
              FROM dedges JOIN s$k ON dedges.src = s$k.vec_id
              WHERE s$k.lab IS NOT NULL GROUP BY dst, lab),
            p$k AS MATERIALIZED (SELECT dst AS vec_id, lab AS vote FROM (
                SELECT dst, lab, ROW_NUMBER() OVER (PARTITION BY dst
                  ORDER BY c DESC, lab ASC) AS rn FROM v$k) t
              WHERE rn = 1),
            s${k + 1} AS MATERIALIZED (SELECT s$k.vec_id,
                COALESCE(seeds.seed_lab, p$k.vote, s$k.lab) AS lab
              FROM s$k LEFT JOIN p$k ON s$k.vec_id = p$k.vec_id
              LEFT JOIN seeds ON s$k.vec_id = seeds.vec_id)"""
      }.mkString(",\n")
      s"""WITH $mutualCteSql,
              nodes AS (SELECT vec_id FROM e),
              lbl AS (SELECT vec_id, label FROM embeddings
                      WHERE vec_id < 300),
              seeds AS (SELECT vec_id, label AS seed_lab FROM lbl
                        WHERE vec_id % 5 = 0),
              dedges AS (SELECT a AS src, b AS dst FROM m
                         UNION ALL SELECT b, a FROM m),
              s0 AS MATERIALIZED (SELECT nodes.vec_id, seed_lab AS lab
                FROM nodes LEFT JOIN seeds ON nodes.vec_id = seeds.vec_id),
              $rounds
         SELECT s5.vec_id, s5.lab,
                CASE WHEN seeds.vec_id IS NOT NULL THEN 'seed'
                     ELSE 'propagated' END AS src
         FROM s5 LEFT JOIN seeds ON s5.vec_id = seeds.vec_id
         WHERE s5.lab IS NOT NULL ORDER BY s5.vec_id"""
    })

  private val q116 = QueryDef(
    "q116_mutual_knn",
    (s, d) => mutualKnnEdges(knnSubset(s, d), 3).orderBy("a", "b"),
    Some(s"""WITH $mutualCteSql
             SELECT a, b, sim, rank_ab, rank_ba FROM m ORDER BY a, b"""))

  /** Semantic clusters: connected components over the q116 mutual-kNN
    * edge set — the embedding-space twin of q74's MinHash dedup clusters
    * (there: lexical near-dup components; here: semantic neighborhoods).
    * Every vector that appears in a mutual edge is labeled with its
    * component's minimum vec_id; isolated vectors carry no label, the
    * q74 convention. Reuses [[DedupQueries.connectedComponents]] —
    * hash-to-min over the edge list, O(log d) rounds, convergence
    * checked by row-set checksum, loud failure on the iteration cap.
    *
    * Scale shape: the CC loop's state is edge-list-sized (mutual top-k
    * caps degree at k, so |E| <= kN/2 — linear, never quadratic), and
    * each round is two hash shuffles on vertex ids. The demo edge
    * generator is q116's bounded brute force; at 100 TB the directed
    * top-k lists come from the ANN index and the component loop is
    * unchanged — exactly how q74 runs CC on bucket-star edges rather
    * than all pairs.
    */
  private val q117 = QueryDef(
    "q117_semantic_clusters",
    (s, d) => DedupQueries.connectedComponents(
        mutualKnnEdges(knnSubset(s, d), 3)
          .select(col("a").as("doc_a"), col("b").as("doc_b")))
      .select(col("doc_id").as("vec_id"), col("cluster_id"))
      .orderBy("vec_id"),
    Some(s"""WITH RECURSIVE $mutualCteSql,
                  edges AS (SELECT a AS u, b AS v FROM m
                            UNION ALL SELECT b, a FROM m),
                  walk(u, v) AS (
                    SELECT u, v FROM edges
                    UNION
                    SELECT w.u, e2.v FROM walk w JOIN edges e2 ON w.v = e2.u),
                  cc AS (SELECT u AS vec_id, least(u, min(v)) AS cluster_id
                         FROM walk GROUP BY u)
             SELECT vec_id, cluster_id FROM cc ORDER BY vec_id"""))

  /** One 32-bit lane of the binary sign quantization: bit j of the lane
    * is `v[lo + j] > 0`. Two positive 32-bit lanes instead of one 64-bit
    * word because `1 << 63` crosses the BIGINT sign bit, and signed
    * shift/overflow edge semantics are exactly the kind of cross-engine
    * detail the hash gate exists to catch — both lanes stay below 2^32,
    * exactly representable everywhere, at the cost of one extra
    * bit_count per comparison.
    */
  private def signLane(lo: Int): Column =
    expr(s"aggregate(sequence($lo, ${lo + 31}), 0L, " +
      s"(acc, i) -> acc + IF(element_at(v, i + 1) > 0D, " +
      s"shiftleft(1L, i - $lo), 0L))")

  private def signLaneSql(lo: Int): String =
    s"CAST(list_sum(list_transform(range(0, 32), i -> " +
      s"CASE WHEN v[i + 1 + $lo] > 0 THEN (1::BIGINT << i) ELSE 0 END)) " +
      "AS BIGINT)"

  /** Binary-quantized ANN: sign-bit embeddings + Hamming pre-filter +
    * exact-cosine rerank. Each 64-dim vector compresses 64× to two packed
    * sign lanes ([[signLane]]); candidate generation scans 16 bytes per
    * vector with xor+popcount (both codegen'd integer ops) instead of 512
    * bytes of doubles, keeps the Hamming top-25 per query via the exact
    * two-stage [[graft.operators.GroupTopK]], and only the 25 survivors
    * pay the full-precision cosine for the final top-5.
    *
    * Scale design: queries are broadcast, the corpus scan is map-only
    * (packing + xor/popcount are all integer codegen — the scan is
    * bandwidth-bound on 16-byte rows, the whole point of binary
    * quantization), and nothing corpus-sized shuffles: the only exchanges
    * are GroupTopK's bounded survivor sets. The packed lanes are
    * integers, so Hamming distances hash-match DuckDB exactly with no
    * float discipline needed; only the 125-row rerank touches doubles.
    */
  private val q128 = QueryDef(
    "q128_hamming_ann",
    (s, d) => {
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val packed = e.select(col("vec_id"), col("v"),
        signLane(0).as("w0"), signLane(32).as("w1"))
      val q = packed.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("w0").as("qw0"), col("w1").as("qw1"))
      val ham = packed.join(broadcast(q), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), col("v"), col("qv"),
          expr("CAST(bit_count(w0 ^ qw0) + bit_count(w1 ^ qw1) AS INT)")
            .as("hamming"))
      val cand = graft.operators.GroupTopK.topK(ham, Seq(col("qid")),
        Seq(col("hamming").asc, col("vec_id").asc), col("vec_id"), 25,
        rankName = "hrank")
      // the rerank window is candidate-sized (<= 25 rows per query by
      // construction), never corpus-sized — safe to partition on qid alone
      val wr = Window.partitionBy("qid")
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
      cand.withColumn("cos_sim", cosine(col("qv"), col("v")))
        .withColumn("rank", row_number().over(wr))
        .filter(col("rank") <= 5)
        .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"),
          col("rank"), col("hamming"), col("cos_sim"))
        .orderBy("query_id", "rank")
    },
    Some(binAnnOracleSql))

  private lazy val binAnnOracleSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                        FROM embeddings),
                  packed AS (SELECT vec_id, v, ${signLaneSql(0)} AS w0,
                               ${signLaneSql(32)} AS w1 FROM e),
                  q AS (SELECT vec_id AS qid, v AS qv, w0 AS qw0, w1 AS qw1
                        FROM packed WHERE vec_id < 5),
                  ham AS (SELECT qid, vec_id, v, qv,
                            CAST(bit_count(xor(w0, qw0))
                              + bit_count(xor(w1, qw1)) AS INTEGER) AS hamming
                          FROM packed CROSS JOIN q WHERE vec_id <> qid),
                  cand AS (SELECT qid, vec_id, v, qv, hamming FROM (
                             SELECT qid, vec_id, v, qv, hamming,
                               ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY hamming ASC, vec_id ASC) AS hrank
                             FROM ham) h WHERE hrank <= 25)
             SELECT qid AS query_id, vec_id AS neighbor_id, rank, hamming,
                    cos_sim
             FROM (SELECT qid, vec_id, hamming,
                     ${cosSql("qv", "v")} AS cos_sim,
                     ROW_NUMBER() OVER (PARTITION BY qid
                       ORDER BY ${cosSql("qv", "v")} DESC, vec_id ASC) AS rank
                   FROM cand) r
             WHERE rank <= 5 ORDER BY query_id, rank"""

  /** q204: q128's Hamming-candidates + exact-rerank pipeline with the
    * candidates served from the MANIFEST-COMMITTED binary store driven
    * through its own verbs — ONE PUT commits the packing-spec row + the
    * bootstrap slice's 16-byte codes, the remaining slice appends as a
    * delta revision (the packing is a fixed rule, so the union equals a
    * from-scratch pack and the oracle is q128's SQL VERBATIM).
    * VersionedBinSpec pins bit-equality against the rename family
    * across the delete/sticky/compact lifecycle and `asOf`.
    */
  private val q204 = QueryDef(
    "q204_versioned_bin_search",
    (s, d) => {
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val boot = e.filter(col("vec_id") % 4 =!= 3)
      if (boot.isEmpty)
        e.select(col("vec_id").as("query_id"),
          col("vec_id").as("neighbor_id"), lit(1).as("rank"),
          lit(0).as("hamming"), lit(0.0).as("cos_sim")).limit(0)
      else
        withThrowawayStore { idx =>
          graft.BenchPhases.build {
            binSaveIndexVersioned(binCodes(boot), idx)
            binAppendCodesVersioned(e.filter(col("vec_id") % 4 === 3), idx)
          }
          val cand = binHammingSearchVersioned(s, q, idx, topR = 25,
            excludeSelfMatches = true)
          // the rerank window is candidate-sized (<= 25 rows per query
          // by construction), never corpus-sized — q128's exact tail
          val wr = Window.partitionBy("qid")
            .orderBy(col("cos_sim").desc, col("vec_id").asc)
          e.join(broadcast(cand.select("qid", "vec_id", "hamming")),
              "vec_id")
            .join(broadcast(q), "qid")
            .withColumn("cos_sim", cosine(col("qv"), col("v")))
            .withColumn("rank", row_number().over(wr))
            .filter(col("rank") <= 5)
            .select(col("qid").as("query_id"),
              col("vec_id").as("neighbor_id"), col("rank"),
              col("hamming"), col("cos_sim"))
            .orderBy("query_id", "rank")
        }(s)
    },
    Some(binAnnOracleSql))

  /** Identity of the binary sign-code packing. Unlike PQ/IVF there are
    * no trained parameters — the packing is a fixed rule — so the
    * fingerprint stamps the packing SPEC (dimensions, lane layout, sign
    * rule). What it guards is therefore not foreign TRAINING but foreign
    * FORMAT: a store written by a different spec version, or a PQ/IVF
    * store path passed to [[binLoadIndex]] by mistake, fails the same
    * loud way a mis-trained PQ store does.
    */
  private val binFingerprint = s"bin:dims=$dims:lanes=2:lane_bits=32:sign=gt0"

  /** Packed sign codes for `emb`(vec_id, v): two 32-bit lanes per vector
    * ([[signLane]] — 16 bytes instead of 512) plus the spec stamp. The
    * persisted representation of the binary ANN family (q128), and the
    * input [[binHammingSearch]] consumes. Vector length is validated on
    * the scan: a short array would silently pack missing dimensions as
    * zero bits.
    */
  def binCodes(emb: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    emb.filter(
        assert_true(size(col("v")) === lit(dims),
          lit(s"binCodes: vector length must be $dims")).isNull)
      .select(col("vec_id"), signLane(0).as("w0"), signLane(32).as("w1"))
      .withColumn("fp", lit(binFingerprint))

  /** Persists the packed sign codes at `path`/codes with a 1-row spec
    * relation at `path`/meta — build once, search forever, append
    * increments: the q82/PQ/IVF store lifecycle applied to the binary
    * family.
    */
  def binSaveIndex(codes: org.apache.spark.sql.DataFrame, path: String): Unit = {
    binSaveChecked(codes, "binSaveIndex")
    binMetaRow(codes.sparkSession)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    codes.write.mode("overwrite").parquet(s"$path/codes")
    // a full save is the tombstone compaction + re-admission point
    graft.operators.IndexTombstones.clear(codes.sparkSession, path)
  }

  /** The 1-row spec relation BOTH persisted forms write. */
  private def binMetaRow(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame =
    spark.range(1).select(lit(binFingerprint).as("fp"), lit(dims).as("dims"))

  /** Save-side gate shared by [[binSaveIndex]] and
    * [[binSaveIndexVersioned]]: every code row must carry THIS library's
    * packing spec — a layout change between pack and save would corrupt
    * every Hamming distance.
    */
  private def binSaveChecked(codes: org.apache.spark.sql.DataFrame,
      verb: String): Unit = {
    require(codes.columns.contains("fp"),
      s"$verb: codes carry no spec stamp — pack them with binCodes")
    val stamps = codes.select("fp").distinct().collect()
      .map(_.getString(0)).toSeq.sorted
    require(stamps.nonEmpty,
      s"$verb: refusing to persist an EMPTY code set — pack the " +
        "corpus with binCodes first (an empty store would be rejected " +
        "at load as interrupted)")
    require(stamps == Seq(binFingerprint),
      s"$verb: codes were packed under a different spec " +
        s"(${stamps.mkString(", ")}) than this library's " +
        s"($binFingerprint) — a layout change between pack and save " +
        "would corrupt every Hamming distance")
  }

  /** Load-side gates shared by [[binLoadIndex]] and
    * [[binLoadIndexVersioned]]: the meta spec row and every code row's
    * stamp are checked against this library's packing spec.
    */
  private def binGateLoaded(meta: Array[org.apache.spark.sql.Row],
      codes: org.apache.spark.sql.DataFrame, verb: String,
      where: String): Unit = {
    require(meta.nonEmpty,
      s"$verb: meta store at $where is empty — interrupted " +
        "save or wrong path")
    require(meta(0).getString(0) == binFingerprint,
      s"$verb: stored packing spec ${meta(0).getString(0)} does " +
        s"not match this library's ($binFingerprint) — the store was " +
        "written by a different layout; repack instead of searching it")
    val stamps = codes.select("fp").distinct().collect()
      .map(_.getString(0)).toSeq
    require(stamps == Seq(binFingerprint),
      s"$verb: code rows carry spec stamps ${stamps.mkString(", ")} " +
        s"— the store at $where mixes packings or is corrupt")
  }

  /** DELETE verb of the binary-store lifecycle: tombstone `ids`(vec_id),
    * masked out of every subsequent [[binLoadIndex]]; sticky across a
    * replayed [[binAppendCodes]].
    */
  def binDeleteVectors(ids: org.apache.spark.sql.DataFrame, path: String): Unit = {
    require(ids.sparkSession.read.parquet(s"$path/meta")
        .select("fp").take(1).nonEmpty,
      s"binDeleteVectors: meta store at $path/meta is empty — nothing " +
        "to delete from")
    graft.operators.IndexTombstones.append(ids, path)
  }

  /** Restores a persisted binary index: the spec row is checked against
    * this library's packing spec (version/layout skew fails here, not as
    * silently wrong distances), and every code row's stamp is checked
    * like the IVF cells — a store spliced together from two spec
    * versions fails loudly.
    */
  def binLoadIndex(spark: org.apache.spark.sql.SparkSession, path: String)
      : org.apache.spark.sql.DataFrame = {
    val codes = spark.read.parquet(s"$path/codes")
    binGateLoaded(spark.read.parquet(s"$path/meta").select("fp").take(1),
      codes, "binLoadIndex", path)
    graft.operators.IndexTombstones.mask(codes, path)
  }

  // ------------------------------------------------------------------
  // MANIFEST-COMMITTED binary store — the sign-code family on the
  // rename-free protocol (the q201 template with NO trained artifact:
  // the packing is a fixed spec, so the meta row guards FORMAT skew,
  // not foreign training). Gates shared with the rename family
  // ([[binSaveChecked]]/[[binGateLoaded]]); semantics identical —
  // sticky tombstones until compact, `asOf` time travel free.
  // ------------------------------------------------------------------

  /** Build the manifest-committed binary store: ONE revision commits
    * the spec row and the packed codes together.
    */
  def binSaveIndexVersioned(codes: org.apache.spark.sql.DataFrame,
      path: String,
      extra: Map[String, org.apache.spark.sql.DataFrame] = Map.empty): Long = {
    binSaveChecked(codes, "binSaveIndexVersioned")
    graft.operators.VersionedStore.save(Map(
      "meta" -> binMetaRow(codes.sparkSession).coalesce(1),
      "codes" -> codes) ++ extra, path)
  }

  /** Restore the visible (or `asOf`) code set through the SAME gates
    * as [[binLoadIndex]].
    */
  def binLoadIndexVersioned(spark: org.apache.spark.sql.SparkSession,
      path: String, asOf: Option[Long] = None)
      : org.apache.spark.sql.DataFrame = {
    val codes = graft.operators.VersionedStore.read(spark, path, "codes",
      asOf)
    binGateLoaded(
      graft.operators.VersionedStore.read(spark, path, "meta", asOf)
        .select("fp").take(1),
      codes, "binLoadIndexVersioned", path)
    codes
  }

  /** APPEND: pack the batch (spec-checked against the store's meta
    * row), idempotent on vec_id against the visible code set, committed
    * as a delta revision. Zero-fresh batches commit nothing.
    */
  def binAppendCodesVersioned(emb: org.apache.spark.sql.DataFrame,
      path: String): Long = {
    val spark = emb.sparkSession
    val existing = binLoadIndexVersioned(spark, path)
    val fresh = binCodes(
      emb.join(existing.select("vec_id").distinct(), Seq("vec_id"),
        "left_anti")).localCheckpoint(true)
    if (fresh.isEmpty)
      graft.operators.VersionedStore.currentVersion(spark, path).get
    else
      graft.operators.VersionedStore.append(Map("codes" -> fresh), path)
  }

  /** DELETE: one manifest tombstone revision on `codes`. Idempotent;
    * sticky for a re-appended same vec_id until compact.
    */
  def binDeleteVectorsVersioned(ids: org.apache.spark.sql.DataFrame,
      path: String): Long =
    graft.operators.VersionedStore.delete(ids.select("vec_id"), "codes",
      path)

  /** Hamming candidate search over the store's visible (or `asOf`)
    * revision — [[binHammingSearch]]'s exact plan.
    */
  def binHammingSearchVersioned(spark: org.apache.spark.sql.SparkSession,
      queries: org.apache.spark.sql.DataFrame, path: String,
      topR: Int = 25, excludeSelfMatches: Boolean = false,
      asOf: Option[Long] = None): org.apache.spark.sql.DataFrame =
    binHammingSearch(binLoadIndexVersioned(spark, path, asOf), queries,
      topR, excludeSelfMatches)

  /** SYNC with a versioned embedding corpus — the [[pqSyncVersionedWithStore]]
    * dance with no trained artifact to freeze: bootstrap packs
    * read(current); every later call absorbs the pending window as ONE
    * commitDelta; replays are no-ops.
    */
  def binSyncVersionedWithStore(spark: org.apache.spark.sql.SparkSession,
      storePath: String, rel: String, path: String,
      retain: Option[Int] = None): Option[(Long, Long)] =
    graft.operators.CdcBridge.sync(spark, storePath, path,
      "binSyncVersionedWithStore", retain)(
      graft.operators.VersionedStore.currentVersion(spark, path).isDefined)(
      cur => {
        val e = graft.operators.VersionedStore
          .read(spark, storePath, rel, Some(cur)).select("vec_id", "v")
        binSaveIndexVersioned(binCodes(e), path)
      })(
      (from, to) =>
        graft.operators.CdcBridge.maintainAtomic(spark, storePath, rel,
          from, to, "vec_id", Seq("vec_id", "v"),
          "binSyncVersionedWithStore") { (del, ins) =>
          val existing = binLoadIndexVersioned(spark, path)
          val appends = ins.map(e => binCodes(
              e.join(existing.select("vec_id").distinct(), Seq("vec_id"),
                "left_anti")).localCheckpoint(true))
            .filterNot(_.isEmpty)
            .map(f => Map("codes" -> f))
            .getOrElse(Map.empty[String, org.apache.spark.sql.DataFrame])
          val deletes = del.map(k =>
              Map("codes" -> k.select("vec_id")))
            .getOrElse(Map.empty[String, org.apache.spark.sql.DataFrame])
          if (appends.nonEmpty || deletes.nonEmpty)
            graft.operators.VersionedStore.commitDelta(appends, deletes,
              path)
          ()
        })

  /** The APPEND verb of the binary-store lifecycle: pack a new batch and
    * append, idempotent on vec_id (the retried-append guard the PQ/IVF
    * stores carry — duplicate code rows would surface the same vector
    * twice in every candidate list).
    */
  def binAppendCodes(emb: org.apache.spark.sql.DataFrame, path: String): Unit = {
    val spark = emb.sparkSession
    val meta = spark.read.parquet(s"$path/meta").select("fp").take(1)
    require(meta.nonEmpty,
      s"binAppendCodes: meta store at $path/meta is empty — save the " +
        "index first (binSaveIndex)")
    require(meta(0).getString(0) == binFingerprint,
      s"binAppendCodes: stored packing spec ${meta(0).getString(0)} does " +
        s"not match this library's ($binFingerprint) — an increment " +
        "packed under a different layout would corrupt every distance")
    val existing = spark.read.parquet(s"$path/codes").select("vec_id").distinct()
    binCodes(emb.join(existing, Seq("vec_id"), "left_anti"))
      .write.mode("append").parquet(s"$path/codes")
  }

  /** Hamming candidate search over PERSISTED sign codes: `queries`
    * (qid, qv) are external full-dimension vectors, packed on the fly
    * and broadcast; the corpus side is ONLY its 16-byte code rows — the
    * raw vectors never rescan (the ADC move applied to the binary
    * family). Returns the exact Hamming top-`topR` per query via
    * [[graft.operators.GroupTopK]] with the rank as `hrank`; the caller
    * reranks the survivors against full-precision vectors exactly as
    * q128 does inline (recall@5 == candidate recall — the rerank is
    * lossless past this stage, so topR is the only recall knob;
    * measured sweep in SCALING.md). `excludeSelfMatches` only when
    * queries are corpus members.
    */
  def binHammingSearch(codes: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame,
      topR: Int = 25,
      excludeSelfMatches: Boolean = false): org.apache.spark.sql.DataFrame = {
    val packedQ = binCodes(queries.select(col("qid").as("vec_id"),
        col("qv").as("v")))
      .select(col("vec_id").as("qid"), col("w0").as("qw0"),
        col("w1").as("qw1"))
    val pairs = codes.select("vec_id", "w0", "w1")
      .join(broadcast(packedQ),
        if (excludeSelfMatches) col("vec_id") =!= col("qid") else lit(true))
      .select(col("qid"), col("vec_id"),
        expr("CAST(bit_count(w0 ^ qw0) + bit_count(w1 ^ qw1) AS INT)")
          .as("hamming"))
    graft.operators.GroupTopK.topK(pairs, Seq(col("qid")),
      Seq(col("hamming").asc, col("vec_id").asc), col("vec_id"), topR,
      rankName = "hrank")
  }

  /** Diversity-balanced subset selection — semantic stratified sampling:
    * assign every vector to a coarse quantizer cell (the q62/q101
    * k-means), then draw an EQUAL per-cell quota in deterministic
    * hash order. Metadata-stratified sampling (q67) balances over
    * sources; this balances over the embedding space itself, so the
    * sample covers sparse semantic regions instead of reproducing the
    * corpus's density skew — the cluster-balanced selection step used
    * to diversify fine-tuning and eval subsets. The md5 hash order
    * within a cell is a uniform deterministic draw (the q67 move
    * applied inside quantizer cells).
    *
    * Scale design: cell assignment is one broadcast-centroid scan
    * (map-only); the per-cell quota runs through the exact two-stage
    * [[graft.operators.GroupTopK]] because a cell is corpus/k sized —
    * partitioning a rank window on the cell alone would funnel whole
    * cells through single tasks (the q105 lesson). Cell sizes come from
    * an 8-row aggregate broadcast back onto the quota rows, never from
    * a count window over cell-sized partitions.
    */
  private val q131 = QueryDef(
    "q131_diverse_sample",
    (s, d) => {
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val cents = kmeansCentroids(e)
      // 2-long-column assignment relation feeding TWO consumers (sizes +
      // the quota draw) — checkpointed so the broadcast argmax over the
      // full embedding corpus runs once (the q101 cells discipline);
      // 16 B/row is far below the vector payload it avoids re-scanning
      val cells = nearestCentroid(e, cents)
        .select(col("vec_id"), col("cid").as("cell"))
        .localCheckpoint(true)
      val sizes = cells.groupBy("cell").agg(count(lit(1)).as("n_cell"))
      graft.operators.GroupTopK.topK(
          cells.withColumn("h",
            md5(concat(lit("divs:"), col("vec_id").cast("string")))),
          Seq(col("cell")), Seq(col("h").asc, col("vec_id").asc),
          col("vec_id"), 10)
        .join(broadcast(sizes), "cell")
        .select("cell", "rank", "vec_id", "n_cell")
        .orderBy("cell", "rank")
    },
    Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                        FROM embeddings),
                  ${kmeansSql()},
                  cells AS (${nearestSql("e", "cents3", byL2 = false,
                    "vec_id, cid AS cell")}),
                  sizes AS (SELECT cell, COUNT(*) AS n_cell FROM cells
                            GROUP BY cell),
                  hashed AS (SELECT cell, vec_id,
                               md5('divs:' || CAST(vec_id AS VARCHAR)) AS h
                             FROM cells)
             SELECT cell, rank, vec_id, n_cell FROM (
               SELECT cell, vec_id,
                      ROW_NUMBER() OVER (PARTITION BY cell
                        ORDER BY h ASC, vec_id ASC) AS rank
               FROM hashed) r JOIN sizes USING (cell)
             WHERE rank <= 10 ORDER BY cell, rank"""))

  /** The composed curation pipeline — fluency gate (q129) → DSIR
    * domain-matched quota (q130) → diversity-balanced draw (q131) as ONE
    * query, proving the three selection stages compose on a single scan
    * topology (CorpusPipelineSpec establishes the same for the dedup
    * family). A real pretraining curation run chains exactly these
    * stages; composing them per-stage-materialized would re-tokenize the
    * corpus once per gate.
    *
    * Scale shape: all trained artifacts stay bounded and broadcast —
    * the fluency vocabulary (top-V TakeOrdered), the DSIR raw/target
    * vocabulary, the 1-row totals frame, the k coarse centroids. BOTH
    * token statistics (fluency improbability, DSIR importance) come off
    * the SAME exploded-token scoring scan with map-side partial
    * aggregation — the corpus is tokenized ONCE for both gates, the
    * whole point of the composition. The per-source quota and the
    * per-cell draw run through the exact two-stage
    * [[graft.operators.GroupTopK]]; the cell assignment joins the
    * bounded survivor set INTO the cells relation broadcast, so nothing
    * corpus-sized ever shuffles on a low-cardinality key.
    */
  private val q132 = QueryDef(
    "q132_curation_pipeline",
    (s, d) => {
      import graft.functions.TextFunctions.tokens
      val docs = Tables(s, d, "documents")
      val v = 2000
      val toks = tokens(col("text"))
      // bounded artifacts (TakeOrdered / tiny aggregates, all broadcast).
      // ONE tokenization pass feeds every trained artifact: the r14 move —
      // the raw/train/target counts are per-token aggregates of the SAME
      // exploded scan (train = en rows, target = src0 rows), so the three
      // vocabularies and the totals frame that used to cost six corpus
      // tokenizations are derived from one vocabulary-sized relation
      // (checkpointed: distinct-token-sized, far below corpus size).
      val tokStats = docs.select(col("lang"), col("source"),
          explode(toks).as("tok"))
        .groupBy("tok")
        .agg(count(lit(1)).as("cr"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("cnt"),
          sum(when(col("source") === "src0", 1L).otherwise(0L)).as("ct"))
        .localCheckpoint(true)
      // cnt > 0 keeps fVocab identical to the en-only aggregate it
      // replaces: a zero-count row would otherwise join as cnt=0 (not
      // NULL) and flip the oov flag
      val fVocab = tokStats.filter(col("cnt") > 0).select("tok", "cnt")
        .orderBy(col("cnt").desc, col("tok").asc).limit(v)
      val dVocab = tokStats.select("tok", "cr", "ct")
        .orderBy(col("cr").desc, col("tok").asc).limit(v)
      val totals = tokStats.agg(
        coalesce(sum("cnt"), lit(0L)).as("n_train"),
        coalesce(sum("cr"), lit(0L)).as("nr"),
        coalesce(sum("ct"), lit(0L)).as("nt"))
      // ONE corpus tokenization scoring BOTH gates (ratio expressions
      // verbatim from q129/q130 so the stats stay hash-identical)
      val scored = docs.select(col("doc_id"), col("source"),
          explode(toks).as("tok"))
        .join(broadcast(fVocab), Seq("tok"), "left")
        .join(broadcast(dVocab), Seq("tok"), "left")
        .crossJoin(broadcast(totals))
        .withColumn("fratio",
          (col("n_train") + lit(v + 1)).cast("double") /
            (coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double"))
        .withColumn("oov", when(col("cnt").isNull, 1L).otherwise(0L))
        .withColumn("dratio",
          ((coalesce(col("ct"), lit(0L)) + lit(1L)) *
            (col("nr") + lit(v + 1))).cast("double") /
            ((coalesce(col("cr"), lit(0L)) + lit(1L)) *
              (col("nt") + lit(v + 1))).cast("double"))
        .groupBy("doc_id", "source")
        .agg(count(lit(1)).as("n_toks"), sum(col("oov")).as("n_oov"),
          Exact.davg(col("fratio")).as("improb"),
          Exact.davg(col("dratio")).as("importance"))
      // stage 1 — fluency gate (q129's keep predicate)
      val fluent = scored.filter(col("n_oov") * lit(5) <= col("n_toks"))
      // stage 2 — DSIR per-source quota over the GATED survivors
      val quota = graft.operators.GroupTopK.topK(fluent, Seq(col("source")),
          Seq(col("importance").desc, col("doc_id").asc), col("doc_id"), 10)
        .select("doc_id", "source", "improb", "importance")
      // stage 3 — diversity-balanced draw over the survivors' embeddings
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val cells = nearestCentroid(e, kmeansCentroids(e))
        .select(col("vec_id"), col("cid").as("cell"))
      val surv = cells.join(broadcast(quota),
          col("vec_id") === col("doc_id"))
        .select(col("cell"), col("doc_id"), col("source"), col("improb"),
          col("importance"))
      graft.operators.GroupTopK.topK(
          surv.withColumn("h",
            md5(concat(lit("cur:"), col("doc_id").cast("string")))),
          Seq(col("cell")), Seq(col("h").asc, col("doc_id").asc),
          col("doc_id"), 5)
        .select("cell", "rank", "doc_id", "source", "improb", "importance")
        .orderBy("cell", "rank")
    },
    Some {
      val tokSql = "regexp_extract_all(lower(text), '[a-z0-9]+')"
      s"""WITH rawtok AS (SELECT doc_id, source, unnest($tokSql) AS tok
                          FROM documents),
               ttok AS (SELECT unnest($tokSql) AS tok FROM documents
                        WHERE lang = 'en'),
               tgttok AS (SELECT unnest($tokSql) AS tok FROM documents
                          WHERE source = 'src0'),
               fvocab AS (SELECT tok, cnt FROM (
                            SELECT tok, COUNT(*) AS cnt FROM ttok
                            GROUP BY tok
                            ORDER BY cnt DESC, tok ASC LIMIT 2000)),
               dvocab AS (SELECT tok, cr,
                            CAST(COALESCE(ct, 0) AS BIGINT) AS ct
                          FROM (SELECT tok, COUNT(*) AS cr FROM rawtok
                                GROUP BY tok
                                ORDER BY COUNT(*) DESC, tok ASC LIMIT 2000) rv
                          LEFT JOIN (SELECT tok, COUNT(*) AS ct FROM tgttok
                                     GROUP BY tok) tc USING (tok)),
               tot AS (SELECT (SELECT COUNT(*) FROM ttok) AS n_train,
                              (SELECT COUNT(*) FROM rawtok) AS nr,
                              (SELECT COUNT(*) FROM tgttok) AS nt),
               scored AS (SELECT doc_id, source, COUNT(*) AS n_toks,
                            CAST(SUM(oov) AS BIGINT) AS n_oov,
                            ${Exact.sqlDavg("fratio")} AS improb,
                            ${Exact.sqlDavg("dratio")} AS importance
                          FROM (SELECT doc_id, source,
                                  CAST(n_train + 2001 AS DOUBLE)
                                    / CAST(COALESCE(cnt, 0) + 1 AS DOUBLE)
                                    AS fratio,
                                  CASE WHEN cnt IS NULL THEN 1 ELSE 0 END
                                    AS oov,
                                  CAST((COALESCE(ct, 0) + 1) * (nr + 2001)
                                    AS DOUBLE)
                                    / CAST((COALESCE(cr, 0) + 1) * (nt + 2001)
                                      AS DOUBLE) AS dratio
                                FROM rawtok LEFT JOIN fvocab USING (tok)
                                     LEFT JOIN dvocab USING (tok)
                                     CROSS JOIN tot) t
                          GROUP BY doc_id, source),
               fluent AS (SELECT * FROM scored WHERE 5 * n_oov <= n_toks),
               quota AS (SELECT doc_id, source, improb, importance FROM (
                           SELECT doc_id, source, improb, importance,
                             ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY importance DESC, doc_id ASC) AS rnk
                           FROM fluent) q WHERE rnk <= 10),
               e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                     FROM embeddings),
               ${kmeansSql()},
               cells AS (${nearestSql("e", "cents3", byL2 = false,
                 "vec_id, cid AS cell")}),
               surv AS (SELECT cell, doc_id, source, improb, importance,
                          md5('cur:' || CAST(doc_id AS VARCHAR)) AS h
                        FROM quota JOIN cells ON quota.doc_id = cells.vec_id)
          SELECT cell, rank, doc_id, source, improb, importance FROM (
            SELECT cell, doc_id, source, improb, importance,
                   ROW_NUMBER() OVER (PARTITION BY cell
                     ORDER BY h ASC, doc_id ASC) AS rank
            FROM surv) r
          WHERE rank <= 5 ORDER BY cell, rank"""
    })

  /** Graph-expanded ANN search — the NSW/HNSW refinement at one hop,
    * composed from two persisted artifacts: a cheap base probe (q128's
    * Hamming candidates, here deliberately shallow at R = 8) expanded
    * through the kNN-list store ([[graphExpandCandidates]]: each
    * candidate pulls in its stored top-3 neighbors), then ONE exact
    * rerank over the expanded set. The expansion recovers true
    * neighbors the shallow probe missed — "a neighbor of my near
    * neighbor is probably near" — at list-join cost instead of a deeper
    * corpus scan; `via` marks which survivors only the graph found (the
    * per-row provenance of the recall gain, measured against brute truth
    * in KnnStoreSpec).
    *
    * Scale shape: base candidates are the q128 machinery (broadcast
    * queries, 16-byte integer scan, two-stage GroupTopK); the expansion
    * join is |base| × out-degree ≤ 8·3 extra rows per query against the
    * (aid)-keyed lists — never corpus-shaped; the rerank window sees ≤
    * 32 rows per query. The demo graph is [[bruteTopLists]] on the
    * bounded vec_id < 300 subset; in production the lists come from
    * [[knnLoadLists]] and the composition is unchanged.
    */
  private val q147 = QueryDef(
    "q147_graph_expanded_ann",
    (s, d) => {
      val e = knnSubset(s, d)
      val packed = e.select(col("vec_id"), col("v"),
        signLane(0).as("w0"), signLane(32).as("w1"))
      val q = packed.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("w0").as("qw0"), col("w1").as("qw1"))
      val ham = packed.join(broadcast(q), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          expr("CAST(bit_count(w0 ^ qw0) + bit_count(w1 ^ qw1) AS INT)")
            .as("hamming"))
      val base = graft.operators.GroupTopK.topK(ham, Seq(col("qid")),
          Seq(col("hamming").asc, col("vec_id").asc), col("vec_id"), 8,
          rankName = "hrank")
        .select("qid", "vec_id").localCheckpoint(true)
      val lists = bruteTopLists(e, 3)
      val expanded = graphExpandCandidates(base, lists)
      val rr = expanded
        .join(e, Seq("vec_id"))
        .join(broadcast(q.select(col("qid"), col("qv"))), Seq("qid"))
        .join(base.withColumn("in_base", lit(true)),
          Seq("qid", "vec_id"), "left")
        .select(col("qid"), col("vec_id"),
          cosine(col("qv"), col("v")).as("cos_sim"),
          when(col("in_base").isNotNull, lit("base")).otherwise(lit("graph"))
            .as("via"))
      // candidate-bounded window (<= 32 rows per query by construction)
      val wr = Window.partitionBy("qid")
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
      rr.withColumn("rank", row_number().over(wr))
        .filter(col("rank") <= 5)
        .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"),
          col("rank"), col("cos_sim"), col("via"))
        .orderBy("query_id", "rank")
    },
    Some(knnExpandOracleSql))

  /** q205: q147's graph-expanded search with the lists served from the
    * MANIFEST-COMMITTED kNN store driven through its full maintenance
    * cycle — bootstrap save of the old anchors' lists, a delta-revision
    * append of the new batch's lists, and the single-PUT re-knit that
    * repairs the old anchors' staleness. Because re-knit is proven
    * byte-equal to the full rebuild (VersionedKnnSpec), the maintained
    * store's lists equal `bruteTopLists` over the whole corpus and the
    * oracle is q147's SQL VERBATIM — the maintenance protocol must be
    * invisible to every graph consumer.
    */
  private val q205 = QueryDef(
    "q205_versioned_knn_expand",
    (s, d) => {
      val e = knnSubset(s, d)
      val inc = e.filter(col("vec_id") < 20).select("vec_id")
      val old = e.filter(col("vec_id") >= 20)
      if (old.isEmpty)
        e.select(col("vec_id").as("query_id"),
          col("vec_id").as("neighbor_id"), lit(1).as("rank"),
          lit(0.0).as("cos_sim"), lit("base").as("via")).limit(0)
      else
        withThrowawayStore { idx =>
          graft.BenchPhases.build {
            knnSaveListsVersioned(bruteTopLists(old, 3), 3, "brute-cos",
              idx)
            knnAppendListsVersioned(
              bruteListsForAnchors(e, inc, 3), "brute-cos", idx)
            knnReknitVersioned(e, inc, idx)
          }
          val lists = knnLoadListsVersioned(s, idx)._1
            .localCheckpoint(true)
          val packed = e.select(col("vec_id"), col("v"),
            signLane(0).as("w0"), signLane(32).as("w1"))
          val q = packed.filter(col("vec_id") < 5)
            .select(col("vec_id").as("qid"), col("v").as("qv"),
              col("w0").as("qw0"), col("w1").as("qw1"))
          val ham = packed.join(broadcast(q), col("vec_id") =!= col("qid"))
            .select(col("qid"), col("vec_id"),
              expr("CAST(bit_count(w0 ^ qw0) + bit_count(w1 ^ qw1) AS INT)")
                .as("hamming"))
          val base = graft.operators.GroupTopK.topK(ham, Seq(col("qid")),
              Seq(col("hamming").asc, col("vec_id").asc), col("vec_id"), 8,
              rankName = "hrank")
            .select("qid", "vec_id").localCheckpoint(true)
          val expanded = graphExpandCandidates(base, lists)
          val rr = expanded
            .join(e, Seq("vec_id"))
            .join(broadcast(q.select(col("qid"), col("qv"))), Seq("qid"))
            .join(base.withColumn("in_base", lit(true)),
              Seq("qid", "vec_id"), "left")
            .select(col("qid"), col("vec_id"),
              cosine(col("qv"), col("v")).as("cos_sim"),
              when(col("in_base").isNotNull, lit("base"))
                .otherwise(lit("graph")).as("via"))
          val wr = Window.partitionBy("qid")
            .orderBy(col("cos_sim").desc, col("vec_id").asc)
          rr.withColumn("rank", row_number().over(wr))
            .filter(col("rank") <= 5)
            .select(col("qid").as("query_id"),
              col("vec_id").as("neighbor_id"), col("rank"),
              col("cos_sim"), col("via"))
            .orderBy("query_id", "rank")
        }(s)
    },
    Some(knnExpandOracleSql))

  private lazy val knnExpandOracleSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                        FROM embeddings WHERE vec_id < 300),
                  packed AS (SELECT vec_id, v, ${signLaneSql(0)} AS w0,
                               ${signLaneSql(32)} AS w1 FROM e),
                  q AS (SELECT vec_id AS qid, v AS qv, w0 AS qw0, w1 AS qw1
                        FROM packed WHERE vec_id < 5),
                  ham AS (SELECT qid, vec_id,
                            CAST(bit_count(xor(w0, qw0))
                              + bit_count(xor(w1, qw1)) AS INTEGER) AS hamming
                          FROM packed CROSS JOIN q WHERE vec_id <> qid),
                  base AS (SELECT qid, vec_id FROM (
                             SELECT qid, vec_id,
                               ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY hamming ASC, vec_id ASC) AS hrank
                             FROM ham) h WHERE hrank <= 8),
                  p AS (SELECT a.vec_id AS aid, b.vec_id AS bid,
                          ${cosSql("a.v", "b.v")} AS sim
                        FROM e a CROSS JOIN e b WHERE a.vec_id <> b.vec_id),
                  t AS (SELECT aid, bid FROM (
                          SELECT aid, bid,
                            ROW_NUMBER() OVER (PARTITION BY aid
                              ORDER BY sim DESC, bid ASC) AS rn
                          FROM p) r WHERE rn <= 3),
                  expd AS (SELECT DISTINCT qid, vec_id FROM (
                             SELECT qid, vec_id FROM base
                             UNION ALL
                             SELECT base.qid, t.bid AS vec_id
                             FROM base JOIN t ON base.vec_id = t.aid) u
                           WHERE vec_id <> qid),
                  rr AS (SELECT expd.qid, expd.vec_id,
                           ${cosSql("q.qv", "e.v")} AS cos_sim,
                           CASE WHEN base.vec_id IS NOT NULL THEN 'base'
                                ELSE 'graph' END AS via
                         FROM expd
                         JOIN e ON expd.vec_id = e.vec_id
                         JOIN q ON expd.qid = q.qid
                         LEFT JOIN base ON expd.qid = base.qid
                           AND expd.vec_id = base.vec_id)
             SELECT qid AS query_id, vec_id AS neighbor_id, rank, cos_sim,
                    via
             FROM (SELECT qid, vec_id, cos_sim, via,
                     ROW_NUMBER() OVER (PARTITION BY qid
                       ORDER BY cos_sim DESC, vec_id ASC) AS rank
                   FROM rr) r
             WHERE rank <= 5 ORDER BY query_id, rank"""

  /** Binary-ANN recall audit — q99's measure-before-you-trust discipline
    * applied to the vector index: candidate recall of the Hamming top-25
    * against brute-cosine top-5 ground truth, as ONE summary row an
    * operator reads before pointing a retrieval pipeline at the code
    * store (the rerank is lossless past the candidate stage, so
    * candidate recall IS search recall — the q128 scaladoc's claim,
    * here monitored as a query). Truth is quadratic by nature, so both
    * sides run over the bounded vec_id < 300 subset with 10 query
    * vectors — the production form samples queries the same way.
    */
  private val q148 = QueryDef(
    "q148_bin_recall_audit",
    (s, d) => {
      val e = knnSubset(s, d)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), cosine(col("qv"), col("v")).as("sim"))
      val wt = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id").asc)
      val truth = scored.withColumn("rn", row_number().over(wt))
        .filter(col("rn") <= 5).select("qid", "vec_id")
      val packed = e.select(col("vec_id"), signLane(0).as("w0"),
        signLane(32).as("w1"))
      val pq = packed.join(q.select("qid"), col("vec_id") === col("qid"))
        .select(col("qid"), col("w0").as("qw0"), col("w1").as("qw1"))
      val ham = packed.join(broadcast(pq), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          expr("CAST(bit_count(w0 ^ qw0) + bit_count(w1 ^ qw1) AS INT)")
            .as("hamming"))
      val cand = graft.operators.GroupTopK.topK(ham, Seq(col("qid")),
          Seq(col("hamming").asc, col("vec_id").asc), col("vec_id"), 25,
          rankName = "hrank")
        .select("qid", "vec_id")
      cand.withColumn("in_cand", lit(1L))
        .join(truth.withColumn("in_truth", lit(1L)),
          Seq("qid", "vec_id"), "full_outer")
        .agg(coalesce(sum(coalesce(col("in_cand"), lit(0L))), lit(0L))
            .as("n_candidates"),
          coalesce(sum(coalesce(col("in_truth"), lit(0L))), lit(0L))
            .as("n_truth"),
          coalesce(sum(when(col("in_cand").isNotNull
            && col("in_truth").isNotNull, 1L).otherwise(0L)), lit(0L))
            .as("n_hit"))
        .select(col("n_candidates"), col("n_truth"), col("n_hit"),
          (col("n_hit").cast("double") /
            greatest(col("n_truth"), lit(1L)).cast("double")).as("recall"))
    },
    Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                        FROM embeddings WHERE vec_id < 300),
                  q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
                  truth AS (SELECT qid, vec_id FROM (
                              SELECT qid, e.vec_id,
                                ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY ${cosSql("qv", "v")} DESC,
                                           e.vec_id ASC) AS rn
                              FROM e CROSS JOIN q WHERE e.vec_id <> qid) t
                            WHERE rn <= 5),
                  packed AS (SELECT vec_id, ${signLaneSql(0)} AS w0,
                               ${signLaneSql(32)} AS w1 FROM e),
                  pq AS (SELECT qid, w0 AS qw0, w1 AS qw1
                         FROM packed JOIN q ON packed.vec_id = q.qid),
                  cand AS (SELECT qid, vec_id FROM (
                             SELECT pq.qid, packed.vec_id,
                               ROW_NUMBER() OVER (PARTITION BY pq.qid
                                 ORDER BY bit_count(xor(w0, qw0))
                                   + bit_count(xor(w1, qw1)) ASC,
                                   packed.vec_id ASC) AS hrank
                             FROM packed CROSS JOIN pq
                             WHERE packed.vec_id <> pq.qid) h
                           WHERE hrank <= 25),
                  m AS (SELECT
                          (SELECT COUNT(*) FROM cand) AS n_candidates,
                          (SELECT COUNT(*) FROM truth) AS n_truth,
                          (SELECT COUNT(*) FROM cand JOIN truth
                             ON cand.qid = truth.qid
                             AND cand.vec_id = truth.vec_id) AS n_hit)
             SELECT CAST(n_candidates AS BIGINT) AS n_candidates,
                    CAST(n_truth AS BIGINT) AS n_truth,
                    CAST(n_hit AS BIGINT) AS n_hit,
                    CAST(n_hit AS DOUBLE)
                      / CAST(GREATEST(n_truth, 1) AS DOUBLE) AS recall
             FROM m"""))

  /** Cluster-assignment quality audit over the k-means cells every
    * coarse-quantized consumer shares (IVF probing, SemDeDup cells,
    * diversity strata): per cell, how COHESIVE its members are (mean
    * cosine to the own centroid) and how AMBIGUOUS its boundary is
    * (mean margin to the runner-up centroid; members with margin <
    * 0.05 counted as boundary vectors). A crowded/overlapping cell pair
    * shows up as low margins and a fat boundary count — the signal to
    * raise k or nprobe BEFORE recall degrades silently (q148 measures
    * the symptom; this measures the cause). Means are integer-exact
    * (floor ×1e6 BIGINT sums, one final division — the q110/q137
    * discipline, since cosines are not 4-decimal-exact).
    *
    * Scale shape: centroids broadcast (8 rows); per-vector affinities
    * are a map-side 8-row fold; own/runner-up extraction is a bounded
    * window over 8 rows per vector; the report is one #cells-row
    * aggregate with map-side partials. Nothing corpus-sized shuffles.
    */
  private val q149 = QueryDef(
    "q149_cluster_quality",
    (s, d) => {
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val cents = kmeansCentroids(e)
      val aff = e.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cid"),
          cosine(col("v"), col("cv")).as("aff"))
      val wa = Window.partitionBy("vec_id")
        .orderBy(col("aff").desc, col("cid").asc)
      val ranked = aff.withColumn("crn", row_number().over(wa))
        .filter(col("crn") <= 2)
      // own-cell and runner-up in ONE conditional aggregation — an
      // own/runner self-join would evaluate the affinity scan twice and
      // plan a corpus-sized shuffle join (caught by the plan lock)
      val per = ranked.groupBy("vec_id").agg(
        max(when(col("crn") === 1, col("cid"))).as("cell"),
        max(when(col("crn") === 1, col("aff"))).as("a"),
        max(when(col("crn") === 2, col("aff"))).as("b"))
      per
        .select(col("cell"),
          floor(col("a") * lit(1e6)).cast("long").as("qa"),
          floor((col("a") - col("b")) * lit(1e6)).cast("long").as("qm"))
        .groupBy("cell")
        .agg(count(lit(1)).as("n"),
          sum("qa").as("sa"), sum("qm").as("sm"),
          sum(when(col("qm") < 50000L, 1L).otherwise(0L)).as("n_boundary"))
        .select(col("cell"), col("n"),
          (col("sa").cast("double") / col("n").cast("double") / lit(1e6))
            .as("mean_cohesion"),
          (col("sm").cast("double") / col("n").cast("double") / lit(1e6))
            .as("mean_margin"),
          col("n_boundary"))
        .orderBy("cell")
    },
    Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                        FROM embeddings),
                  ${kmeansSql()},
                  aff AS (SELECT vec_id, cid, ${cosSql("v", "cv")} AS aff
                          FROM e CROSS JOIN cents3),
                  ranked AS (SELECT vec_id, cid, aff,
                               ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY aff DESC, cid ASC) AS crn
                             FROM aff),
                  own AS (SELECT vec_id, cid AS cell, aff AS a
                          FROM ranked WHERE crn = 1),
                  runner AS (SELECT vec_id, aff AS b
                             FROM ranked WHERE crn = 2),
                  j AS (SELECT cell,
                          CAST(floor(a * 1e6) AS BIGINT) AS qa,
                          CAST(floor((a - b) * 1e6) AS BIGINT) AS qm
                        FROM own JOIN runner ON own.vec_id = runner.vec_id)
             SELECT cell, COUNT(*) AS n,
                    CAST(SUM(qa) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e6
                      AS mean_cohesion,
                    CAST(SUM(qm) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e6
                      AS mean_margin,
                    CAST(SUM(CASE WHEN qm < 50000 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_boundary
             FROM j GROUP BY cell ORDER BY cell"""))

  /** q158: q147's graph expansion taken to depth — a SHALLOWER Hamming
    * probe (top-4 vs q147's top-8) beam-expanded TWO hops through the
    * stored kNN lists ([[graphExpandMultiHop]], beam 8). The point the
    * query pins: depth recovers what probe width gave up — half the
    * probe candidates, yet the 2-hop frontier reaches neighbors the
    * 1-hop expansion of the wider probe misses (the measured curve is
    * in KnnStoreSpec; this query pins the exact arithmetic against the
    * engine twin). `hop` says where each survivor was first discovered
    * — the beam's provenance, the multi-hop analogue of q147's `via`.
    *
    * Scale: every hop is frontier×k then beam-capped — depth never
    * compounds the join size (the closure explosion the cap exists to
    * prevent); the final rerank window is ≤ 4+2·8 rows per query.
    */
  private val q158 = QueryDef(
    "q158_multihop_ann",
    (s, d) => {
      val e = knnSubset(s, d)
      val packed = e.select(col("vec_id"), col("v"),
        signLane(0).as("w0"), signLane(32).as("w1"))
      val q = packed.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("w0").as("qw0"), col("w1").as("qw1"))
      val ham = packed.join(broadcast(q), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          expr("CAST(bit_count(w0 ^ qw0) + bit_count(w1 ^ qw1) AS INT)")
            .as("hamming"))
      val base = graft.operators.GroupTopK.topK(ham, Seq(col("qid")),
          Seq(col("hamming").asc, col("vec_id").asc), col("vec_id"), 4,
          rankName = "hrank")
        .select("qid", "vec_id")
      val visited = graphExpandMultiHop(base, bruteTopLists(e, 3), e,
        q.select("qid", "qv"), hops = 2, beam = 8)
      // candidate-bounded window (<= 20 rows per query by construction)
      val wr = Window.partitionBy("qid")
        .orderBy(col("sim").desc, col("vec_id").asc)
      visited.withColumn("rank", row_number().over(wr))
        .filter(col("rank") <= 5)
        .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"),
          col("rank"), col("sim").as("cos_sim"), col("hop"))
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                        FROM embeddings WHERE vec_id < 300),
                  packed AS (SELECT vec_id, v, ${signLaneSql(0)} AS w0,
                               ${signLaneSql(32)} AS w1 FROM e),
                  q AS (SELECT vec_id AS qid, v AS qv, w0 AS qw0, w1 AS qw1
                        FROM packed WHERE vec_id < 5),
                  ham AS (SELECT qid, vec_id,
                            CAST(bit_count(xor(w0, qw0))
                              + bit_count(xor(w1, qw1)) AS INTEGER) AS hamming
                          FROM packed CROSS JOIN q WHERE vec_id <> qid),
                  base AS (SELECT qid, vec_id FROM (
                             SELECT qid, vec_id,
                               ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY hamming ASC, vec_id ASC) AS hrank
                             FROM ham) h WHERE hrank <= 4),
                  p AS (SELECT a.vec_id AS aid, b.vec_id AS bid,
                          ${cosSql("a.v", "b.v")} AS sim
                        FROM e a CROSS JOIN e b WHERE a.vec_id <> b.vec_id),
                  t AS (SELECT aid, bid FROM (
                          SELECT aid, bid,
                            ROW_NUMBER() OVER (PARTITION BY aid
                              ORDER BY sim DESC, bid ASC) AS rn
                          FROM p) r WHERE rn <= 3),
                  v0 AS (SELECT base.qid, base.vec_id,
                           ${cosSql("q.qv", "e.v")} AS sim, 0 AS hop
                         FROM base JOIN e ON base.vec_id = e.vec_id
                         JOIN q ON base.qid = q.qid),
                  n1 AS (SELECT v0.qid, t.bid AS vec_id
                         FROM v0 JOIN t ON v0.vec_id = t.aid
                         WHERE t.bid <> v0.qid
                         EXCEPT SELECT qid, vec_id FROM v0),
                  s1 AS (SELECT n1.qid, n1.vec_id,
                           ${cosSql("q.qv", "e.v")} AS sim
                         FROM n1 JOIN e ON n1.vec_id = e.vec_id
                         JOIN q ON n1.qid = q.qid),
                  k1 AS (SELECT qid, vec_id, sim, 1 AS hop FROM (
                           SELECT qid, vec_id, sim,
                             ROW_NUMBER() OVER (PARTITION BY qid
                               ORDER BY sim DESC, vec_id ASC) AS br
                           FROM s1) b WHERE br <= 8),
                  v1 AS (SELECT * FROM v0 UNION ALL SELECT * FROM k1),
                  n2 AS (SELECT k1.qid, t.bid AS vec_id
                         FROM k1 JOIN t ON k1.vec_id = t.aid
                         WHERE t.bid <> k1.qid
                         EXCEPT SELECT qid, vec_id FROM v1),
                  s2 AS (SELECT n2.qid, n2.vec_id,
                           ${cosSql("q.qv", "e.v")} AS sim
                         FROM n2 JOIN e ON n2.vec_id = e.vec_id
                         JOIN q ON n2.qid = q.qid),
                  k2 AS (SELECT qid, vec_id, sim, 2 AS hop FROM (
                           SELECT qid, vec_id, sim,
                             ROW_NUMBER() OVER (PARTITION BY qid
                               ORDER BY sim DESC, vec_id ASC) AS br
                           FROM s2) b WHERE br <= 8),
                  v2 AS (SELECT * FROM v1 UNION ALL SELECT * FROM k2)
             SELECT qid AS query_id, vec_id AS neighbor_id, rank,
                    sim AS cos_sim, hop
             FROM (SELECT qid, vec_id, sim, hop,
                     ROW_NUMBER() OVER (PARTITION BY qid
                       ORDER BY sim DESC, vec_id ASC) AS rank
                   FROM v2) r
             WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** q196: the embedding corpus lives in a VERSIONED STORE and the
    * kNN-list graph store is maintained by CDC + SYNC — the graph family
    * completing the bridge discipline (q189 text, q192 vector, q193
    * signature, q194 winnow, q195 sync). The window exercises all three
    * CDC shapes: net-new appends (generator-routed lists, anchors
    * broadcast), deletes of BOOTSTRAP rows (vec_id % 8 = 1 — the
    * delete-repair path: their referencing anchors are recomputed
    * against the live corpus), and in-window append-then-delete rows
    * (vec_id % 8 = 7, netted away by the store before the index ever
    * sees them). Unlike the frozen-quantizer vector families, the exact
    * generator's maintained store is REBUILT-EQUAL even across delete
    * windows, so the oracle is the strongest possible: from-scratch
    * brute-force top-3 cosine lists over the FINAL visible corpus in
    * SQL — the maintained graph must be indistinguishable from never
    * having maintained at all.
    */
  private val q196 = QueryDef(
    "q196_cdc_knn_maintenance",
    (s, d) => {
      import graft.operators.VersionedStore
      val e = Tables(s, d, "embeddings").filter(col("vec_id") < 300)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val boot = e.filter(col("vec_id") % 4 =!= 3)
      if (boot.isEmpty)
        e.select(col("vec_id").as("aid"), col("vec_id").as("bid"),
          lit(0.0).as("sim"), lit(1).as("rn")).limit(0)
      else {
        val root = graft.BenchPhases.storeDir("graft-knncdc")
        val store = root + "/emb"
        val idx = root + "/knn"
        graft.BenchPhases.build {
          VersionedStore.save(Map("emb" -> boot), store)
          knnSyncWithStore(s, store, "emb", idx, k = 3) // bootstrap
          VersionedStore.append(
            Map("emb" -> e.filter(col("vec_id") % 4 === 3)), store)
          VersionedStore.delete(
            e.filter(col("vec_id") % 8 === 1 || col("vec_id") % 8 === 7)
              .select("vec_id"), "emb", store)
          knnSyncWithStore(s, store, "emb", idx, k = 3) // absorb the window
        }
        val res = knnLoadLists(s, idx)._1
          .select("aid", "bid", "sim", "rn")
          .orderBy("aid", "rn").localCheckpoint(true)
        graft.BenchPhases.discard(s, root)
        res
      }
    },
    Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                        FROM embeddings
                        WHERE vec_id < 300 AND vec_id % 8 NOT IN (1, 7)),
                  p AS (SELECT a.vec_id AS aid, b.vec_id AS bid,
                          ${cosSql("a.v", "b.v")} AS sim
                        FROM e a CROSS JOIN e b WHERE a.vec_id <> b.vec_id),
                  r AS (SELECT aid, bid, sim,
                          ROW_NUMBER() OVER (PARTITION BY aid
                            ORDER BY sim DESC, bid ASC) AS rn
                        FROM p)
             SELECT aid, bid, sim, rn FROM r WHERE rn <= 3
             ORDER BY aid, rn"""))

  override def defs: Seq[QueryDef] =
    Seq(q36, q37, q38, q62, q81, q101, q102, q107, q108, q111, q112, q142,
      q114, q116, q117, q119, q123, q127, q128, q131, q132, q147, q148,
      q149, q158, q196, q202, q203, q204, q205, q206)
}
