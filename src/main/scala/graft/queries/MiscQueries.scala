package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import Exact._

/** Grouping-set analytics (ROLLUP/CUBE/PIVOT), multimodal binary-column
  * plumbing, and sketch-based approximate aggregation.
  */
object MiscQueries extends QueryModule {

  /** Oracle twin of TextFunctions.tokens over the documents table. */
  private val tokSqlDocs = "regexp_extract_all(lower(text), '[a-z0-9]+')"

  /** ROLLUP: hierarchical subtotals + grand total. NULLS FIRST is explicit
    * in both engines (Spark's ASC default vs DuckDB's differ).
    */
  private val q43 = QueryDef(
    "q43_rollup",
    (s, d) => Tables(s, d, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
    Some(s"""SELECT l_returnflag, l_linestatus,
                    ${sqlDsum("l_quantity")} AS sum_qty, COUNT(*) AS n
             FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""))

  /** CUBE: all grouping combinations over two dimensions. */
  private val q44 = QueryDef(
    "q44_cube",
    (s, d) => Tables(s, d, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
    Some(s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
                    ${sqlDsum("o_totalprice")} AS total
             FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""))

  /** PIVOT: return-flag counts as columns per line status (explicit value
    * list keeps the output schema static — required at scale anyway).
    */
  private val q45 = QueryDef(
    "q45_pivot",
    (s, d) => Tables(s, d, "lineitem")
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("A", "N", "R"))
      .orderBy("l_linestatus"),
    Some("""SELECT l_linestatus,
                   COUNT(*) FILTER (l_returnflag = 'A') AS "A",
                   COUNT(*) FILTER (l_returnflag = 'N') AS "N",
                   COUNT(*) FILTER (l_returnflag = 'R') AS "R"
            FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""))

  /** Multimodal column plumbing: treat text as an opaque binary payload
    * (stand-in for image/audio bytes — decode libs are stubbed per spec),
    * with typed metadata extraction: byte length, content digest, and a
    * deterministic fake decode of width/height "dimensions". The Spark-side
    * schema/partitioning/expression plumbing is real; only the codec is fake.
    */
  private val q46 = QueryDef(
    "q46_multimodal_meta",
    (s, d) => Tables(s, d, "documents")
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .select(
        col("doc_id"),
        octet_length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("digest"),
        (octet_length(col("payload")) % 640).as("fake_width"),
        ((col("doc_id") * 7) % 480).cast("int").as("fake_height"),
        expr("CAST(octet_length(payload) div 2 AS INT)").as("mid_offset"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
                   CAST(LENGTH(text) AS INT) AS n_bytes,
                   md5(text) AS digest,
                   CAST(LENGTH(text) % 640 AS INT) AS fake_width,
                   CAST((doc_id * 7) % 480 AS INT) AS fake_height,
                   CAST(LENGTH(text) // 2 AS INT) AS mid_offset
            FROM documents ORDER BY doc_id"""))

  /** Sketch aggregation: HyperLogLog approximate distinct, oracled. The raw
    * HLL estimate is engine-specific (DuckDB's sketch can't reproduce
    * Spark's), so the SEMANTIC contract — estimate within 2% of exact — is
    * what goes through the oracle: the exact columns hash-compare and
    * `approx_ok` must come out TRUE, which only happens if Spark's sketch
    * (rsd 0.02, deterministic for a given dataset; measured max error 1.03%
    * at sf0.1 — tighter rsd costs 2-3x the sketch merge time for no gain
    * here) meets the bound. The numeric error itself is pinned in SketchSpec.
    */
  private val q47 = QueryDef(
    "q47_approx_distinct",
    (s, d) => Tables(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("exact_parts"), col("n"),
        (abs(col("approx") - col("exact_parts")).cast("double") <=
          col("exact_parts").cast("double") * 0.02).as("approx_ok"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
                   COUNT(DISTINCT l_partkey) AS exact_parts,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   TRUE AS approx_ok
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** WKT spatial round-trip as text (the reference's spatial recipe,
    * etl.py:387-390 / docs/recipes/spatial_etl.rst: geometry travels as WKT
    * strings): build POINT WKT from numeric columns, parse a coordinate
    * back out with a regexp — all string ops, engine-portable.
    */
  private val q48 = QueryDef(
    "q48_spatial_wkt",
    (s, d) => Tables(s, d, "part")
      .withColumn("wkt", concat(lit("POINT("), col("p_size").cast("string"),
        lit(" "), (col("p_partkey") % 100).cast("string"), lit(")")))
      .select(
        col("p_partkey"),
        col("wkt"),
        regexp_extract(col("wkt"), "POINT\\(([0-9]+) ", 1).cast("int").as("x_back"),
        regexp_extract(col("wkt"), " ([0-9]+)\\)", 1).cast("bigint").as("y_back"))
      .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
                   'POINT(' || CAST(p_size AS VARCHAR) || ' ' || CAST(p_partkey % 100 AS VARCHAR) || ')' AS wkt,
                   CAST(regexp_extract('POINT(' || CAST(p_size AS VARCHAR) || ' ' || CAST(p_partkey % 100 AS VARCHAR) || ')', 'POINT\(([0-9]+) ', 1) AS INT) AS x_back,
                   CAST(regexp_extract('POINT(' || CAST(p_size AS VARCHAR) || ' ' || CAST(p_partkey % 100 AS VARCHAR) || ')', ' ([0-9]+)\)', 1) AS BIGINT) AS y_back
            FROM part ORDER BY p_partkey"""))

  /** Skew-mitigated aggregation: l_returnflag has 3 values — at 100 TB a
    * single-phase groupBy sends ~33% of all rows to one reducer. The salted
    * two-phase form (groupBy(key, salt) then groupBy(key)) spreads phase one
    * across salt*3 reducers. Decimal partials reassociate exactly, so the
    * result is identical to the naive plan the oracle runs.
    */
  private val q49 = QueryDef(
    "q49_salted_agg",
    (s, d) => Tables(s, d, "lineitem")
      .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
      .groupBy("l_returnflag", "salt")
      .agg(sum(dec(col("l_quantity"))).as("part_qty"), count(lit(1)).as("part_n"))
      .groupBy("l_returnflag")
      .agg(sum(col("part_qty")).cast("double").as("sum_qty"),
        sum(col("part_n")).as("n"))
      .orderBy("l_returnflag"),
    Some(s"""SELECT l_returnflag, ${sqlDsum("l_quantity")} AS sum_qty,
                    COUNT(*) AS n
             FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Exact interpolated percentiles (Spark `percentile` == DuckDB
    * quantile_cont on sorted values; interpolation arithmetic lands exactly
    * on the same doubles for this data). The exact form sorts per group —
    * at 100 TB switch to approx_percentile (t-digest) and drop the oracle.
    */
  private val q52 = QueryDef(
    "q52_percentiles",
    (s, d) => Tables(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        expr("percentile(l_quantity, array(0.25, 0.75))").getItem(1)
          .as("q3_qty"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
                   quantile_cont(l_quantity, 0.5) AS median_qty,
                   quantile_cont(l_quantity, 0.9) AS p90_qty,
                   quantile_cont(l_quantity, 0.75) AS q3_qty
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Pearson correlation via exact decimal sufficient statistics (n, Σx,
    * Σy, Σxy, Σx², Σy²) — the built-in corr() is an order-dependent double
    * stream and can't hash-match across engines; the decimal sums are
    * order-insensitive and the final formula is computed identically both
    * sides. Same single-shuffle cost as any grouped aggregate.
    */
  private val q53 = QueryDef(
    "q53_correlation",
    (s, d) => {
      val x = dec(col("l_quantity")); val y = dec(col("l_discount"))
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(x).cast("double").as("sx"),
          sum(y).cast("double").as("sy"),
          sum(x * y).cast("double").as("sxy"),
          sum(x * x).cast("double").as("sxx"),
          sum(y * y).cast("double").as("syy"))
        .select(col("l_returnflag"), col("n"),
          ((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
            .as("corr_qty_disc"))
        .orderBy("l_returnflag")
    },
    Some(s"""WITH stats AS (SELECT l_returnflag, COUNT(*) AS n,
                    CAST(SUM(${sqlDec("l_quantity")}) AS DOUBLE) AS sx,
                    CAST(SUM(${sqlDec("l_discount")}) AS DOUBLE) AS sy,
                    CAST(SUM(${sqlDec("l_quantity")} * ${sqlDec("l_discount")}) AS DOUBLE) AS sxy,
                    CAST(SUM(${sqlDec("l_quantity")} * ${sqlDec("l_quantity")}) AS DOUBLE) AS sxx,
                    CAST(SUM(${sqlDec("l_discount")} * ${sqlDec("l_discount")}) AS DOUBLE) AS syy
             FROM lineitem GROUP BY l_returnflag)
             SELECT l_returnflag, n,
                    ((n * sxy - sx * sy) /
                     (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))) AS corr_qty_disc
             FROM stats ORDER BY l_returnflag"""))

  /** Collect/string aggregation made deterministic: collect_set is
    * order-nondeterministic across partitions, so the contract is
    * sort-then-join — same discipline as every other oracled aggregate.
    */
  private val q54 = QueryDef(
    "q54_string_agg",
    (s, d) => Tables(s, d, "orders")
      .groupBy("o_orderstatus")
      .agg(
        array_join(array_sort(collect_set(col("o_orderpriority"))), ",")
          .as("priorities"),
        countDistinct(col("o_orderpriority")).as("n_priorities"))
      .orderBy("o_orderstatus"),
    Some("""SELECT o_orderstatus,
                   array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities,
                   COUNT(DISTINCT o_orderpriority) AS n_priorities
            FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Approximate percentiles with a verified bound (the q47 pattern): the
    * GK sketch's median must land within one quantity unit of the exact
    * interpolated median. The exact columns hash-compare; `approx_ok` goes
    * through the oracle as the semantic contract, TRUE only if Spark's
    * sketch (deterministic per dataset) meets the bound. At 100 TB the
    * sketch replaces the per-group sort q52 needs — fixed memory,
    * mergeable map-side.
    */
  private val q73 = QueryDef(
    "q73_approx_percentile",
    (s, d) => Tables(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_quantity, 0.5, 1000)").as("approx_median"),
        expr("percentile(l_quantity, 0.5)").as("exact_median"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("exact_median"), col("n"),
        (abs(col("approx_median") - col("exact_median")) <= 1.0).as("approx_ok"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
                   quantile_cont(l_quantity, 0.5) AS exact_median,
                   COUNT(*) AS n,
                   TRUE AS approx_ok
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Count-min sketch for token frequencies, expressed relationally: d=4
    * hash rows x w=1024 buckets, built as ONE partial-aggregated shuffle of
    * at most d*w rows (the explode multiplies rows map-side, the combine
    * collapses them map-side — what ships is the sketch, not the corpus).
    * Estimates = min over the d bucket counts. The sketch build is ONE
    * corpus pass: the total token count is derived FROM the sketch (every
    * token contributes exactly one row to each hash row, so summing any
    * one hash row's counts is the stream length) instead of re-counting
    * the stream. The exact top-20 is verification scaffolding — the oracle
    * needs ground-truth counts to compare against; a production consumer
    * queries the sketch without it (the sketch exists precisely so the
    * exact vocabulary is never built).
    *
    * Count-min never underestimates — the hard contract, asserted as
    * no_underestimate. within_bound is a heuristic sanity screen only:
    * E[excess] = total/w per hash row, and the 32·total/w slack puts a
    * persistent failure at P ≈ (1/32)^4 per token under pairwise-
    * independent hashing — but xxhash64 is deterministic, so it is a
    * screen, not a guarantee (q47/q73 gate approx_ok the same way).
    * SketchSpec pins the numeric behavior.
    */
  private val q87 = QueryDef(
    "q87_countmin_heavy_hitters",
    (s, d) => {
      val w = 1024
      val depth = 4
      val toks = Tables(s, d, "documents")
        .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      def rows(tok: org.apache.spark.sql.Column) = array((0 until depth).map(i =>
        struct(lit(i).as("h"), pmod(xxhash64(lit(i), tok), lit(w)).as("b"))): _*)
      // materialized once (≤ d·w = 4,096 rows): reused by the stream-length
      // derivation and the estimate join without re-scanning the corpus
      val cm = toks.select(explode(rows(col("tok"))).as("hb"))
        .groupBy(col("hb.h").as("h"), col("hb.b").as("b"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(true)
      val total = cm.filter(col("h") === 0).agg(sum("c").as("total"))
      val top = toks.groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok")).limit(20)
      top.select(col("tok"), col("n"), explode(rows(col("tok"))).as("hb"))
        .join(broadcast(cm),
          col("hb.h") === cm("h") && col("hb.b") === cm("b"))
        .groupBy("tok", "n")
        .agg(min("c").as("est"))
        .crossJoin(broadcast(total))
        .select(col("tok"), col("n"),
          (col("est") >= col("n")).as("no_underestimate"),
          (col("est") - col("n") <= lit(32) * col("total") / lit(w))
            .as("within_bound"))
        .orderBy(col("n").desc, col("tok"))
    },
    Some(s"""WITH tk AS (SELECT unnest($tokSqlDocs) AS tok FROM documents)
             SELECT tok, COUNT(*) AS n,
                    TRUE AS no_underestimate, TRUE AS within_bound
             FROM tk GROUP BY tok ORDER BY n DESC, tok LIMIT 20"""))

  /** Z-score outlier screen over order totals — the standard numeric
    * sanity filter before a column feeds training statistics. The global
    * moments come from exact DECIMAL sums (the 4-decimal-digit doubles are
    * exact in DECIMAL(18,4), their squares exact in the widened product
    * type), so mean/variance are order-insensitive and engine-identical;
    * z is then derived through an identical double expression tree. Plan
    * shape: one 1-row aggregate broadcast back over the table — the
    * corpus itself is never shuffled, linear at 100 TB.
    */
  private val q90 = QueryDef(
    "q90_zscore_outliers",
    (s, d) => {
      val o = Tables(s, d, "orders")
      val st = o.agg(
        sum(dec(col("o_totalprice"))).cast("double").as("sq"),
        sum(dec(col("o_totalprice")) * dec(col("o_totalprice")))
          .cast("double").as("sq2"),
        count(lit(1)).as("cnt"))
      val z = (col("o_totalprice") - col("sq") / col("cnt")) /
        sqrt(col("sq2") / col("cnt") -
          (col("sq") / col("cnt")) * (col("sq") / col("cnt")))
      o.crossJoin(broadcast(st))
        .select(col("o_orderkey"), col("o_totalprice"), z.as("z"),
          (abs(z) > lit(2.5)).as("is_outlier"))
        .orderBy("o_orderkey")
    },
    // the squared term is DECIMAL(19,4)^2 in DuckDB — width 38 promotes the
    // storage to HUGEINT (int64 multiply would overflow); still exact, and
    // Spark's (18,4)^2 = (37,8) product is exact too, so the values match
    Some(s"""WITH st AS (SELECT CAST(SUM(${sqlDec("o_totalprice")}) AS DOUBLE) AS sq,
                           CAST(SUM(CAST(o_totalprice AS DECIMAL(19,4)) * CAST(o_totalprice AS DECIMAL(19,4))) AS DOUBLE) AS sq2,
                           COUNT(*) AS cnt FROM orders)
             SELECT o_orderkey, o_totalprice,
                    (o_totalprice - sq / cnt)
                      / sqrt(sq2 / cnt - (sq / cnt) * (sq / cnt)) AS z,
                    abs((o_totalprice - sq / cnt)
                      / sqrt(sq2 / cnt - (sq / cnt) * (sq / cnt))) > 2.5 AS is_outlier
             FROM orders, st ORDER BY o_orderkey"""))

  /** Fixed-width histogram of document lengths: bucket = n_chars/50 capped
    * at 19. One partial-aggregated shuffle of at most 20 rows — the shape
    * of every distribution dashboard at corpus scale.
    */
  private val q89 = QueryDef(
    "q89_length_histogram",
    (s, d) => Tables(s, d, "documents")
      .select(least(floor(col("n_chars") / 50), lit(19)).cast("long").as("bucket"),
        col("n_chars"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
      .orderBy("bucket"),
    Some("""SELECT CAST(LEAST(floor(n_chars / 50), 19) AS BIGINT) AS bucket,
                   COUNT(*) AS n_docs,
                   MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
            FROM documents GROUP BY bucket ORDER BY bucket"""))

  /** Z-order (Morton) data-layout clustering: lineitem rows keyed by the
    * bit-interleave of (l_partkey, l_suppkey) buckets, summarized per
    * 64-tile layout bucket (top 6 interleaved bits). Each tile's min/max
    * show BOTH dimensions bounded — the property that makes Z-ordered file
    * layout answer range predicates on either column with bounded file
    * reads, where a lexicographic sort bounds only the leading column.
    * The interleave is the codegen'd ZOrderExpr (one shift/mask loop per
    * row); the oracle carries the expanded 16-term shift/mask sum.
    *
    * Scale shape: map-only index computation + a 64-row aggregate; the
    * production form feeds the index to a write-path sort
    * (repartitionByRange on z) so downstream scans prune files — the
    * layout decision happens once at write time, costs one range shuffle.
    */
  private val q98 = QueryDef(
    "q98_zorder_layout",
    (s, d) => {
      import graft.functions.ZOrderExpr.zorder
      Tables(s, d, "lineitem")
        .select((col("l_partkey") % 256).as("x"), (col("l_suppkey") % 256).as("y"))
        .withColumn("z", zorder(col("x"), col("y"), 8))
        .withColumn("tile", expr("z div 1024"))
        .groupBy("tile")
        .agg(count(lit(1)).as("n_rows"),
          min("x").as("min_x"), max("x").as("max_x"),
          min("y").as("min_y"), max("y").as("max_y"))
        .orderBy("tile")
    },
    Some(s"""WITH zed AS (SELECT x, y,
                    ${graft.functions.ZOrderExpr.zorderSql("x", "y", 8)} AS z
                  FROM (SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y
                        FROM lineitem) b)
             SELECT z // 1024 AS tile, COUNT(*) AS n_rows,
                    MIN(x) AS min_x, MAX(x) AS max_x,
                    MIN(y) AS min_y, MAX(y) AS max_y
             FROM zed GROUP BY tile ORDER BY tile"""))

  /** The dataset card: one-row corpus summary (doc/source/language counts,
    * token and char totals, exact-duplicate rate) — the numbers a corpus
    * release publishes, as one aggregate pass. countDistinct on the content
    * hash is exact; at extreme scale the HLL form (q47) swaps in with
    * documented error. Map-side codegen'd metrics + a single global
    * aggregate: no per-group shuffle at all.
    */
  private val q100 = QueryDef(
    "q100_dataset_card",
    (s, d) => {
      import graft.functions.TextFunctions.{contentHash, tokenCount}
      Tables(s, d, "documents")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"),
          countDistinct(col("lang")).as("n_langs"),
          sum(tokenCount(col("text")).cast("long")).as("n_tokens"),
          sum(col("n_chars")).as("n_chars_total"),
          countDistinct(contentHash(col("text"))).as("n_distinct_texts"))
        .select(col("n_docs"), col("n_sources"), col("n_langs"),
          col("n_tokens"), col("n_chars_total"), col("n_distinct_texts"),
          ((col("n_docs") - col("n_distinct_texts")).cast("double") /
            col("n_docs").cast("double")).as("dup_rate"))
    },
    Some(s"""SELECT COUNT(*) AS n_docs,
                    COUNT(DISTINCT source) AS n_sources,
                    COUNT(DISTINCT lang) AS n_langs,
                    CAST(SUM(len($tokSqlDocs)) AS BIGINT) AS n_tokens,
                    CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
                    COUNT(DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))) AS n_distinct_texts,
                    CAST(COUNT(*) - COUNT(DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))) AS DOUBLE)
                      / CAST(COUNT(*) AS DOUBLE) AS dup_rate
             FROM documents"""))

  override def defs: Seq[QueryDef] =
    Seq(q43, q44, q45, q46, q47, q48, q49, q52, q53, q54, q73, q87, q89,
      q90, q98, q100)
}
