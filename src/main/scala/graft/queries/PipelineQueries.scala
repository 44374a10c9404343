package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._
import Exact._

/** Composite training-data pipeline queries and the remaining relational
  * surface: the end-to-end corpus-clean pass (quality gate + language check
  * + exact dedup in one plan), correlated aggregate predicates, multiset set
  * ops, GROUPING SETS, higher-order array aggregation, and window
  * distribution functions.
  *
  * Scale notes: q56 is the shape a 100 TB pre-training clean actually runs —
  * per-row codegen'd metrics (no shuffle) feeding ONE hash shuffle on the
  * content hash for the dedup; nothing is collected and the quality gate
  * prunes before the shuffle, so shuffle volume is the post-filter survivor
  * set only. q57's per-nation averages are a 25-row aggregate broadcast back
  * against the full table — the correlated-subquery decorrelation a good
  * optimizer performs, written explicitly.
  */
object PipelineQueries extends QueryModule {

  private val tokSql = "regexp_extract_all(lower(text), '[a-z0-9]+')"
  private val nTokSql = s"len($tokSql)"
  private val punctSql =
    "(CAST(LENGTH(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)" +
      " / CAST(GREATEST(LENGTH(text), 1) AS DOUBLE))"
  private def hitsSql(words: Seq[String]) =
    s"len(list_filter($tokSql, t -> list_contains([${words.map(w => s"'$w'").mkString(",")}], t)))"
  private val enHits = hitsSql(Seq("the", "a", "of", "and", "to", "in", "is"))
  private val stopRatioSql =
    s"(CAST($enHits AS DOUBLE) / CAST(GREATEST($nTokSql, 1) AS DOUBLE))"
  // shared with DedupQueries.q145 so the election oracle can't drift from
  // the Spark-side qualityScore twin
  private[queries] val qualitySql =
    s"""LEAST(CAST($nTokSql AS DOUBLE) / 50.0, 1.0) * 0.4
        + (1.0 - $punctSql) * 0.3
        + LEAST($stopRatioSql * 5.0, 1.0) * 0.3"""

  /** The full corpus-clean pass in one declarative plan: score every doc
    * (codegen'd, shuffle-free), gate on quality, then exact-dedup survivors
    * on the content hash keeping the lowest doc_id. The only shuffle is the
    * dedup window on content_hash, and it sees post-gate survivors only.
    */
  private val q56 = QueryDef(
    "q56_corpus_clean",
    (s, d) => {
      val scored = Tables(s, d, "documents").select(
        col("doc_id"), col("lang"),
        qualityScore(col("text")).as("quality"),
        contentHash(col("text")).as("content_hash"))
      val w = Window.partitionBy(col("content_hash")).orderBy(col("doc_id").asc)
      scored.filter(col("quality") >= 0.5)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("doc_id", "lang", "quality", "content_hash")
        .orderBy("doc_id")
    },
    Some(s"""WITH scored AS (
               SELECT doc_id, lang, $qualitySql AS quality,
                      md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash
               FROM documents),
             ranked AS (
               SELECT doc_id, lang, quality, content_hash,
                      ROW_NUMBER() OVER (PARTITION BY content_hash ORDER BY doc_id ASC) AS rn
               FROM scored WHERE quality >= 0.5)
             SELECT doc_id, lang, quality, content_hash
             FROM ranked WHERE rn = 1 ORDER BY doc_id"""))

  /** Correlated aggregate predicate, decorrelated: customers above their
    * nation's average balance. The per-nation aggregate is tiny (one row per
    * nation) and broadcast — the full table never shuffles.
    */
  private val q57 = QueryDef(
    "q57_above_nation_avg",
    (s, d) => {
      val c = Tables(s, d, "customer")
      val nav = c.groupBy("c_nationkey")
        .agg(davg(col("c_acctbal")).as("nation_avg"))
      c.join(broadcast(nav), "c_nationkey")
        .filter(col("c_acctbal") > col("nation_avg"))
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "nation_avg")
        .orderBy("c_custkey")
    },
    Some(s"""WITH nav AS (SELECT c_nationkey, ${sqlDavg("c_acctbal")} AS nation_avg
                          FROM customer GROUP BY c_nationkey)
             SELECT c_custkey, c_name, c_nationkey, c_acctbal, nation_avg
             FROM customer JOIN nav USING (c_nationkey)
             WHERE c_acctbal > nation_avg
             ORDER BY c_custkey"""))

  /** Multiset set operations (q17 covers the DISTINCT forms): nation keys of
    * customers vs suppliers with multiplicity — INTERSECT ALL keeps
    * min(count_a, count_b) copies, EXCEPT ALL keeps count_a - count_b.
    */
  private val q58 = QueryDef(
    "q58_set_ops_all",
    (s, d) => {
      val a = Tables(s, d, "customer").select(col("c_nationkey").as("nationkey"))
      val b = Tables(s, d, "supplier").select(col("s_nationkey").as("nationkey"))
      a.intersectAll(b).withColumn("op", lit("intersect_all"))
        .unionByName(a.exceptAll(b).withColumn("op", lit("except_all")))
        .orderBy("op", "nationkey")
    },
    Some("""SELECT nationkey, 'intersect_all' AS op
            FROM (SELECT c_nationkey AS nationkey FROM customer
                  INTERSECT ALL
                  SELECT s_nationkey FROM supplier)
            UNION ALL
            SELECT nationkey, 'except_all' AS op
            FROM (SELECT c_nationkey AS nationkey FROM customer
                  EXCEPT ALL
                  SELECT s_nationkey FROM supplier)
            ORDER BY op, nationkey"""))

  /** Explicit GROUPING SETS (beyond q43/q44's ROLLUP/CUBE): per-flag and
    * per-status subtotals plus the grand total, disambiguated by
    * grouping_id — one aggregation pass with grouping expansion.
    */
  private val q59 = QueryDef(
    "q59_grouping_sets",
    (s, d) => Tables(s, d, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
        grouping_id(col("l_returnflag"), col("l_linestatus")).as("gid"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first),
    Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                    ${sqlDsum("l_quantity")} AS sum_qty,
                    GROUPING(l_returnflag, l_linestatus) AS gid
             FROM lineitem
             GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
             ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""))

  /** Higher-order array aggregation: per-order quantity vectors processed
    * with codegen'd HOFs — fold (aggregate), predicate count (filter), no
    * UDFs. Arrays stay internal; outputs are scalars so the differential
    * hash sees plain columns.
    */
  private val q60 = QueryDef(
    "q60_hof_arrays",
    (s, d) => Tables(s, d, "lineitem")
      .groupBy("l_orderkey")
      .agg(array_sort(collect_list(col("l_quantity").cast("int"))).as("qtys"))
      .select(
        col("l_orderkey"),
        size(col("qtys")).as("n_items"),
        aggregate(col("qtys"), lit(0), (acc, x) => acc + x).as("qty_sum"),
        size(filter(col("qtys"), _ > 25)).as("n_big"),
        element_at(col("qtys"), 1).as("min_qty"),
        element_at(col("qtys"), -1).as("max_qty"))
      .orderBy("l_orderkey"),
    Some("""WITH q AS (SELECT l_orderkey,
                              list_sort(list(CAST(l_quantity AS INT))) AS qtys
                       FROM lineitem GROUP BY l_orderkey)
            SELECT l_orderkey,
                   len(qtys) AS n_items,
                   CAST(list_aggregate(qtys, 'sum') AS INT) AS qty_sum,
                   len(list_filter(qtys, x -> x > 25)) AS n_big,
                   qtys[1] AS min_qty,
                   qtys[-1] AS max_qty
            FROM q ORDER BY l_orderkey"""))

  /** Window distribution functions: quartile bucket, percent_rank and
    * cume_dist of customers by balance within market segment. The window
    * order carries a unique tie-break so ntile assignment is deterministic.
    */
  private val q61 = QueryDef(
    "q61_window_distribution",
    (s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      Tables(s, d, "customer")
        .select(
          col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_mktsegment, c_acctbal,
                   NTILE(4) OVER w AS quartile,
                   PERCENT_RANK() OVER w AS pct_rank,
                   CUME_DIST() OVER w AS cume
            FROM customer
            WINDOW w AS (PARTITION BY c_mktsegment
                         ORDER BY c_acctbal ASC, c_custkey ASC)
            ORDER BY c_custkey"""))

  /** Full outer join over disjoint-ish aggregates: nations' high-balance
    * customer counts vs low-balance supplier counts — both sides filtered so
    * some nations appear on only one side and the outer join must synthesize
    * nulls (coalesced to zero). Both inputs are already-reduced aggregates,
    * so the join is tiny regardless of fact-table size.
    */
  private val q63 = QueryDef(
    "q63_full_outer",
    (s, d) => {
      val c = Tables(s, d, "customer")
        .filter(col("c_acctbal") > 9000)
        .groupBy("c_nationkey").agg(count(lit(1)).as("n_rich_cust"))
      val sp = Tables(s, d, "supplier")
        .filter(col("s_acctbal") < -800)
        .groupBy("s_nationkey").agg(count(lit(1)).as("n_poor_supp"))
      c.join(sp, c("c_nationkey") === sp("s_nationkey"), "full_outer")
        .select(
          coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("n_rich_cust"), lit(0L)).as("n_rich_cust"),
          coalesce(col("n_poor_supp"), lit(0L)).as("n_poor_supp"))
        .orderBy("nationkey")
    },
    Some("""WITH c AS (SELECT c_nationkey, COUNT(*) AS n_rich_cust
                       FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey),
                 sp AS (SELECT s_nationkey, COUNT(*) AS n_poor_supp
                        FROM supplier WHERE s_acctbal < -800 GROUP BY s_nationkey)
            SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
                   COALESCE(n_rich_cust, 0) AS n_rich_cust,
                   COALESCE(n_poor_supp, 0) AS n_poor_supp
            FROM c FULL OUTER JOIN sp ON c_nationkey = s_nationkey
            ORDER BY nationkey"""))

  /** Deterministic train/test split: assignment from a salted content-free
    * hash of the stable id, not rand() — reproducible across runs, engines,
    * and partitionings (the only split discipline that survives re-runs at
    * scale). Two leading md5 hex chars give 256 buckets; '0'..'e5' ≈ 90%.
    * Map-only, no shuffle.
    */
  private val q66 = QueryDef(
    "q66_train_test_split",
    (s, d) => Tables(s, d, "documents")
      .withColumn("h2", substring(md5(concat(lit("split:"),
        col("doc_id").cast("string"))), 1, 2))
      .withColumn("split", when(col("h2") < "e6", lit("train")).otherwise(lit("test")))
      .select("doc_id", "h2", "split")
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
                   substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) AS h2,
                   CASE WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                        THEN 'train' ELSE 'test' END AS split
            FROM documents ORDER BY doc_id"""))

  /** Stratified deterministic sampling: 1-in-5 per source block, chosen by
    * hash order (not rand()) with a unique tie-break — every run and every
    * engine picks the same rows. One shuffle on the stratum key; the
    * integer guard rn*5 <= n keeps the arithmetic exact.
    */
  private val q67 = QueryDef(
    "q67_stratified_sample",
    (s, d) => {
      val byStratum = Window.partitionBy(col("source"))
      val w = byStratum.orderBy(
        md5(concat(lit("samp:"), col("doc_id").cast("string"))).asc,
        col("doc_id").asc)
      Tables(s, d, "documents")
        .withColumn("rn", row_number().over(w))
        .withColumn("n_src", count(lit(1)).over(byStratum))
        .filter(col("rn") * 5 <= col("n_src"))
        .select("doc_id", "source", "rn")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, source, rn FROM (
              SELECT doc_id, source,
                     ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY md5('samp:' || CAST(doc_id AS VARCHAR)) ASC,
                                doc_id ASC) AS rn,
                     COUNT(*) OVER (PARTITION BY source) AS n_src
              FROM documents) t
            WHERE rn * 5 <= n_src ORDER BY doc_id"""))

  /** Positional explode (LATERAL VIEW surface): tokens with their positions
    * for a slice of the corpus — the UDTF-shaped 1→N generator as a
    * first-class query. Map-side only; no shuffle before the harness sort.
    */
  private val q68 = QueryDef(
    "q68_posexplode_tokens",
    (s, d) => Tables(s, d, "documents")
      .filter(col("doc_id") < 50)
      .select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("tok"))
      .orderBy("doc_id", "pos"),
    Some(s"""SELECT doc_id,
                    CAST(generate_subscripts(tk, 1) AS INT) AS pos,
                    unnest(tk) AS tok
             FROM (SELECT doc_id, $tokSql AS tk FROM documents WHERE doc_id < 50)
             ORDER BY doc_id, pos"""))

  /** Blocked fuzzy join: nearest customer name per supplier by edit
    * distance, with a COMPOSITE blocking key — (nation, last-2-chars of the
    * name). Nation-only blocking is still quadratic (both sides of a block
    * grow with corpus size, only divided by the 25 nations); adding the
    * name-tail key bounds candidates per supplier by block cardinality:
    * measured at sf0.1, 599k pairs nation-only vs 6.0k composite (99x).
    * For these zero-padded numeric names the discriminative characters are
    * the low-order digits, so the tail is the "prefix" of the key portion;
    * real-name pipelines would use a phonetic key here instead. Suppliers
    * whose block has no candidate are kept with a NULL match (left join
    * after the argmin), so blocking narrows candidates, not output
    * cardinality. The argmin is a `min(struct(dist, tiebreak, payload))`
    * hash aggregation: struct min is lexicographic so the winner (dist asc,
    * custkey asc) equals the rank-1 window's, with map-side partial min.
    */
  private val q69 = QueryDef(
    "q69_fuzzy_name_match",
    (s, d) => {
      val sup = Tables(s, d, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
      val cust = Tables(s, d, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      val best = sup.join(cust,
          col("s_nationkey") === col("c_nationkey") &&
            substring(col("s_name"), -2, 2) === substring(col("c_name"), -2, 2))
        .withColumn("dist", levenshtein(col("s_name"), col("c_name")))
        .groupBy("s_suppkey")
        .agg(min(struct(col("dist"), col("c_custkey"), col("c_name"))).as("best"))
      sup.join(best, Seq("s_suppkey"), "left")
        .select(col("s_suppkey"), col("s_name"),
          col("best.c_custkey").as("c_custkey"),
          col("best.c_name").as("c_name"),
          col("best.dist").as("dist"))
        .orderBy("s_suppkey")
    },
    Some("""SELECT s.s_suppkey, s.s_name, t.c_custkey, t.c_name, t.dist
            FROM supplier s LEFT JOIN (
              SELECT s_suppkey, c_custkey, c_name, dist FROM (
                SELECT s_suppkey, c_custkey, c_name,
                       levenshtein(s_name, c_name) AS dist,
                       ROW_NUMBER() OVER (PARTITION BY s_suppkey
                         ORDER BY levenshtein(s_name, c_name) ASC, c_custkey ASC) AS rnk
                FROM supplier JOIN customer
                  ON s_nationkey = c_nationkey
                 AND substring(s_name, -2, 2) = substring(c_name, -2, 2)) x
              WHERE rnk = 1) t ON s.s_suppkey = t.s_suppkey
            ORDER BY s.s_suppkey"""))

  /** Calendar-spine gap filling: generate the full day range between the
    * corpus bounds and left-join daily counts so empty days appear as
    * zeros — the time-series densification every reporting pipeline needs.
    * The spine is generated from a 1-row aggregate (broadcast), never
    * materialized wide.
    */
  private val q70 = QueryDef(
    "q70_calendar_gapfill",
    (s, d) => {
      val ev = Tables(s, d, "events")
      val daily = ev.groupBy(date_trunc("DAY", col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"))
      val spine = ev.agg(min(date_trunc("DAY", col("ts"))).as("lo"),
          max(date_trunc("DAY", col("ts"))).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("INTERVAL 1 DAY"))).as("day"))
      spine.join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("n_events"), lit(0L)).as("n_events"))
        .orderBy("day")
    },
    Some("""WITH daily AS (SELECT date_trunc('day', ts) AS day, COUNT(*) AS n_events
                           FROM events GROUP BY day),
                 bounds AS (SELECT MIN(date_trunc('day', ts)) AS lo,
                                   MAX(date_trunc('day', ts)) AS hi FROM events),
                 spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL '1 day')) AS day
                           FROM bounds)
            SELECT day, COALESCE(n_events, 0) AS n_events
            FROM spine LEFT JOIN daily USING (day)
            ORDER BY day"""))

  /** Repetition-based quality filter (the Gopher/MassiveText rule family):
    * per-document duplicate-token fraction, top-token share, and repeated-
    * bigram fraction, with keep/drop flags at corpus-calibrated thresholds.
    * Every fraction is an integer ratio computed with the identical FP ops
    * on both engines.
    *
    * Round 14 shape: the metrics come from exploded-token aggregates, not
    * per-row array lambdas — the original O(distinct × n) top-token scan
    * and the bigram transform evaluated INTERPRETED per document (the
    * q168 finding) and made this the slowest map-only query in the suite
    * (2.6 s at sf0.1; 1.1 s in this shape). One (doc, token) count chain
    * yields n (sum of counts), nd (distinct rows) and topc (max count) in
    * a single aggregation tree; the repeated-bigram count reuses the
    * codegen'd position-explode kernel; zero-token documents re-enter via
    * a left join from the corpus' doc axis. The exploded shuffles are
    * (doc, token)-bounded — the same volume every dedup query here
    * already pays, and far cheaper than interpreted lambdas at any scale.
    */
  private val q76 = QueryDef(
    "q76_repetition_filter",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      val toks = docs.select(col("doc_id"), tokens(col("text")).as("tk"))
      val tokStats = toks.select(col("doc_id"), explode(col("tk")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(sum("c").as("n"), count(lit(1)).as("nd"),
          max("c").as("topc"))
      val biStats = explodeShinglesFromTokens(toks, col("tk"), 2, "gram", "pos")
        .groupBy("doc_id").agg(countDistinct("gram").as("nd2"))
      docs.select("doc_id")
        .join(tokStats, Seq("doc_id"), "left")
        .join(biStats, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n"), lit(0L)).cast("int").as("n"),
          coalesce(col("nd"), lit(0L)).cast("int").as("nd"),
          coalesce(col("topc"), lit(0L)).cast("int").as("topc"),
          coalesce(col("nd2"), lit(0L)).cast("int").as("nd2"))
        .select(col("doc_id"), col("n").as("n_tokens"),
          expr("CASE WHEN n > 0 THEN CAST(n - nd AS DOUBLE) / CAST(n AS DOUBLE) ELSE 0.0 END").as("dup_frac"),
          expr("CASE WHEN n > 0 THEN CAST(topc AS DOUBLE) / CAST(n AS DOUBLE) ELSE 0.0 END").as("top_share"),
          expr("CASE WHEN n >= 2 THEN CAST(n - 1 - nd2 AS DOUBLE) / CAST(n - 1 AS DOUBLE) ELSE 0.0 END").as("rep2_frac"))
        .withColumn("kept", col("dup_frac") <= 0.55 && col("top_share") <= 0.12
          && col("rep2_frac") <= 0.05)
        .orderBy("doc_id")
    },
    Some(s"""WITH t AS (SELECT doc_id, $tokSql AS tk FROM documents),
                  m AS (SELECT doc_id,
                          len(tk) AS n,
                          len(list_distinct(tk)) AS nd,
                          CASE WHEN len(tk) > 0
                               THEN list_max(list_transform(list_distinct(tk),
                                      d -> len(list_filter(tk, x -> x = d))))
                               ELSE 0 END AS topc,
                          CASE WHEN len(tk) >= 2
                               THEN len(list_distinct(list_transform(range(len(tk) - 1),
                                      i -> tk[i+1] || ' ' || tk[i+2])))
                               ELSE 0 END AS nd2
                        FROM t)
             SELECT doc_id, n AS n_tokens,
                    CASE WHEN n > 0 THEN CAST(n - nd AS DOUBLE) / CAST(n AS DOUBLE) ELSE 0.0 END AS dup_frac,
                    CASE WHEN n > 0 THEN CAST(topc AS DOUBLE) / CAST(n AS DOUBLE) ELSE 0.0 END AS top_share,
                    CASE WHEN n >= 2 THEN CAST(n - 1 - nd2 AS DOUBLE) / CAST(n - 1 AS DOUBLE) ELSE 0.0 END AS rep2_frac,
                    (CASE WHEN n > 0 THEN CAST(n - nd AS DOUBLE) / CAST(n AS DOUBLE) ELSE 0.0 END) <= 0.55
                      AND (CASE WHEN n > 0 THEN CAST(topc AS DOUBLE) / CAST(n AS DOUBLE) ELSE 0.0 END) <= 0.12
                      AND (CASE WHEN n >= 2 THEN CAST(n - 1 - nd2 AS DOUBLE) / CAST(n - 1 AS DOUBLE) ELSE 0.0 END) <= 0.05
                      AS kept
             FROM m ORDER BY doc_id"""))

  /** Sequence packing for training batches: documents in doc_id order are
    * assigned to fixed token-budget bins by exclusive running token count
    * (bin = cum_before DIV 512) — the boundary-packing approximation whose
    * per-bin overflow is bounded by one document. Integer arithmetic only.
    *
    * Scale shape: the prefix sum runs in the two-pass range-bucket form
    * (the q94/q115 idiom — an unpartitioned Window.orderBy would plan as
    * Exchange SinglePartition and stream the whole corpus through ONE
    * task): doc_ids are cut into 256 ordered ranges (width from one tiny
    * max(doc_id) aggregate, broadcast), pass 1 aggregates per-range token
    * totals into exclusive prefix offsets (256 rows), pass 2 runs the
    * EXCLUSIVE running sum within each range (a 256-way partitioned
    * window) plus the broadcast offset — identical integer arithmetic to
    * the global window because the range is a doc_id prefix. The regex
    * token count is localCheckpointed once: both passes read the
    * (doc_id, n_tokens) frame, and without the materialization the
    * corpus-regex scan would execute twice.
    */
  /** The two-pass fixed-budget packer shared by q77 (regex-token
    * counts) and q144 (true BPE counts): `toks`(doc_id, n_tokens) →
    * (doc_id, n_tokens, bin_id) with 512-token bins off an exclusive
    * doc_id-ordered prefix sum — pass 1 aggregates 256 range totals
    * into broadcast offsets, pass 2 runs the per-range window, so the
    * corpus never funnels one partition (the q94/q106 form).
    */
  private def packByTokens(toks0: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val toks = toks0.localCheckpoint(true)
    val dims = toks.agg((expr("max(doc_id) div 256") + 1).as("bw"))
    val bucketed = toks.crossJoin(broadcast(dims))
      .withColumn("bk", expr("doc_id div bw"))
    // pass 1: 256 range totals -> exclusive prefix offsets (tiny)
    val offs = bucketed.groupBy("bk").agg(sum("n_tokens").as("bs"))
      .withColumn("off", coalesce(sum("bs").over(
        Window.orderBy("bk")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bk", "off")
    // pass 2: per-range EXCLUSIVE running sum + broadcast offset
    val wb = Window.partitionBy("bk").orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(offs), "bk")
      .withColumn("cum_before",
        col("off") + coalesce(sum(col("n_tokens")).over(wb), lit(0L)))
      .select(col("doc_id"), col("n_tokens"),
        expr("cum_before div 512").as("bin_id"))
      .orderBy("doc_id")
  }

  private val q77 = QueryDef(
    "q77_sequence_packing",
    (s, d) => packByTokens(Tables(s, d, "documents")
      .select(col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_tokens"))),
    Some(s"""SELECT doc_id, n_tokens,
                    CAST(COALESCE(cum_before, 0) AS BIGINT) // 512 AS bin_id
             FROM (SELECT doc_id, CAST(len($tokSql) AS BIGINT) AS n_tokens,
                          SUM(CAST(len($tokSql) AS BIGINT)) OVER (ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cum_before
                   FROM documents) t
             ORDER BY doc_id"""))

  /** q144: sequence packing under the TRUE token budget — q143's trained
    * BPE tokenizer supplies per-document token counts (each document's
    * count is the sum of its words' BPE segment lengths, via the
    * broadcast DISTINCT-word encoding — the corpus token stream is never
    * re-encoded per word occurrence) and the q77 two-pass packer bins
    * them. The regex-token proxy q77 packs by OVER-counts short merges
    * and UNDER-counts long words; packing a real context window needs
    * the tokenizer's own arithmetic, which is exactly what changes
    * between q77 and this query (same packer, same oracle shape, true
    * counts).
    */
  private val q144 = QueryDef(
    "q144_bpe_packing",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      val words = docs.select(explode(tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("wn"))
        .localCheckpoint(true)
      val merges = TextQueries.bpeTrain(
        TextQueries.bpeTrainSample(words), 12)
      val wordLens = TextQueries.bpeEncodeWords(words, merges)
        .select(col("w"), size(col("tk")).cast("long").as("wt"))
        .localCheckpoint(true)
      val counts = docs.select(col("doc_id"),
          explode(tokens(col("text"))).as("w"))
        .join(broadcast(wordLens), "w")
        .groupBy("doc_id").agg(sum("wt").as("n_tokens"))
      packByTokens(docs.select("doc_id")
        .join(counts, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("n_tokens"), lit(0L))
          .as("n_tokens")))
    },
    Some {
      // the q143 training rounds, verbatim (shared shape), feeding the
      // per-doc count + the q77 packing window
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
              $rounds,
              wl AS (SELECT w, CAST(len(tk) AS BIGINT) AS wt FROM v12),
              dt AS (SELECT doc_id, unnest($tokSql) AS w FROM documents),
              cnt AS (SELECT d.doc_id,
                        CAST(COALESCE(SUM(wl.wt), 0) AS BIGINT) AS n_tokens
                      FROM documents d
                      LEFT JOIN dt ON d.doc_id = dt.doc_id
                      LEFT JOIN wl ON dt.w = wl.w
                      GROUP BY d.doc_id)
         SELECT doc_id, n_tokens,
                CAST(COALESCE(cum_before, 0) AS BIGINT) // 512 AS bin_id
         FROM (SELECT doc_id, n_tokens,
                 SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS cum_before
               FROM cnt) t
         ORDER BY doc_id"""
    })

  /** Deterministic domain mixing: downsample each source to an equal token
    * budget (total_tokens DIV n_sources) with hash-order selection — the
    * pretraining-mixture rebalance, rerun-stable like q66/q67 (never
    * rand()). The keep decision compares a 16-bit md5 slice against the
    * source's quantized keep-rate rendered as a zero-padded hex literal, so
    * both engines make the identical string comparison; sources already
    * under budget keep everything. Per-source stats are a tiny broadcast
    * (one row per domain); the corpus itself is scanned map-only.
    */
  private val q78 = QueryDef(
    "q78_domain_mix",
    (s, d) => {
      val docs = Tables(s, d, "documents")
        .select(col("doc_id"), col("source"),
          tokenCount(col("text")).cast("long").as("n_tokens"),
          substring(md5(concat(lit("mix:"), col("doc_id").cast("string"))), 1, 4).as("h4"))
      val bySrc = docs.groupBy("source").agg(sum("n_tokens").as("src_tokens"))
      val tot = bySrc.agg(sum("src_tokens").as("total"), count(lit(1)).as("n_src"))
      val rates = bySrc.crossJoin(broadcast(tot))
        .withColumn("budget", expr("total div n_src"))
        .select(col("source"), col("src_tokens"), col("budget"),
          floor(col("budget").cast("double") / col("src_tokens").cast("double")
            * lit(65536.0)).as("cut"))
      docs.join(broadcast(rates), "source")
        .filter(col("src_tokens") <= col("budget")
          || col("h4") < lpad(lower(hex(col("cut"))), 4, "0"))
        .select(col("doc_id"), col("source"), col("n_tokens"))
        .orderBy("doc_id")
    },
    Some(s"""WITH docs AS (SELECT doc_id, source,
                             CAST(len($tokSql) AS BIGINT) AS n_tokens,
                             substring(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 4) AS h4
                           FROM documents),
                  by_src AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens
                             FROM docs GROUP BY source),
                  tot AS (SELECT CAST(SUM(src_tokens) AS BIGINT) AS total,
                                 COUNT(*) AS n_src
                          FROM by_src),
                  rates AS (SELECT source, src_tokens, total // n_src AS budget,
                                   CAST(floor(CAST(total // n_src AS DOUBLE)
                                     / CAST(src_tokens AS DOUBLE) * 65536.0) AS BIGINT) AS cut
                            FROM by_src CROSS JOIN tot)
             SELECT doc_id, docs.source, n_tokens
             FROM docs JOIN rates ON docs.source = rates.source
             WHERE src_tokens <= budget
                OR h4 < lpad(lower(to_hex(cut)), 4, '0')
             ORDER BY doc_id"""))

  /** Benchmark decontamination: train-split documents (q66's split) that
    * share at least one 5-token shingle with any eval-split document —
    * the eval-leakage sweep every pretraining corpus runs. Shingle length
    * is the precision dial: at this corpus's ~30-word vocabulary,
    * 4-grams over-flag incidental overlap (60/456 docs at sf0.01) while
    * 5-grams isolate true near-dup leakage (4/456, matching the q74
    * duplicate clusters); production corpora use 8-13-gram windows.
    *
    * Scale shape: the eval shingle set is the SMALL side by construction
    * (the held-out split) — broadcast it and the corpus-side scan stays
    * map-only up to the per-doc count; the corpus never shuffles on text.
    */
  private val q79 = QueryDef(
    "q79_decontamination",
    (s, d) => {
      val docs = Tables(s, d, "documents")
        .withColumn("h2", substring(md5(concat(lit("split:"),
          col("doc_id").cast("string"))), 1, 2))
      // per-doc distinct shingles MAP-SIDE (array_distinct before the
      // explode) — a global distinct here would shuffle every corpus
      // shingle string, exactly what this operator is shaped to avoid
      val sh = docs
        .withColumn("tk", tokens(col("text")))
        .withColumn("sh", explode(expr(
          "CASE WHEN size(tk) >= 5 THEN array_distinct(transform(" +
            "sequence(1, size(tk) - 4), i -> concat_ws(' ', slice(tk, i, 5))))" +
            " ELSE array() END")))
        .select("doc_id", "h2", "sh")
      val evalSh = sh.filter(col("h2") >= "e6").select("sh").distinct()
      sh.filter(col("h2") < "e6")
        .join(broadcast(evalSh), "sh")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shared_shingles"))
        .orderBy("doc_id")
    },
    Some(s"""WITH t AS (SELECT doc_id, $tokSql AS tk,
                          substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) AS h2
                        FROM documents),
                  sh AS (SELECT DISTINCT doc_id, h2, s FROM (
                           SELECT doc_id, h2, unnest(list_distinct(
                             CASE WHEN len(tk) >= 5
                                  THEN list_transform(range(len(tk) - 4),
                                         i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
                                              || ' ' || tk[i+4] || ' ' || tk[i+5])
                                  ELSE []::VARCHAR[] END)) AS s
                           FROM t) x),
                  ev AS (SELECT DISTINCT s FROM sh WHERE h2 >= 'e6')
             SELECT doc_id, COUNT(*) AS n_shared_shingles
             FROM sh JOIN ev ON sh.s = ev.s
             WHERE sh.h2 < 'e6'
             GROUP BY doc_id ORDER BY doc_id"""))

  /** Decontamination at scale: bloom-filter semijoin reduction. Same
    * semantic as an exact eval-shingle join (the oracle runs that form),
    * different physical strategy: the eval side's shingle hashes build a
    * broadcast bloom bitset, the train side probes it MAP-SIDE with
    * Spark's codegen'd might_contain, and only the (tiny) surviving rows
    * enter the exact confirm join that removes bloom false positives. At
    * 100 TB this is the difference between shuffling every corpus shingle
    * into a join and shuffling ~nothing: a q79-shaped broadcast join still
    * streams every train shingle through join code, while the bloom probe
    * rejects the overwhelming majority inside the scan stage. Output is
    * the KEPT corpus: train docs sharing < 3 five-gram shingles with eval.
    */
  private val q91 = QueryDef(
    "q91_bloom_decontaminated_corpus",
    (s, d) => {
      val docs = Tables(s, d, "documents")
        .withColumn("h2", substring(md5(concat(lit("split:"),
          col("doc_id").cast("string"))), 1, 2))
      val sh = explodeShingles(docs.select("doc_id", "h2", "text"),
        col("text"), 5, "sh").select("doc_id", "h2", "sh")
      // eval-suite-sized (it is broadcast into the confirm join below, so
      // it is bounded by construction) and feeds THREE consumers — the
      // bloom sizing count, the bloom build, and the broadcast confirm
      // join; without the checkpoint each re-ran the shingle explosion
      val evalSh = sh.filter(col("h2") >= "e6").select("sh").distinct()
        .localCheckpoint(true)
      val evalFp = evalSh.select(xxhash64(col("sh")).as("fp"))
      val bloom = graft.functions.BloomFunctions.buildLongBloom(
        evalFp, col("fp"), expectedItems = evalSh.count(), fpp = 0.01)
      val contaminated = sh.filter(col("h2") < "e6")
        // the scale lever: map-side bitset probe before any join
        .filter(graft.functions.BloomFunctions.mightContainLong(
          bloom, xxhash64(col("sh"))))
        // exact confirm join kills bloom false positives; multiset-safe
        // because explodeShingles emits dup shingles only across docs and
        // the per-doc count below counts DISTINCT shared shingles
        .join(broadcast(evalSh), "sh")
        .groupBy("doc_id")
        .agg(countDistinct(col("sh")).as("n_shared"))
        .filter(col("n_shared") >= 3)
      docs.filter(col("h2") < "e6")
        .join(contaminated, Seq("doc_id"), "left_anti")
        .select("doc_id")
        .orderBy("doc_id")
    },
    Some(s"""WITH t AS (SELECT doc_id, $tokSql AS tk,
                          substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) AS h2
                        FROM documents),
                  sh AS (SELECT DISTINCT doc_id, h2, s FROM (
                           SELECT doc_id, h2, unnest(CASE WHEN len(tk) >= 5
                             THEN list_transform(range(len(tk) - 4),
                                    i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
                                         || ' ' || tk[i+4] || ' ' || tk[i+5])
                             ELSE []::VARCHAR[] END) AS s
                           FROM t) x),
                  ev AS (SELECT DISTINCT s FROM sh WHERE h2 >= 'e6'),
                  cont AS (SELECT doc_id FROM sh JOIN ev ON sh.s = ev.s
                           WHERE sh.h2 < 'e6'
                           GROUP BY doc_id HAVING COUNT(*) >= 3)
             SELECT doc_id FROM t
             WHERE h2 < 'e6' AND doc_id NOT IN (SELECT doc_id FROM cont)
             ORDER BY doc_id"""))

  /** Weighted sampling, probability proportional to size (systematic PPS):
    * documents are laid on a cumulative-weight axis (weight = n_chars, the
    * token-budget proxy) and one document is taken wherever the running sum
    * crosses a multiple of step = total/100 — so expected inclusion
    * probability is weight/step, and a 100-doc sample costs ZERO randomness
    * (reproducible across runs, engines, partitionings — the q66/q67
    * discipline applied to weighted selection). All arithmetic is integer
    * (running sum, integer division), so both engines agree bit-for-bit.
    *
    * Scale shape: the running sum is a prefix sum computed in the
    * genuinely distributed two-pass form (the q106 shard-rank move, with
    * RANGE buckets because the cumulative order is doc_id, not a hash):
    * an unpartitioned Window.orderBy would plan as Exchange
    * SinglePartition and stream the whole corpus through ONE task, so
    * instead doc_ids are cut into 256 ordered ranges (width from one tiny
    * max(doc_id) aggregate, broadcast), pass 1 aggregates per-range
    * n_chars totals (256 rows) into exclusive prefix offsets, and pass 2
    * runs the running sum WITHIN each range (a 256-way partitioned
    * window) and adds the broadcast offset. Range-then-offset equals the
    * global doc_id order because the range IS a doc_id prefix. One pass
    * over (doc_id, n_chars) — the text never enters the operator.
    */
  private val q94 = QueryDef(
    "q94_weighted_sample",
    (s, d) => {
      val docs = Tables(s, d, "documents")
        .select(col("doc_id"), col("n_chars"))
      // one tiny broadcast row: the sampling step and the range width
      val dims = docs.agg(
        greatest(expr("sum(n_chars) div 100"), lit(1L)).as("step"),
        (expr("max(doc_id) div 256") + 1).as("bw"))
      val bucketed = docs.crossJoin(broadcast(dims))
        .withColumn("bk", expr("doc_id div bw"))
      // pass 1: 256 range totals -> exclusive prefix offsets (tiny)
      val offs = bucketed.groupBy("bk").agg(sum("n_chars").as("bs"))
        .withColumn("off", coalesce(sum("bs").over(
          Window.orderBy("bk")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("bk", "off")
      // pass 2: per-range running sum + broadcast offset = global prefix
      val wb = Window.partitionBy("bk").orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bucketed.join(broadcast(offs), "bk")
        .withColumn("cw", col("off") + sum(col("n_chars")).over(wb))
        .filter(expr("cw div step > (cw - n_chars) div step"))
        .select(col("doc_id"), col("n_chars"), col("cw"),
          expr("cw div step").as("bucket"))
        .orderBy("doc_id")
    },
    Some("""WITH w AS (SELECT doc_id, n_chars,
                              CAST(SUM(n_chars) OVER (ORDER BY doc_id) AS BIGINT) AS cw
                       FROM documents),
                 tot AS (SELECT CAST(GREATEST(SUM(n_chars) // 100, 1) AS BIGINT) AS step
                         FROM documents)
            SELECT doc_id, n_chars, cw, cw // step AS bucket
            FROM w, tot
            WHERE cw // step > (cw - n_chars) // step
            ORDER BY doc_id"""))

  /** Benchmark contamination REPORT: for every corpus document, the
    * fraction of its distinct 8-gram shingles that appear anywhere in the
    * benchmark set (here: doc_id % 50 = 0 stands in for the eval suite).
    * q79/q91 give the binary keep/drop decision; this is the measurement
    * form — the overlap histogram an eval-integrity audit publishes, and
    * the dial for choosing the drop threshold.
    *
    * Scale shape: benchmark n-grams are eval-suite-sized — tiny against the
    * corpus — so the membership probe is a broadcast left join inside the
    * corpus scan stage (the q91 bloom would replace the exact broadcast at
    * extreme benchmark sizes); per-doc ratios are one shuffle on doc_id.
    */
  private val q95 = QueryDef(
    "q95_contamination_overlap",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      val bench = explodeShingles(docs.filter(col("doc_id") % 50 === 0)
          .select("doc_id", "text"), col("text"), 8, "gram")
        .select("gram").distinct()
        .withColumn("hit", lit(1L))
      val grams = explodeShingles(docs.filter(col("doc_id") % 50 =!= 0)
          .select("doc_id", "text"), col("text"), 8, "gram")
        .select("doc_id", "gram").distinct()
      val hits = grams.join(broadcast(bench), Seq("gram"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      val ratio = col("n_hit").cast("double") /
        greatest(col("n_grams"), lit(1L)).cast("double")
      docs.filter(col("doc_id") % 50 =!= 0).select("doc_id")
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"))
        .withColumn("overlap", ratio)
        .withColumn("contaminated", ratio >= lit(0.2))
        .orderBy("doc_id")
    },
    Some(s"""WITH toks AS (SELECT doc_id, $tokSql AS tk FROM documents),
                  g AS (SELECT doc_id, unnest(list_distinct(
                          CASE WHEN len(tk) >= 8
                               THEN list_transform(range(len(tk) - 7),
                                      i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4]
                                        || ' ' || tk[i+5] || ' ' || tk[i+6] || ' ' || tk[i+7] || ' ' || tk[i+8])
                               ELSE []::VARCHAR[] END)) AS gram
                        FROM toks),
                  bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
                  hits AS (SELECT c.doc_id, COUNT(*) AS n_grams,
                                  CAST(SUM(CASE WHEN bench.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
                           FROM (SELECT doc_id, gram FROM g WHERE doc_id % 50 <> 0) c
                           LEFT JOIN bench ON c.gram = bench.gram
                           GROUP BY c.doc_id)
             SELECT d.doc_id,
                    COALESCE(n_grams, 0) AS n_grams,
                    COALESCE(n_hit, 0) AS n_hit,
                    CAST(COALESCE(n_hit, 0) AS DOUBLE)
                      / CAST(GREATEST(COALESCE(n_grams, 0), 1) AS DOUBLE) AS overlap,
                    CAST(COALESCE(n_hit, 0) AS DOUBLE)
                      / CAST(GREATEST(COALESCE(n_grams, 0), 1) AS DOUBLE) >= 0.2 AS contaminated
             FROM documents d LEFT JOIN hits ON d.doc_id = hits.doc_id
             WHERE d.doc_id % 50 <> 0
             ORDER BY d.doc_id"""))

  /** Deterministic training-shard assignment: documents are laid out in
    * md5-hash order (the engine-portable global shuffle — no rand(), same
    * order every run) and dealt round-robin into 16 shards; the output is
    * the per-shard balance report a shard-writing job checks before
    * committing (round-robin over a hash order concentrates token totals
    * tightly around N/16 of the corpus).
    *
    * Scale shape: the global rank is computed in the genuinely distributed
    * two-pass form — an unpartitioned Window.orderBy would funnel the
    * whole corpus through ONE partition (Spark's single-partition window
    * warning), so instead pass 1 aggregates per-hash-prefix bucket counts
    * (256 tiny rows) into exclusive prefix offsets, and pass 2 ranks
    * WITHIN each bucket (a 256-way partitioned window) and adds the
    * broadcast offset. Bucket-then-offset ordering equals the global
    * (h, doc_id) order because the bucket IS h's prefix. The report is a
    * 16-row aggregate; all shard arithmetic is integer, so both engines
    * agree bit-for-bit.
    */
  private val q106 = QueryDef(
    "q106_shard_assignment",
    (s, d) => {
      val base = Tables(s, d, "documents")
        .select(col("doc_id"),
          tokenCount(col("text")).cast("long").as("n_tokens"),
          md5(concat(lit("shard:"), col("doc_id").cast("string"))).as("h"))
        .withColumn("bk", substring(col("h"), 1, 2))
      // the two-pass global rank over the hash-prefix buckets is the
      // shared operators.BucketedRank (bk IS h's prefix, so bucket
      // order equals row order)
      graft.operators.BucketedRank.rank(base, Seq.empty, "bk",
          bucketAsc = true, Seq(col("h").asc, col("doc_id").asc))
        .withColumn("shard", ((col("rank") - 1) % 16).cast("long"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("shard_tokens"))
        .orderBy("shard")
    },
    Some(s"""WITH docs AS (SELECT doc_id,
                             CAST(len($tokSql) AS BIGINT) AS n_tokens,
                             md5('shard:' || CAST(doc_id AS VARCHAR)) AS h
                           FROM documents),
                  b AS (SELECT doc_id, n_tokens, h, substring(h, 1, 2) AS bk
                        FROM docs),
                  offs AS (SELECT bk,
                             COALESCE(CAST(SUM(c) OVER (ORDER BY bk
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                               AS BIGINT), 0) AS off
                           FROM (SELECT bk, COUNT(*) AS c FROM b GROUP BY bk) t),
                  r AS (SELECT b.doc_id, n_tokens,
                               off + ROW_NUMBER() OVER (PARTITION BY b.bk
                                 ORDER BY h, doc_id) AS rank
                        FROM b JOIN offs ON b.bk = offs.bk),
                  sh AS (SELECT doc_id, n_tokens, (rank - 1) % 16 AS shard
                         FROM r)
             SELECT shard, COUNT(*) AS n_docs,
                    CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
             FROM sh GROUP BY shard ORDER BY shard"""))

  /** Shared mixture-weight fragment (q113/q115): per-source token mass and
    * its temperature-scaled sampling weight at alpha = 0.5 — the standard
    * move for upweighting small sources without letting one giant source
    * dominate a training mix (weight_i = n_i^alpha / sum_j n_j^alpha).
    *
    * Cross-engine determinism: sqrt is IEEE correctly-rounded in both
    * engines, so alpha is FIXED at 0.5 (a pow() would be libm-dependent —
    * the q51/q92 ln() rationale); each sqrt is snapped to 4 decimals and
    * the denominator is an exact DECIMAL sum (order-free), then a single
    * double division — both engines see bit-identical operands.
    */
  private val mixSrcsSql =
    s"""srcs AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS n_chars,
                        ${sqlDec("sqrt(CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE))")} AS raw
                 FROM documents GROUP BY source),
        mixtot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS tot, SUM(raw) AS denom
                   FROM srcs)"""

  /** Per-source frame (source, n_chars, max_doc, raw DECIMAL(18,4)) —
    * the Spark twin of the `srcs` CTE above (max_doc rides along so q115
    * derives its range width without a second corpus scan). Eagerly
    * checkpointed: #sources tiny rows, and every consumer (totals,
    * weights, per-source dims) reuses the ONE corpus aggregate instead
    * of re-scanning documents per subtree.
    *
    * Units: the mass column is CHARACTER mass (sum of the parquet
    * n_chars column), named n_chars so it can never be misread as the
    * tokenCount quantity q77/q106 compute. The *_tokens columns the mix
    * queries derive from it are token BUDGETS under the chars-as-token-
    * mass proxy (≈4 chars/token, constant across sources, so shares and
    * weights are unaffected); swap in tokenCount here to make them exact
    * at the cost of the regex scan.
    */
  private def mixSrcs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables(s, d, "documents").groupBy("source")
      .agg(sum("n_chars").cast("long").as("n_chars"),
        max("doc_id").as("max_doc"))
      .withColumn("raw", dec(sqrt(col("n_chars").cast("double"))))
      .localCheckpoint(true)

  /** Temperature-scaled source mixing weights (alpha = 0.5): for every
    * source its token mass, natural share, alpha-scaled sampling weight,
    * the token allocation under a budget of half the corpus, and the
    * implied epochs (allocation / mass — > 1 means the source is repeated,
    * the standard signal that alpha is upsampling it). q110 reports what a
    * mix LOOKS like; this op decides what the mix SHOULD be, and q115
    * executes it.
    *
    * Scale shape: one corpus-scan aggregate with map-side combine down to
    * #sources rows, then a 1-row total broadcast back over those rows —
    * nothing corpus-sized past the first aggregate, no window, no skew
    * exposure (the aggregate key is the source, and partial aggregation
    * absorbs source imbalance on the map side).
    */
  private val q113 = QueryDef(
    "q113_mixture_weights",
    (s, d) => {
      val srcs = mixSrcs(s, d)
      val tots = srcs.agg(sum("n_chars").as("tot"), sum("raw").as("denom"))
      srcs.crossJoin(broadcast(tots))
        .withColumn("share",
          col("n_chars").cast("double") / col("tot").cast("double"))
        .withColumn("weight",
          col("raw").cast("double") / col("denom").cast("double"))
        .withColumn("target_tokens",
          floor(col("weight") * expr("tot div 2").cast("double")).cast("long"))
        .withColumn("epochs",
          col("target_tokens").cast("double") / col("n_chars").cast("double"))
        .select("source", "n_chars", "share", "weight", "target_tokens",
          "epochs")
        .orderBy("source")
    },
    Some(s"""WITH $mixSrcsSql
             SELECT source, n_chars,
                    CAST(n_chars AS DOUBLE) / CAST(tot AS DOUBLE) AS share,
                    CAST(raw AS DOUBLE) / CAST(denom AS DOUBLE) AS weight,
                    CAST(FLOOR(CAST(raw AS DOUBLE) / CAST(denom AS DOUBLE)
                      * CAST(tot // 2 AS DOUBLE)) AS BIGINT) AS target_tokens,
                    CAST(FLOOR(CAST(raw AS DOUBLE) / CAST(denom AS DOUBLE)
                      * CAST(tot // 2 AS DOUBLE)) AS BIGINT)
                      / CAST(n_chars AS DOUBLE) AS epochs
             FROM srcs CROSS JOIN mixtot
             ORDER BY source"""))

  /** Mixture REALIZATION: the q113 weights executed as a deterministic
    * per-source systematic PPS draw — each source gets k_i = max(1,
    * floor(weight_i * 100)) draws, its documents are laid on a per-source
    * cumulative n_chars axis in doc_id order, and one document is taken
    * wherever the running mass crosses a multiple of step_i = mass_i /
    * k_i. Zero randomness (the q94 discipline per source), so the
    * realized mix is reproducible across runs, engines, and
    * partitionings — this is the op that actually BUILDS the training
    * mix q110 reports on.
    *
    * Scale shape: the per-source prefix sum composes q94's two-pass form
    * with q105's per-group bucketing — doc_ids are cut into 256 global
    * ranges, pass 1 aggregates per-(source, range) mass (#sources x 256
    * tiny rows) into per-source exclusive offsets (a window over ranges
    * WITHIN each source — #sources partitions of <= 256 rows), pass 2
    * runs the running sum within each (source, range) cell and adds the
    * broadcast offset. No partition ever holds more than one range of one
    * source — a corpus-sized source never funnels through one task, which
    * is exactly the q105 fix applied to weighted sampling.
    */
  private val q115 = QueryDef(
    "q115_mixture_realization",
    (s, d) => {
      val docs = Tables(s, d, "documents").select("source", "doc_id", "n_chars")
      val srcs = mixSrcs(s, d)
      val denom = srcs.agg(sum("raw").as("denom"))
      val dims = srcs.crossJoin(broadcast(denom))
        .withColumn("k_draws", greatest(
          floor(col("raw").cast("double") / col("denom").cast("double")
            * lit(100.0)).cast("long"), lit(1L)))
        .withColumn("step", greatest(expr("n_chars div k_draws"), lit(1L)))
        .select("source", "step")
      // range width from the checkpointed per-source frame — no second
      // corpus scan for one number
      val bw = srcs.agg((expr("max(max_doc) div 256") + 1).as("bw"))
      val bucketed = docs.crossJoin(broadcast(bw))
        .withColumn("bk", expr("doc_id div bw"))
      // pass 1: per-(source, range) mass -> per-source exclusive offsets
      val offs = bucketed.groupBy("source", "bk").agg(sum("n_chars").as("bs"))
        .withColumn("off", coalesce(sum("bs").over(
          Window.partitionBy("source").orderBy("bk")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("source", "bk", "off")
      // pass 2: in-cell running sum + broadcast offset = per-source prefix
      val wb = Window.partitionBy("source", "bk").orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bucketed.join(broadcast(offs), Seq("source", "bk"))
        .join(broadcast(dims), "source")
        .withColumn("cw", col("off") + sum(col("n_chars")).over(wb))
        .filter(expr("cw div step > (cw - n_chars) div step"))
        .select(col("source"), col("doc_id"), col("n_chars"), col("cw"),
          expr("cw div step").as("bucket"))
        .orderBy("source", "doc_id")
    },
    Some(s"""WITH $mixSrcsSql,
                  dims AS (SELECT source, n_chars,
                             GREATEST(CAST(FLOOR(CAST(raw AS DOUBLE)
                               / CAST(denom AS DOUBLE) * 100.0) AS BIGINT), 1)
                               AS k_draws
                           FROM srcs CROSS JOIN mixtot),
                  d2 AS (SELECT source, GREATEST(n_chars // k_draws, 1) AS step
                         FROM dims),
                  w AS (SELECT d.source, doc_id, n_chars, step,
                               CAST(SUM(n_chars) OVER (PARTITION BY d.source
                                 ORDER BY doc_id) AS BIGINT) AS cw
                        FROM documents d JOIN d2 ON d.source = d2.source)
             SELECT source, doc_id, n_chars, cw, cw // step AS bucket
             FROM w WHERE cw // step > (cw - n_chars) // step
             ORDER BY source, doc_id"""))

  /** Capped epoch schedule under a data-constrained token budget: the
    * training budget here is 2× the unique corpus (the regime where
    * repeat schedules exist at all — the budget exceeds the data), each
    * source's q113-weighted allocation is capped at 2.0 epochs
    * (repeating a source many times yields diminishing returns, so
    * data-constrained practice bounds repeats), and the capped sources'
    * shortfall flows to the under-cap sources in ONE deterministic
    * waterfall round, proportional to their mixture weight. Output is
    * the per-source repeat plan a dataloader consumes: target vs capped
    * allocation and the final epoch count. q113 decides the ideal mix;
    * this op reconciles it with the cap that real data budgets hit.
    *
    * Scale shape: everything after mixSrcs' one corpus-scan aggregate
    * operates on #sources rows — two 1-row broadcast totals (the
    * weight denominator, then the waterfall's alloc sum + uncapped
    * weight mass). Determinism: raw weights are 4-decimal DECIMALs with
    * exact sums; the two divisions and the floor run on bit-identical
    * operands in both engines (the q113 discipline).
    */
  private val q126 = QueryDef(
    "q126_epoch_schedule",
    (s, d) => {
      val srcs = mixSrcs(s, d)
      val tots = srcs.agg(sum("n_chars").as("tot"), sum("raw").as("denom"))
      val w = srcs.crossJoin(broadcast(tots))
        .withColumn("budget", col("tot") * lit(2L))
        .withColumn("target_tokens",
          floor(col("raw").cast("double") / col("denom").cast("double")
            * col("budget").cast("double")).cast("long"))
        .withColumn("cap_tokens", col("n_chars") * lit(2L))
        .withColumn("capped", col("target_tokens") > col("cap_tokens"))
        .withColumn("alloc1", least(col("target_tokens"), col("cap_tokens")))
      val r = w.agg(sum("alloc1").as("asum"),
        sum(when(!col("capped"), col("raw"))).as("raw_u"))
      w.crossJoin(broadcast(r))
        .withColumn("extra",
          when(col("capped") || col("raw_u").isNull, lit(0L))
            .otherwise(floor((col("budget") - col("asum")).cast("double")
              * col("raw").cast("double") / col("raw_u").cast("double"))
              .cast("long")))
        .withColumn("alloc_tokens",
          least(col("alloc1") + col("extra"), col("cap_tokens")))
        .withColumn("final_epochs",
          col("alloc_tokens").cast("double") / col("n_chars").cast("double"))
        .select("source", "n_chars", "target_tokens", "capped",
          "alloc_tokens", "final_epochs")
        .orderBy("source")
    },
    Some(s"""WITH $mixSrcsSql,
                  w AS (SELECT source, n_chars, raw,
                               tot * 2 AS budget,
                               CAST(FLOOR(CAST(raw AS DOUBLE)
                                 / CAST(denom AS DOUBLE)
                                 * CAST(tot * 2 AS DOUBLE)) AS BIGINT)
                                 AS target_tokens,
                               n_chars * 2 AS cap_tokens
                        FROM srcs CROSS JOIN mixtot),
                  w2 AS (SELECT *, target_tokens > cap_tokens AS capped,
                                LEAST(target_tokens, cap_tokens) AS alloc1
                         FROM w),
                  r AS (SELECT CAST(SUM(alloc1) AS BIGINT) AS asum,
                               SUM(CASE WHEN NOT capped THEN raw END) AS raw_u
                        FROM w2),
                  w3 AS (SELECT source, n_chars, target_tokens, capped,
                                LEAST(alloc1 + CASE
                                    WHEN capped OR raw_u IS NULL THEN 0
                                    ELSE CAST(FLOOR(CAST(budget - asum AS DOUBLE)
                                      * CAST(raw AS DOUBLE)
                                      / CAST(raw_u AS DOUBLE)) AS BIGINT) END,
                                  cap_tokens) AS alloc_tokens
                         FROM w2 CROSS JOIN r)
             SELECT source, n_chars, target_tokens, capped, alloc_tokens,
                    CAST(alloc_tokens AS DOUBLE) / CAST(n_chars AS DOUBLE)
                      AS final_epochs
             FROM w3 ORDER BY source"""))

  /** Domain-matched data selection — the DSIR shape (data selection via
    * importance resampling): estimate token distributions for a small
    * TARGET domain (source = 'src0', standing in for the benchmark/
    * fine-tuning corpus) and for the RAW pool, weight every raw document
    * by how target-like its tokens are, and take a per-source quota of
    * the highest-importance documents. The paper's weight is the
    * log-product of per-feature likelihood ratios; this ships the
    * ln-free twin — the arithmetic mean of per-token ratios
    * p_t(tok)/p_r(tok) = (ct+1)(Nr+V+1) / ((cr+1)(Nt+V+1)) — for the
    * q51/q92 reason (libm ln would break the hash gate). Numerator and
    * denominator are exact BIGINT products (bounded by N·N, far under
    * 2^63), so each ratio is ONE correctly-rounded IEEE division,
    * snapped to 4 decimals and DECIMAL-averaged per document.
    *
    * Scale design: both "models" are bounded artifacts — the top-V raw
    * vocabulary with raw AND target counts on it (one TakeOrdered, one
    * broadcast join to attach target counts) plus a 1-row totals frame —
    * broadcast to a single scoring scan of the corpus (broadcast-hash
    * join + map-side partial agg, the q129 shape). The selection quota
    * runs through the exact two-stage [[graft.operators.GroupTopK]], so
    * no per-source window ever sees a corpus-sized partition.
    */
  private val q130 = QueryDef(
    "q130_dsir_selection",
    (s, d) => {
      val docs = Tables(s, d, "documents")
      val v = 2000
      // ONE tokenization pass feeds raw counts, target counts and both
      // totals (the q132 tokStats move — the raw/target distinction is a
      // per-token conditional sum, not a second explode). Checkpointed:
      // vocabulary-sized, four consumers below.
      val tokStats = docs.select(col("source"),
          explode(tokens(col("text"))).as("tok"))
        .groupBy("tok")
        .agg(count(lit(1)).as("cr"),
          sum(when(col("source") === "src0", 1L).otherwise(0L)).as("ct"))
        .localCheckpoint(true)
      val vocab = tokStats.select("tok", "cr", "ct")
        .orderBy(col("cr").desc, col("tok").asc).limit(v)
      val totals = tokStats.agg(
        coalesce(sum("cr"), lit(0L)).as("nr"),
        coalesce(sum("ct"), lit(0L)).as("nt"))
      val scored = docs.select(col("doc_id"), col("source"),
          explode(tokens(col("text"))).as("tok"))
        .join(broadcast(vocab), Seq("tok"), "left")
        .crossJoin(broadcast(totals))
        .withColumn("ratio",
          ((coalesce(col("ct"), lit(0L)) + lit(1L)) *
            (col("nr") + lit(v + 1))).cast("double") /
            ((coalesce(col("cr"), lit(0L)) + lit(1L)) *
              (col("nt") + lit(v + 1))).cast("double"))
        .groupBy("doc_id", "source")
        .agg(count(lit(1)).as("n_toks"), davg(col("ratio")).as("importance"))
      graft.operators.GroupTopK.topK(scored, Seq(col("source")),
          Seq(col("importance").desc, col("doc_id").asc), col("doc_id"), 5)
        .select("source", "rank", "doc_id", "n_toks", "importance")
        .orderBy("source", "rank")
    },
    Some(s"""WITH rawtok AS (SELECT doc_id, source, unnest($tokSql) AS tok
                             FROM documents),
                  tgttok AS (SELECT unnest($tokSql) AS tok FROM documents
                             WHERE source = 'src0'),
                  rawvocab AS (SELECT tok, COUNT(*) AS cr FROM rawtok
                               GROUP BY tok
                               ORDER BY COUNT(*) DESC, tok ASC LIMIT 2000),
                  tgtcnt AS (SELECT tok, COUNT(*) AS ct FROM tgttok
                             GROUP BY tok),
                  vocab AS (SELECT tok, cr,
                              CAST(COALESCE(ct, 0) AS BIGINT) AS ct
                            FROM rawvocab LEFT JOIN tgtcnt USING (tok)),
                  tot AS (SELECT (SELECT COUNT(*) FROM rawtok) AS nr,
                                 (SELECT COUNT(*) FROM tgttok) AS nt),
                  scored AS (SELECT doc_id, source, COUNT(*) AS n_toks,
                               ${sqlDavg("ratio")} AS importance
                             FROM (SELECT doc_id, source,
                                     CAST((COALESCE(ct, 0) + 1)
                                       * (nr + 2001) AS DOUBLE)
                                     / CAST((COALESCE(cr, 0) + 1)
                                       * (nt + 2001) AS DOUBLE) AS ratio
                                   FROM rawtok LEFT JOIN vocab USING (tok)
                                        CROSS JOIN tot) t
                             GROUP BY doc_id, source)
             SELECT source, rank, doc_id, n_toks, importance FROM (
               SELECT source, doc_id, n_toks, importance,
                      ROW_NUMBER() OVER (PARTITION BY source
                        ORDER BY importance DESC, doc_id ASC) AS rank
               FROM scored) r
             WHERE rank <= 5 ORDER BY source, rank"""))

  /** Corpus funnel — the per-stage attrition dashboard every data team
    * builds over its curation pipeline, as one registered query: the
    * training universe (q66's train split) gated in sequence by quality
    * (q56's bar), exact dedup (keep-first on the content hash), and
    * benchmark decontamination (q79's 5-shingle eval-overlap sweep),
    * reporting surviving documents AND tokens per stage. The funnel is
    * how "we filtered aggressively" becomes a number — and how a broken
    * gate (a stage suddenly dropping 90%) is caught before training.
    *
    * Scale shape: ONE tokenization scan computes every per-doc gate
    * input (quality, content hash, token count) and is materialized once
    * for the four stage aggregates (1 row each); the dedup stage is the
    * q56 content-hash window (post-gate survivors only); the
    * decontamination stage explodes shingles for DEDUP SURVIVORS only
    * and probes the broadcast eval-shingle set map-side. Nothing else
    * shuffles.
    */
  private val q151 = QueryDef(
    "q151_corpus_funnel",
    (s, d) => {
      val base = Tables(s, d, "documents")
        .select(col("doc_id"), col("text"),
          substring(md5(concat(lit("split:"), col("doc_id").cast("string"))),
            1, 2).as("h2"),
          qualityScore(col("text")).as("quality"),
          contentHash(col("text")).as("content_hash"),
          tokenCount(col("text")).cast("long").as("n_tokens"))
        .localCheckpoint(true)
      val s0 = base.filter(col("h2") < "e6")
      val s1 = s0.filter(col("quality") >= 0.5)
      val w = Window.partitionBy("content_hash").orderBy(col("doc_id").asc)
      val s2 = s1.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
        .localCheckpoint(true) // feeds the shingle probe AND two aggregates
      val sh = s2
        .withColumn("tk", tokens(col("text")))
        .withColumn("sh", explode(expr(
          "CASE WHEN size(tk) >= 5 THEN array_distinct(transform(" +
            "sequence(1, size(tk) - 4), i -> concat_ws(' ', slice(tk, i, 5))))" +
            " ELSE array() END")))
        .select("doc_id", "sh")
      val evalSh = base.filter(col("h2") >= "e6")
        .withColumn("tk", tokens(col("text")))
        .withColumn("sh", explode(expr(
          "CASE WHEN size(tk) >= 5 THEN array_distinct(transform(" +
            "sequence(1, size(tk) - 4), i -> concat_ws(' ', slice(tk, i, 5))))" +
            " ELSE array() END")))
        .select("sh").distinct()
      val contaminated = sh.join(broadcast(evalSh), "sh")
        .select("doc_id").distinct()
      val s3 = s2.join(contaminated, Seq("doc_id"), "left_anti")
      def stage(df: org.apache.spark.sql.DataFrame, name: String) =
        df.agg(coalesce(count(lit(1)), lit(0L)).as("n_docs"),
            coalesce(sum("n_tokens"), lit(0L)).as("n_tokens"))
          .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"))
      stage(s0, "0_train_universe")
        .unionAll(stage(s1, "1_quality_gate"))
        .unionAll(stage(s2, "2_exact_dedup"))
        .unionAll(stage(s3, "3_decontaminated"))
        .orderBy("stage")
    },
    Some(s"""WITH base AS (SELECT doc_id, text,
                             substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) AS h2,
                             $qualitySql AS quality,
                             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash,
                             CAST($nTokSql AS BIGINT) AS n_tokens,
                             $tokSql AS tk
                           FROM documents),
                  s0 AS (SELECT * FROM base WHERE h2 < 'e6'),
                  s1 AS (SELECT * FROM s0 WHERE quality >= 0.5),
                  s2 AS (SELECT * FROM (
                           SELECT *, ROW_NUMBER() OVER (PARTITION BY content_hash
                             ORDER BY doc_id ASC) AS rn
                           FROM s1) t WHERE rn = 1),
                  sh AS (SELECT DISTINCT doc_id, s FROM (
                           SELECT doc_id, unnest(list_distinct(
                             CASE WHEN len(tk) >= 5
                                  THEN list_transform(range(len(tk) - 4),
                                         i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
                                              || ' ' || tk[i+4] || ' ' || tk[i+5])
                                  ELSE []::VARCHAR[] END)) AS s
                           FROM s2) x),
                  ev AS (SELECT DISTINCT s FROM (
                           SELECT unnest(list_distinct(
                             CASE WHEN len(tk) >= 5
                                  THEN list_transform(range(len(tk) - 4),
                                         i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
                                              || ' ' || tk[i+4] || ' ' || tk[i+5])
                                  ELSE []::VARCHAR[] END)) AS s
                           FROM base WHERE h2 >= 'e6') y),
                  cont AS (SELECT DISTINCT doc_id FROM sh JOIN ev ON sh.s = ev.s),
                  s3 AS (SELECT * FROM s2 ANTI JOIN cont ON s2.doc_id = cont.doc_id)
             SELECT stage, n_docs, n_tokens FROM (
               SELECT '0_train_universe' AS stage, COUNT(*) AS n_docs,
                      COALESCE(CAST(SUM(n_tokens) AS BIGINT), 0) AS n_tokens FROM s0
               UNION ALL
               SELECT '1_quality_gate', COUNT(*),
                      COALESCE(CAST(SUM(n_tokens) AS BIGINT), 0) FROM s1
               UNION ALL
               SELECT '2_exact_dedup', COUNT(*),
                      COALESCE(CAST(SUM(n_tokens) AS BIGINT), 0) FROM s2
               UNION ALL
               SELECT '3_decontaminated', COUNT(*),
                      COALESCE(CAST(SUM(n_tokens) AS BIGINT), 0) FROM s3) f
             ORDER BY stage"""))

  /** Reproducible training-order manifest: every document's position in
    * every epoch, from a SEEDED deterministic shuffle (md5 of
    * epoch:doc_id) — the artifact that makes a training run replayable
    * and resumable: two runs see byte-identical data order, "resume from
    * step S of epoch e" is a filter on this relation, and a data-order
    * ablation (does epoch-2 order matter?) is a join. rand()-shuffled
    * loaders can do none of that. Per-epoch reshuffle falls out of the
    * seed: the hash changes with the epoch component, so each epoch is
    * an independent uniform permutation.
    *
    * Scale shape: the manifest is corpus × epochs rows of three small
    * columns; positions come from the exact two-pass
    * [[graft.operators.BucketedRank]] on (epoch, hash-prefix range)
    * cells — no epoch-sized single-task sort window (the q105 trap, per
    * epoch). The oracle ranks with a plain per-epoch window; same
    * values, different physics.
    */
  private val q153 = QueryDef(
    "q153_epoch_order_manifest",
    (s, d) => {
      val keyed = Tables(s, d, "documents").select(col("doc_id"))
        .withColumn("epoch", explode(sequence(lit(0), lit(2))))
        .withColumn("h", md5(concat(lit("order:"), col("epoch").cast("string"),
          lit(":"), col("doc_id").cast("string"))))
        .withColumn("bk", substring(col("h"), 1, 2))
      graft.operators.BucketedRank.rank(keyed, Seq("epoch"), "bk",
          bucketAsc = true, order = Seq(col("h").asc, col("doc_id").asc),
          rankName = "step")
        .select("epoch", "step", "doc_id")
        .orderBy("epoch", "step")
    },
    Some("""SELECT CAST(epoch AS INTEGER) AS epoch, step, doc_id FROM (
              SELECT epoch, doc_id,
                     ROW_NUMBER() OVER (PARTITION BY epoch
                       ORDER BY md5('order:' || CAST(epoch AS VARCHAR)
                         || ':' || CAST(doc_id AS VARCHAR)) ASC,
                         doc_id ASC) AS step
              FROM documents, range(3) r(epoch)) t
            ORDER BY epoch, step"""))

  override def defs: Seq[QueryDef] =
    Seq(q56, q57, q58, q59, q60, q61, q63, q66, q67, q68, q69, q70,
      q76, q77, q78, q79, q91, q94, q95, q106, q113, q115, q126, q130, q144,
      q151, q153)
}
