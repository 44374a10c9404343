package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import Exact._

/** The backend-SQL surface the reference delegates to its databases
  * (SURVEY.md §2.4-§2.7, §2.11), answered natively by Catalyst: join
  * varieties, window functions, sorts/limits, set ops, scalar string/date
  * functions, CASE, HAVING, IN-subqueries.
  *
  * Scale notes: dimension sides of joins are broadcast explicitly; windows
  * partition on high-cardinality keys (custkey/suppkey) so state per key is
  * tiny; top-k uses sort+limit which Spark executes as TakeOrderedAndProject
  * (per-partition heaps, no global sort materialization).
  */
object RelationalQueries extends QueryModule {

  /** Left-semi join = EXISTS: customers having at least one open order. */
  private val q09 = QueryDef(
    "q09_semi_join",
    (s, d) => {
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders").filter(col("o_orderstatus") === "O")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
            ORDER BY c_custkey"""))

  /** Left-anti join = NOT EXISTS: customers with no urgent order. */
  private val q10 = QueryDef(
    "q10_anti_join",
    (s, d) => {
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderpriority = '1-URGENT')
            ORDER BY c_custkey"""))

  /** Left-outer join + grouped count, preserving empty groups (nation with
    * zero customers still appears, count 0).
    */
  private val q11 = QueryDef(
    "q11_outer_join_count",
    (s, d) => {
      val n = Tables(s, d, "nation")
      val c = Tables(s, d, "customer")
      n.join(c, n("n_nationkey") === c("c_nationkey"), "left_outer")
        .groupBy(n("n_nationkey"), n("n_name"))
        .agg(count(c("c_custkey")).as("n_customers"))
        .orderBy("n_nationkey")
    },
    Some("""SELECT n_nationkey, n_name, COUNT(c_custkey) AS n_customers
            FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
            GROUP BY n_nationkey, n_name ORDER BY n_nationkey"""))

  /** Window top-N per group: 3 priciest orders per customer (row_number with
    * a unique tie-break so both engines agree).
    */
  private val q12 = QueryDef(
    "q12_window_topn",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
              FROM orders) t
            WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  /** Running (cumulative) sum per supplier in ship order — frame-ordered
    * decimal summation is exact and identical on both engines.
    */
  private val q13 = QueryDef(
    "q13_window_running_sum",
    (s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc,
          col("l_linenumber").asc, col("l_partkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, d, "lineitem")
        .withColumn("running_qty", sum(dec(col("l_quantity"))).over(w).cast("double"))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_partkey", "l_shipdate", "running_qty")
        .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber", "l_partkey")
    },
    Some(s"""SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey, l_shipdate,
                    CAST(SUM(${sqlDec("l_quantity")}) OVER (
                      PARTITION BY l_suppkey
                      ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC, l_partkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                    AS running_qty
             FROM lineitem
             ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_partkey"""))

  /** lag/lead: per-customer order-to-order price delta. */
  private val q14 = QueryDef(
    "q14_window_lag",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables(s, d, "orders")
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("delta", col("o_totalprice") - col("prev_price"))
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
                "prev_price", "delta")
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
                   LAG(o_totalprice, 1) OVER w AS prev_price,
                   o_totalprice - LAG(o_totalprice, 1) OVER w AS delta
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
            ORDER BY o_custkey, o_orderdate, o_orderkey"""))

  /** rank/dense_rank with real ties (retail price within brand). */
  private val q15 = QueryDef(
    "q15_window_rank",
    (s, d) => {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc)
      Tables(s, d, "part")
        .withColumn("price_rank", rank().over(w))
        .withColumn("price_dense_rank", dense_rank().over(w))
        .select("p_brand", "p_partkey", "p_retailprice",
                "price_rank", "price_dense_rank")
        .orderBy("p_brand", "p_partkey")
    },
    Some("""SELECT p_brand, p_partkey, p_retailprice,
                   RANK() OVER w AS price_rank,
                   DENSE_RANK() OVER w AS price_dense_rank
            FROM part
            WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC)
            ORDER BY p_brand, p_partkey"""))

  /** ORDER BY ... LIMIT top-k — Spark plans TakeOrderedAndProject (per-
    * partition heaps + driver merge; no global sort at 100 TB).
    */
  private val q16 = QueryDef(
    "q16_sort_topk",
    (s, d) => Tables(s, d, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select("o_orderkey", "o_custkey", "o_totalprice"),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"""))

  /** Set operations: UNION (dedup), INTERSECT, EXCEPT over key sets. */
  private val q17 = QueryDef(
    "q17_set_ops",
    (s, d) => {
      val o = Tables(s, d, "orders")
      val big = o.filter(col("o_totalprice") > 300000.0).select("o_custkey")
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      val union = big.union(urgent).distinct().withColumn("op", lit("union"))
      val inter = big.intersect(urgent).withColumn("op", lit("intersect"))
      val minus = big.except(urgent).withColumn("op", lit("except"))
      union.union(inter).union(minus).orderBy("op", "o_custkey")
    },
    Some("""WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0),
                 urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
            SELECT o_custkey, 'union' AS op FROM (SELECT o_custkey FROM big UNION SELECT o_custkey FROM urgent)
            UNION ALL
            SELECT o_custkey, 'intersect' AS op FROM (SELECT o_custkey FROM big INTERSECT SELECT o_custkey FROM urgent)
            UNION ALL
            SELECT o_custkey, 'except' AS op FROM (SELECT o_custkey FROM big EXCEPT SELECT o_custkey FROM urgent)
            ORDER BY op, o_custkey"""))

  /** DISTINCT — implicit dedup-by-constraint analogue (§2.6). */
  private val q18 = QueryDef(
    "q18_distinct",
    (s, d) => Tables(s, d, "lineitem")
      .select("l_returnflag", "l_linestatus").distinct()
      .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
            ORDER BY l_returnflag, l_linestatus"""))

  /** Scalar string functions (§2.7): LOWER/UPPER, substring, length,
    * concat, regexp_extract, CASE.
    */
  private val q19 = QueryDef(
    "q19_scalar_string",
    (s, d) => Tables(s, d, "part")
      .select(
        col("p_partkey"),
        lower(col("p_name")).as("name_lower"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        length(col("p_name")).as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_extract(col("p_name"), "[a-z]+", 0).as("first_word"),
        when(col("p_size") > 25, lit("large"))
          .when(col("p_size") > 10, lit("medium"))
          .otherwise(lit("small")).as("size_class"))
      .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
                   LOWER(p_name) AS name_lower,
                   SUBSTRING(p_type, 1, 5) AS type_prefix,
                   LENGTH(p_name) AS name_len,
                   CONCAT_WS('|', p_brand, p_type) AS brand_type,
                   REGEXP_EXTRACT(p_name, '[a-z]+') AS first_word,
                   CASE WHEN p_size > 25 THEN 'large'
                        WHEN p_size > 10 THEN 'medium'
                        ELSE 'small' END AS size_class
            FROM part ORDER BY p_partkey"""))

  /** Scalar date/time functions (§2.7): extraction + truncation. */
  private val q20 = QueryDef(
    "q20_scalar_datetime",
    (s, d) => Tables(s, d, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"),
        dayofmonth(col("o_orderdate")).as("order_day"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(lit(java.sql.Date.valueOf("2002-01-01")), col("o_orderdate"))
          .as("days_before_2002"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
                   CAST(YEAR(o_orderdate) AS INT) AS order_year,
                   CAST(MONTH(o_orderdate) AS INT) AS order_month,
                   CAST(DAY(o_orderdate) AS INT) AS order_day,
                   DATE_TRUNC('month', o_orderdate) AS month_start,
                   CAST(DATEDIFF('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS INT)
                     AS days_before_2002
            FROM orders ORDER BY o_orderkey"""))

  /** Conditional aggregation (CASE inside SUM) — pivot-style totals. */
  private val q21 = QueryDef(
    "q21_case_pivot",
    (s, d) => Tables(s, d, "lineitem")
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("l_returnflag") === "R", dec(col("l_quantity")))
          .otherwise(lit(0).cast("decimal(18,4)"))).cast("double").as("qty_returned"),
        sum(when(col("l_returnflag") === "A", dec(col("l_quantity")))
          .otherwise(lit(0).cast("decimal(18,4)"))).cast("double").as("qty_accepted"),
        sum(when(col("l_returnflag") === "N", dec(col("l_quantity")))
          .otherwise(lit(0).cast("decimal(18,4)"))).cast("double").as("qty_none"))
      .orderBy("l_linestatus"),
    Some(s"""SELECT l_linestatus,
                    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN ${sqlDec("l_quantity")} ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_returned,
                    CAST(SUM(CASE WHEN l_returnflag = 'A' THEN ${sqlDec("l_quantity")} ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_accepted,
                    CAST(SUM(CASE WHEN l_returnflag = 'N' THEN ${sqlDec("l_quantity")} ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_none
             FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""))

  /** HAVING: suppliers that shipped more than a threshold total quantity. */
  private val q22 = QueryDef(
    "q22_having",
    (s, d) => Tables(s, d, "lineitem")
      .groupBy("l_suppkey")
      .agg(dsum(col("l_quantity")).as("total_qty"),
           count(lit(1)).as("n_lines"))
      .filter(col("total_qty") > 14000.0)
      .orderBy("l_suppkey"),
    Some(s"""SELECT l_suppkey, ${sqlDsum("l_quantity")} AS total_qty,
                    COUNT(*) AS n_lines
             FROM lineitem GROUP BY l_suppkey
             HAVING CAST(SUM(${sqlDec("l_quantity")}) AS DOUBLE) > 14000.0
             ORDER BY l_suppkey"""))

  /** IN-subquery (planned as semi join): orders from rich customers. */
  private val q23 = QueryDef(
    "q23_in_subquery",
    (s, d) => {
      val rich = Tables(s, d, "customer")
        .filter(col("c_acctbal") > 9000.0).select("c_custkey")
      val o = Tables(s, d, "orders")
      o.join(broadcast(rich), o("o_custkey") === rich("c_custkey"), "left_semi")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0)
            ORDER BY o_orderkey"""))

  /** Scalar math (§2.7): abs/floor/ceil/sqrt/mod — IEEE-deterministic ops
    * only (no round/pow whose rounding modes differ across engines).
    */
  private val q24 = QueryDef(
    "q24_scalar_math",
    (s, d) => Tables(s, d, "supplier")
      .select(
        col("s_suppkey"),
        abs(col("s_acctbal")).as("bal_abs"),
        floor(col("s_acctbal")).as("bal_floor"),
        ceil(col("s_acctbal")).as("bal_ceil"),
        sqrt(abs(col("s_acctbal"))).as("bal_sqrt"),
        (col("s_suppkey") % 7).as("key_mod7"))
      .orderBy("s_suppkey"),
    Some("""SELECT s_suppkey,
                   ABS(s_acctbal) AS bal_abs,
                   CAST(FLOOR(s_acctbal) AS BIGINT) AS bal_floor,
                   CAST(CEIL(s_acctbal) AS BIGINT) AS bal_ceil,
                   SQRT(ABS(s_acctbal)) AS bal_sqrt,
                   s_suppkey % 7 AS key_mod7
            FROM supplier ORDER BY s_suppkey"""))

  /** Range join: every lineitem priced into its band by a non-equi
    * interval join against a tiny broadcast band dimension — the range-join
    * shape (SURVEY §2: the named operator example Spark has no native
    * node for). With a handful of intervals the honest plan is a broadcast
    * nested-loop join whose inner side is 5 rows — per-row cost is a
    * 5-interval scan, linear overall. At real scale with many intervals,
    * the standard rewrite prejoins on a coarse bin key (floor(price /
    * binWidth) equality) and checks bounds inside the bin — equality-join
    * cost with interval semantics.
    */
  private val q84 = QueryDef(
    "q84_range_join_bands",
    (s, d) => {
      import s.implicits._
      val bands = Seq(
        ("p0_under_1k", 0d, 1000d),
        ("p1_1k_5k", 1000d, 5000d),
        ("p2_5k_20k", 5000d, 20000d),
        ("p3_20k_50k", 20000d, 50000d),
        ("p4_50k_plus", 50000d, Double.MaxValue))
        .toDF("band", "lo", "hi")
      Tables(s, d, "lineitem")
        .join(broadcast(bands),
          col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("band")
    },
    Some(s"""WITH bands(band, lo, hi) AS (VALUES
               ('p0_under_1k', 0.0, 1000.0),
               ('p1_1k_5k', 1000.0, 5000.0),
               ('p2_5k_20k', 5000.0, 20000.0),
               ('p3_20k_50k', 20000.0, 50000.0),
               ('p4_50k_plus', 50000.0, 1.7976931348623157e308))
             SELECT band, COUNT(*) AS n_items,
                    ${sqlDsum("l_extendedprice")} AS sum_price
             FROM lineitem JOIN bands
               ON l_extendedprice >= lo AND l_extendedprice < hi
             GROUP BY band ORDER BY band"""))

  /** CDC batch apply (MERGE semantics, last-writer-wins): a change batch of
    * upserts and deletes merges into a snapshot — rows untouched by the
    * batch survive, 'U' rows replace/insert with their new values, 'D' rows
    * vanish. The snapshot (orderkey % 4 <> 3) and the deterministic batch
    * (orderkey % 3 = 0; deletes where % 9 = 0, updates repriced ×1.1)
    * derive from `orders` so the oracle can mirror them; the operator is
    * the standard two-piece MERGE plan — anti join for survivors, batch
    * projection for upserts — that any CDC ingestion compiles to.
    *
    * Scale shape: one hash shuffle of both sides on the merge key (the
    * batch is normally the small side and broadcast; at 100 TB the snapshot
    * is bucketed on the key so the merge is shuffle-free and the rewrite
    * touches only buckets the batch hits — the Db.appendIfAbsent upsert's
    * table-scale sibling).
    */
  private val q97 = QueryDef(
    "q97_cdc_merge",
    (s, d) => {
      val o = Tables(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val snap = o.filter(col("o_orderkey") % 4 =!= 3)
      val batch = o.filter(col("o_orderkey") % 3 === 0)
        .withColumn("op", when(col("o_orderkey") % 9 === 0, lit("D")).otherwise(lit("U")))
      val kept = snap
        .join(batch.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
        .withColumn("change_type", lit("kept"))
      val upserted = batch.filter(col("op") === "U")
        .select(col("o_orderkey"), col("o_custkey"),
          lit("U").as("o_orderstatus"),
          (col("o_totalprice") * lit(1.1)).as("o_totalprice"),
          lit("upserted").as("change_type"))
      kept.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "change_type")
        .unionAll(upserted)
        .orderBy("o_orderkey")
    },
    Some("""WITH snap AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
                          FROM orders WHERE o_orderkey % 4 <> 3),
                 batch AS (SELECT o_orderkey, o_custkey, o_totalprice,
                                  CASE WHEN o_orderkey % 9 = 0 THEN 'D' ELSE 'U' END AS op
                           FROM orders WHERE o_orderkey % 3 = 0)
            SELECT s.o_orderkey, s.o_custkey, s.o_orderstatus, s.o_totalprice,
                   'kept' AS change_type
            FROM snap s ANTI JOIN batch b ON s.o_orderkey = b.o_orderkey
            UNION ALL
            SELECT o_orderkey, o_custkey, 'U', o_totalprice * 1.1, 'upserted'
            FROM batch WHERE op = 'U'
            ORDER BY o_orderkey"""))

  override def defs: Seq[QueryDef] = Seq(
    q09, q10, q11, q12, q13, q14, q15, q16,
    q17, q18, q19, q20, q21, q22, q23, q24, q84, q97)
}
