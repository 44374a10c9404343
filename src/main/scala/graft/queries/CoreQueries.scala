package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import Exact._

/** The reference's extract / transform / query surface re-expressed as native
  * Catalyst plans. etlhelper delegates all query semantics to backend SQL
  * (/root/reference/etlhelper/etl.py:95); this module answers that SQL surface
  * (SURVEY.md §2.11) natively: scans, parameterized predicates, projections,
  * limits, GROUP BY aggregates — each with a DuckDB oracle twin.
  *
  * Scale notes: every query is a declarative plan — filters/projections reach
  * the parquet scan via Catalyst pushdown; aggregates use partial (map-side)
  * aggregation; sorts for determinism sit on top of already-reduced data
  * except q01/q03 (full extracts, which ARE the operator being demonstrated).
  */
object CoreQueries extends QueryModule {

  /** O4 fetchall (etl.py:207-230): materialize a whole SELECT. The Spark form
    * is the scan itself; ORDER BY on the unique key makes the dump
    * deterministic for the differential harness.
    */
  private val q01 = QueryDef(
    "q01_fetchall_scan",
    (s, d) => Tables(s, d, "lineitem")
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
    Some("SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey"))

  /** O3 fetchone (etl.py:172-204): first row of an ordered result. */
  private val q02 = QueryDef(
    "q02_fetchone",
    (s, d) => Tables(s, d, "orders")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .limit(1),
    Some("SELECT * FROM orders ORDER BY o_orderdate ASC, o_orderkey ASC LIMIT 1"))

  /** O1 iter_chunks (etl.py:53-139): chunked extract with projection.
    * Chunking maps to partitioned scans; the projection+filter are pushed
    * into the parquet reader (ReadSchema lists 4 of 11 columns).
    */
  private val q03 = QueryDef(
    "q03_chunked_extract",
    (s, d) => Tables(s, d, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")
      .filter(col("l_quantity") >= 30.0)
      .orderBy("l_orderkey", "l_linenumber", "l_partkey"),
    Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
            FROM lineitem WHERE l_quantity >= 30.0
            ORDER BY l_orderkey, l_linenumber, l_partkey"""))

  /** §2.3 parameterized predicates (test_etl_extract.py:80-87): positional /
    * named binds become Scala closure parameters over Column expressions.
    */
  private val q04 = QueryDef(
    "q04_filter_params", {
      val minDate = java.sql.Timestamp.valueOf("1998-01-01 00:00:00")
      val maxDisc = 0.05
      (s, d) => Tables(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit(minDate) && col("l_discount") <= lit(maxDisc))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_shipdate", "l_discount", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_shipdate, l_discount, l_returnflag
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00' AND l_discount <= 0.05
            ORDER BY l_orderkey, l_linenumber, l_partkey"""))

  /** §2.8 transform (etl.py:134-135, test_etl_transform.py:152-159): the
    * reference's chunk-transform examples — shift a key, upper-case a string,
    * strip newlines — as Catalyst column expressions (codegen'd, no UDF).
    */
  private val q05 = QueryDef(
    "q05_transform_project",
    (s, d) => Tables(s, d, "customer")
      .select(
        (col("c_custkey") + 1000L).as("shifted_key"),
        upper(col("c_name")).as("name_upper"),
        regexp_replace(col("c_mktsegment"), "\n", " ").as("segment_clean"),
        coalesce(col("c_acctbal"), lit(0.0)).as("acctbal"))
      .orderBy("shifted_key"),
    Some("""SELECT c_custkey + 1000 AS shifted_key,
                   UPPER(c_name) AS name_upper,
                   REGEXP_REPLACE(c_mktsegment, '\n', ' ') AS segment_clean,
                   COALESCE(c_acctbal, 0.0) AS acctbal
            FROM customer ORDER BY shifted_key"""))

  /** §2.5 the reference's canonical aggregate (demo_copy_rows.py:6-13):
    * SUM(amount) ... WHERE key > N GROUP BY customer. Partial aggregation
    * map-side; one shuffle on the group key.
    */
  private val q06 = QueryDef(
    "q06_groupby_sum",
    (s, d) => Tables(s, d, "orders")
      .filter(col("o_orderkey") > 1000L)
      .groupBy("o_custkey")
      .agg(dsum(col("o_totalprice")).as("total_spend"),
           count(lit(1)).as("n_orders"))
      .orderBy("o_custkey"),
    Some(s"""SELECT o_custkey, ${sqlDsum("o_totalprice")} AS total_spend,
                    COUNT(*) AS n_orders
             FROM orders WHERE o_orderkey > 1000
             GROUP BY o_custkey ORDER BY o_custkey"""))

  /** §2.5 multi-aggregate pricing summary (TPC-H Q1 shape) over lineitem. */
  private val q07 = QueryDef(
    "q07_agg_pricing",
    (s, d) => Tables(s, d, "lineitem")
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("2001-09-01 00:00:00")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some(s"""SELECT l_returnflag, l_linestatus,
                    ${sqlDsum("l_quantity")} AS sum_qty,
                    ${sqlDsum("l_extendedprice")} AS sum_base_price,
                    CAST(SUM(${sqlDec("l_extendedprice")} * (1 - ${sqlDec("l_discount")})) AS DOUBLE) AS sum_disc_price,
                    ${sqlDavg("l_quantity")} AS avg_qty,
                    ${sqlDavg("l_discount")} AS avg_disc,
                    COUNT(*) AS count_order
             FROM lineitem
             WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
             GROUP BY l_returnflag, l_linestatus
             ORDER BY l_returnflag, l_linestatus"""))

  /** §2.4 equi-join across the star schema: customer ⋈ orders ⋈ lineitem.
    * customer is tiny relative to the fact tables at every SF => explicit
    * broadcast hint keeps the plan shuffle-free on that side at 100 TB
    * (orders⋈lineitem still shuffles on orderkey — unavoidable without
    * co-bucketing, which CopySpec demonstrates separately).
    */
  private val q08 = QueryDef(
    "q08_join_revenue",
    (s, d) => {
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders")
      val l = Tables(s, d, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(c("c_custkey"), c("c_name"))
        .agg(sum(dec(l("l_extendedprice")) * (lit(1) - dec(l("l_discount"))))
              .cast("double").as("revenue"),
             count(lit(1)).as("n_items"))
        .orderBy("c_custkey")
    },
    Some(s"""SELECT c_custkey, c_name,
                    CAST(SUM(${sqlDec("l_extendedprice")} * (1 - ${sqlDec("l_discount")})) AS DOUBLE) AS revenue,
                    COUNT(*) AS n_items
             FROM lineitem
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             GROUP BY c_custkey, c_name
             ORDER BY c_custkey"""))

  override def defs: Seq[QueryDef] = Seq(q01, q02, q03, q04, q05, q06, q07, q08)
}
