package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by modules under graft.queries; each QueryDef
  * carries its Spark program and (when SQL-expressible) its DuckDB oracle.
  */
object SparkEntry {

  def modules: Seq[QueryModule] = Seq(
    CoreQueries, RelationalQueries, TextQueries, DedupQueries,
    SimilarityQueries, EventQueries, MiscQueries, PipelineQueries,
    SearchQueries, QuantQueries, GovernanceQueries)

  private lazy val all: Seq[QueryDef] = {
    val defs = modules.flatMap(_.defs)
    // a duplicate name would silently drop a query in the toMap below
    val dups = defs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    defs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
