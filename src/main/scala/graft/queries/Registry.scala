package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A judged query: the Spark program plus (when SQL-expressible) its ANSI-SQL
  * twin that the driver runs in DuckDB over the same parquet tables. Keeping
  * the pair in one value keeps column aliases in lockstep (the driver's
  * compare sorts columns by name before hashing).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def defs: Seq[QueryDef]
}
