package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import graft.{DbParams, EtlExtractError}

/** Extraction operators (reference O1-O4, /root/reference/etlhelper/etl.py:53-230),
  * Spark-first: a partitioned DataFrame IS the lazy chunk stream — each JDBC
  * fetch block / parquet row-group plays the role of a 5000-row chunk, and
  * Catalyst's lazy plan is the generator laziness. The driver-side iterator
  * views exist for API parity but the distributed DataFrame is the intended
  * surface at scale (toLocalIterator funnels through the driver).
  */
object Extract {

  /** O1 root extraction from a JDBC SELECT: chunk_size -> fetchsize.
    * Parallel chunking (numPartitions + partitionColumn bounds) is the
    * upgrade the single-threaded reference cannot do.
    */
  def fromJdbc(spark: SparkSession, db: DbParams, query: String,
      passwordVariable: Option[String] = None, chunkSize: Int = 5000,
      partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame =
    try {
      // reference log contract: 'Fetching rows (chunk_size=N)' at INFO
      // plus SQL/parameters/target at DEBUG (etl.py:85-87). Parameters
      // are pre-bound into `query` on this surface, so the slot renders
      // () like the reference's empty tuple; the target is the JDBC URL
      // (never carries a password).
      graft.Logging.logFetching(chunkSize, query, "()", db.jdbcUrl)
      partitionColumn match {
        case Some((col, lower, upper, n)) =>
          partitionedRead(spark, db, query, passwordVariable, chunkSize,
            col, lower.toString, upper.toString, n)
        case None =>
          spark.read.format("jdbc")
            .options(db.readOptions(query, passwordVariable, chunkSize))
            .load()
      }
    } catch {
      case e: Exception =>
        throw new EtlExtractError(s"Error executing query: ${e.getMessage}", query, e)
    }

  /** Shared partitioned-read assembly: Spark rejects `query` +
    * `partitionColumn` together, so the partitioned form goes through
    * `dbtable` as a derived table Spark can append range predicates to.
    * Bounds are strings because Spark parses numeric, date, and timestamp
    * forms — callers with Longs stringify.
    */
  private def partitionedRead(spark: SparkSession, db: DbParams, query: String,
      passwordVariable: Option[String], chunkSize: Int,
      col: String, lower: String, upper: String, n: Int): DataFrame =
    spark.read.format("jdbc")
      .options(db.readOptions(query, passwordVariable, chunkSize)
        - "query" + ("dbtable" -> s"($query) graft_subq"))
      .option("partitionColumn", col)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", n.toString)
      .load()

  /** Auto-partitioned whole-table read: probe MIN/MAX of the split column
    * with one tiny query, then fan out `numPartitions` range readers — the
    * zero-config form of the `partitionColumn` quadruple for the common
    * "read this whole big table in parallel" case. Empty tables fall back
    * to a single-partition read.
    */
  def fromJdbcAutoPartitioned(spark: SparkSession, db: DbParams, table: String,
      column: String, numPartitions: Int, passwordVariable: Option[String] = None,
      chunkSize: Int = 5000): DataFrame = {
    graft.Identifiers.validate(table)
    graft.Identifiers.validate(column)
    val bounds = fromJdbc(spark, db,
      s"SELECT MIN($column) AS lo, MAX($column) AS hi FROM $table",
      passwordVariable).head()
    val select = s"SELECT * FROM $table"
    if (bounds.isNullAt(0)) fromJdbc(spark, db, select, passwordVariable, chunkSize)
    else
      try
        // bounds travel as their string forms, which Spark's JDBC source
        // parses for numeric, date, AND timestamp partition columns — a
        // Number-only cast here would crash on date/timestamp split keys
        partitionedRead(spark, db, select, passwordVariable, chunkSize,
          column, bounds.get(0).toString, bounds.get(1).toString, numPartitions)
      catch {
        case e: Exception =>
          throw new EtlExtractError(s"Error executing query: ${e.getMessage}", select, e)
      }
  }

  /** Parallel JDBC read via an explicit predicate list — one partition per
    * predicate (the reference's chunking generalized to non-numeric splits:
    * date ranges, hash buckets, region lists). Complements the numeric
    * `partitionColumn` quadruple of `fromJdbc`.
    */
  def fromJdbcPredicates(spark: SparkSession, db: DbParams, table: String,
      predicates: Seq[String], passwordVariable: Option[String] = None,
      chunkSize: Int = 5000): DataFrame = {
    graft.Identifiers.validate(table)
    require(predicates.nonEmpty,
      "fromJdbcPredicates with an empty predicate list would read ZERO rows " +
        "(one partition per predicate) — pass predicates or use fromJdbc")
    // reuse DbParams' option assembly (single source of truth for driver/
    // auth/dialect keys) — only the query key doesn't apply here
    val props = new java.util.Properties()
    (db.readOptions(table, passwordVariable, chunkSize) - "query")
      .foreach { case (k, v) => props.setProperty(k, v) }
    try spark.read.jdbc(db.jdbcUrl, table, predicates.toArray, props)
    catch {
      case e: Exception =>
        throw new EtlExtractError(s"Error executing query: ${e.getMessage}",
          s"SELECT * FROM $table", e)
    }
  }

  /** The namedtuple row-factory's rename contract
    * (/root/reference/etlhelper/row_factories.py:97-105): columns whose
    * names are invalid identifiers (aggregates like `count(*)`), start with
    * an underscore (namedtuple's own rule — which is also what makes the
    * positional `_N` targets collision-free), or collide after
    * normalization are renamed positionally `_1, _2, ...`, with a warning
    * listing the renames. Valid, unique names pass through.
    */
  def withSafeColumnNames(df: DataFrame): DataFrame = {
    val names = df.columns
    val seen = scala.collection.mutable.Set.empty[String]
    val renamed = names.zipWithIndex.map { case (n, i) =>
      // single-part names only: Identifiers.isValid accepts the dotted
      // schema.table form, but a dotted COLUMN (e.g. "price.usd") breaks
      // df.select resolution and INSERT generation — rename it
      val ok = !n.contains(".") && graft.Identifiers.isValid(n) &&
        !n.startsWith("_") && !seen.contains(n.toLowerCase)
      if (ok) { seen += n.toLowerCase; n } else s"_${i + 1}"
    }
    val changed = names.zip(renamed).filter { case (a, b) => a != b }
    if (changed.nonEmpty) {
      org.slf4j.LoggerFactory.getLogger("graft").warn(
        s"Columns renamed: ${changed.map { case (a, b) => s"$a -> $b" }.mkString(", ")}")
      df.toDF(renamed: _*)
    } else df
  }

  def fromParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV source (the reference's csv recipe, docs/recipes/csv_files.rst —
    * there via pandas; here a native distributed scan). Pass a schema for
    * production reads; inference scans the data twice.
    */
  def fromCsv(spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      header: Boolean = true, multiLine: Boolean = false): DataFrame = {
    // multiLine parses quoted embedded newlines but makes files unsplittable
    // (one task per file) — at scale prefer escaped newlines + default mode.
    val r = spark.read.option("header", header.toString)
      .option("multiLine", multiLine.toString)
    schema match {
      case Some(s) => r.schema(s).csv(path)
      case None => r.option("inferSchema", "true").csv(path)
    }
  }

  /** JSON-lines source (docs/recipes recipes use requests+json; native here). */
  def fromJson(spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame =
    schema match {
      case Some(s) => spark.read.schema(s).json(path)
      case None => spark.read.json(path)
    }

  /** ORC source — the other columnar format with full pushdown/pruning
    * support (PushedFilters/ReadSchema reach the ORC reader exactly as for
    * parquet).
    */
  def fromOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Plain-text source: one row per line (`value` string column) — the raw
    * ingestion shape for unstructured corpus files before parsing.
    */
  def fromText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** XML source (Spark's built-in XML datasource, Spark 4+): one row per
    * `rowTag` element. Pass a schema for production reads — inference
    * scans the data twice, like CSV/JSON. XML files split per-file, not
    * per-block (a row can span arbitrary byte ranges), so at scale shard
    * the corpus into many files rather than one giant document.
    */
  def fromXml(spark: SparkSession, path: String, rowTag: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read.option("rowTag", rowTag)
    schema match {
      case Some(s) => r.schema(s).xml(path)
      case None => r.xml(path)
    }
  }

  /** O4 fetchall: materialize the full result on the driver. */
  def fetchAll(df: DataFrame): Seq[Row] = {
    val rows = df.collect().toSeq
    rows.headOption.foreach(r => graft.Logging.logFirstRow(r))
    graft.Logging.logRowsReturned(rows.length)
    rows
  }

  /** O3 fetchone: first row or None. */
  def fetchOne(df: DataFrame): Option[Row] = {
    val row = df.head(1).headOption
    row.foreach(r => graft.Logging.logFirstRow(r))
    row
  }

  /** O2 iter_rows: driver-side lazy row iterator (pulls partition by
    * partition — constant driver memory like the reference's generator).
    */
  def iterRows(df: DataFrame): Iterator[Row] =
    scala.jdk.CollectionConverters.IteratorHasAsScala(df.toLocalIterator()).asScala

  /** O1 iter_chunks: driver-side chunked view, grouped at chunkSize —
    * semantic parity with the reference's Generator[Chunk].
    */
  def iterChunks(df: DataFrame, chunkSize: Int = 5000): Iterator[Seq[Row]] =
    iterRows(df).grouped(chunkSize).map(_.toSeq)

  /** Incremental extract (the reference's incremental-load recipe): only
    * rows with watermarkCol strictly greater than the last seen value —
    * a pushed-down range predicate, so the scan skips old partitions/row
    * groups entirely (partition pruning + parquet min/max at scale).
    */
  def incremental(df: DataFrame, watermarkCol: String, lastSeen: Any): DataFrame =
    // null lastSeen = no watermark yet (e.g. max() over an empty target):
    // first run must be the full extract, not `col > NULL` (zero rows).
    if (lastSeen == null) df
    else df.filter(org.apache.spark.sql.functions.col(watermarkCol) >
      org.apache.spark.sql.functions.lit(lastSeen))

  /** §2.3 named-parameter SQL (the reference's named binds,
    * test_etl_extract.py:80-87): Spark >= 3.4 parameterized SQL — values are
    * bound as literals by the analyzer, never string-interpolated.
    */
  def sql(spark: SparkSession, sqlText: String, args: Map[String, Any]): DataFrame =
    spark.sql(sqlText, args)

  /** §2.8 transform, untyped: an arbitrary DataFrame => DataFrame applied
    * in-flight (Catalyst sees through it — filters still push down).
    */
  def withTransform(df: DataFrame)(f: DataFrame => DataFrame): DataFrame = f(df)

  /** §2.8 transform, typed: the literal chunk-transform equivalent —
    * an Iterator => Iterator function over each partition (may filter,
    * reshape, 1->N like the reference's generator transforms).
    */
  def transformChunks[T, U: org.apache.spark.sql.Encoder](ds: Dataset[T])(
      f: Iterator[T] => Iterator[U]): Dataset[U] =
    ds.mapPartitions(f)
}
