package graft.operators

import java.sql.{Connection, DriverManager, PreparedStatement}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.apache.spark.util.{CollectionAccumulator, LongAccumulator}

import graft.{DbParams, EtlInsertError, Identifiers}

/** A row that failed per-row retry, with its error — the reference's
  * FailedRow (etl.py:48-50) carried back to the driver via accumulator.
  */
final case class FailedRow(values: Seq[String], error: String)

/** Outcome of a load: `processed` counts every input row INCLUDING failed
  * ones, exactly the reference's semantics
  * (/root/reference/test/integration/etl/test_etl_load.py:60-74).
  */
final case class LoadResult(processed: Long, failed: Long, failedRows: Seq[FailedRow])

/** Load operators (reference O5/O6/O9, etl.py:233-365, :509-574).
  *
  * Two tiers:
  *  - `load`: the plain path — Spark's native JDBC writer (batched inserts,
  *    `batchsize` = chunk_size, SaveMode.Append, table must pre-exist per
  *    docs/etl_functions/copy.rst:22-24). All-or-nothing per task.
  *  - `loadWithErrorChannel`: the reference's distinctive on_error semantics
  *    (§2.10) that Spark's writer cannot express: per-partition batched
  *    inserts with chunk commit, batch failure -> rollback -> row-by-row
  *    retry each in its own transaction -> surviving failures collected to
  *    a bounded accumulator (the DLQ/quarantine channel) and counted.
  *    Exact `(processed, failed)` counts via LongAccumulators.
  *
  * Scale notes: one JDBC connection per partition, batches of `chunkSize`
  * per round-trip; counts/quarantine flow through accumulators (no driver
  * collect of the data path). Speculative execution should be off for this
  * sink (non-idempotent inserts), as for any JDBC sink.
  */
object Load {

  /** O9 `load` via Spark's JDBC writer — schema-driven INSERT generation is
    * native (no first-row peek needed: the schema is static).
    */
  def load(df: DataFrame, db: DbParams, table: String,
      passwordVariable: Option[String] = None, chunkSize: Int = 5000): Unit =
    try {
      // reference log contract: 'Executing many (chunk_size=N)' at INFO
      // plus the generated INSERT + target at DEBUG (etl.py:292-294,
      // test_etl_logging.py:22-35)
      graft.Logging.logExecutingMany(chunkSize,
        generateInsertSql(table, df.schema), db.jdbcUrl)
      df.write.format("jdbc")
        .options(db.writeOptions(table, passwordVariable, chunkSize))
        .mode("append").save()
    } catch {
      case e: Exception =>
        throw new EtlInsertError(s"Error during insert: ${e.getMessage}",
          s"INSERT INTO $table", e)
    }

  /** O11 generate_insert_sql (etl.py:577-639): INSERT built from the schema
    * with every identifier validated; JDBC `?` placeholders (the qmark
    * paramstyle — binding by position is what the writer does).
    */
  def generateInsertSql(table: String, schema: StructType): String =
    generateInsertSqlStyled(table, schema, "qmark")

  /** O11 named-paramstyle form (the reference's named/pyformat surface,
    * `named_paramstyle` in each db_helpers backend): `:name` placeholders
    * keyed by column, the shape Spark's parameterized SQL (`Extract.sql`)
    * binds.
    */
  def generateInsertSqlNamed(table: String, schema: StructType): String =
    generateInsertSqlStyled(table, schema, "named")

  /** O11, full paramstyle surface (etl.py:596-602): the five DBAPI
    * placeholder dialects the reference renders. JDBC itself always binds
    * positionally with `?`; the other styles exist for emitting SQL to
    * engines/drivers that expect them. Table names may carry a schema.
    * prefix; column names may not contain dots (a dotted column renders
    * broken placeholders), so they get the stricter no-dot validation.
    */
  def generateInsertSqlStyled(table: String, schema: StructType,
      paramstyle: String): String = {
    Identifiers.validate(table)
    val cols = schema.fieldNames.map(Identifiers.validateColumn)
    val placeholders: Seq[String] = paramstyle match {
      case "qmark"    => cols.toSeq.map(_ => "?")
      case "numeric"  => cols.indices.map(i => s":${i + 1}")
      case "named"    => cols.toSeq.map(c => s":$c")
      case "format"   => cols.toSeq.map(_ => "%s")
      case "pyformat" => cols.toSeq.map(c => s"%($c)s")
      case other => throw new IllegalArgumentException(
        s"unknown paramstyle '$other' (expected qmark, numeric, named, format or pyformat)")
    }
    s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${placeholders.mkString(", ")})"
  }

  /** O5+O6 executemany with the on_error channel. `maxQuarantine` bounds the
    * TOTAL failed-row payload shipped driver-ward (counts stay exact
    * regardless): the budget is split across partitions up front, so the
    * global quarantine size can never exceed it no matter how many tasks
    * fail. `onError`, when provided, is the reference's per-chunk callback
    * (etl.py:305-320): invoked on the executor after each failed chunk's
    * row-by-row retry with exactly that chunk's failed rows — it must be
    * serializable, and runs distributed (one call per failed chunk per task).
    */
  /** `quarantinePath`: when set, the (bounded) quarantined rows are also
    * written as a parquet dead-letter table `(values, error)` — the DLQ
    * form of the reference's on_error recipe, queryable like any table.
    */
  def loadWithErrorChannel(df: DataFrame, db: DbParams, table: String,
      passwordVariable: Option[String] = None, chunkSize: Int = 5000,
      commitChunks: Boolean = true, maxQuarantine: Int = 10000,
      onError: Option[Seq[FailedRow] => Unit] = None,
      quarantinePath: Option[String] = None): LoadResult = {

    val spark = df.sparkSession
    val sql = generateInsertSql(table, df.schema)
    graft.Logging.logExecutingMany(chunkSize, sql, db.jdbcUrl)
    val processed: LongAccumulator = spark.sparkContext.longAccumulator("etl.processed")
    val failed: LongAccumulator = spark.sparkContext.longAccumulator("etl.failed")
    val quarantine: CollectionAccumulator[FailedRow] =
      spark.sparkContext.collectionAccumulator[FailedRow]("etl.quarantine")

    val schema = df.schema
    val url = db.jdbcUrl
    val driverClass = db.driverClass
    val dbtype = db.dbtype
    val user = db.user
    val pw = passwordVariable.map(db.password)
    // Split the global quarantine budget across partitions so the sum of all
    // task contributions is bounded by maxQuarantine (the accumulator's
    // task-local .value can't see other tasks, so a global check on the
    // executor is impossible — a pre-divided budget is the sound bound).
    // base + remainder by partition id sums to EXACTLY maxQuarantine, so the
    // global bound holds even with more partitions than budget.
    val numParts = math.max(1, df.rdd.getNumPartitions)
    val budgetBase = math.max(0, maxQuarantine) / numParts
    val budgetRemainder = math.max(0, maxQuarantine) % numParts

    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        DbParams.loadDriver(driverClass, dbtype)
        val conn = connect(url, user, pw)
        try {
          conn.setAutoCommit(false)
          val stmt = conn.prepareStatement(sql)
          try {
            val pid = org.apache.spark.TaskContext.getPartitionId()
            var quarantineBudget =
              budgetBase + (if (pid < budgetRemainder) 1 else 0)
            rows.grouped(chunkSize).foreach { chunk =>
              val chunkFailed = insertChunk(conn, stmt, schema, chunk,
                processed, failed, commitChunks)
              if (chunkFailed.nonEmpty) {
                val keep = math.min(quarantineBudget, chunkFailed.size)
                var i = 0
                while (i < keep) { quarantine.add(chunkFailed(i)); i += 1 }
                quarantineBudget -= keep
                onError.foreach(f => f(chunkFailed))
              }
            }
            if (!commitChunks) conn.commit()
          } finally stmt.close()
        } finally conn.close()
      }
    }
    // accumulator values are only exact after the job completes (foreachPartition is an action)
    val result = LoadResult(processed.value, failed.value,
      scala.jdk.CollectionConverters.ListHasAsScala(quarantine.value).asScala.toSeq)
    quarantinePath.foreach { path =>
      // bounded by maxQuarantine, so a driver-built DataFrame is safe;
      // skipped when clean — a nightly job must not accrete one empty
      // part file per successful run
      if (result.failedRows.nonEmpty) {
        import spark.implicits._
        result.failedRows.toDF("values", "error")
          .write.mode("append").parquet(path)
      }
    }
    result
  }

  /** INSERT ... ON CONFLICT DO NOTHING analogue
    * (docs/code_demos/error_handling/demo_sql_conflict_error.py:53-57),
    * Spark-native: dedup the incoming batch on the key, anti-join away rows
    * whose keys already exist in the target, then append. At scale this is
    * one shuffle on the key columns versus per-row conflict handling in the
    * database — the distributed-correct formulation of upsert-ignore.
    */
  /** `keyPartitioning` = (column, lowerBound, upperBound, numPartitions)
    * splits the existing-keys scan across parallel JDBC range reads — against
    * a 10⁹-row target the single-connection whole-table read is the
    * bottleneck, exactly as it is for any extract (see Extract.fromJdbc).
    */
  def appendIfAbsent(df: DataFrame, db: DbParams, table: String, keyCols: Seq[String],
      passwordVariable: Option[String] = None, chunkSize: Int = 5000,
      keyPartitioning: Option[(String, Long, Long, Int)] = None): LoadResult = {
    Identifiers.validate(table)
    keyCols.foreach(Identifiers.validate)
    val spark = df.sparkSession
    // the split column must exist in the derived table Spark ranges over,
    // so project it alongside the keys when it isn't one of them
    val extraSplitCol = keyPartitioning.map(_._1)
      .filterNot(c => keyCols.exists(_.equalsIgnoreCase(c))).toSeq
    val selectCols = keyCols ++ extraSplitCol
    val existing = Extract.fromJdbc(spark, db,
        s"SELECT ${selectCols.mkString(", ")} FROM $table",
        passwordVariable, chunkSize, keyPartitioning)
      .toDF(selectCols: _*) // normalize case (Derby/Oracle upper-case metadata)
      .select(keyCols.map(org.apache.spark.sql.functions.col): _*)
    val fresh = df.dropDuplicates(keyCols)
      .join(existing, keyCols, "left_anti")
    loadWithErrorChannel(fresh, db, table, passwordVariable, chunkSize)
  }

  /** Proactive schema check before a load: compare the DataFrame's columns
    * against the target table's catalog metadata and raise ONE clear error
    * listing every problem (missing columns, extras without defaults,
    * NOT-NULL targets fed by nullable sources) — instead of the opaque
    * batch-insert failure the database would produce mid-load. Matching is
    * case-insensitive (JDBC catalogs fold case; see TableInfo).
    */
  def validateAgainstTable(df: DataFrame, db: DbParams, table: String,
      passwordVariable: Option[String] = None): Unit = {
    val target = TableInfo.fromJdbc(db, table, passwordVariable = passwordVariable)
    val targetByName = target.map(c => c.name.toLowerCase -> c).toMap
    val dfCols = df.schema.fields.map(f => f.name.toLowerCase -> f).toMap
    val problems = Seq.newBuilder[String]
    df.schema.fields.foreach { f =>
      if (!targetByName.contains(f.name.toLowerCase))
        problems += s"column '${f.name}' not present in $table"
    }
    target.foreach { c =>
      if (!dfCols.contains(c.name)) {
        if (c.notNull && !c.hasDefault)
          problems += s"NOT NULL column '${c.name}' of $table has no source column and no default"
      } else if (c.notNull && dfCols(c.name).nullable)
        problems += s"NOT NULL column '${c.name}' of $table is fed by a nullable source column"
    }
    val found = problems.result()
    if (found.nonEmpty)
      throw new EtlInsertError(
        s"Schema mismatch against $table:\n  ${found.mkString("\n  ")}",
        s"INSERT INTO $table")
  }

  private def connect(url: String, user: String, pw: Option[String]): Connection =
    if (user.nonEmpty) DriverManager.getConnection(url, user, pw.orNull)
    else DriverManager.getConnection(url)

  /** One chunk: batch insert; on failure rollback and retry row-by-row,
    * each row in its own transaction (etl.py:342-365). Returns the chunk's
    * failed rows (empty when the batch succeeded).
    */
  private def insertChunk(conn: Connection, stmt: PreparedStatement,
      schema: StructType, chunk: Seq[Row], processed: LongAccumulator,
      failed: LongAccumulator, commitChunks: Boolean): Seq[FailedRow] = {
    val chunkFailed = scala.collection.mutable.ArrayBuffer.empty[FailedRow]
    try {
      chunk.foreach { row => bind(stmt, schema, row); stmt.addBatch() }
      stmt.executeBatch()
      if (commitChunks) conn.commit()
    } catch {
      case _: java.sql.SQLException =>
        conn.rollback()
        stmt.clearBatch()
        chunk.foreach { row =>
          try {
            bind(stmt, schema, row)
            stmt.execute()
            conn.commit()
          } catch {
            case rowErr: java.sql.SQLException =>
              conn.rollback()
              failed.add(1)
              chunkFailed += FailedRow(
                (0 until row.length).map(i => String.valueOf(row.get(i))),
                rowErr.getMessage)
          }
        }
    }
    processed.add(chunk.size) // includes failed rows (reference contract)
    chunkFailed.toSeq
  }

  /** Positional bind by schema type — the qmark paramstyle binding. */
  private def bind(stmt: PreparedStatement, schema: StructType, row: Row): Unit = {
    var i = 0
    while (i < schema.length) {
      val p = i + 1
      if (row.isNullAt(i)) stmt.setObject(p, null)
      else schema(i).dataType match {
        case IntegerType => stmt.setInt(p, row.getInt(i))
        case LongType => stmt.setLong(p, row.getLong(i))
        case DoubleType => stmt.setDouble(p, row.getDouble(i))
        case FloatType => stmt.setFloat(p, row.getFloat(i))
        case StringType => stmt.setString(p, row.getString(i))
        case BooleanType => stmt.setBoolean(p, row.getBoolean(i))
        case DateType => stmt.setDate(p, row.getDate(i))
        case TimestampType => stmt.setTimestamp(p, row.getTimestamp(i))
        case BinaryType => stmt.setBytes(p, row.getAs[Array[Byte]](i))
        case _: DecimalType => stmt.setBigDecimal(p, row.getDecimal(i))
        case ShortType => stmt.setShort(p, row.getShort(i))
        case ByteType => stmt.setByte(p, row.getByte(i))
        case t @ (_: ArrayType | _: MapType | _: StructType) =>
          // setObject on a Spark collection value would throw a driver-
          // specific error (or silently store a toString) deep inside the
          // batch — fail fast with the fix instead
          throw new IllegalArgumentException(
            s"cannot bind column '${schema(i).name}' of type ${t.simpleString}: " +
            "JDBC has no portable binding for nested types — flatten the " +
            "column or serialize it (e.g. to_json) before load")
        case _ => stmt.setObject(p, row.get(i))
      }
      i += 1
    }
  }
}
