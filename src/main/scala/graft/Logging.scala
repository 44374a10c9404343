package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.slf4j.LoggerFactory

import graft.operators.LoadResult

/** O17 progress logging (/root/reference/etlhelper/__init__.py:50-81,
  * etl.py:119-124, :327-328): the reference logs "N rows processed
  * (M failed)" per chunk and "N rows returned" per extract. Chunk-serial
  * logging is meaningless across executors, so totals stay exact via
  * accumulators/metrics and progress is surfaced per task-end.
  */
object Logging {
  private val log = LoggerFactory.getLogger("graft")

  /** The reference's exact log-line contract
    * (test/integration/etl/test_etl_logging.py:14-56): these strings ARE the
    * API — pinned verbatim by LoggingSpec.
    */
  def loadResultMessage(r: LoadResult): String =
    s"${r.processed} rows processed (${r.failed} failed)"

  def rowsReturnedMessage(n: Long): String = s"$n rows returned"

  /** INFO lines that open an extract / a batched load
    * (test_etl_logging.py:14-21: 'Fetching rows (chunk_size=1)',
    * 'Executing many (chunk_size=1)', '3 rows processed in total').
    */
  def fetchingRowsMessage(chunkSize: Int): String =
    s"Fetching rows (chunk_size=$chunkSize)"

  def executingManyMessage(chunkSize: Int): String =
    s"Executing many (chunk_size=$chunkSize)"

  /** O10 execute's INFO open line — 'Executing query', exactly
    * (test_etl_logging.py:92 INFO_EXECUTE).
    */
  val executingQueryMessage: String = "Executing query"

  def totalProcessedMessage(n: Long): String = s"$n rows processed in total"

  /** The DEBUG layer of the contract (etl.py:86, pinned at
    * test_etl_logging.py:22-56): the SQL, its parameters, and the
    * connection target — blank-line separated, exactly the reference's
    * shape. The target is the JDBC URL, which never carries a password
    * here (passwords resolve from env at connect time and go only into
    * the option map), matching the reference's masked-password repr.
    */
  def fetchDebugMessage(sql: String, parameters: String, target: String): String =
    s"Fetching:\n\n$sql\n\nwith parameters:\n\n$parameters\n\nagainst:\n\n$target"

  def executeDebugMessage(sql: String, target: String): String =
    s"Executing:\n\n$sql\n\nagainst:\n\n$target"

  /** execute's DEBUG layer — unlike executemany's (above, no parameter
    * section: test_etl_logging.py:24-35), single-statement execute logs
    * its bound parameters (etl.py:446, pinned at test_etl_logging.py:
    * 93-104: 'Executing:\n\n<sql>\n\nwith parameters:\n\n()\n\n
    * against:\n\n<conn>').
    */
  def executeQueryDebugMessage(sql: String, parameters: String,
      target: String): String =
    s"Executing:\n\n$sql\n\nwith parameters:\n\n$parameters\n\nagainst:\n\n$target"

  /** Render bound parameters the way the reference's Python logger does
    * (the parameters land in the message via `%s` of a tuple): "()" when
    * empty — the only case the reference test pins byte-for-byte
    * (test_etl_logging.py:93-104) — a trailing comma for one element
    * ("(1,)"), strings/chars repr'd with single quotes and
    * backslash/quote escapes, None/True/False for null/booleans.
    * Types Python would repr differently from their JVM toString
    * (e.g. byte arrays, nested collections, java.sql temporal classes)
    * fall back to toString — parity beyond the reference-pinned surface
    * is best-effort by design; the reference suite never observes them.
    */
  def pyTupleRepr(params: Seq[Any]): String = {
    def one(p: Any): String = p match {
      case null => "None"
      case b: Boolean => if (b) "True" else "False"
      case s: String =>
        // Python's quote choice: single quotes, switching to double when
        // the string contains a single quote but no double quote.
        // Control characters escape as repr does (\n, \r, \t named;
        // other C0 controls as \xNN) so a multi-line parameter stays on
        // one log line — the blank-line-separated DEBUG format the
        // reference's messages pin would otherwise tear
        val esc = s.replace("\\", "\\\\").flatMap {
          case '\n' => "\\n"
          case '\r' => "\\r"
          case '\t' => "\\t"
          case c if c < ' ' || c == '\u007f' => f"\\x${c.toInt}%02x"
          case c => c.toString
        }
        if (s.contains("'") && !s.contains("\"")) "\"" + esc + "\""
        else "'" + esc.replace("'", "\\'") + "'"
      case c: Char => one(c.toString)
      case other => String.valueOf(other)
    }
    params match {
      case Seq() => "()"
      case Seq(p) => s"(${one(p)},)"
      case ps => ps.map(one).mkString("(", ", ", ")")
    }
  }

  /** 'First row: ...' at DEBUG (test_etl_logging.py:49-51). Logged at the
    * driver-side materialization points (fetchAll/fetchOne) only — peeking
    * a row at PLAN-build time would trigger an eager Spark job.
    */
  def firstRowMessage(row: Any): String = s"First row: $row"

  /** The reference's load log contract, driven by exact accumulator counts. */
  def logLoadResult(r: LoadResult): Unit = log.info(loadResultMessage(r))

  def logRowsReturned(n: Long): Unit = log.info(rowsReturnedMessage(n))

  def logFetching(chunkSize: Int, sql: String, parameters: String,
      target: String): Unit = {
    log.info(fetchingRowsMessage(chunkSize))
    if (log.isDebugEnabled)
      log.debug(fetchDebugMessage(sql, parameters, target))
  }

  def logExecutingMany(chunkSize: Int, sql: String, target: String): Unit = {
    log.info(executingManyMessage(chunkSize))
    if (log.isDebugEnabled) log.debug(executeDebugMessage(sql, target))
  }

  def logExecutingQuery(sql: String, parameters: String,
      target: String): Unit = {
    log.info(executingQueryMessage)
    if (log.isDebugEnabled)
      log.debug(executeQueryDebugMessage(sql, parameters, target))
  }

  def logFirstRow(row: => Any): Unit =
    if (log.isDebugEnabled) log.debug(firstRowMessage(row))

  def logTotalProcessed(n: Long): Unit = log.info(totalProcessedMessage(n))

  /** In-flight metrics via the observe() API: attach named aggregate
    * metrics to a plan node; Spark computes them DURING the action (no
    * second pass over the data, unlike a separate count()) and exposes them
    * through the returned Observation once the action finishes. The
    * distributed, single-pass upgrade of the reference's per-chunk progress
    * counters — works identically under batch and foreachBatch streaming.
    */
  def observed(df: org.apache.spark.sql.DataFrame, name: String = "etl")
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    val out = df.observe(obs,
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("rows"))
    (out, obs)
  }

  /** Task-level progress listener: emits cumulative records read/written as
    * tasks finish — the distributed analogue of per-chunk progress lines.
    * Returns the listener so callers can detach with `removeSparkListener`.
    */
  def attachProgressListener(spark: SparkSession): SparkListener = {
    val listener = new SparkListener {
      private val read = new java.util.concurrent.atomic.AtomicLong()
      private val written = new java.util.concurrent.atomic.AtomicLong()
      override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
        val m = taskEnd.taskMetrics
        if (m != null) {
          val r = read.addAndGet(m.inputMetrics.recordsRead)
          val w = written.addAndGet(m.outputMetrics.recordsWritten)
          log.debug(s"progress: $r rows read, $w rows written")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    listener
  }
}
