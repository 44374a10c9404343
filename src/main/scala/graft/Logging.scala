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

  /** The reference's load log contract, driven by exact accumulator counts. */
  def logLoadResult(r: LoadResult): Unit = log.info(loadResultMessage(r))

  def logRowsReturned(n: Long): Unit = log.info(rowsReturnedMessage(n))

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
