package graft.operators

import org.apache.spark.sql.SparkSession
import graft.EtlAbortError

/** O15 cooperative cancellation (/root/reference/etlhelper/abort.py:1-28).
  *
  * The reference checks a threading.Event at each chunk boundary; Spark's
  * native equivalent is job-group cancellation: tag work with a group id,
  * cancel the group from any thread — running tasks are interrupted at
  * their next record boundary and committed chunks stay committed (the
  * abort contract of docs/utilities.rst:109-116).
  */
object Abort {
  val DefaultGroup = "graft-etl"

  /** Run `body` under a cancellable job group. Raises EtlAbortError if the
    * group was cancelled mid-flight.
    */
  def runCancellable[T](spark: SparkSession, groupId: String = DefaultGroup)(
      body: => T): T = {
    spark.sparkContext.setJobGroup(groupId, s"graft cancellable work: $groupId",
      interruptOnCancel = true)
    try body
    catch {
      case e: Exception if isCancellation(e) =>
        throw new EtlAbortError(s"ETL aborted (job group $groupId cancelled)")
    } finally spark.sparkContext.clearJobGroup()
  }

  /** The abort switch — callable from any thread (abort.py:11-17). */
  def abort(spark: SparkSession, groupId: String = DefaultGroup): Unit =
    spark.sparkContext.cancelJobGroup(groupId)

  /** Structural detection first: Spark raises `SPARK_JOB_CANCELLED` (a
    * SparkThrowable error condition) for cancelled job groups — stable across
    * versions, unlike message text. Message substrings remain only as a
    * fallback for wrappers that drop the cause chain.
    */
  private def isCancellation(e: Throwable): Boolean = {
    var t: Throwable = e
    while (t != null) {
      t match {
        case st: org.apache.spark.SparkThrowable
            if st.getCondition != null &&
              st.getCondition.startsWith("SPARK_JOB_CANCELLED") => return true
        case _: InterruptedException => return true
        case _ =>
      }
      val m = Option(t.getMessage).getOrElse("")
      if (m.contains("cancelled") || m.contains("canceled")) return true
      t = t.getCause
    }
    false
  }
}
