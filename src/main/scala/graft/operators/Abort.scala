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

  private def isCancellation(e: Throwable): Boolean = {
    var t: Throwable = e
    while (t != null) {
      val m = Option(t.getMessage).getOrElse("")
      if (m.contains("cancelled") || m.contains("canceled") ||
        t.isInstanceOf[InterruptedException]) return true
      t = t.getCause
    }
    false
  }
}
