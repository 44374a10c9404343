package graft

import scala.concurrent.{ExecutionContext, Future}

import graft.operators.Abort

/** Cooperative cancellation (mirror of /root/reference/test/integration/etl/
  * test_abort.py:60-100): abort mid-job raises EtlAbortError; a subsequent
  * run on the same session succeeds cleanly.
  */
class AbortSpec extends SparkSuite {
  implicit private val ec: ExecutionContext = ExecutionContext.global

  private def slowCount(): Long = {
    import spark.implicits._
    spark.range(0, 64, 1, 8).mapPartitions { it =>
      Thread.sleep(4000); it
    }.count()
  }

  test("abort mid-job raises EtlAbortError") {
    // Abort only once the job is actually RUNNING: a fixed pre-abort sleep
    // raced job submission on a loaded box (parallel test JVMs) — the
    // cancel landed on an empty group and the count then succeeded.
    Future {
      val tracker = spark.sparkContext.statusTracker
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (tracker.getActiveJobIds().isEmpty &&
        System.nanoTime() < deadline) Thread.sleep(50)
      Thread.sleep(200) // let the first tasks enter their sleep
      Abort.abort(spark, "abort-test")
    }
    assertThrows[EtlAbortError] {
      Abort.runCancellable(spark, "abort-test") { slowCount() }
    }
  }

  test("clean re-run after abort succeeds (event cleared on entry)") {
    import spark.implicits._
    val n = Abort.runCancellable(spark, "abort-test-2") {
      spark.range(0, 100).count()
    }
    assert(n == 100)
  }
}
