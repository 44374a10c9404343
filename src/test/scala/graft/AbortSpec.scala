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
    Future { Thread.sleep(1000); Abort.abort(spark, "abort-test") }
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
