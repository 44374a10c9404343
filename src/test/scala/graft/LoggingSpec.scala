package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LoadResult

/** The reference's exact log-line contract
  * (/root/reference/test/integration/etl/test_etl_logging.py:14-56):
  * "N rows processed (M failed)" per load and "N rows returned" per extract.
  * These strings are API — pinned verbatim here.
  */
class LoggingSpec extends AnyFunSuite {

  test("load log line is exactly 'N rows processed (M failed)'") {
    assert(Logging.loadResultMessage(LoadResult(3, 0, Nil)) ==
      "3 rows processed (0 failed)")
    assert(Logging.loadResultMessage(LoadResult(1050, 50, Nil)) ==
      "1050 rows processed (50 failed)")
  }

  test("extract log line is exactly 'N rows returned'") {
    assert(Logging.rowsReturnedMessage(0) == "0 rows returned")
    assert(Logging.rowsReturnedMessage(60000) == "60000 rows returned")
  }
}
