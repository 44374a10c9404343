package graft

import org.scalatest.funsuite.AnyFunSuite

/** Missing-driver error contract (mirror of
  * /root/reference/test/unit/test_db_helpers.py:113-138): connecting a
  * backend whose driver is absent must raise the connection error with an
  * instructive message naming the driver — not a raw ClassNotFoundException.
  * Only Derby is on this classpath, so every other backend exercises the
  * missing path for real.
  */
class DriverLoadSpec extends AnyFunSuite {

  test("loadDriver raises EtlConnectionError naming the missing driver") {
    for ((params, driver) <- Seq(
      (DbParams("postgres", host = "h", port = 5432, dbname = "d", user = "u"),
        "org.postgresql.Driver"),
      (DbParams("oracle", host = "h", port = 1521, dbname = "d", user = "u"),
        "oracle.jdbc.OracleDriver"),
      (DbParams("sqlite", filename = "/tmp/x.db"), "org.sqlite.JDBC"))) {
      val e = intercept[EtlConnectionError](params.loadDriver())
      assert(e.getMessage.contains("Could not"), e.getMessage)
      assert(e.getMessage.contains(driver), e.getMessage)
      assert(e.getCause.isInstanceOf[ClassNotFoundException])
    }
  }

  test("loadDriver succeeds for a driver that is present (Derby)") {
    DbParams("derby", filename = "memory:drvspec;create=true").loadDriver()
  }
}
