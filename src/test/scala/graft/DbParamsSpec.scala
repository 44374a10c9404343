package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mirror of /root/reference/test/unit/test_db_params.py:25-175: required-key
  * validation per dbtype, env construction, connection-string emission,
  * password-variable contract.
  */
class DbParamsSpec extends AnyFunSuite {

  test("postgres params validate and emit jdbc url") {
    val p = DbParams("postgres", host = "localhost", port = 5432,
      dbname = "etlhelper", user = "etlhelper_user")
    assert(p.jdbcUrl == "jdbc:postgresql://localhost:5432/etlhelper")
    assert(p.driverClass == "org.postgresql.Driver")
  }

  test("sqlite requires only filename") {
    val p = DbParams("sqlite", filename = "/tmp/data.db")
    assert(p.jdbcUrl == "jdbc:sqlite:/tmp/data.db")
  }

  test("missing required key raises EtlDbParamsError") {
    val e = intercept[EtlDbParamsError](DbParams("postgres", host = "localhost"))
    assert(e.getMessage.contains("not set"))
  }

  test("unknown dbtype raises") {
    val e = intercept[EtlDbParamsError](DbParams("mongodb", host = "h"))
    assert(e.getMessage.contains("not supported"))
  }

  test("mssql additionally requires odbc_driver") {
    assertThrows[EtlDbParamsError](
      DbParams("mssql", host = "h", port = 1433, dbname = "d", user = "u"))
    DbParams("mssql", host = "h", port = 1433, dbname = "d", user = "u",
      odbcDriver = "ODBC Driver 17 for SQL Server")
  }

  test("fromEnvironment builds from prefixed vars") {
    val env = Map("TEST_DBTYPE" -> "postgres", "TEST_HOST" -> "h",
      "TEST_PORT" -> "5432", "TEST_DBNAME" -> "db", "TEST_USER" -> "u")
    val p = DbParams.fromEnvironment("TEST_", env)
    assert(p.dbtype == "postgres" && p.port == 5432)
  }

  test("fromEnvironment with missing DBTYPE raises") {
    val e = intercept[EtlDbParamsError](DbParams.fromEnvironment("NOPE_", Map.empty))
    assert(e.getMessage.contains("NOPE_DBTYPE"))
  }

  test("password comes from env var at call time; missing var raises") {
    val p = DbParams("sqlite", filename = "x.db")
    val e = intercept[EtlDbParamsError](p.password("GRAFT_NO_SUCH_PASSWORD_VAR"))
    assert(e.getMessage.contains("GRAFT_NO_SUCH_PASSWORD_VAR"))
  }

  test("copy re-validates (attribute-set validation parity)") {
    val p = DbParams("postgres", host = "h", port = 5432, dbname = "d", user = "u")
    assertThrows[EtlDbParamsError](p.copy(user = ""))
    assert(p.copy(port = 5433).port == 5433)
  }

  test("isReachable: open local port true, closed port false, socketless false") {
    val server = new java.net.ServerSocket(0)
    try {
      val open = DbParams("postgres", host = "127.0.0.1",
        port = server.getLocalPort, dbname = "d", user = "u")
      assert(open.isReachable())
    } finally server.close()
    // port 1 (tcpmux): never bound in this environment, avoids ephemeral
    // port-reuse races on the just-closed server port
    val closed = DbParams("postgres", host = "127.0.0.1",
      port = 1, dbname = "d", user = "u")
    assert(!closed.isReachable(timeoutMs = 500))
    assert(!DbParams("sqlite", filename = "x.db").isReachable())
    // out-of-range port: false, not IllegalArgumentException
    assert(!DbParams("postgres", host = "127.0.0.1", port = 543210,
      dbname = "d", user = "u").isReachable(timeoutMs = 100))
  }

  test("writeOptions validates the table identifier") {
    val p = DbParams("derby", filename = "memory:opts;create=true")
    assertThrows[EtlBadIdentifierError](p.writeOptions("bad;table"))
    assert(p.writeOptions("good_table")("dbtable") == "good_table")
    assert(p.writeOptions("good_table")("batchsize") == "5000")
  }

  test("dialect fast paths: postgres batched-insert rewrite on by default, " +
    "extra options override") {
    val pg = DbParams("postgres", host = "h", port = 5432, dbname = "d", user = "u")
    assert(pg.writeOptions("t")("reWriteBatchedInserts") == "true")
    assert(pg.writeOptions("t", extra = Map("batchsize" -> "99"))("batchsize") == "99")
    val derby = DbParams("derby", filename = "memory:x;create=true")
    assert(!derby.writeOptions("t").contains("reWriteBatchedInserts"))
  }

  test("per-dialect option-map parity: each backend's emitted read AND " +
    "write options carry exactly its reference fast path") {
    // The reference accelerates each backend differently:
    //   PG    execute_batch        (postgres.py:76-96)  -> reWriteBatchedInserts
    //   MSSQL fast_executemany     (mssql.py:79-100)    -> useBulkCopyForBatchInsert
    //   Oracle fetch_lobs=False    (oracle.py:43-48)    -> defaultLobPrefetchSize
    //   SQLite (no fast path)                           -> no dialect options
    // The JDBC analogue must be present in BOTH directions (Spark's JDBC
    // source passes the same option map to reads and writes) and no
    // backend may leak another backend's flag.
    val pg = DbParams("postgres", host = "h", port = 5432, dbname = "d", user = "u")
    val ms = DbParams("mssql", host = "h", port = 1433, dbname = "d",
      user = "u", odbcDriver = "ODBC Driver 17 for SQL Server")
    val ora = DbParams("oracle", host = "h", port = 1521, dbname = "d", user = "u")
    val lite = DbParams("sqlite", filename = "x.db")
    val dialectKeys = Set("reWriteBatchedInserts", "useBulkCopyForBatchInsert",
      "oracle.jdbc.defaultLobPrefetchSize")
    def both(p: DbParams): Seq[Map[String, String]] =
      Seq(p.readOptions("SELECT 1"), p.writeOptions("t"))
    both(pg).foreach { o =>
      assert(o("reWriteBatchedInserts") == "true")
      assert((o.keySet & dialectKeys) == Set("reWriteBatchedInserts"))
    }
    both(ms).foreach { o =>
      assert(o("useBulkCopyForBatchInsert") == "true")
      assert((o.keySet & dialectKeys) == Set("useBulkCopyForBatchInsert"))
    }
    both(ora).foreach { o =>
      assert(o("oracle.jdbc.defaultLobPrefetchSize") == "4000")
      assert((o.keySet & dialectKeys) == Set("oracle.jdbc.defaultLobPrefetchSize"))
    }
    both(lite).foreach(o => assert((o.keySet & dialectKeys).isEmpty))
    // the MemoryError fallback analogue (mssql.py:86-96 retries with the
    // fast path off): extra wins over the dialect default, so a caller
    // can disable the bulk path per-job without a new DbParams
    assert(ms.writeOptions("t",
      extra = Map("useBulkCopyForBatchInsert" -> "false"))(
      "useBulkCopyForBatchInsert") == "false")
  }
}
