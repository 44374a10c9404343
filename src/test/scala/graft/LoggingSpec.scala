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

  test("INFO open lines match the reference verbatim: 'Fetching rows', " +
    "'Executing many', 'N rows processed in total'") {
    // test_etl_logging.py:14-21
    assert(Logging.fetchingRowsMessage(1) == "Fetching rows (chunk_size=1)")
    assert(Logging.fetchingRowsMessage(5000) ==
      "Fetching rows (chunk_size=5000)")
    assert(Logging.executingManyMessage(1) == "Executing many (chunk_size=1)")
    assert(Logging.totalProcessedMessage(3) == "3 rows processed in total")
    // test_etl_logging.py:92: INFO_EXECUTE = ['Executing query']
    assert(Logging.executingQueryMessage == "Executing query")
  }

  test("execute's DEBUG layer carries the parameter section the " +
    "executemany variant omits — both shapes pinned verbatim against " +
    "test_etl_logging.py:24-35 (no params) and :93-104 (with params)") {
    assert(Logging.executeQueryDebugMessage("SELECT 1 AS result;", "()",
        "jdbc:postgresql://h:5432/d") ==
      "Executing:\n\nSELECT 1 AS result;\n\nwith parameters:\n\n()\n\n" +
        "against:\n\njdbc:postgresql://h:5432/d")
    // the executemany debug line has NO parameter section — the two
    // shapes must not drift into each other
    assert(Logging.executeDebugMessage("SELECT 1 AS result;",
        "jdbc:postgresql://h:5432/d") ==
      "Executing:\n\nSELECT 1 AS result;\n\n" +
        "against:\n\njdbc:postgresql://h:5432/d")
  }

  test("bound parameters render as a Python tuple repr — the shape the " +
    "reference's %s-of-a-tuple logging produces: trailing comma for one " +
    "element, quoted strings, None/True/False") {
    assert(Logging.pyTupleRepr(Nil) == "()") // the reference-pinned case
    assert(Logging.pyTupleRepr(Seq(1)) == "(1,)")
    assert(Logging.pyTupleRepr(Seq("a")) == "('a',)")
    assert(Logging.pyTupleRepr(Seq(1, "a")) == "(1, 'a')")
    assert(Logging.pyTupleRepr(Seq(null, true, false)) ==
      "(None, True, False)")
    assert(Logging.pyTupleRepr(Seq("it's")) == "(\"it's\",)")
    assert(Logging.pyTupleRepr(Seq[Any](1.5, 2L)) == "(1.5, 2)")
  }

  test("DEBUG layer matches the reference shape: SQL, parameters and " +
    "target, blank-line separated; 'First row: ...'") {
    // etl.py:86: logger.debug(f"Fetching:\n\n{q}\n\nwith parameters:\n\n
    // {params}\n\nagainst:\n\n{conn}") — pinned at
    // test_etl_logging.py:36-51
    assert(Logging.fetchDebugMessage("SELECT * FROM src", "()",
        "jdbc:postgresql://h:5432/d") ==
      "Fetching:\n\nSELECT * FROM src\n\nwith parameters:\n\n()\n\n" +
        "against:\n\njdbc:postgresql://h:5432/d")
    assert(Logging.executeDebugMessage("INSERT INTO dest (id) VALUES (?)",
        "jdbc:postgresql://h:5432/d") ==
      "Executing:\n\nINSERT INTO dest (id) VALUES (?)\n\n" +
        "against:\n\njdbc:postgresql://h:5432/d")
    assert(Logging.firstRowMessage("[1,text]") == "First row: [1,text]")
    // the target slot is the JDBC URL: passwords NEVER appear (they live
    // only in the option map, resolved at connect time), mirroring the
    // reference's password-masked conn repr ('password=xxx')
    val url = DbParams("postgres", host = "h", port = 5432, dbname = "d",
      user = "u").jdbcUrl
    assert(!url.toLowerCase.contains("password"))
  }
}
