package graft

/** Smoke layer for the judged inventory: every registered query runs at
  * sf0.001 and yields a sane result; full value-level correctness is the
  * Verify + DuckDB differential gate (tools/check.py).
  */
class QueriesSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("query names are unique and every oracle key has a query") {
    val names = SparkEntry.modules.flatMap(_.defs).map(_.name)
    assert(names.distinct.length == names.length)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001 and returns rows") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0) // materializes the whole plan
    }
  }
}
