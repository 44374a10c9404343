package graft

import org.apache.spark.sql.functions._

/** HLL sketch accuracy contract behind q47: the approx_count_distinct
  * estimate (rsd 0.01) stays within 2% relative error of the exact count on
  * the test tables — the bound the q47 oracle asserts as `approx_ok`.
  */
class SketchSpec extends SparkSuite {

  private def relErrors(dir: String): Array[(String, Double)] =
    Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
      .map(r => (r.getString(0),
        math.abs(r.getLong(1) - r.getLong(2)).toDouble / r.getLong(2)))

  test("HLL estimate within 2% of exact per group (sf0.001 and sf0.01)") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val errs = relErrors(s"/root/testdata/$sf")
      assert(errs.nonEmpty)
      errs.foreach { case (flag, e) =>
        assert(e <= 0.02, s"$sf group $flag relative error $e > 2%")
      }
    }
  }
}
