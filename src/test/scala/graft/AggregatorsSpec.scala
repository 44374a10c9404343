package graft

import org.apache.spark.sql.functions._
import graft.functions.Aggregators

/** Typed Aggregator semantics: TopK must agree with the window-function
  * formulation (q12), WeightedMean with the closed form.
  */
class AggregatorsSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("TopK aggregator matches the row_number window top-3") {
    import spark.implicits._
    val orders = Tables(spark, dir, "orders")
    val viaAgg = orders
      .select(col("o_custkey"), col("o_orderkey").as("key"),
        col("o_totalprice").as("score"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => Aggregators.Scored(t._2, t._3))
      .agg(new Aggregators.TopK(3).toColumn)
      .collect().toMap

    val viaWindow = SparkEntry.queries("q12_window_topn")(spark, dir)
      .collect()
      .groupBy(_.getAs[Long]("o_custkey"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rn")).map(_.getAs[Long]("o_orderkey")).toSeq)
      .toMap

    assert(viaAgg.keySet == viaWindow.keySet)
    viaWindow.foreach { case (k, expected) =>
      assert(viaAgg(k) == expected, s"custkey $k")
    }
  }

  test("WeightedMean matches the closed form") {
    import spark.implicits._
    val data = Seq((10.0, 1.0), (20.0, 3.0), (30.0, 1.0)).toDS()
    val got = data.select(new Aggregators.WeightedMean().toColumn).head()
    assert(math.abs(got - (10.0 * 1 + 20.0 * 3 + 30.0 * 1) / 5.0) < 1e-12)
  }
}
