package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.8: absent in the reference, the Spark
  * extension point is `Aggregator[IN, BUF, OUT]`). TopK keeps a bounded
  * per-group buffer — constant state per key regardless of group size, the
  * property that makes per-group top-k feasible at 100 TB (the buffer is
  * merged map-side before the shuffle, so only k rows per group ship).
  */
object Aggregators {

  final case class Scored(key: Long, score: Double)

  /** Top-k scores per group: buffer holds at most k (score desc, key asc)
    * entries at every reduce/merge step.
    */
  final class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Long]] {
    private def bound(s: Seq[Scored]): Seq[Scored] =
      s.sortBy(x => (-x.score, x.key)).take(k)

    override def zero: Seq[Scored] = Seq.empty
    override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = bound(b :+ a)
    override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = bound(x ++ y)
    override def finish(b: Seq[Scored]): Seq[Long] = b.map(_.key)
    override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** Exact weighted mean as a single pass (sum/weight pair buffer). */
  final class WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    override def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(b: (Double, Double)): Double =
      if (b._2 == 0.0) 0.0 else b._1 / b._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
