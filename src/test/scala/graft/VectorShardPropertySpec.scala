package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.asDouble
import graft.operators.VectorIndex

/** Model-based check of the sharded VECTOR federation (the text twin is
  * ShardedIndexPropertySpec): random append/delete interleavings against
  * a 2-shard sq8 store must keep the federated search BIT-equal to a
  * monolithic store driven by the same verbs. The monolithic store IS
  * the model — sq8 training is deterministic on the same build relation,
  * both sides encode appends with stored copies of that one training,
  * so any divergence is a routing or tombstone-commutation defect, not
  * quantization noise.
  */
class VectorShardPropertySpec extends SparkSuite {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables(spark, dir, "embeddings")
    .select(col("vec_id"), asDouble(col("embedding")).as("v"))

  private def queries = emb.filter(col("vec_id") < 3)
    .select(col("vec_id").as("qid"), col("v").as("qv"))

  private sealed trait Verb
  private case class Append(lo: Long, n: Long) extends Verb
  private case class Delete(ids: Seq[Long]) extends Verb

  private val genVerb: Gen[Verb] = Gen.frequency(
    3 -> Gen.chooseNum(1L, 8L).map(n => Append(0L, n)), // lo filled later
    2 -> Gen.chooseNum(1, 3).flatMap(k =>
      Gen.listOfN(k, Gen.chooseNum(0L, 80L)).map(Delete(_))))

  private def slice(lo: Long, hi: Long): DataFrame =
    emb.filter(col("vec_id") >= lo && col("vec_id") < hi)

  private def asRows(df: DataFrame): Seq[(Long, Long, Int, Double)] =
    df.orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSeq

  test("random append/delete interleavings on a 2-shard sq8 store stay " +
    "BIT-equal to the monolithic model after every verb") {
    (1 to 3).foreach { seed =>
      val verbs = Gen.listOfN(8, genVerb)
        .apply(Gen.Parameters.default, Seed(300L + seed)).get
      val base = tmpDir(s"vec-shprop$seed")
      val root = s"$base/sharded"; val mono = s"$base/mono"
      VectorIndex.buildSharded(slice(0L, 40L), "sq8", root, 2, protocol = "rename")
      VectorIndex.build(slice(0L, 40L), "sq8", mono, protocol = "rename")
      var nextLo = 40L
      verbs.zipWithIndex.foreach { case (verb, step) =>
        verb match {
          case Append(_, n) =>
            val inc = slice(nextLo, nextLo + n); nextLo += n
            if (!inc.isEmpty) {
              VectorIndex.appendSharded(inc, root)
              VectorIndex.append(inc, mono)
            }
          case Delete(ids) =>
            val del = ids.distinct.toDF("vec_id")
            VectorIndex.deleteSharded(del, root)
            VectorIndex.delete(del, mono)
        }
        val sh = asRows(VectorIndex.searchSharded(queries, root, k = 5))
        val mo = asRows(VectorIndex.search(emb, queries, mono, k = 5))
        assert(sh == mo, s"seed=$seed step=$step verb=$verb:\n $sh\nvs $mo")
      }
    }
  }
}
