package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.SearchQueries.{textIndexBuild, textIndexSaveSharded,
  textIndexLoad, textIndexAppendSharded, textIndexDeleteSharded,
  textIndexForgetSharded, textIndexShardCount, textIndexRecoverSharded}

/** The TextIndexPropertySpec model run against a SHARDED store: the
  * federation must commute with every random verb interleaving — after
  * every append/delete/forget/crashed-append, the union of the shards'
  * loaded relations must row-equal the from-scratch index of the model's
  * visible corpus. This pins that routing (pmod(xxhash64(doc_id), n))
  * composes with tombstones, forget's own-tombstone clearing, and
  * per-shard crash recovery — not just with the straight-line verb
  * sequences the example-based ShardedIndexSpec exercises.
  */
class ShardedIndexPropertySpec extends SparkSuite {

  import spark.implicits._

  private val N = 2

  private sealed trait Verb
  private case class Append(ids: Seq[Long]) extends Verb
  private case class Delete(ids: Seq[Long]) extends Verb
  private case class Forget(ids: Seq[Long]) extends Verb
  private case class CrashedAppend(ids: Seq[Long]) extends Verb

  private val genVerb: Gen[Verb] = Gen.frequency(
    5 -> Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 24L)).map(Append(_))),
    3 -> Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 24L)).map(Delete(_))),
    2 -> Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 24L)).map(Forget(_))),
    1 -> Gen.chooseNum(1, 2).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(30L, 40L)).map(CrashedAppend(_))))

  private def textOf(id: Long): String =
    s"common corpus words doc$id plus shared token t${id % 5} tail t${id % 3}"

  private def docs(ids: Seq[Long]): DataFrame =
    ids.distinct.map(i => (i, textOf(i))).toDF("doc_id", "text")

  /** The router's shard assignment, computed with the SAME expression the
    * store uses, so the model can predict per-shard emptiness for the
    * forget-refusal guard.
    */
  private lazy val shardOfId: Map[Long, Long] =
    (0L to 44L).map(i => (i, textOf(i))).toDF("doc_id", "text")
      .select(col("doc_id"),
        pmod(xxhash64(col("doc_id").cast("long")), lit(N.toLong)).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private case class Model(indexed: Set[Long], tombs: Set[Long]) {
    def visible: Set[Long] = indexed -- tombs
  }

  private def rowSets(po: DataFrame, ds: DataFrame): (Set[(String, Long, Int)], Set[(Long, Int)]) =
    (po.select("term", "doc_id", "tf").collect()
       .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet,
      ds.select("doc_id", "dl").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet)

  private def federatedRows(root: String): (Set[(String, Long, Int)], Set[(Long, Int)]) =
    (0 until textIndexShardCount(spark, root))
      .map(i => rowSets _ tupled textIndexLoad(spark, s"$root/shard-$i"))
      .reduce((a, b) => (a._1 ++ b._1, a._2 ++ b._2))

  private def modelRows(m: Model): (Set[(String, Long, Int)], Set[(Long, Int)]) = {
    if (m.visible.isEmpty) return (Set.empty, Set.empty)
    val (po, ds) = textIndexBuild(docs(m.visible.toSeq))
    rowSets(po, ds)
  }

  test("random verb interleavings against a 2-shard store: the FEDERATED " +
    "row set equals the from-scratch index of the model after every verb") {
    (1 to 3).foreach { seed =>
      val verbs = Gen.listOfN(10, genVerb)
        .apply(Gen.Parameters.default, Seed(100L + seed)).get
      val root = tmpDir(s"tidx-shprop$seed") + "/root"
      val init = (0L to 9L).toSeq
      // the fixture must populate both shards (saveSharded refuses empty)
      assert(init.map(shardOfId).toSet.size == N, "fixture must hit all shards")
      val (p0, d0) = textIndexBuild(docs(init))
      textIndexSaveSharded(p0, d0, root, N)
      var m = Model(init.toSet, Set.empty)

      verbs.zipWithIndex.foreach { case (verb, step) =>
        verb match {
          case Append(ids) =>
            textIndexAppendSharded(docs(ids), root)
            m = m.copy(indexed = m.indexed ++ ids)
          case Delete(ids) =>
            textIndexDeleteSharded(ids.toDF("doc_id"), root)
            m = m.copy(tombs = m.tombs ++ ids)
          case Forget(ids) =>
            val wouldEmpty = (0L until N).exists { sh =>
              val slice = ids.filter(i => shardOfId(i) == sh)
              slice.nonEmpty &&
                (m.indexed.filter(i => shardOfId(i) == sh) -- slice).isEmpty
            }
            if (wouldEmpty) {
              // the verb must refuse UP FRONT — no shard forgotten, the
              // federation (and therefore the model) untouched
              intercept[IllegalArgumentException] {
                textIndexForgetSharded(ids.toDF("doc_id"), root)
              }
            } else {
              textIndexForgetSharded(ids.toDF("doc_id"), root)
              m = Model(m.indexed -- ids, m.tombs -- ids)
            }
          case CrashedAppend(ids) =>
            val fresh = ids.distinct.filterNot(m.indexed)
            if (fresh.nonEmpty) {
              val (pInc, _) = textIndexBuild(docs(fresh))
              pInc.write.mode("append").parquet(s"$root/shard-0/postings")
              new java.io.File(s"$root/shard-0/_inflight").createNewFile()
              textIndexRecoverSharded(spark, root)
            }
        }
        val got = federatedRows(root)
        val want = modelRows(m)
        assert(got == want,
          s"seed=$seed step=$step verb=$verb model=$m:\n got=$got\nwant=$want")
      }
    }
  }
}
