package graft

import org.apache.spark.sql.DataFrame
import graft.operators.VersionedStore
import graft.queries.DedupQueries._

/** Model-based property check of the MANIFEST-COMMITTED sharded
  * signature federation — ShardedSignaturePropertySpec's interleaving
  * discipline on the rename-free protocol: a seeded random stream of
  * append / replayed-append / forget / re-append-forgotten /
  * crashed-commit / compact verbs against the 3-shard versioned store
  * must keep the federated probe equal, after EVERY verb, to a
  * from-scratch incrementalReject over the in-memory model's VISIBLE
  * document set. The protocol's own semantics are part of the model:
  * forget is a sticky manifest tombstone (a re-appended same doc_id
  * stays masked until its shard compacts), compact retires tombstones
  * per shard (modeled here as an all-shard sweep), and a crashed
  * commit — a data dir written on some shard with no manifest PUT —
  * changes nothing.
  */
class VersionedShardedSignaturePropertySpec extends SparkSuite {
  import spark.implicits._

  private val bases = Seq(
    "the quick brown fox jumps over the lazy dog tonight",
    "pack my box with five dozen liquor jugs right now",
    "how vexingly quick daft zebras jump in the morning",
    "sphinx of black quartz judge my vow before dusk",
    "jackdaws love my big sphinx of quartz every day",
    "waltz bad nymph for quick jigs vex the crowd")

  private def docs(ids: Seq[Long]): DataFrame =
    ids.map(id => (id, bases((id % 6).toInt))).toDF("doc_id", "text")

  private def probeSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("seeded random verb interleaving keeps the versioned federated " +
    "probe equal to a from-scratch recompute over the model's visible " +
    "set after EVERY verb") {
    val root = tmpDir("vsigprop") + "/fed"
    var indexed = (1L to 9L).toSet
    var tombs = Set.empty[Long]
    def visible = indexed -- tombs
    buildSignatureIndexShardedVersioned(docs(indexed.toSeq.sorted), root,
      nShards = 3)
    val probe = docs(Seq(501L, 502L, 503L)).localCheckpoint(true)
    val rnd = new scala.util.Random(20260816L)
    var nextId = 100L
    (1 to 12).foreach { step =>
      val verb = rnd.nextInt(6)
      verb match {
        case 0 => // append a fresh doc
          appendSignatureIndexShardedVersioned(docs(Seq(nextId)), root)
          indexed += nextId; nextId += 1
        case 1 => // replayed append: the visible-id guard admits once
          appendSignatureIndexShardedVersioned(docs(Seq(nextId)), root)
          appendSignatureIndexShardedVersioned(docs(Seq(nextId)), root)
          indexed += nextId; nextId += 1
        case 2 => // forget a random known doc (sticky tombstone)
          val pool = indexed.toSeq.sorted
          val id = pool(rnd.nextInt(pool.size))
          forgetSignatureIndexShardedVersioned(spark,
            Seq(id).toDF("doc_id"), root)
          tombs += id
        case 3 => // re-append a FORGOTTEN doc: stays masked (sticky)
          if (tombs.nonEmpty) {
            val id = tombs.toSeq.sorted.head
            appendSignatureIndexShardedVersioned(docs(Seq(id)), root)
            indexed += id
          }
        case 4 => // crashed commit on a random shard: a data dir for
          // the next revision, no manifest PUT — invisible
          val shard = s"$root/shard-${rnd.nextInt(3)}"
          val rev = VersionedStore.currentVersion(spark, shard).get + 1
          VersionedStore.writeDataDir(
            minhashSigs(docs(Seq(nextId + 900))), shard, rev, "data",
            "sig")
        case 5 => // compact every shard: tombstones fold out and retire
          (0 until 3).foreach(i =>
            VersionedStore.compact(spark, s"$root/shard-$i"))
          indexed = visible; tombs = Set.empty
      }
      val fed = probeSet(probeSignatureIndexShardedVersioned(spark,
        probe, root))
      val model =
        if (visible.isEmpty) Set.empty[(Long, Long, Double)]
        else probeSet(incrementalReject(
          minhashSigs(docs(visible.toSeq.sorted)), minhashSigs(probe)))
      assert(fed == model,
        s"step $step verb=$verb (visible=${visible.toSeq.sorted}): " +
          s"federated $fed != model $model")
    }
  }
}
