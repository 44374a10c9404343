package graft

import org.apache.spark.sql.DataFrame
import graft.queries.DedupQueries._

/** Model-based property check of the sharded signature federation — the
  * ShardedWinnowSpec interleaving discipline on the MinHash side: a
  * seeded random stream of append / replayed-append / forget / compact
  * verbs against the 3-shard store must keep the federated probe equal,
  * after EVERY verb, to a from-scratch incrementalReject over the live
  * document set tracked by a plain in-memory model. MinHash signatures
  * are per-doc deterministic (no global training, no corpus
  * statistics), so any divergence is a routing, guard, or
  * tombstone-commutation defect — never estimation noise.
  */
class ShardedSignaturePropertySpec extends SparkSuite {
  import spark.implicits._

  /** A small pool of base texts; each doc is an exact copy of its
    * (id % pool) base, so the probe always has matches to find and a
    * forgotten copy visibly changes the best-match election.
    */
  private val bases = Seq(
    "the quick brown fox jumps over the lazy dog tonight",
    "pack my box with five dozen liquor jugs right now",
    "how vexingly quick daft zebras jump in the morning",
    "sphinx of black quartz judge my vow before dusk",
    "jackdaws love my big sphinx of quartz every day",
    "waltz bad nymph for quick jigs vex the crowd")

  private def mkDoc(id: Long): (Long, String) = (id, bases((id % 6).toInt))

  private def docs(ids: Seq[Long]): DataFrame =
    ids.map(mkDoc).toDF("doc_id", "text")

  private def probeSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("seeded random verb interleaving (append / replayed append / " +
    "forget / compact) keeps the federated probe equal to a from-scratch " +
    "recompute over the model's live set after EVERY verb") {
    val root = tmpDir("sigprop") + "/sharded"
    var live = (1L to 9L).toVector
    buildSignatureIndexSharded(docs(live), root, nShards = 3)
    val probe = docs(Seq(501L, 502L, 503L))
    val rnd = new scala.util.Random(20260815L)
    var nextId = 100L
    (1 to 10).foreach { step =>
      rnd.nextInt(4) match {
        case 0 => // append a fresh doc
          val d = docs(Seq(nextId)); nextId += 1
          appendSignatureIndexSharded(d, root)
          live :+= (nextId - 1)
        case 1 => // replayed append: the left-anti guard admits once
          val d = docs(Seq(nextId)); nextId += 1
          appendSignatureIndexSharded(d, root)
          appendSignatureIndexSharded(d, root)
          live :+= (nextId - 1)
        case 2 => // forget one random live doc; an emptying-shard
          // refusal is an atomic no-op (checked up front) — the model
          // then keeps the doc too
          val id = live(rnd.nextInt(live.size))
          try {
            forgetSignatureIndexSharded(spark, Seq(id).toDF("doc_id"), root)
            live = live.filterNot(_ == id)
          } catch { case _: IllegalArgumentException => }
        case 3 =>
          compactSignatureIndexSharded(spark, root)
      }
      val f = probeSet(probeSignatureIndexSharded(spark, probe, root))
      val m = probeSet(incrementalReject(
        minhashSigs(docs(live)), minhashSigs(probe)))
      assert(f == m, s"step $step (live=${live.sorted}): sharded $f != model $m")
    }
  }
}
