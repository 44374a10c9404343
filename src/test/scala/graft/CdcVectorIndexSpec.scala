package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.asDouble
import graft.operators.{VectorIndex, VersionedStore}

/** The CDC bridge between the versioned embedding store and the vector
  * index families (q192): one revision-window call maintains the index
  * in O(delta). The quantized families encode appends under the FROZEN
  * bootstrap quantizer, so the pinned contract is bit-equality with
  * hand-driving the family's own append/delete verbs on the window's
  * diff — maintenance, not rebuild — plus replay safety and the
  * store's in-window netting (a row appended then tombstoned inside
  * the window never even reaches the index).
  */
class CdcVectorIndexSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables(spark, dir, "embeddings")
    .filter(col("vec_id") < 300)
    .select(col("vec_id"), asDouble(col("embedding")).as("v"))

  private def queries = emb.filter(col("vec_id") < 3)
    .select(col("vec_id").as("qid"), col("v").as("qv"))

  private def results(idx: String): Seq[(Long, Long, Int, Double)] =
    VectorIndex.search(emb, queries, idx, k = 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSeq

  test("a maintained sq8 store is BIT-equal to hand-driving the family's " +
    "append/delete verbs with the window's diff; replaying the window " +
    "changes nothing; in-window append-then-delete rows never reach the " +
    "index") {
    val base = tmpDir("cdcvec")
    val store = s"$base/emb"
    val idx = s"$base/idx"; val hand = s"$base/hand"
    val boot = emb.filter(col("vec_id") % 4 =!= 3)
    val late = emb.filter(col("vec_id") % 4 === 3)
    val doomed = emb.filter(col("vec_id") % 8 === 1 ||
      col("vec_id") % 8 === 7).select("vec_id")

    // the corpus evolves through store verbs alone
    val r1 = VersionedStore.save(Map("emb" -> boot), store)
    VectorIndex.build(VersionedStore.read(spark, store, "emb", Some(r1)),
      "sq8", idx, protocol = "rename")
    VectorIndex.build(VersionedStore.read(spark, store, "emb", Some(r1)),
      "sq8", hand, protocol = "rename")
    VersionedStore.append(Map("emb" -> late), store)
    val r3 = VersionedStore.delete(doomed, "emb", store)

    VectorIndex.maintainFromStore(spark, store, "emb", r1, r3, idx)
    // the hand-driven twin: deletes first, then the NETTED insert set
    // (the store nets appended-then-tombstoned rows out of the window)
    VectorIndex.delete(doomed, hand)
    VectorIndex.append(late.join(doomed, Seq("vec_id"), "left_anti"), hand)

    assert(results(idx) == results(hand),
      "maintained store must equal the hand-driven append/delete twin")
    // the netted rows (vec_id % 8 = 7: appended in the window, deleted
    // in the window) were never encoded — no code row, not just a mask
    val codes = spark.read.parquet(s"$idx/codes").select("vec_id")
    assert(codes.filter(col("vec_id") % 8 === 7).count() == 0,
      "in-window append-then-delete rows must be netted out, not encoded")
    // deleted bootstrap rows leave results via the sticky mask
    assert(!results(idx).exists(t => t._2 % 8 == 1),
      "a tombstoned bootstrap vector re-entered the search results")

    // replay: the same window re-applied is a no-op (fingerprint/
    // left-anti guarded appends, idempotent tombstones)
    val before = results(idx)
    val nCodes = spark.read.parquet(s"$idx/codes").count()
    VectorIndex.maintainFromStore(spark, store, "emb", r1, r3, idx)
    assert(results(idx) == before)
    assert(spark.read.parquet(s"$idx/codes").count() == nCodes,
      "a replayed window must re-append nothing")
  }

  test("refusals: a window crossing a compact refuses with guidance; a " +
    "relation without (vec_id, v) refuses naming the columns") {
    val base = tmpDir("cdcvec-ref")
    val store = s"$base/emb"; val idx = s"$base/idx"
    val r1 = VersionedStore.save(Map("emb" -> emb), store)
    VectorIndex.build(VersionedStore.read(spark, store, "emb", Some(r1)),
      "sq8", idx, protocol = "rename")
    VersionedStore.append(
      Map("emb" -> emb.filter(col("vec_id") === 0)
        .withColumn("vec_id", col("vec_id") + 1000000)), store)
    val r3 = VersionedStore.compact(spark, store)
    val ex = intercept[IllegalArgumentException] {
      VectorIndex.maintainFromStore(spark, store, "emb", r1, r3, idx)
    }
    assert(ex.getMessage.contains("save/compact"))

    val store2 = s"$base/docs"
    val d1 = VersionedStore.save(
      Map("docs" -> Seq((1L, "a")).toDF("doc_id", "text")), store2)
    val d2 = VersionedStore.append(
      Map("docs" -> Seq((2L, "b")).toDF("doc_id", "text")), store2)
    val ex2 = intercept[IllegalArgumentException] {
      VectorIndex.maintainFromStore(spark, store2, "docs", d1, d2, idx)
    }
    assert(ex2.getMessage.contains("vec_id"))
  }

  test("family matrix: the SAME maintain call routes pq, bin, ivf, and " +
    "lsh stores through their own append/delete verbs — each maintained " +
    "store bit-equals its hand-driven twin, and a replayed window " +
    "changes nothing") {
    Seq("pq", "bin", "ivf", "lsh").foreach { fam =>
      val base = tmpDir(s"cdcvec-$fam")
      val store = s"$base/emb"
      val idx = s"$base/idx"; val hand = s"$base/hand"
      val boot = emb.filter(col("vec_id") % 4 =!= 3)
      val late = emb.filter(col("vec_id") % 4 === 3)
      val doomed = emb.filter(col("vec_id") % 8 === 1).select("vec_id")
      val r1 = VersionedStore.save(Map("emb" -> boot), store)
      VectorIndex.build(VersionedStore.read(spark, store, "emb", Some(r1)),
        fam, idx, protocol = "rename")
      VectorIndex.build(VersionedStore.read(spark, store, "emb", Some(r1)),
        fam, hand, protocol = "rename")
      VersionedStore.append(Map("emb" -> late), store)
      val r3 = VersionedStore.delete(doomed, "emb", store)
      VectorIndex.maintainFromStore(spark, store, "emb", r1, r3, idx)
      VectorIndex.delete(doomed, hand)
      VectorIndex.append(late, hand)
      assert(results(idx) == results(hand),
        s"family $fam: maintained store must equal the hand-driven twin")
      assert(!results(idx).exists(t => t._2 % 8 == 1),
        s"family $fam: a tombstoned vector re-entered the results")
      val before = results(idx)
      VectorIndex.maintainFromStore(spark, store, "emb", r1, r3, idx)
      assert(results(idx) == before, s"family $fam: replay must change nothing")
    }
  }

  test("sync: bootstrap trains the quantizer on read(current) and " +
    "checkpoints; one later call absorbs pending revisions and equals " +
    "the hand-driven window; a current index syncs as a no-op") {
    val base = tmpDir("cdcvec-sync")
    val store = s"$base/emb"; val idx = s"$base/idx"; val hand = s"$base/hand"
    val boot = emb.filter(col("vec_id") % 4 =!= 3)
    val late = emb.filter(col("vec_id") % 4 === 3)
    val doomed = emb.filter(col("vec_id") % 8 === 1).select("vec_id")
    VersionedStore.save(Map("emb" -> boot), store)
    assert(VectorIndex.syncWithStore(spark, store, "emb", idx, protocol = "rename").isDefined)
    assert(VectorIndex.syncWithStore(spark, store, "emb", idx, protocol = "rename").isEmpty)
    VersionedStore.append(Map("emb" -> late), store)
    VersionedStore.delete(doomed, "emb", store)
    assert(VectorIndex.syncWithStore(spark, store, "emb", idx, protocol = "rename").isDefined)
    // the hand-driven twin over the same window
    VectorIndex.build(boot, "sq8", hand, protocol = "rename")
    VectorIndex.delete(doomed, hand)
    VectorIndex.append(late, hand)
    assert(results(idx) == results(hand))
  }
}
