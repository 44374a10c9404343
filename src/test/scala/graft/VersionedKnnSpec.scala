package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.asDouble
import graft.operators.VersionedStore
import graft.queries.SimilarityQueries._

/** The manifest-committed kNN-list store — the graph family on the
  * rename-free protocol, with the family's one protocol difference: the
  * dead-node set is an append-only `dead` relation (a manifest
  * tombstone's single-key anti join cannot mask BOTH list columns).
  * Pinned: rename-equality of the stored lists, two-column dead
  * masking with sticky semantics, the generator splice guard, the
  * single-PUT re-knit byte-equal to the rename re-knit AND the full
  * rebuild, and `asOf` time travel.
  */
class VersionedKnnSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables(spark, dir, "embeddings")
    .filter(col("vec_id") < 300)
    .select(col("vec_id"), asDouble(col("embedding")).as("v"))

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))

  private def sorted(df: org.apache.spark.sql.DataFrame) =
    df.select("aid", "bid", "sim", "rn").collect().map(key).sorted

  test("save → load round-trips through the manifest protocol and " +
    "equals the rename store bit-for-bit") {
    val base = tmpDir("vknn")
    val lists = bruteTopLists(emb, 3)
    knnSaveLists(lists, 3, "brute-cos", s"$base/ren")
    knnSaveListsVersioned(lists, 3, "brute-cos", s"$base/ver")
    val (ren, kr) = knnLoadLists(spark, s"$base/ren")
    val (ver, kv) = knnLoadListsVersioned(spark, s"$base/ver")
    assert(kr == 3 && kv == 3)
    assert(sorted(ver).sameElements(sorted(ren)))
    // save-side gates shared: mis-declared k refused
    val ex = intercept[IllegalArgumentException] {
      knnSaveListsVersioned(lists, 2, "brute-cos", s"$base/bad")
    }
    assert(ex.getMessage.contains("> declared k"))
  }

  test("append: disjoint new anchors land as a delta revision, a " +
    "replayed append is a no-op, and a different generator is refused") {
    val base = tmpDir("vknna") + "/v"
    val old = emb.filter(col("vec_id") >= 20)
    val inc = emb.filter(col("vec_id") < 20)
    knnSaveListsVersioned(bruteTopLists(old, 3), 3, "brute-cos", base)
    val r1 = VersionedStore.currentVersion(spark, base).get
    val incLists = bruteListsForAnchors(emb, inc.select("vec_id"), 3)
    val r2 = knnAppendListsVersioned(incLists, "brute-cos", base)
    assert(r2 == r1 + 1)
    val n = knnLoadListsVersioned(spark, base)._1
      .select("aid").distinct().count()
    assert(n == emb.count(), "appended anchors visible")
    // replay: all aids already stored → nothing committed
    assert(knnAppendListsVersioned(incLists, "brute-cos", base) == r2)
    val ex = intercept[IllegalArgumentException] {
      knnAppendListsVersioned(incLists, "lsh-multi-4x6", base)
    }
    assert(ex.getMessage.contains("different generator"))
  }

  test("delete masks a node out of BOTH columns, stays sticky across a " +
    "replayed append, and a fresh save re-admits") {
    val base = tmpDir("vknnd") + "/v"
    val lists = bruteTopLists(emb, 3)
    knnSaveListsVersioned(lists, 3, "brute-cos", base)
    val victim = emb.filter(col("vec_id") === 0).select("vec_id")
      .localCheckpoint(true)
    knnDeleteNodesVersioned(victim, base)
    val (masked, _) = knnLoadListsVersioned(spark, base)
    assert(masked.filter(col("aid") === 0 || col("bid") === 0).isEmpty,
      "a forgotten node vanishes as an anchor AND as everyone's neighbor")
    // replayed append of the victim's lists: refused by the raw-store
    // probe (its rows are still stored), so deletion stays sticky
    val r = VersionedStore.currentVersion(spark, base).get
    assert(knnAppendListsVersioned(
      lists.filter(col("aid") === 0), "brute-cos", base) == r)
    assert(knnLoadListsVersioned(spark, base)._1
      .filter(col("aid") === 0).isEmpty, "sticky forget")
    // a fresh save is the re-admission point (dead resets)
    knnSaveListsVersioned(lists, 3, "brute-cos", base)
    assert(!knnLoadListsVersioned(spark, base)._1
      .filter(col("aid") === 0).isEmpty)
  }

  test("re-knit commits ONE replaceRelation revision and is byte-equal " +
    "to the rename re-knit AND the from-scratch rebuild; asOf the " +
    "pre-reknit revision still shows the stale lists") {
    val base = tmpDir("vknnr")
    val old = emb.filter(col("vec_id") >= 20)
    val inc = emb.filter(col("vec_id") < 20)
    val ids = inc.select("vec_id").localCheckpoint(true)
    // both stores: bootstrap lists + appended new-anchor lists
    knnSaveLists(bruteTopLists(old, 3), 3, "brute-cos", s"$base/ren")
    knnSaveListsVersioned(bruteTopLists(old, 3), 3, "brute-cos",
      s"$base/ver")
    val incLists = bruteListsForAnchors(emb, ids, 3).localCheckpoint(true)
    knnAppendLists(incLists, "brute-cos", s"$base/ren")
    val rStale = knnAppendListsVersioned(incLists, "brute-cos",
      s"$base/ver")
    val stale = sorted(knnLoadListsVersioned(spark, s"$base/ver")._1)
    knnReknit(emb, ids, s"$base/ren")
    val rKnit = knnReknitVersioned(emb, ids, s"$base/ver")
    assert(rKnit == rStale + 1, "the repair is ONE manifest PUT")
    val ver = sorted(knnLoadListsVersioned(spark, s"$base/ver")._1)
    assert(ver.sameElements(sorted(knnLoadLists(spark, s"$base/ren")._1)),
      "versioned re-knit must equal the rename re-knit byte-for-byte")
    assert(ver.sameElements(sorted(bruteTopLists(emb, 3))),
      "re-knit must equal the full rebuild byte-for-byte")
    assert(sorted(knnLoadListsVersioned(spark, s"$base/ver",
      asOf = Some(rStale))._1).sameElements(stale),
      "asOf the pre-reknit revision still shows the stale lists")
    // ANN-generated stores refuse the exact merge
    knnSaveListsVersioned(
      bruteTopLists(emb, 3), 3, "lsh-multi-4x6", s"$base/ann")
    val ex = intercept[IllegalArgumentException] {
      knnReknitVersioned(emb, ids, s"$base/ann")
    }
    assert(ex.getMessage.contains("exact only over exact lists"))
  }

  test("sync: the CDC window (append + deletes hitting both stored and " +
    "in-window rows) lands as ONE commit and the maintained store loads " +
    "byte-equal to a from-scratch build of the final visible corpus") {
    val base = tmpDir("vknny")
    val store = s"$base/emb"; val idx = s"$base/v"
    val boot = emb.filter(col("vec_id") % 4 =!= 3)
    VersionedStore.save(Map("emb" -> boot), store)
    assert(knnSyncVersionedWithStore(spark, store, "emb", idx, k = 3)
      .contains((1L, 1L)), "bootstrap absorbs the store's current rev")
    VersionedStore.append(
      Map("emb" -> emb.filter(col("vec_id") % 4 === 3)), store)
    VersionedStore.delete(
      emb.filter(col("vec_id") % 8 === 1 || col("vec_id") % 8 === 7)
        .select("vec_id"), "emb", store)
    val before = VersionedStore.currentVersion(spark, idx).get
    assert(knnSyncVersionedWithStore(spark, store, "emb", idx, k = 3)
      .contains((1L, 3L)), "catch-up absorbs the two pending revisions")
    assert(VersionedStore.currentVersion(spark, idx).get == before + 1,
      "the whole window — dead append + merged lists — is ONE commit")
    val live = VersionedStore.read(spark, store, "emb")
      .select("vec_id", "v").localCheckpoint(true)
    assert(sorted(knnLoadListsVersioned(spark, idx)._1)
      .sameElements(sorted(bruteTopLists(live, 3))),
      "maintained store must be byte-equal to a from-scratch rebuild " +
        "of the final visible corpus — even across the delete window " +
        "(the repair recomputes every referencing anchor exactly)")
    assert(knnSyncVersionedWithStore(spark, store, "emb", idx, k = 3)
      .isEmpty, "a current index syncs as a no-op")
  }
}
