package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{RevisionSync, VectorIndex, VersionedStore}
import graft.queries.{DedupQueries, SearchQueries}

/** The `retain` knob on the CDC sync verbs: a sync loop adds one
  * revision per absorbed window forever, so `retain = Some(n)` vacuums
  * the synced manifest-committed index to its newest n revisions after
  * each marker bump — bounding a year of daily syncs to n manifests
  * instead of 365. Pins: the revision floor moves (asOf below it
  * refuses), the `_synced_rev` checkpoint and manifest batch markers
  * survive vacuum, search content is untouched, federations sweep
  * every shard plus the router, and a rename-protocol index refuses
  * the knob.
  */
class VersionedRetentionSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def docs: DataFrame =
    Tables(spark, dir, "documents").select("doc_id", "text", "source")

  test("text sync with retain=2: revisions are bounded after every sync, " +
    "asOf below the floor refuses, the checkpoint survives, and search " +
    "equals a fresh build of the store's current content") {
    val base = tmpDir("ret-text")
    val store = s"$base/corpus"; val idx = s"$base/idx"
    VersionedStore.save(
      Map("docs" -> docs.filter(col("doc_id") % 3 === 0)
        .select("doc_id", "text")), store)
    // bootstrap (idx rev 1)
    SearchQueries.textIndexSyncVersionedWithStore(spark, store, "docs",
      idx, retain = Some(2))
    // two more corpus revisions, absorbed one sync each (idx revs 2, 3)
    VersionedStore.append(Map("docs" -> docs
      .filter(col("doc_id") % 3 === 1).select("doc_id", "text")), store)
    SearchQueries.textIndexSyncVersionedWithStore(spark, store, "docs",
      idx, retain = Some(2))
    VersionedStore.delete(
      docs.filter(col("doc_id") % 9 === 0).select("doc_id"), "docs", store)
    SearchQueries.textIndexSyncVersionedWithStore(spark, store, "docs",
      idx, retain = Some(2))
    assert(VersionedStore.listVersions(spark, idx) == Seq(2L, 3L),
      "retain=2 keeps exactly the newest two revisions")
    val ex = intercept[IllegalArgumentException] {
      VersionedStore.read(spark, idx, "postings", asOf = Some(1L))
    }
    assert(ex.getMessage.contains("vacuumed"),
      "time travel below the retained floor refuses with the vacuum trade")
    // the checkpoint survived: a fourth sync is a clean no-op
    assert(SearchQueries.textIndexSyncVersionedWithStore(spark, store,
      "docs", idx, retain = Some(2)).isEmpty)
    assert(RevisionSync.syncedRev(spark, idx) == Some((store, 3L)))
    // content untouched: equals a fresh build of read(current)
    val fresh = s"$base/fresh"
    SearchQueries.textIndexSaveVersioned(
      VersionedStore.read(spark, store, "docs"), fresh)
    assert(SearchQueries.textIndexSearchVersioned(spark, idx)
        .orderBy("doc_id").collect().toSeq ==
      SearchQueries.textIndexSearchVersioned(spark, fresh)
        .orderBy("doc_id").collect().toSeq)
  }

  test("sharded signature sync with retain=1 sweeps every shard AND the " +
    "router; the federated probe still equals the from-scratch recompute") {
    val base = tmpDir("ret-sig")
    val store = s"$base/corpus"; val root = s"$base/fed"
    // the probe increment stays OUT of the corpus (q191 semantics)
    val corpus = docs.filter(col("source") =!= "src19")
      .select("doc_id", "text")
    VersionedStore.save(
      Map("docs" -> corpus.filter(col("doc_id") % 3 =!= 0)), store)
    DedupQueries.syncSignatureIndexShardedVersionedWithStore(spark, store,
      "docs", root, nShards = 3, retain = Some(1))
    VersionedStore.append(
      Map("docs" -> corpus.filter(col("doc_id") % 3 === 0)), store)
    DedupQueries.syncSignatureIndexShardedVersionedWithStore(spark, store,
      "docs", root, nShards = 3, retain = Some(1))
    val n = DedupQueries.signatureShardCount(spark, root)
    (0 until n).foreach { i =>
      assert(VersionedStore.listVersions(spark, s"$root/shard-$i")
        .size == 1, s"shard $i vacuumed to the single newest revision")
    }
    assert(VersionedStore.listVersions(spark, s"$root/router").size == 1)
    val probe = docs.filter(col("source") === "src19")
      .select("doc_id", "text").limit(10).localCheckpoint(true)
    val fed = DedupQueries.probeSignatureIndexShardedVersioned(spark,
      probe, root).collect().map(_.toSeq).toSet
    val model = DedupQueries.incrementalReject(
      DedupQueries.minhashSigs(VersionedStore.read(spark, store, "docs")),
      DedupQueries.minhashSigs(probe)).collect().map(_.toSeq).toSet
    assert(fed == model,
      "retention must not change what the federation returns")
  }

  test("a manifest batch marker survives vacuum (retention on a corpus " +
    "store maintained by VersionedIngest keeps exactly-once intact); " +
    "retain on a rename-protocol index refuses") {
    val base = tmpDir("ret-marker")
    val store = s"$base/corpus"
    val d = docs.select("doc_id", "text").limit(30).localCheckpoint(true)
    graft.streaming.VersionedIngest.bootstrap(d.limit(10), store)
    graft.streaming.VersionedIngest.ingestBatch(
      d.filter(col("doc_id") % 2 === 0), 0L, store)
    graft.streaming.VersionedIngest.ingestBatch(
      d.filter(col("doc_id") % 2 === 1), 1L, store)
    VersionedStore.vacuum(spark, store, keep = 1)
    assert(VersionedStore.batchMarker(spark, store).contains(1L),
      "the newest manifest carries the marker; vacuum never strips it")
    // a replay after the vacuum still skips
    assert(!graft.streaming.VersionedIngest.ingestBatch(
      d.limit(5), 1L, store))
    // rename-protocol index: the knob refuses up front
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
    val estore = s"$base/emb"
    VersionedStore.save(Map("emb" -> emb), estore)
    val ex = intercept[IllegalArgumentException] {
      VectorIndex.syncWithStore(spark, estore, "emb", s"$base/renidx",
        "sq8", protocol = "rename", retain = Some(2))
    }
    assert(ex.getMessage.contains("rename"))
  }
}
