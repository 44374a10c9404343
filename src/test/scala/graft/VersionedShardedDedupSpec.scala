package graft

import org.apache.spark.sql.functions._
import graft.operators.{RevisionSync, VersionedStore}
import graft.queries.DedupQueries._

/** The sharded signature and winnow federations on the manifest-commit
  * protocol — every shard AND the router are versioned stores. Pinned:
  * probe row-identity with the rename federations across the full
  * build/append/forget lifecycle (the commit protocol is invisible to
  * the pairing), the forget-without-intent discipline (tombstone PUTs
  * replace the rename forms' `_forget_intent` + rewrites), and the
  * one-verb CDC sync whose maintained federation probes identically to
  * a fresh versioned sharded build of the final visible corpus.
  */
class VersionedShardedDedupSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def docs = Tables(spark, dir, "documents")

  private def sigRows(df: org.apache.spark.sql.DataFrame) =
    df.select("new_id", "old_id", "jaccard_est").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def winRows(df: org.apache.spark.sql.DataFrame) =
    df.select("new_doc", "old_doc", "n_shared").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("signature federation: build/append/forget driven through BOTH " +
    "protocols probe row-identically at every step; the versioned " +
    "forget is per-owning-shard tombstone PUTs with no intent marker") {
    val base = tmpDir("vshsig")
    val inc = docs.filter(col("source") === "src19")
    val old = docs.filter(col("source") =!= "src19")
    val boot = old.filter(col("doc_id") % 2 === 0)
    val rest = old.filter(col("doc_id") % 2 =!= 0)
    buildSignatureIndexSharded(boot, s"$base/ren", 3)
    buildSignatureIndexShardedVersioned(boot, s"$base/ver", 3)
    def ren() = sigRows(probeSignatureIndexSharded(spark, inc, s"$base/ren"))
    def ver() = sigRows(
      probeSignatureIndexShardedVersioned(spark, inc, s"$base/ver"))
    assert(ver() == ren(), "post-build probes row-identical")
    appendSignatureIndexSharded(rest, s"$base/ren")
    appendSignatureIndexShardedVersioned(rest, s"$base/ver")
    assert(ver() == ren(), "post-append probes row-identical")
    val doomed = old.filter(col("doc_id") % 7 === 0).select("doc_id")
      .localCheckpoint(true)
    forgetSignatureIndexSharded(spark, doomed, s"$base/ren")
    forgetSignatureIndexShardedVersioned(spark, doomed, s"$base/ver")
    val after = ver()
    assert(after == ren(), "post-forget probes row-identical")
    val dead = doomed.collect().map(_.getLong(0)).toSet
    assert(after.forall(t => !dead.contains(t._2)),
      "forgotten docs never pair")
    // no intent sidecar exists on the versioned root
    val ip = new org.apache.hadoop.fs.Path(s"$base/ver/_forget_intent")
    assert(!ip.getFileSystem(spark.sessionState.newHadoopConf()).exists(ip),
      "the versioned forget needs no _forget_intent")
  }

  test("winnow federation: build/append/forget driven through BOTH " +
    "protocols probe row-identically; the all-shard forget is n " +
    "idempotent tombstone PUTs") {
    val base = tmpDir("vshwin")
    val inc = docs.filter(col("source") === "src19")
    val old = docs.filter(col("source") =!= "src19")
    val boot = old.filter(col("doc_id") % 2 === 0)
    val rest = old.filter(col("doc_id") % 2 =!= 0)
    buildWinnowIndexSharded(boot, s"$base/ren", 3)
    buildWinnowIndexShardedVersioned(boot, s"$base/ver", 3)
    def ren() = winRows(
      probeWinnowIndexSharded(spark, inc, s"$base/ren", minShared = 1))
    def ver() = winRows(
      probeWinnowIndexShardedVersioned(spark, inc, s"$base/ver",
        minShared = 1))
    assert(ver() == ren(), "post-build probes row-identical")
    appendWinnowIndexSharded(rest, s"$base/ren")
    appendWinnowIndexShardedVersioned(rest, s"$base/ver")
    assert(ver() == ren(), "post-append probes row-identical")
    val doomed = old.filter(col("doc_id") % 7 === 0).select("doc_id")
      .localCheckpoint(true)
    forgetWinnowIndexSharded(spark, doomed, s"$base/ren")
    forgetWinnowIndexShardedVersioned(spark, doomed, s"$base/ver")
    val after = ver()
    assert(after == ren(), "post-forget probes row-identical")
    val dead = doomed.collect().map(_.getLong(0)).toSet
    assert(after.forall(t => !dead.contains(t._2)),
      "forgotten docs never pair")
    // replaying the forget is a no-op on the pairing
    forgetWinnowIndexShardedVersioned(spark, doomed, s"$base/ver")
    assert(ver() == after, "replayed forget changes nothing")
  }

  test("sync: both versioned federations bootstrap from read(current), " +
    "absorb an append+delete window, and probe identically to a fresh " +
    "versioned sharded build of the final visible corpus") {
    val base = tmpDir("vshsync")
    val store = s"$base/corpus"
    val inc = docs.filter(col("source") === "src19")
    val old = docs.filter(col("source") =!= "src19")
    val boot = old.filter(col("doc_id") % 2 === 0)
    val rest = old.filter(col("doc_id") % 2 =!= 0)
    val doomed = old.filter(col("doc_id") % 7 === 0).select("doc_id")
    VersionedStore.save(Map("docs" ->
      boot.select("doc_id", "text")), store)
    assert(syncSignatureIndexShardedVersionedWithStore(spark, store,
      "docs", s"$base/sig").contains((1L, 1L)))
    assert(syncWinnowIndexShardedVersionedWithStore(spark, store,
      "docs", s"$base/win").contains((1L, 1L)))
    VersionedStore.append(Map("docs" -> rest.select("doc_id", "text")),
      store)
    VersionedStore.delete(doomed, "docs", store)
    assert(syncSignatureIndexShardedVersionedWithStore(spark, store,
      "docs", s"$base/sig").contains((1L, 3L)))
    assert(syncWinnowIndexShardedVersionedWithStore(spark, store,
      "docs", s"$base/win").contains((1L, 3L)))
    // fresh builds of the final visible corpus
    val visible = VersionedStore.read(spark, store, "docs")
    buildSignatureIndexShardedVersioned(visible, s"$base/sigf", 3)
    buildWinnowIndexShardedVersioned(visible, s"$base/winf", 3)
    assert(sigRows(probeSignatureIndexShardedVersioned(spark, inc,
        s"$base/sig")) ==
      sigRows(probeSignatureIndexShardedVersioned(spark, inc,
        s"$base/sigf")),
      "maintained signature federation probes like the fresh build")
    assert(winRows(probeWinnowIndexShardedVersioned(spark, inc,
        s"$base/win", minShared = 1)) ==
      winRows(probeWinnowIndexShardedVersioned(spark, inc,
        s"$base/winf", minShared = 1)),
      "maintained winnow federation probes like the fresh build")
    assert(syncSignatureIndexShardedVersionedWithStore(spark, store,
      "docs", s"$base/sig").isEmpty, "a current federation syncs no-op")
    assert(RevisionSync.syncedRev(spark, s"$base/sig") ==
      Some((store, 3L)))
  }
}
