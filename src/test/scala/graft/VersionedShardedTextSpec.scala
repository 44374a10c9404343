package graft

import org.apache.spark.sql.functions._
import graft.operators.{RevisionSync, VersionedStore}
import graft.queries.SearchQueries._

/** The sharded text federation on the manifest-commit protocol — every
  * shard a versioned multi-relation store, the router a versioned
  * store carrying the federation-level champion lists as a relation.
  * Pinned: federated BM25/phrase/proximity bit-identity with the
  * rename federation across build/append/delete, champion-pruned
  * search exactness with delete-consistent heads (no stale-head
  * resurfacing, no tombstone mask needed), and the one-verb CDC sync.
  */
class VersionedShardedTextSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def docs = Tables(spark, dir, "documents")
    .select("doc_id", "text")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "n_terms_hit", "score").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue(),
        r.getDouble(2))).toSet

  test("build/append/delete driven through BOTH protocols yields " +
    "bit-identical federated BM25, phrase, and proximity results at " +
    "every step") {
    val base = tmpDir("vshtext")
    val h = pmod(col("doc_id").cast("long"), lit(3L))
    val seed = docs.filter(h === 0)
    val (p, ds) = textIndexBuild(seed)
    val pc = p.localCheckpoint(true); val dc = ds.localCheckpoint(true)
    val pos = positionalPostings(seed).localCheckpoint(true)
    textIndexSaveSharded(pc, dc, s"$base/ren", 3, Some(pos))
    textIndexSaveShardedVersioned(pc, dc, s"$base/ver", 3, Some(pos))

    def renS() = rows(textIndexSearchSharded(spark, s"$base/ren"))
    def verS() = rows(textIndexSearchShardedVersioned(spark, s"$base/ver"))
    assert(verS() == renS(), "post-build searches bit-identical")

    val inc = docs.filter(h =!= 0)
    textIndexAppendSharded(inc, s"$base/ren")
    textIndexAppendShardedVersioned(inc, s"$base/ver")
    assert(verS() == renS(), "post-append searches bit-identical")

    val doomed = docs.filter(pmod(col("doc_id").cast("long"), lit(5L)) === 2)
      .select("doc_id").localCheckpoint(true)
    textIndexDeleteSharded(doomed, s"$base/ren")
    textIndexDeleteShardedVersioned(doomed, s"$base/ver")
    assert(verS() == renS(), "post-delete searches bit-identical")
    val dead = doomed.collect().map(_.getLong(0)).toSet
    assert(verS().forall(t => !dead.contains(t._1)),
      "deleted docs never score")

    val phrase = Seq("data", "line")
    def pk(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(pk(textIndexPhraseSearchShardedVersioned(spark, s"$base/ver",
        phrase)) ==
      pk(textIndexPhraseSearchSharded(spark, s"$base/ren", phrase)),
      "federated phrase matches bit-identical")
    assert(pk(textIndexProximitySearchShardedVersioned(spark,
        s"$base/ver", "data", "line", 4)) ==
      pk(textIndexProximitySearchSharded(spark, s"$base/ren", "data",
        "line", 4)),
      "federated proximity matches bit-identical")
  }

  test("root champions live IN the router store: championed search is " +
    "bit-identical to the rename federation's, mutations re-elect in " +
    "one router PUT, and a deleted doc never resurfaces through a " +
    "stale head") {
    val base = tmpDir("vshtextc")
    val (p0, ds0) = textIndexBuild(docs)
    val p = p0.localCheckpoint(true); val ds = ds0.localCheckpoint(true)
    textIndexSaveSharded(p, ds, s"$base/ren", 3)
    textIndexSaveShardedVersioned(p, ds, s"$base/ver", 3)
    textIndexChampionsSaveSharded(spark, s"$base/ren", m = 50)
    textIndexChampionsSaveShardedVersioned(spark, s"$base/ver", m = 50)
    def renC() = rows(textIndexChampionSearchSharded(spark, s"$base/ren",
      m = 50))
    def verC() = rows(textIndexChampionSearchShardedVersioned(spark,
      s"$base/ver", m = 50))
    assert(verC() == renC(),
      "championed federated searches must be bit-identical across " +
        "protocols")
    // delete the current top doc; its head must not resurface
    val top = textIndexSearchShardedVersioned(spark, s"$base/ver")
      .orderBy(col("score").desc, col("doc_id").asc)
      .select("doc_id").limit(1).localCheckpoint(true)
    val topId = top.head().getLong(0)
    val chBefore = VersionedStore
      .currentVersion(spark, s"$base/ver/router").get
    textIndexDeleteShardedVersioned(top, s"$base/ver")
    assert(VersionedStore.currentVersion(spark, s"$base/ver/router").get >
      chBefore, "the delete re-elects the root heads in a router PUT")
    val after = verC()
    assert(!after.map(_._1).contains(topId),
      "a deleted doc never resurfaces via a stale head")
    // the versioned delete re-elects the touched terms under the
    // POST-delete statistics, so the championed search equals a FRESH
    // build + fresh election of the final corpus — a claim the rename
    // federation's masked-stale-heads approach deliberately does not
    // make (a freed slot stays empty there until re-election)
    val live = docs.join(top, Seq("doc_id"), "left_anti")
    val (fp0, fds0) = textIndexBuild(live)
    textIndexSaveShardedVersioned(fp0.localCheckpoint(true),
      fds0.localCheckpoint(true), s"$base/fresh", 3)
    textIndexChampionsSaveShardedVersioned(spark, s"$base/fresh", m = 50)
    assert(after == rows(textIndexChampionSearchShardedVersioned(spark,
      s"$base/fresh", m = 50)),
      "post-delete championed search equals fresh-build + fresh election")
  }

  test("sync: bootstrap builds the federation from read(current), one " +
    "call absorbs an append+delete window, and the maintained " +
    "federation searches like a fresh versioned sharded build of the " +
    "final visible corpus") {
    val base = tmpDir("vshtexty")
    val store = s"$base/corpus"
    val h = pmod(col("doc_id").cast("long"), lit(3L))
    val boot = docs.filter(h === 0)
    VersionedStore.save(Map("docs" -> boot), store)
    assert(textIndexSyncShardedVersionedWithStore(spark, store, "docs",
      s"$base/idx").contains((1L, 1L)))
    VersionedStore.append(Map("docs" -> docs.filter(h =!= 0)), store)
    VersionedStore.delete(
      docs.filter(pmod(col("doc_id").cast("long"), lit(5L)) === 2)
        .select("doc_id"), "docs", store)
    assert(textIndexSyncShardedVersionedWithStore(spark, store, "docs",
      s"$base/idx").contains((1L, 3L)))
    val visible = VersionedStore.read(spark, store, "docs")
    val (p, ds) = textIndexBuild(visible)
    textIndexSaveShardedVersioned(p.localCheckpoint(true),
      ds.localCheckpoint(true), s"$base/fresh", 3)
    assert(rows(textIndexSearchShardedVersioned(spark, s"$base/idx")) ==
      rows(textIndexSearchShardedVersioned(spark, s"$base/fresh")),
      "maintained federation must search like the fresh build")
    assert(textIndexSyncShardedVersionedWithStore(spark, store, "docs",
      s"$base/idx").isEmpty, "a current federation syncs as a no-op")
    assert(RevisionSync.syncedRev(spark, s"$base/idx") ==
      Some((store, 3L)))
  }
}
