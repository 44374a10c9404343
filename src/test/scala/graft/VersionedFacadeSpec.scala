package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.asDouble
import graft.operators.{RevisionSync, VectorIndex, VersionedStore}

/** The unified vector-index façade over BOTH commit protocols: ONE API
  * (build/search/append/delete/sync) dispatches on the store's own
  * protocol (manifest-committed stores carry their family marker as a
  * `family` relation inside the store), and the routed lifecycle is
  * bit-identical across protocols for every searchable family.
  */
class VersionedFacadeSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables(spark, dir, "embeddings")
    .select(col("vec_id"), asDouble(col("embedding")).as("v"))

  private def queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("v").as("qv"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "neighbor_id", "rank", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet

  test("routed build/append/delete/search is bit-identical across the " +
    "two protocols for every searchable family — the commit discipline " +
    "is invisible through the façade") {
    val base = tmpDir("vfac")
    val boot = emb.filter(col("vec_id") % 4 =!= 3)
    val inc = emb.filter(col("vec_id") % 4 === 3)
    val doomed = emb.filter(col("vec_id") % 8 === 1).select("vec_id")
      .localCheckpoint(true)
    for (fam <- Seq("sq8", "pq", "bin", "lsh", "ivf", "residual")) {
      val ren = s"$base/$fam-ren"; val ver = s"$base/$fam-ver"
      VectorIndex.build(boot, fam, ren, protocol = "rename")
      VectorIndex.build(boot, fam, ver, protocol = "manifest")
      assert(VectorIndex.family(spark, ver) == fam,
        s"$fam: the family marker rides inside the versioned store")
      VectorIndex.append(inc, ren)
      VectorIndex.append(inc, ver)
      VectorIndex.delete(doomed, ren)
      VectorIndex.delete(doomed, ver)
      val (r, v) = (rows(VectorIndex.search(emb, queries, ren, k = 5)),
        rows(VectorIndex.search(emb, queries, ver, k = 5)))
      assert(v == r, s"$fam: routed searches must be bit-identical " +
        "across protocols after the full lifecycle")
      val deadIds = doomed.collect().map(_.getLong(0)).toSet
      assert(v.forall(t => !deadIds.contains(t._2)),
        s"$fam: deleted vec_ids must never surface")
    }
  }

  test("manifest builds are SINGLE-REVISION: the family marker rides the " +
    "build's own commit PUT, so a crash between 'data committed' and " +
    "'marker committed' is unrepresentable") {
    val base = tmpDir("vfac-1rev")
    val e = emb.filter(col("vec_id") < 200).localCheckpoint(true)
    for (fam <- Seq("sq8", "pq", "bin", "lsh", "ivf", "residual", "knn")) {
      val p = s"$base/$fam"
      VectorIndex.build(e, fam, p, protocol = "manifest")
      assert(VersionedStore.currentVersion(spark, p).contains(1L),
        s"$fam: a fresh manifest build commits exactly ONE revision")
      assert(VectorIndex.family(spark, p) == fam,
        s"$fam: the marker is already visible at revision 1")
      // a rebuild over the existing store bumps by exactly one too
      VectorIndex.build(e, fam, p, protocol = "manifest")
      assert(VersionedStore.currentVersion(spark, p).contains(2L),
        s"$fam: a rebuild is one more commit, not a data+marker pair")
    }
    // the sharded federation: every shard build is single-revision
    VectorIndex.buildSharded(e, "sq8", s"$base/sh", 2,
      protocol = "manifest")
    (0 until 2).foreach { i =>
      assert(VersionedStore.currentVersion(spark, s"$base/sh/shard-$i")
        .contains(1L), s"shard $i: data + marker in one PUT")
    }
  }

  test("knn routes: versioned build stores the lists, delete masks both " +
    "columns, search refuses with graph guidance on both protocols") {
    val base = tmpDir("vfac-knn")
    val e = emb.filter(col("vec_id") < 100)
    VectorIndex.build(e, "knn", s"$base/ver", protocol = "manifest")
    assert(VectorIndex.family(spark, s"$base/ver") == "knn")
    VectorIndex.delete(e.filter(col("vec_id") === 0).select("vec_id"),
      s"$base/ver")
    val lists = graft.queries.SimilarityQueries
      .knnLoadListsVersioned(spark, s"$base/ver")._1
    assert(lists.filter(col("aid") === 0 || col("bid") === 0).isEmpty,
      "routed delete must mask both list columns")
    val ex = intercept[IllegalArgumentException] {
      VectorIndex.search(e, queries, s"$base/ver")
    }
    assert(ex.getMessage.contains("neighbor-GRAPH store"))
  }

  test("sharded federation on the manifest protocol: shard stores AND " +
    "the router are versioned; routed search/append/delete are " +
    "bit-identical to the rename federation") {
    val base = tmpDir("vfac-sh")
    val boot = emb.filter(col("vec_id") % 4 =!= 3)
    val inc = emb.filter(col("vec_id") % 4 === 3)
    val doomed = emb.filter(col("vec_id") % 8 === 1).select("vec_id")
      .localCheckpoint(true)
    VectorIndex.buildSharded(boot, "sq8", s"$base/ren", 3, protocol = "rename")
    VectorIndex.buildSharded(boot, "sq8", s"$base/ver", 3,
      protocol = "manifest")
    assert(VersionedStore.currentVersion(spark, s"$base/ver/router")
      .isDefined, "the router itself is a versioned store")
    assert(VectorIndex.family(spark, s"$base/ver/shard-0") == "sq8",
      "each shard is a facade-marked versioned store")
    VectorIndex.appendSharded(inc, s"$base/ren")
    VectorIndex.appendSharded(inc, s"$base/ver")
    VectorIndex.deleteSharded(doomed, s"$base/ren")
    VectorIndex.deleteSharded(doomed, s"$base/ver")
    assert(rows(VectorIndex.searchSharded(queries, s"$base/ver", k = 5)) ==
      rows(VectorIndex.searchSharded(queries, s"$base/ren", k = 5)),
      "federated searches must be bit-identical across protocols")
  }

  test("sync(protocol = manifest): bootstrap builds the versioned twin, " +
    "a window absorbs through the routed delete+append, and the synced " +
    "store searches identically to the rename-protocol sync") {
    val base = tmpDir("vfac-sync")
    val store = s"$base/emb"
    val boot = emb.filter(col("vec_id") % 4 =!= 3)
    VersionedStore.save(Map("emb" -> boot), store)
    assert(VectorIndex.syncWithStore(spark, store, "emb", s"$base/ren",
      "sq8", protocol = "rename").contains((1L, 1L)))
    assert(VectorIndex.syncWithStore(spark, store, "emb", s"$base/ver",
      "sq8", protocol = "manifest").contains((1L, 1L)))
    VersionedStore.append(
      Map("emb" -> emb.filter(col("vec_id") % 4 === 3)), store)
    VersionedStore.delete(
      emb.filter(col("vec_id") % 8 === 1).select("vec_id"), "emb", store)
    assert(VectorIndex.syncWithStore(spark, store, "emb", s"$base/ren",
      "sq8", protocol = "rename").contains((1L, 3L)))
    assert(VectorIndex.syncWithStore(spark, store, "emb", s"$base/ver",
      "sq8", protocol = "manifest").contains((1L, 3L)))
    assert(rows(VectorIndex.search(emb, queries, s"$base/ver", k = 5)) ==
      rows(VectorIndex.search(emb, queries, s"$base/ren", k = 5)),
      "synced stores must search identically across protocols")
    assert(RevisionSync.syncedRev(spark, s"$base/ver") ==
      Some((store, 3L)))
  }
}
