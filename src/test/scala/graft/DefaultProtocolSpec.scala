package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.asDouble
import graft.operators.{VectorIndex, VersionedStore}

/** The r14 default flip: a façade build with NO protocol argument
  * commits the MANIFEST form — object storage is the deployment target
  * and rename-there is copy-then-delete, so new builds start on the
  * atomic protocol; the rename path stays first-class behind an
  * explicit `protocol = "rename"` (every existing lifecycle spec pins
  * it). This spec is what makes the default a contract instead of an
  * accident of the signature.
  */
class DefaultProtocolSpec extends SparkSuite {

  private def emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    .filter(col("vec_id") < 40).localCheckpoint(true)

  test("an argument-free facade build commits a manifest store — marker " +
    "in revision 1, routed search served; rename remains reachable " +
    "explicitly") {
    val base = tmpDir("defproto")
    VectorIndex.build(emb, "sq8", s"$base/dflt")
    assert(VectorIndex.isVersioned(spark, s"$base/dflt"),
      "default build must be manifest-committed")
    assert(VersionedStore.currentVersion(spark, s"$base/dflt").contains(1L),
      "build commits exactly one revision, marker included")
    assert(VectorIndex.family(spark, s"$base/dflt") == "sq8")
    val q = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    assert(VectorIndex.search(emb, q, s"$base/dflt", k = 3).count() > 0)

    VectorIndex.build(emb, "sq8", s"$base/ren", protocol = "rename")
    assert(!VectorIndex.isVersioned(spark, s"$base/ren"),
      "explicit rename must still build the rename family")
    // the two protocols answer identically through the one routed API
    val a = VectorIndex.search(emb, q, s"$base/dflt", k = 3)
      .collect().map(_.toSeq).toSet
    val b = VectorIndex.search(emb, q, s"$base/ren", k = 3)
      .collect().map(_.toSeq).toSet
    assert(a == b, "protocol must be invisible to the routed search")
  }

  test("the argument-free sharded build and sync-bootstrap follow the " +
    "same default") {
    val base = tmpDir("defproto-sh")
    VectorIndex.buildSharded(emb, "sq8", s"$base/fed", 2)
    assert(VectorIndex.isVersioned(spark, s"$base/fed/router"),
      "default sharded build must commit a versioned router")
    assert(VectorIndex.shardInfo(spark, s"$base/fed") == ((2, "sq8")))

    val store = s"$base/corpus"
    VersionedStore.save(Map("emb" -> emb), store)
    VectorIndex.syncWithStore(spark, store, "emb", s"$base/synced")
    assert(VectorIndex.isVersioned(spark, s"$base/synced"),
      "default sync bootstrap must build the manifest form")
  }
}
