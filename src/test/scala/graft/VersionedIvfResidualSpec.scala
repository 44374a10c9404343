package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.asDouble
import graft.operators.VersionedStore
import graft.queries.SimilarityQueries._

/** The manifest-committed IVF store and the COMPOSED residual store —
  * the family where the protocol genuinely improves on the rename form:
  * build/append/delete of the composed store each land as ONE manifest
  * PUT spanning both halves (the rename form orders two subtree writes
  * and appends two tombstone sidecars non-atomically). Pinned:
  * bit-equality against the rename family, the single-revision
  * atomicity of every composed verb, the composed pairing gate, and
  * `asOf` time travel.
  */
class VersionedIvfResidualSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables(spark, dir, "embeddings")
    .select(col("vec_id"), asDouble(col("embedding")).as("v"))

  private def queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("v").as("qv"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "neighbor_id", "adc_dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("IVF: build/append/delete driven through BOTH families yields " +
    "identical visible cell assignments at every step") {
    val base = tmpDir("vivf")
    val ren = s"$base/rename"; val ver = s"$base/versioned"
    val boot = emb.filter(col("vec_id") % 4 =!= 3)
    val inc = emb.filter(col("vec_id") % 4 === 3)
    val (cents, cells0) = ivfTrain(boot)
    val cells = cells0.localCheckpoint(true)
    ivfSaveIndex(cents, cells, ren)
    ivfSaveIndexVersioned(cents, cells, ver)

    def renCells() = ivfLoadIndex(spark, ren)._2
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    def verCells() = ivfLoadIndexVersioned(spark, ver)._2
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(verCells() == renCells(), "post-build assignments equal")

    ivfAppendCells(cents, inc, ren)
    ivfAppendCellsVersioned(cents, inc, ver)
    assert(verCells() == renCells(), "post-append assignments equal " +
      "(both assigned under the FROZEN bootstrap centroids)")

    val doomed = emb.filter(col("vec_id") % 8 === 1).select("vec_id")
    ivfDeleteVectors(doomed, ren)
    ivfDeleteVectorsVersioned(doomed, ver)
    assert(verCells() == renCells(), "post-delete assignments equal")
    val deadIds = doomed.collect().map(_.getLong(0)).toSet
    assert(verCells().forall(t => !deadIds.contains(t._1)))
    // zero-fresh append commits nothing; foreign centroids refused
    val r = VersionedStore.currentVersion(spark, ver).get
    assert(ivfAppendCellsVersioned(cents, inc, ver) == r)
    val (fCents, _) = ivfTrain(
      emb.withColumn("v", expr("transform(v, x -> x * 2.0D)")))
    val e = intercept[Exception] {
      ivfAppendCellsVersioned(fCents, inc, ver)
    }
    assert(e.getMessage.contains("do not match the store's"))
  }

  test("COMPOSED residual: the versioned store searches bit-identically " +
    "to the rename store; append and delete each land as ONE revision " +
    "spanning both halves; asOf reproduces the bootstrap search") {
    val base = tmpDir("vres")
    val ren = s"$base/rename"; val ver = s"$base/versioned"
    val boot = emb.filter(col("vec_id") % 4 =!= 3)
    val inc = emb.filter(col("vec_id") % 4 === 3)
    val (cents, cells0) = ivfTrain(boot)
    val cells = cells0.localCheckpoint(true)
    val rv = ivfResiduals(boot, cents, cells)
      .select("vec_id", "v").localCheckpoint(true)
    val index = pqTrain(rv)
    residualSaveIndex(cents, cells, index, pqCodes(index, rv), ren)
    val r1 = residualSaveIndexVersioned(cents, cells, index,
      pqCodes(index, rv), ver)

    def renSearch() = { val (c, ce, i, co) = residualLoadIndex(spark, ren)
      ivfPqSearchResidual(ce, c, i, co, queries, excludeSelfMatches = true) }
    def verSearch(asOf: Option[Long] = None) =
      residualSearchVersioned(spark, queries, ver,
        excludeSelfMatches = true, asOf = asOf)
    val asBuilt = rows(verSearch())
    assert(asBuilt == rows(renSearch()),
      "post-build searches must be bit-identical")

    residualAppendVectors(cents, index, inc, ren)
    val r2 = residualAppendVectorsVersioned(cents, index, inc, ver)
    assert(r2 == r1 + 1,
      "the append commits codes AND cells in ONE revision")
    assert(rows(verSearch()) == rows(renSearch()),
      "post-append searches must be bit-identical")
    // a retried append is a no-op (no empty revision committed)
    assert(residualAppendVectorsVersioned(cents, index, inc, ver) == r2)

    val doomed = emb.filter(col("vec_id") % 8 === 1 ||
      col("vec_id") % 8 === 7).select("vec_id")
    residualDeleteVectors(doomed, ren)
    val r3 = residualDeleteVectorsVersioned(doomed, ver)
    assert(r3 == r2 + 1,
      "the delete tombstones BOTH halves in ONE revision")
    val after = rows(verSearch())
    assert(after == rows(renSearch()),
      "post-delete searches must be bit-identical")
    val deadIds = doomed.collect().map(_.getLong(0)).toSet
    assert(after.forall(t => !deadIds.contains(t._2)))
    val (_, vCells, _, vCodes) = residualLoadIndexVersioned(spark, ver)
    assert(vCells.join(doomed, Seq("vec_id"), "left_semi").isEmpty &&
      vCodes.join(doomed, Seq("vec_id"), "left_semi").isEmpty,
      "a deleted vector holds neither candidates nor codes")

    assert(rows(verSearch(asOf = Some(r1))) == asBuilt,
      "asOf the build revision reproduces the bootstrap search")
  }

  test("the composed pairing gate holds on the versioned form: a " +
    "FLAT-trained codebook relation of identical geometry — internally " +
    "self-consistent — fails the composed stamp at load; foreign halves " +
    "are refused at append before the store is touched") {
    val ver = tmpDir("vresg") + "/v"
    val (cents, cells0) = ivfTrain(emb)
    val cells = cells0.localCheckpoint(true)
    val rv = ivfResiduals(emb, cents, cells)
      .select("vec_id", "v").localCheckpoint(true)
    val index = pqTrain(rv)
    residualSaveIndexVersioned(cents, cells, index, pqCodes(index, rv), ver)
    val flat = pqTrain(emb)
    val e1 = intercept[Exception] {
      residualAppendVectorsVersioned(cents, flat, emb.limit(5), ver)
    }
    assert(e1.getMessage.contains("do not match the store's pairing"))
    // the splice: flat codebooks + codes pass pqGateLoaded on their own
    VersionedStore.commitMixed(Map.empty, Map.empty,
      Map("codebooks" -> flatRows(flat),
        "codes" -> pqCodes(flat, emb)), ver)
    val e2 = intercept[Exception] { residualLoadIndexVersioned(spark, ver) }
    assert(e2.getMessage.contains("composed stamp"),
      s"expected the composed-pairing check, got: ${e2.getMessage}")
  }

  private def flatRows(index: PqIndex): org.apache.spark.sql.DataFrame =
    index.codebooks.zipWithIndex.map { case (c, s) =>
      c.select(lit(s).as("sub"), col("cid"), col("cv"))
    }.reduce(_ unionAll _)
      .withColumn("subspaces", lit(index.subspaces))
      .withColumn("sub_dim", lit(index.subDim))
      .withColumn("fp", lit(index.fingerprint))

  test("sync (ivf and composed residual): bootstrap trains from " +
    "read(current); one call absorbs an append+delete window as ONE " +
    "delta revision; the maintained stores equal the hand-driven verbs") {
    val base = tmpDir("vivfy")
    val store = s"$base/emb"
    val boot = emb.filter(col("vec_id") % 4 =!= 3)
    VersionedStore.save(Map("emb" -> boot), store)
    assert(ivfSyncVersionedWithStore(spark, store, "emb", s"$base/ivf")
      .contains((1L, 1L)))
    assert(residualSyncVersionedWithStore(spark, store, "emb",
      s"$base/res").contains((1L, 1L)))
    // hand-driven twins from the same bootstrap corpus
    val (cents, cells0) = ivfTrain(boot)
    val cells = cells0.localCheckpoint(true)
    ivfSaveIndexVersioned(cents, cells, s"$base/hivf")
    val rv = ivfResiduals(boot, cents, cells)
      .select("vec_id", "v").localCheckpoint(true)
    val index = pqTrain(rv)
    residualSaveIndexVersioned(cents, cells, index, pqCodes(index, rv),
      s"$base/hres")

    val inc = emb.filter(col("vec_id") % 4 === 3)
    VersionedStore.append(Map("emb" -> inc), store)
    val doomed = emb.filter(col("vec_id") % 8 === 1 ||
      col("vec_id") % 8 === 7).select("vec_id")
    VersionedStore.delete(doomed, "emb", store)

    val ivfBefore = VersionedStore.currentVersion(spark, s"$base/ivf").get
    val resBefore = VersionedStore.currentVersion(spark, s"$base/res").get
    assert(ivfSyncVersionedWithStore(spark, store, "emb", s"$base/ivf")
      .contains((1L, 3L)))
    assert(residualSyncVersionedWithStore(spark, store, "emb",
      s"$base/res").contains((1L, 3L)))
    assert(VersionedStore.currentVersion(spark, s"$base/ivf").get ==
      ivfBefore + 1, "the ivf window lands as ONE delta revision")
    assert(VersionedStore.currentVersion(spark, s"$base/res").get ==
      resBefore + 1, "the residual window — appends to both halves AND " +
        "tombstones on both halves — lands as ONE delta revision")

    ivfAppendCellsVersioned(cents, inc, s"$base/hivf")
    ivfDeleteVectorsVersioned(doomed, s"$base/hivf")
    residualAppendVectorsVersioned(cents, index, inc, s"$base/hres")
    residualDeleteVectorsVersioned(doomed, s"$base/hres")

    def cellsOf(p: String) = ivfLoadIndexVersioned(spark, p)._2
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(cellsOf(s"$base/ivf") == cellsOf(s"$base/hivf"),
      "synced ivf store must equal the hand-driven verbs")
    assert(rows(residualSearchVersioned(spark, queries, s"$base/res",
        excludeSelfMatches = true)) ==
      rows(residualSearchVersioned(spark, queries, s"$base/hres",
        excludeSelfMatches = true)),
      "synced residual store must search identically to the hand-driven " +
        "verbs")
    assert(residualSyncVersionedWithStore(spark, store, "emb",
      s"$base/res").isEmpty, "a current index syncs as a no-op")
  }
}
