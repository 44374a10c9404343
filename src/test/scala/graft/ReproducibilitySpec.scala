package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedStore
import graft.queries.SearchQueries.{textIndexBuild, textIndexSave, textIndexLoad}

/** Cross-family reproducibility: derived stores (here the BM25 text index)
  * rebuilt from a versioned-store TIME-TRAVEL read must be bit-identical —
  * in content stamp and row set — to the index built when that revision was
  * current. This is the property that makes "re-derive the index for an
  * audit" sound at 100 TB: the versioned store pins the corpus, the index's
  * order-insensitive stamp pins the derivation, and together any retained
  * revision's index is reconstructible years later without having kept it.
  */
class ReproducibilitySpec extends SparkSuite {
  import spark.implicits._

  private def docs(ids: Range, tag: String) =
    ids.map(i => (i.toLong, s"$tag tok$i common words here for doc body"))
      .toDF("doc_id", "text")

  test("a text index rebuilt from a time-travel read reproduces the index " +
    "built when that revision was current (stamp AND row set)") {
    val root = tmpDir("repro")
    val store = root + "/store"
    VersionedStore.save(Map("docs" -> docs(1 to 30, "alpha")), store) // rev 1
    // index built "then", from the store's current read at rev 1
    val (p1, d1) = textIndexBuild(VersionedStore.read(spark, store, "docs"))
    val idxThen = root + "/idx_then"
    textIndexSave(p1, d1, idxThen)
    // the store moves on: append + delete
    VersionedStore.append(Map("docs" -> docs(31 to 45, "beta")), store)
    VersionedStore.delete(Seq(3L, 7L).toDF("doc_id"), "docs", store)
    // index rebuilt LATER from the time-traveled rev-1 read
    val (p2, d2) = textIndexBuild(
      VersionedStore.read(spark, store, "docs", asOf = Some(1L)))
    val idxTT = root + "/idx_tt"
    textIndexSave(p2, d2, idxTT)
    val mThen = spark.read.parquet(idxThen + "/meta").collect()(0)
    val mTT = spark.read.parquet(idxTT + "/meta").collect()(0)
    assert(mThen.getAs[String]("fp") == mTT.getAs[String]("fp"),
      "content stamp must be revision-determined")
    assert(mThen.getAs[String]("h_pos") == mTT.getAs[String]("h_pos"))
    val (poA, dsA) = textIndexLoad(spark, idxThen)
    val (poB, dsB) = textIndexLoad(spark, idxTT)
    assert(poA.collect().toSet == poB.collect().toSet)
    assert(dsA.collect().toSet == dsB.collect().toSet)
  }

  test("a binary vector index rebuilt from a time-travel read reproduces " +
    "the code rows built when that revision was current (vector-side twin)") {
    import graft.Tables
    import graft.queries.SimilarityQueries
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
    val root = tmpDir("repro-bin")
    val store = root + "/store"
    VersionedStore.save(Map("emb" -> emb.filter(col("vec_id") < 40)), store)
    val codesThen = SimilarityQueries.binCodes(
      VersionedStore.read(spark, store, "emb"))
    SimilarityQueries.binSaveIndex(codesThen, root + "/idx_then")
    VersionedStore.append(
      Map("emb" -> emb.filter(col("vec_id") >= 40 && col("vec_id") < 60)), store)
    VersionedStore.delete(Seq(1L, 2L).toDF("vec_id"), "emb", store)
    val codesTT = SimilarityQueries.binCodes(
      VersionedStore.read(spark, store, "emb", asOf = Some(1L)))
    SimilarityQueries.binSaveIndex(codesTT, root + "/idx_tt")
    def rows(p: String) = SimilarityQueries.binLoadIndex(spark, p)
      .select("vec_id", "w0", "w1").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(root + "/idx_then") == rows(root + "/idx_tt"))
  }

  test("the moved-on corpus builds a DIFFERENT index (the stamp separates " +
    "revisions — reproducibility is not vacuous)") {
    val root = tmpDir("repro2")
    val store = root + "/store"
    VersionedStore.save(Map("docs" -> docs(1 to 20, "alpha")), store)
    val (p1, d1) = textIndexBuild(VersionedStore.read(spark, store, "docs"))
    val idxV1 = root + "/idx_v1"
    textIndexSave(p1, d1, idxV1)
    VersionedStore.append(Map("docs" -> docs(21 to 25, "beta")), store)
    val (p2, d2) = textIndexBuild(VersionedStore.read(spark, store, "docs"))
    val idxV2 = root + "/idx_v2"
    textIndexSave(p2, d2, idxV2)
    val fp1 = spark.read.parquet(idxV1 + "/meta").collect()(0).getAs[String]("fp")
    val fp2 = spark.read.parquet(idxV2 + "/meta").collect()(0).getAs[String]("fp")
    assert(fp1 != fp2)
  }
}
