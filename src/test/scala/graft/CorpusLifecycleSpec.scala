package graft

import org.apache.spark.sql.functions._
import graft.queries.{DedupQueries, QuantQueries, TextQueries}
import graft.streaming.IngestPipeline

/** The round-8 lifecycle composed end-to-end: documents stream in
  * through the incremental-ingest loop, embeddings derive from the
  * admitted corpus (feature hashing) and index into a persisted SQ8
  * store, then a provider withdraws consent — and the deletion must
  * propagate through EVERY derived artifact: the admitted corpus, the
  * cluster-label map (survivor re-election), and the ANN store
  * (tombstones). One spec, one story: ingest → derive → forget.
  */
class CorpusLifecycleSpec extends SparkSuite {

  test("ingest -> derive -> forget: a withdrawn source disappears from " +
    "the corpus, the label map re-elects, and the index masks — while " +
    "everything else survives untouched") {
    val spark0 = spark
    import spark0.implicits._
    val base = tmpDir("lifecycle")
    val (idx, lab, adm) = (s"$base/idx", s"$base/lab", s"$base/adm")
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")

    // 1. INGEST: bootstrap on half the corpus, stream the rest in two
    //    batches through the idempotent loop
    val half = docs.filter(col("doc_id") < 250)
      .select("doc_id", "text", "source")
    IngestPipeline.bootstrap(half, idx, lab)
    half.write.mode("overwrite").parquet(adm)
    val rest = docs.filter(col("doc_id") >= 250)
      .select("doc_id", "text", "source")
    IngestPipeline.ingestBatch(rest.filter(col("doc_id") < 375),
      idx, lab, adm)
    IngestPipeline.ingestBatch(rest.filter(col("doc_id") >= 375),
      idx, lab, adm)
    val admitted = spark.read.parquet(adm).localCheckpoint(true)
    assert(admitted.count() > 300, "most of the corpus should be admitted")

    // 2. DERIVE: hashed embeddings of the admitted corpus -> SQ8 store
    val emb = TextQueries.hashedEmbeddings(admitted)
      .select(col("doc_id").as("vec_id"), col("v"))
      .localCheckpoint(true)
    val params = QuantQueries.sqTrain(emb).localCheckpoint(true)
    QuantQueries.sqSaveIndex(params, QuantQueries.sqCodes(params, emb),
      s"$base/sq")

    // 3. FORGET: source src3 withdraws consent
    val del = admitted.filter(col("source") === "src3").select("doc_id")
      .localCheckpoint(true)
    val nDel = del.count()
    assert(nDel > 0, "fixture must have src3 documents to forget")
    //    corpus store: rewrite without the withdrawn rows (documents are
    //    the PRIMARY data — tombstones are for derived indexes)
    val kept = admitted.join(del, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    kept.write.mode("overwrite").parquet(adm)
    //    label map: the q138 cascade re-elects survivors
    val labels = spark.read.parquet(lab).localCheckpoint(true)
    val survivors = DedupQueries.deletionCascade(
        admitted.select("doc_id", "source"), del, labels)
      .localCheckpoint(true)
    //    ANN store: tombstone the withdrawn vectors
    QuantQueries.sqDeleteVectors(del.select(col("doc_id").as("vec_id")),
      s"$base/sq")

    // 4. VERIFY every artifact honors the deletion
    assert(spark.read.parquet(adm)
      .filter(col("source") === "src3").count() == 0,
      "withdrawn rows still in the corpus store")
    assert(survivors.filter(col("source") === "src3").count() == 0,
      "a withdrawn document survived the cascade")
    val retained = admitted.filter(col("source") =!= "src3").count()
    val represented = survivors
      .agg((sum(col("n_dupes_removed")) + count(lit(1))).as("n"))
      .head().getLong(0)
    assert(represented == retained,
      s"cascade lost documents: $represented of $retained")
    val (lp, lc) = QuantQueries.sqLoadIndex(spark, s"$base/sq")
    val delIds = del.collect().map(_.getLong(0)).toSet
    assert(lc.filter(col("vec_id").isInCollection(delIds)).count() == 0,
      "withdrawn vectors still load from the ANN store")
    //    and the searchable survivors still search
    val q = emb.join(del, emb("vec_id") === del("doc_id"), "left_anti")
      .limit(1).select(col("vec_id").as("qid"), col("v").as("qv"))
    val hits = QuantQueries.sqAdcSearch(lp, lc, q, topR = 5,
      excludeSelfMatches = true)
    assert(hits.count() == 5, "the masked store must still serve searches")
    assert(hits.filter(col("vec_id").isInCollection(delIds)).count() == 0,
      "a search surfaced a forgotten vector")
  }

  test("bimodal forget: the deletion propagates through the round-8 " +
    "vector-side artifacts too — vector store, binary code store, " +
    "persisted kNN lists (both columns), derived mutual edges, and " +
    "graph-expanded candidates") {
    import graft.queries.{SimilarityQueries, TextQueries}
    import graft.streaming.VectorIngestPipeline
    val base = tmpDir("lifecycle-bimodal")
    val (idx, vp, knn) = (s"$base/bin", s"$base/vec", s"$base/knn")
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val emb = TextQueries.hashedEmbeddings(docs)
      .select(col("doc_id").as("vec_id"), col("v"))
      .localCheckpoint(true)

    // INGEST the embedding corpus in two batches
    VectorIngestPipeline.bootstrap(emb.filter(col("vec_id") < 250), idx, vp)
    VectorIngestPipeline.ingestBatch(emb.filter(col("vec_id") >= 250),
      idx, vp)
    val admitted = spark.read.parquet(vp).localCheckpoint(true)
    // hashed embeddings of near-identical texts share sign patterns, so
    // some of the second batch is gated — that is the pipeline working
    assert(admitted.count() > 300)

    // DERIVE the graph artifact from the admitted vectors
    SimilarityQueries.knnSaveLists(
      SimilarityQueries.bruteTopLists(admitted, 3), 3, "brute-cos", knn)

    // FORGET the vectors of source src3
    val del = docs.filter(col("source") === "src3")
      .select(col("doc_id").as("vec_id"))
      .join(admitted.select("vec_id"), Seq("vec_id"))
      .localCheckpoint(true)
    val delIds = del.collect().map(_.getLong(0)).toSet
    assert(delIds.nonEmpty)
    VectorIngestPipeline.forget(spark, del, idx, vp)
    SimilarityQueries.knnDeleteNodes(del, knn)

    // VERIFY propagation through every artifact
    assert(spark.read.parquet(vp)
      .filter(col("vec_id").isInCollection(delIds)).count() == 0,
      "forgotten vectors still in the vector store")
    assert(SimilarityQueries.binLoadIndex(spark, idx)
      .filter(col("vec_id").isInCollection(delIds)).count() == 0,
      "forgotten vectors still load from the binary store")
    val (lists, _) = SimilarityQueries.knnLoadLists(spark, knn)
    assert(lists.filter(col("aid").isInCollection(delIds)
      || col("bid").isInCollection(delIds)).count() == 0,
      "forgotten vectors still referenced by the kNN lists")
    val edges = SimilarityQueries.mutualKnnEdgesFromCandidates(
      lists.select("aid", "bid", "sim", "rn"))
    assert(edges.filter(col("a").isInCollection(delIds)
      || col("b").isInCollection(delIds)).count() == 0,
      "a forgotten vector resurfaced in the derived mutual graph")
    // graph-expanded candidates from a surviving query never surface a
    // forgotten vector either
    val survivor = admitted.join(del, Seq("vec_id"), "left_anti")
      .orderBy("vec_id").limit(1)
    val baseCand = SimilarityQueries.binHammingSearch(
        SimilarityQueries.binLoadIndex(spark, idx),
        survivor.select(col("vec_id").as("qid"), col("v").as("qv")),
        topR = 10, excludeSelfMatches = true)
      .select("qid", "vec_id")
    val expanded = SimilarityQueries.graphExpandCandidates(baseCand, lists)
    assert(expanded.count() > 0, "the masked stores must still serve")
    assert(expanded.filter(col("vec_id").isInCollection(delIds)).count() == 0,
      "graph expansion resurfaced a forgotten vector")
  }
}
