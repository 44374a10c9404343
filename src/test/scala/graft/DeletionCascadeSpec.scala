package graft

import org.apache.spark.sql.functions._
import graft.queries.{DedupQueries, QuantQueries}
import graft.functions.VectorFunctions.asDouble

/** The right-to-be-forgotten cascade (q138 + the SQ8 tombstone verb):
  * deleting documents must remove every forgotten row, re-elect cluster
  * survivors, and mask index entries — with all the sharp edges
  * (survivor deleted, whole cluster deleted, replayed ingest) pinned on
  * a hand-built fixture where the right answer is enumerable.
  */
class DeletionCascadeSpec extends SparkSuite {

  import spark.implicits._

  test("cascade fixture: survivor deletion promotes the next member, " +
    "whole-cluster deletion leaves nothing, singletons pass through") {
    // clusters: {1,2,3} rep 1; {10,11} rep 10; singleton 20 (no label row)
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b"), (10L, "b"), (11L, "c"),
        (20L, "c"))
      .toDF("doc_id", "source")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")

    // delete the {1,2,3} SURVIVOR and the WHOLE {10,11} cluster
    val del = Seq(1L, 10L, 11L).toDF("doc_id")
    val got = DedupQueries.deletionCascade(docs, del, labels)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getBoolean(3))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (2L, "a", 1L, true),   // promoted rep of {2,3}, absorbed one copy
      (20L, "c", 0L, false)), // untouched singleton
      s"unexpected cascade result: ${got.toSeq}")

    // deleting a NON-survivor member only shrinks the count
    val got2 = DedupQueries.deletionCascade(docs, Seq(2L).toDF("doc_id"),
        labels)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(got2.toSeq == Seq((1L, 1L, false), (10L, 1L, false),
      (20L, 0L, false)),
      s"unexpected non-survivor deletion result: ${got2.toSeq}")

    // empty deletion set degenerates to exactly the q75 survivor shape
    val none = DedupQueries.deletionCascade(docs, spark.emptyDataset[Long]
        .toDF("doc_id"), labels)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(none.toSeq == Seq((1L, 2L, false), (10L, 1L, false),
      (20L, 0L, false)))
  }

  test("q138 invariants on the real corpus: no forgotten row survives, " +
    "every retained document is represented by exactly one survivor") {
    val dir = "/root/testdata/sf0.01"
    val out = SparkEntry.queries("q138_deletion_cascade")(spark, dir)
      .localCheckpoint(true)
    assert(out.filter(col("source") === "src2").count() == 0,
      "a forgotten document survived the cascade")
    // conservation: survivors + absorbed copies == all retained docs
    val docs = Tables(spark, dir, "documents")
    val retained = docs.filter(col("source") =!= "src2").count()
    val represented = out.agg(
      (sum(col("n_dupes_removed")) + count(lit(1))).as("n"))
      .head().getLong(0)
    assert(represented == retained,
      s"cascade lost documents: represents $represented of $retained")
    assert(out.groupBy("doc_id").count().filter(col("count") > 1).count() == 0,
      "a document survived twice")
  }

  test("SQ8 tombstones: a deleted vector disappears from loaded " +
    "searches, deletion is sticky across a replayed append, and a " +
    "fresh save re-admits") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val params = QuantQueries.sqTrain(emb).localCheckpoint(true)
    val base = tmpDir("sqidx-del")
    QuantQueries.sqSaveIndex(params, QuantQueries.sqCodes(params, emb),
      s"$base/sq")
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("v").as("qv"))

    // find a vector the pre-deletion search returns, then forget it
    val (lp0, lc0) = QuantQueries.sqLoadIndex(spark, s"$base/sq")
    val pre = QuantQueries.sqAdcSearch(lp0, lc0, queries,
      excludeSelfMatches = true)
    val victim = pre.orderBy(col("qid"), col("arank")).head().getLong(1)
    QuantQueries.sqDeleteVectors(Seq(victim).toDF("vec_id"), s"$base/sq")
    // idempotent re-delete
    QuantQueries.sqDeleteVectors(Seq(victim).toDF("vec_id"), s"$base/sq")

    val (lp1, lc1) = QuantQueries.sqLoadIndex(spark, s"$base/sq")
    assert(lc1.filter(col("vec_id") === victim).count() == 0,
      "tombstoned vector still visible in the loaded code set")
    val post = QuantQueries.sqAdcSearch(lp1, lc1, queries,
      excludeSelfMatches = true)
    assert(post.filter(col("vec_id") === victim).count() == 0,
      "tombstoned vector still retrieved")

    // a replayed ingest must NOT resurrect the forgotten vector
    QuantQueries.sqAppendCodes(emb.filter(col("vec_id") === victim),
      s"$base/sq")
    val (_, lc2) = QuantQueries.sqLoadIndex(spark, s"$base/sq")
    assert(lc2.filter(col("vec_id") === victim).count() == 0,
      "a replayed append resurrected a forgotten vector")

    // an explicit fresh save is the re-admission (and compaction) point
    QuantQueries.sqSaveIndex(params, QuantQueries.sqCodes(params, emb),
      s"$base/sq")
    val (_, lc3) = QuantQueries.sqLoadIndex(spark, s"$base/sq")
    assert(lc3.filter(col("vec_id") === victim).count() == 1,
      "a fresh save must clear tombstones")
  }

  test("every index family carries the DELETE verb: a tombstoned vector " +
    "is masked from PQ, IVF, binary, LSH, composed-residual and " +
    "kNN-list loads") {
    import graft.queries.SimilarityQueries
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .localCheckpoint(true)
    val victim = 7L
    val base = tmpDir("tomb-matrix")

    // PQ
    val pq = SimilarityQueries.pqTrain(emb)
    SimilarityQueries.pqSaveIndex(pq, SimilarityQueries.pqCodes(pq, emb),
      s"$base/pq")
    SimilarityQueries.pqDeleteVectors(Seq(victim).toDF("vec_id"), s"$base/pq")
    assert(SimilarityQueries.pqLoadIndex(spark, s"$base/pq")._2
      .filter(col("vec_id") === victim).count() == 0, "pq mask failed")

    // IVF
    val (cents, cells) = SimilarityQueries.ivfTrain(emb, k = 4)
    SimilarityQueries.ivfSaveIndex(cents, cells, s"$base/ivf")
    SimilarityQueries.ivfDeleteVectors(Seq(victim).toDF("vec_id"), s"$base/ivf")
    assert(SimilarityQueries.ivfLoadIndex(spark, s"$base/ivf")._2
      .filter(col("vec_id") === victim).count() == 0, "ivf mask failed")

    // binary
    SimilarityQueries.binSaveIndex(SimilarityQueries.binCodes(emb),
      s"$base/bin")
    SimilarityQueries.binDeleteVectors(Seq(victim).toDF("vec_id"), s"$base/bin")
    assert(SimilarityQueries.binLoadIndex(spark, s"$base/bin")
      .filter(col("vec_id") === victim).count() == 0, "bin mask failed")

    // LSH (all of the vector's per-table bucket rows must go)
    SimilarityQueries.lshSaveIndex(SimilarityQueries.lshBuckets(emb),
      4, 6, s"$base/lsh")
    SimilarityQueries.lshDeleteVectors(Seq(victim).toDF("vec_id"), s"$base/lsh")
    assert(SimilarityQueries.lshLoadIndex(spark, s"$base/lsh")._1
      .filter(col("vec_id") === victim).count() == 0, "lsh mask failed")

    // composed residual: BOTH halves masked
    val cellsCk = cells.localCheckpoint(true)
    val rv = SimilarityQueries.ivfResiduals(emb, cents, cellsCk)
      .select("vec_id", "v").localCheckpoint(true)
    val rIndex = SimilarityQueries.pqTrain(rv)
    SimilarityQueries.residualSaveIndex(cents, cellsCk, rIndex,
      SimilarityQueries.pqCodes(rIndex, rv), s"$base/res")
    SimilarityQueries.residualDeleteVectors(Seq(victim).toDF("vec_id"),
      s"$base/res")
    val (_, rCells, _, rCodes) =
      SimilarityQueries.residualLoadIndex(spark, s"$base/res")
    assert(rCells.filter(col("vec_id") === victim).count() == 0,
      "residual ivf-half mask failed")
    assert(rCodes.filter(col("vec_id") === victim).count() == 0,
      "residual pq-half mask failed")

    // kNN lists (the graph family: the victim must vanish from BOTH
    // columns — as an anchor and as anyone's neighbor)
    val bounded = emb.filter(col("vec_id") < 100)
    SimilarityQueries.knnSaveLists(
      SimilarityQueries.bruteTopLists(bounded, 3), 3, "brute-cos",
      s"$base/knn")
    SimilarityQueries.knnDeleteNodes(Seq(victim).toDF("vec_id"), s"$base/knn")
    assert(SimilarityQueries.knnLoadLists(spark, s"$base/knn")._1
      .filter(col("aid") === victim || col("bid") === victim).count() == 0,
      "knn mask failed")

    // a fresh save clears each family's tombstones (spot-check on PQ)
    SimilarityQueries.pqSaveIndex(pq, SimilarityQueries.pqCodes(pq, emb),
      s"$base/pq")
    assert(SimilarityQueries.pqLoadIndex(spark, s"$base/pq")._2
      .filter(col("vec_id") === victim).count() > 0,
      "a fresh pq save must clear tombstones")
  }
}
