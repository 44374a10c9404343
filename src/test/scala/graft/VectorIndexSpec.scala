package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.asDouble
import graft.operators.VectorIndex
import graft.queries.{QuantQueries, SimilarityQueries}

/** The unified façade over the seven persisted index families: ladder
  * routing, marker-gated lifecycle, and search parity with the native
  * family verbs it delegates to.
  */
class VectorIndexSpec extends SparkSuite {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables(spark, dir, "embeddings")
    .filter(col("vec_id") < 200)
    .select(col("vec_id"), asDouble(col("embedding")).as("v"))

  private def queries = emb.filter(col("vec_id") < 3)
    .select(col("vec_id").as("qid"), col("v").as("qv"))

  test("select routes the measured ladder: cheapest family meeting both " +
    "the byte budget and the recall floor; unsatisfiable throws") {
    // 64 B at full recall -> SQ8, the near-free 8x
    assert(VectorIndex.select(64, 0.99) == "sq8")
    // 512 B budget, full recall: SQ8 still wins on bytes over exact
    assert(VectorIndex.select(512, 1.0) == "sq8")
    // 16 B at modest recall -> binary sign codes
    assert(VectorIndex.select(16, 0.5) == "bin")
    // storage floor, any recall -> PQ
    assert(VectorIndex.select(4, 0.0) == "pq")
    // 5 B with a small recall floor -> residual encoding beats flat PQ
    assert(VectorIndex.select(5, 0.05) == "residual")
    // no family gives 0.9 recall at 4 bytes — must throw with the ladder
    val ex = intercept[IllegalArgumentException] {
      VectorIndex.select(4, 0.9)
    }
    assert(ex.getMessage.contains("ladder"))
  }

  test("selectRung carries the KNOB that delivers the recall: the same " +
    "16 B binary store answers 0.5 at the shallow probe and 0.8 only at " +
    "R=100; residual's larger codebook rungs route without the caller " +
    "knowing the probe dial") {
    // '16 B/vec at 0.8 recall' — same store, deeper probe
    val deep = VectorIndex.selectRung(16, 0.8)
    assert(deep.family == "bin" && deep.knob == "R=100")
    // the modest floor resolves the bytes tie to the CHEAPER probe
    val shallow = VectorIndex.selectRung(16, 0.5)
    assert(shallow.family == "bin" && shallow.knob == "R=25")
    // residual at 5 B: the recall floor walks the codebook/probe rungs
    assert(VectorIndex.selectRung(5, 0.05).knob == "cells=32,pq=4x8,probe=2")
    assert(VectorIndex.selectRung(5, 0.10).knob == "cells=32,pq=4x64,probe=2")
    assert(VectorIndex.selectRung(5, 0.14).knob == "cells=32,pq=4x64,probe=4")
    // select stays the family-only surface build consumes
    assert(VectorIndex.select(16, 0.8) == "bin")
  }

  test("build stamps the family marker; open verifies it; a mis-declared " +
    "family and a marker-less store both fail loudly") {
    val base = tmpDir("vidx-marker")
    VectorIndex.build(emb, "sq8", s"$base/a", protocol = "rename")
    assert(VectorIndex.family(spark, s"$base/a") == "sq8")
    VectorIndex.open(spark, s"$base/a", "sq8") // must not throw
    val ex = intercept[IllegalArgumentException] {
      VectorIndex.open(spark, s"$base/a", "pq")
    }
    assert(ex.getMessage.contains("'sq8'") && ex.getMessage.contains("'pq'"),
      s"error must name both families: ${ex.getMessage}")
    // a store built by the raw family verbs has no marker: the façade
    // refuses to guess
    SimilarityQueries.binSaveIndex(
      SimilarityQueries.binCodes(emb), s"$base/raw")
    val ex2 = intercept[IllegalArgumentException] {
      VectorIndex.family(spark, s"$base/raw")
    }
    assert(ex2.getMessage.contains("family marker"))
  }

  test("façade search equals the native family search it routes to " +
    "(sq8 ADC and binary Hamming), with the uniform output shape") {
    val base = tmpDir("vidx-parity")
    VectorIndex.build(emb, "sq8", s"$base/sq8", protocol = "rename")
    val got = VectorIndex.search(emb, queries, s"$base/sq8", k = 5)
    assert(got.columns.toSeq ==
      Seq("query_id", "neighbor_id", "rank", "score"))
    val (params, codes) = QuantQueries.sqLoadIndex(spark, s"$base/sq8")
    val native = QuantQueries.sqAdcSearch(params, codes, queries, topR = 5)
      .select(col("qid"), col("vec_id"), col("arank"), col("adc_dist"))
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))
    assert(got.collect().map(key).sorted
      .sameElements(native.collect().map(key).sorted),
      "routed sq8 search must equal the native ADC search")

    VectorIndex.build(emb, "bin", s"$base/bin", protocol = "rename")
    val gotB = VectorIndex.search(emb, queries, s"$base/bin", k = 5)
    val nativeB = SimilarityQueries.binHammingSearch(
        SimilarityQueries.binLoadIndex(spark, s"$base/bin"), queries, topR = 5)
    assert(gotB.count() == nativeB.count() && gotB.count() > 0)
    assert(gotB.agg(max("rank")).take(1)(0).getInt(0) <= 5)
  }

  test("routed lifecycle: append grows the store idempotently, delete " +
    "tombstones out of search, knn routes its graph-store semantics") {
    val base = tmpDir("vidx-life")
    VectorIndex.build(emb.filter(col("vec_id") >= 20), "sq8", s"$base/s", protocol = "rename")
    VectorIndex.append(emb.filter(col("vec_id") < 20), s"$base/s")
    VectorIndex.append(emb.filter(col("vec_id") < 20), s"$base/s") // replay
    val codes = spark.read.parquet(s"$base/s/codes")
    assert(codes.count() == emb.count(), "replayed append must be a no-op")
    // delete: vec 0 must vanish from results (qid 1's neighbors)
    VectorIndex.delete(Seq(0L).toDF("vec_id"), s"$base/s")
    val after = VectorIndex.search(emb, queries, s"$base/s", k = 5)
    assert(after.filter(col("neighbor_id") === 0L).count() == 0,
      "deleted vector must be masked out of routed search")
    // knn: search and vector-append are graph-store shaped — the façade
    // says so instead of mis-routing
    VectorIndex.build(emb, "knn", s"$base/knn", protocol = "rename")
    assert(intercept[IllegalArgumentException] {
      VectorIndex.search(emb, queries, s"$base/knn")
    }.getMessage.contains("graphExpandCandidates"))
    assert(intercept[IllegalArgumentException] {
      VectorIndex.append(emb, s"$base/knn")
    }.getMessage.contains("knnAppendLists"))
    VectorIndex.delete(Seq(5L).toDF("vec_id"), s"$base/knn")
    val (lists, _) = SimilarityQueries.knnLoadLists(spark, s"$base/knn")
    assert(lists.filter(col("aid") === 5L || col("bid") === 5L).count() == 0)
  }

  test("every family builds and round-trips through the routed verbs " +
    "(lsh and ivf return cosine candidates; residual returns ADC)") {
    val base = tmpDir("vidx-all")
    Seq("lsh", "ivf", "residual", "pq").foreach { fam =>
      VectorIndex.build(emb, fam, s"$base/$fam", protocol = "rename")
      assert(VectorIndex.family(spark, s"$base/$fam") == fam)
      val out = VectorIndex.search(emb, queries, s"$base/$fam", k = 3)
      assert(out.columns.toSeq ==
        Seq("query_id", "neighbor_id", "rank", "score"),
        s"$fam output shape")
      assert(out.count() > 0, s"$fam returned no candidates")
      assert(out.agg(max("rank")).take(1)(0).getInt(0) <= 3, s"$fam rank cap")
    }
  }

  test("sharded federation matrix (sq8/pq/bin): the union of per-shard " +
    "top-k re-cut to k BIT-equals the monolithic store — one global " +
    "training copied per shard, routed append and delete stay equal") {
    for (fam <- Seq("sq8", "pq", "bin")) {
      val root = tmpDir(s"vi-sh-$fam") + "/idx"
      val mono = tmpDir(s"vi-mono-$fam") + "/idx"
      val base = emb.filter(col("vec_id") < 150)
      VectorIndex.buildSharded(base, fam, root, 3, protocol = "rename")
      VectorIndex.build(base, fam, mono, protocol = "rename")
      def both(): (Seq[Row4], Seq[Row4]) = (
        asRows(VectorIndex.searchSharded(queries, root, k = 5)),
        asRows(VectorIndex.search(emb, queries, mono, k = 5)))
      val (sh0, mo0) = both()
      assert(sh0 == mo0, s"$fam: sharded build diverges from monolithic")
      // routed append: the increment encodes with each shard's stored
      // COPY of the global params — still comparable, still bit-equal
      val inc = emb.filter(col("vec_id") >= 150)
      VectorIndex.appendSharded(inc, root)
      VectorIndex.append(inc, mono)
      val (sh1, mo1) = both()
      assert(sh1 == mo1, s"$fam: sharded append diverges from monolithic")
      assert(sh1 != sh0, s"$fam: append changed nothing — weak fixture")
      // routed delete: tombstones land on the owning shard only
      val victims = Seq(sh1.head.nid).toDF("vec_id")
      VectorIndex.deleteSharded(victims, root)
      VectorIndex.delete(victims, mono)
      val (sh2, mo2) = both()
      assert(sh2 == mo2, s"$fam: sharded delete diverges from monolithic")
      assert(!sh2.exists(_.nid == sh1.head.nid),
        s"$fam: deleted neighbor still returned")
    }
  }

  test("sharded store guards: non-shardable families refuse with the " +
    "shardable list; a missing router refuses with re-run guidance; " +
    "more shards than vectors refuses with fewer-shards guidance") {
    val e1 = intercept[IllegalArgumentException] {
      VectorIndex.buildSharded(emb, "ivf", tmpDir("vi-g1") + "/idx", 2, protocol = "rename")
    }
    assert(e1.getMessage.contains("shardable"))
    val e2 = intercept[IllegalArgumentException] {
      VectorIndex.searchSharded(queries, tmpDir("vi-g2") + "/idx")
    }
    assert(e2.getMessage.contains("re-run"))
    val e3 = intercept[IllegalArgumentException] {
      VectorIndex.buildSharded(emb.filter(col("vec_id") < 3), "bin",
        tmpDir("vi-g3") + "/idx", 50, protocol = "rename")
    }
    assert(e3.getMessage.contains("fewer shards"))
  }

  private case class Row4(qid: Long, nid: Long, rank: Int, score: Double)

  private def asRows(df: org.apache.spark.sql.DataFrame): Seq[Row4] =
    df.orderBy("query_id", "rank").collect()
      .map(r => Row4(r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3))).toSeq

  test("ivf search probes by the store's ASSIGNMENT metric (cosine): a " +
    "corpus vector used as its own query must land in its own cell and " +
    "return itself at rank 1 — a raw-dot probe picks a different cell " +
    "for unequal-norm centroids and loses the self-match") {
    val base = tmpDir("vidx-ivfmetric")
    VectorIndex.build(emb, "ivf", s"$base/ivf", protocol = "rename")
    // every corpus vector queried against the index: the self-match is
    // exact cosine 1.0 inside the query's own assigned cell, so rank 1
    // unless the probe routed to a different cell than the assignment
    val allQ = emb.select(col("vec_id").as("qid"), col("v").as("qv"))
    val top1 = VectorIndex.search(emb, allQ, s"$base/ivf", k = 1)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect()
    val missed = top1.filter { case (q, n) => q != n }
    assert(missed.isEmpty,
      s"${missed.length}/${top1.length} self-queries did not find " +
        s"themselves — probe metric diverges from the assignment metric " +
        s"(first: ${missed.take(3).mkString(", ")})")
    assert(top1.length == emb.count(),
      "every self-query must return at least its own vector")
  }
}
