package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.asDouble
import graft.queries.SimilarityQueries

/** The persisted-store lifecycle applied to the SEVENTH family: per-node
  * ranked kNN candidate lists (the graph artifact behind mutual-kNN,
  * semantic clusters, label propagation, and q147's graph-expanded
  * search). Plus the measured claim of the graph expansion itself: a
  * shallow ANN probe expanded one hop through the stored lists recovers
  * true neighbors the probe missed — recall strictly between the shallow
  * probe and the deeper scan it replaces.
  */
class KnnStoreSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables(spark, dir, "embeddings")
    .filter(col("vec_id") < 300)
    .select(col("vec_id"), asDouble(col("embedding")).as("v"))

  private def lists = SimilarityQueries.bruteTopLists(emb, 3)

  test("save → load round-trips: stored lists equal the generated lists, " +
    "k comes back, and the derived mutual edges equal q116 exactly") {
    val base = tmpDir("knnstore")
    SimilarityQueries.knnSaveLists(lists, 3, "brute-cos", s"$base/knn")
    val (loaded, k) = SimilarityQueries.knnLoadLists(spark, s"$base/knn")
    assert(k == 3)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))
    assert(loaded.select("aid", "bid", "sim", "rn").collect().map(key).sorted
      .sameElements(lists.collect().map(key).sorted))
    val derived = SimilarityQueries
      .mutualKnnEdgesFromCandidates(loaded.select("aid", "bid", "sim", "rn"))
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val q116 = SparkEntry.queries("q116_mutual_knn")(spark, dir)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(derived.sameElements(q116),
      "mutual edges derived from the loaded store must equal q116")
  }

  test("provenance guards: mis-declared k fails at save, a foreign-family " +
    "store fails at load, a spliced store (second generator appended) " +
    "fails at load") {
    val base = tmpDir("knnstore-guards")
    // lists carry rank up to 3; declaring k=2 must fail before writing
    val ex = intercept[IllegalArgumentException] {
      SimilarityQueries.knnSaveLists(lists, 2, "brute-cos", s"$base/bad")
    }
    assert(ex.getMessage.contains("> declared k"))
    // an LSH store path is not a kNN store
    SimilarityQueries.lshSaveIndex(
      SimilarityQueries.lshBuckets(emb), 4, 6, s"$base/lsh")
    intercept[Exception] {
      SimilarityQueries.knnLoadLists(spark, s"$base/lsh")
    }
    // splice: same k, different generator tag
    SimilarityQueries.knnSaveLists(lists, 3, "brute-cos", s"$base/knn")
    lists.withColumn("fp", lit("knn:k=3:gen=bin-R25"))
      .select("aid", "bid", "sim", "rn", "fp")
      .write.mode("append").parquet(s"$base/knn/lists")
    val ex2 = intercept[IllegalArgumentException] {
      SimilarityQueries.knnLoadLists(spark, s"$base/knn")
    }
    assert(ex2.getMessage.contains("mixes generators"))
    // empty saves are refused (an empty store reads as interrupted)
    val ex3 = intercept[IllegalArgumentException] {
      SimilarityQueries.knnSaveLists(lists.filter(col("aid") < 0), 3,
        "brute-cos", s"$base/empty")
    }
    assert(ex3.getMessage.contains("EMPTY"))
  }

  test("append is idempotent on aid and bounded by the store's k; delete " +
    "tombstones a node out of BOTH columns and stays sticky across a " +
    "replayed append") {
    val base = tmpDir("knnstore-append")
    val old = lists.filter(col("aid") >= 10)
    val inc = lists.filter(col("aid") < 10)
    SimilarityQueries.knnSaveLists(old, 3, "brute-cos", s"$base/knn")
    SimilarityQueries.knnAppendLists(inc, "brute-cos", s"$base/knn")
    val total = lists.count()
    assert(SimilarityQueries.knnLoadLists(spark, s"$base/knn")._1.count()
      == total)
    // replay: no duplicates
    SimilarityQueries.knnAppendLists(inc, "brute-cos", s"$base/knn")
    assert(SimilarityQueries.knnLoadLists(spark, s"$base/knn")._1.count()
      == total)
    // an increment deeper than the store's k is refused
    intercept[IllegalArgumentException] {
      SimilarityQueries.knnAppendLists(
        SimilarityQueries.bruteTopLists(emb, 5), "brute-cos", s"$base/knn")
    }
    // an increment declaring a DIFFERENT generator is refused — without
    // the declaration this splice would be admitted under the store's
    // own stamp and the load-time 'mixes generators' guard could never
    // see it
    val exGen = intercept[IllegalArgumentException] {
      SimilarityQueries.knnAppendLists(inc, "bin-R25", s"$base/knn")
    }
    assert(exGen.getMessage.contains("different generator"))
    // delete node 7: gone as an anchor AND as anyone's neighbor
    import spark.implicits._
    SimilarityQueries.knnDeleteNodes(Seq(7L).toDF("vec_id"), s"$base/knn")
    val masked = SimilarityQueries.knnLoadLists(spark, s"$base/knn")._1
    assert(masked.filter(col("aid") === 7L || col("bid") === 7L).count() == 0)
    // sticky: replaying the append that contained node 7 does not
    // resurrect it (raw-store idempotence probe sees the old rows)
    SimilarityQueries.knnAppendLists(inc, "brute-cos", s"$base/knn")
    val masked2 = SimilarityQueries.knnLoadLists(spark, s"$base/knn")._1
    assert(masked2.filter(col("aid") === 7L || col("bid") === 7L).count() == 0)
  }

  test("graph expansion measurably lifts recall: shallow Hamming probe " +
    "(R=8) < expanded < truth, and every expansion row is explained by " +
    "a stored list edge") {
    // truth: brute cosine top-5 per query (self excluded)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val truth = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        graft.functions.VectorFunctions.cosine(col("qv"), col("v")).as("s"))
    val wt = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(col("s").desc, col("vec_id").asc)
    val truthSet = truth.withColumn("rn", row_number().over(wt))
      .filter(col("rn") <= 5).select("qid", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val res = SparkEntry.queries("q147_graph_expanded_ann")(spark, dir)
      .collect()
    val expandedTop = res.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val expandedRecall = (expandedTop & truthSet).size.toDouble / truthSet.size

    // the q128 path at the same shallow R=8, rerank to top-5, NO expansion
    val packed = emb.select(col("vec_id"), col("v"),
      expr("aggregate(sequence(0, 31), 0L, (acc, i) -> acc + " +
        "IF(element_at(v, i + 1) > 0D, shiftleft(1L, i), 0L))").as("w0"),
      expr("aggregate(sequence(32, 63), 0L, (acc, i) -> acc + " +
        "IF(element_at(v, i + 1) > 0D, shiftleft(1L, i - 32), 0L))").as("w1"))
    val qp = packed.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("w0").as("qw0"), col("w1").as("qw1"))
    val ham = packed.join(broadcast(qp), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("v"), col("qv"),
        expr("CAST(bit_count(w0 ^ qw0) + bit_count(w1 ^ qw1) AS INT)")
          .as("hamming"))
    val baseCand = graft.operators.GroupTopK.topK(ham, Seq(col("qid")),
      Seq(col("hamming").asc, col("vec_id").asc), col("vec_id"), 8,
      rankName = "hrank")
    val wb = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(col("cs").desc, col("vec_id").asc)
    val baseTop = baseCand
      .withColumn("cs",
        graft.functions.VectorFunctions.cosine(col("qv"), col("v")))
      .withColumn("rn", row_number().over(wb)).filter(col("rn") <= 5)
      .select("qid", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val baseRecall = (baseTop & truthSet).size.toDouble / truthSet.size

    info(f"recall@5 vs brute truth: base(R=8)=$baseRecall%.3f " +
      f"expanded=$expandedRecall%.3f")
    assert(expandedRecall > baseRecall,
      s"expansion must lift recall: base=$baseRecall expanded=$expandedRecall")

    // every graph-sourced survivor is explained by a stored list edge
    // from some base candidate of the same query
    val listEdges = lists.select("aid", "bid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val basePairs = baseCand.select("qid", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    res.filter(_.getAs[String]("via") == "graph").foreach { r =>
      val (qid, nid) = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(basePairs.exists { case (bq, bc) =>
        bq == qid && listEdges.contains((bc, nid)) },
        s"graph survivor ($qid, $nid) has no list-edge provenance")
    }
    // and the gain is non-vacuous on this corpus: at least one graph-via
    // row sits in the true top-5
    assert(res.exists(r => r.getAs[String]("via") == "graph" &&
      truthSet.contains((r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id")))),
      "no graph-sourced survivor is a true neighbor — expansion vacuous")
  }

  test("incremental re-knit equals the full rebuild exactly, is " +
    "idempotent on replay, and refuses non-exact generators") {
    val base = tmpDir("knnstore-reknit")
    val eOld = emb.filter(col("vec_id") >= 60)
    val newIds = emb.filter(col("vec_id") < 60).select("vec_id")
    // day 0: store over the old corpus only
    SimilarityQueries.knnSaveLists(
      SimilarityQueries.bruteTopLists(eOld, 3), 3, "brute-cos", s"$base/knn")
    // append: the new anchors' lists, computed against the FULL corpus
    SimilarityQueries.knnAppendLists(
      SimilarityQueries.bruteTopLists(emb, 3)
        .join(newIds.withColumnRenamed("vec_id", "aid"), Seq("aid"),
          "left_semi"),
      "brute-cos", s"$base/knn")
    // old anchors are now STALE (their lists predate the new nodes);
    // re-knit repairs them from stored lists + new-batch sims only
    SimilarityQueries.knnReknit(emb, newIds, s"$base/knn")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))
    val full = SimilarityQueries.bruteTopLists(emb, 3)
      .select("aid", "bid", "sim", "rn").collect().map(key).sorted
    def loaded() = SimilarityQueries.knnLoadLists(spark, s"$base/knn")._1
      .select("aid", "bid", "sim", "rn").collect().map(key).sorted
    assert(loaded().sameElements(full),
      "re-knit store must equal the full |corpus|^2 rebuild exactly")
    // replayed re-knit: a no-op (candidates dedupe on (aid, bid))
    SimilarityQueries.knnReknit(emb, newIds, s"$base/knn")
    assert(loaded().sameElements(full), "replayed re-knit must be a no-op")
    // a non-exact generator cannot be re-knit (the merge argument needs
    // exact stored lists)
    SimilarityQueries.knnSaveLists(
      SimilarityQueries.bruteTopLists(eOld, 3), 3, "lsh-b4", s"$base/ann")
    val exGen = intercept[IllegalArgumentException] {
      SimilarityQueries.knnReknit(emb, newIds, s"$base/ann")
    }
    assert(exGen.getMessage.contains("'lsh-b4'"),
      s"re-knit must refuse an ANN-generated store: ${exGen.getMessage}")
    // a corpus-scale "batch" trips the broadcast bound loudly instead of
    // materializing stale × batch work silently
    val exBig = intercept[IllegalArgumentException] {
      SimilarityQueries.knnReknit(emb, newIds, s"$base/knn", maxBatch = 10)
    }
    assert(exBig.getMessage.contains("maxBatch") &&
      exBig.getMessage.contains("knnSaveLists"),
      s"oversized re-knit batch must fail with guidance: ${exBig.getMessage}")
  }

  test("ANN-store refresh: re-probing stale anchors against the batch's " +
    "bucket collisions reproduces the full LSH regeneration BYTE-EQUAL; " +
    "replay is a no-op; brute-cos stores are routed to knnReknit; an " +
    "oversized batch trips the broadcast bound") {
    val base = tmpDir("knnstore-refresh")
    val eOld = emb.filter(col("vec_id") >= 60)
    val newIds = emb.filter(col("vec_id") < 60).select("vec_id")
    val gen = "lsh-multi-4x6"
    // day 0: ANN lists over the old corpus only
    SimilarityQueries.knnSaveLists(
      SimilarityQueries.lshTopLists(eOld, 3), 3, gen, s"$base/ann")
    // append: new anchors' lists generated against the FULL corpus
    SimilarityQueries.knnAppendLists(
      SimilarityQueries.lshTopLists(emb, 3)
        .join(newIds.withColumnRenamed("vec_id", "aid"), Seq("aid"),
          "left_semi"),
      gen, s"$base/ann")
    SimilarityQueries.knnRefreshAnn(emb, newIds, s"$base/ann")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))
    val full = SimilarityQueries.lshTopLists(emb, 3)
      .select("aid", "bid", "sim", "rn").collect().map(key).sorted
    def loaded() = SimilarityQueries.knnLoadLists(spark, s"$base/ann")._1
      .select("aid", "bid", "sim", "rn").collect().map(key).sorted
    assert(loaded().sameElements(full),
      "refreshed ANN store must equal the full regeneration exactly")
    SimilarityQueries.knnRefreshAnn(emb, newIds, s"$base/ann")
    assert(loaded().sameElements(full), "replayed refresh must be a no-op")
    // routing: a brute store refreshes through knnReknit, not here
    SimilarityQueries.knnSaveLists(
      SimilarityQueries.bruteTopLists(eOld, 3), 3, "brute-cos",
      s"$base/brute")
    val exBrute = intercept[IllegalArgumentException] {
      SimilarityQueries.knnRefreshAnn(emb, newIds, s"$base/brute")
    }
    assert(exBrute.getMessage.contains("knnReknit"),
      s"brute store must be routed to knnReknit: ${exBrute.getMessage}")
    val exBig = intercept[IllegalArgumentException] {
      SimilarityQueries.knnRefreshAnn(emb, newIds, s"$base/ann",
        maxBatch = 10)
    }
    assert(exBig.getMessage.contains("maxBatch"),
      s"oversized refresh batch must fail loudly: ${exBig.getMessage}")
    // a PARTIAL vector relation must not silently DROP stored anchors
    // absent from it: their lists pass through unrefreshed (the batch
    // vectors stay present, so the probe machinery still runs)
    val dropped = emb.filter(col("vec_id") < 60 || col("vec_id") >= 200)
    val before = loaded()
    SimilarityQueries.knnRefreshAnn(dropped, newIds, s"$base/ann")
    assert(loaded().sameElements(before),
      "refresh with a partial corpus dropped or changed stored lists")
  }

  test("multi-hop beam expansion: the recall-vs-candidates curve is " +
    "monotone in depth from a SHALLOW probe, and the visited set is " +
    "beam-bounded per hop") {
    import org.apache.spark.sql.expressions.Window
    // truth: brute cosine top-5 per query (self excluded)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val truth = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        graft.functions.VectorFunctions.cosine(col("qv"), col("v")).as("s"))
    val wt = Window.partitionBy("qid").orderBy(col("s").desc, col("vec_id").asc)
    val truthSet = truth.withColumn("rn", row_number().over(wt))
      .filter(col("rn") <= 5).select("qid", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // a shallow Hamming probe (top-4) as the base, like q158
    val packed = emb.select(col("vec_id"), col("v"),
      expr("aggregate(sequence(0, 31), 0L, (acc, i) -> acc + " +
        "IF(element_at(v, i + 1) > 0D, shiftleft(1L, i), 0L))").as("w0"),
      expr("aggregate(sequence(32, 63), 0L, (acc, i) -> acc + " +
        "IF(element_at(v, i + 1) > 0D, shiftleft(1L, i - 32), 0L))").as("w1"))
    val qp = packed.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"),
        col("w0").as("qw0"), col("w1").as("qw1"))
    val ham = packed.join(broadcast(qp), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        expr("CAST(bit_count(w0 ^ qw0) + bit_count(w1 ^ qw1) AS INT)")
          .as("hamming"))
    val base = graft.operators.GroupTopK.topK(ham, Seq(col("qid")),
        Seq(col("hamming").asc, col("vec_id").asc), col("vec_id"), 4,
        rankName = "hrank")
      .select("qid", "vec_id")

    def recallAt(hops: Int): (Double, Long) = {
      val visited = SimilarityQueries.graphExpandMultiHop(
        base, lists, emb, q, hops = hops, beam = 8)
      val wr = Window.partitionBy("qid")
        .orderBy(col("sim").desc, col("vec_id").asc)
      val top = visited.withColumn("rn", row_number().over(wr))
        .filter(col("rn") <= 5).select("qid", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      ((top & truthSet).size.toDouble / truthSet.size, visited.count())
    }
    val (r1, n1) = recallAt(1)
    val (r2, n2) = recallAt(2)
    val (r3, n3) = recallAt(3)
    // base-only recall (hop 0 candidates reranked)
    val wb = Window.partitionBy("qid").orderBy(col("s").desc, col("vec_id").asc)
    val baseTop = base.join(truth, Seq("qid", "vec_id"))
      .withColumn("rn", row_number().over(wb))
      .filter(col("rn") <= 5).select("qid", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r0 = (baseTop & truthSet).size.toDouble / truthSet.size
    info(f"recall@5 curve: probe=$r0%.3f 1hop=$r1%.3f ($n1 cand) " +
      f"2hop=$r2%.3f ($n2 cand) 3hop=$r3%.3f ($n3 cand)")
    assert(r1 >= r0 && r2 >= r1 && r3 >= r2,
      s"recall must be monotone in depth: $r0 -> $r1 -> $r2 -> $r3")
    assert(r2 > r0,
      s"two hops from the shallow probe must lift recall: $r0 -> $r2")
    // beam bound: visited <= |q| * (4 + hops*beam)
    Seq((1, n1), (2, n2), (3, n3)).foreach { case (h, n) =>
      assert(n <= 5L * (4 + h * 8),
        s"hop-$h visited set $n exceeds the beam bound ${5 * (4 + h * 8)}")
    }
  }
}
