package graft

import org.apache.spark.sql.functions._
import graft.queries.{DedupQueries, SimilarityQueries}
import graft.functions.VectorFunctions._

/** The ANN-fed composition path the q116/q117 scaladocs promise: directed
  * top-k lists from the multi-table LSH index feed
  * `mutualKnnEdgesFromCandidates`, and connected components run on the
  * resulting edges — no brute-force all-pairs scan anywhere. Edge recall
  * vs the brute-force mutual graph is measured on the same deterministic
  * subset q116 oracles (every stage is deterministic, so these are exact
  * regression values, not flaky samples).
  */
class MutualKnnAnnSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.01"

  private def pairSet(df: org.apache.spark.sql.DataFrame,
      ca: String, cb: String): Set[(Long, Long)] =
    df.select(ca, cb).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
      .toSet

  test("ANN-fed mutual-kNN: lshMultiAnn directed lists through the " +
    "mutuality tail recall brute-force edges and feed CC unchanged") {
    val e = Tables(spark, dir, "embeddings").filter(col("vec_id") < 300)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .localCheckpoint(true)
    def annEdgesAt(planes: Int) = SimilarityQueries.mutualKnnEdgesFromCandidates(
      SimilarityQueries.lshMultiAnn(e,
          e.select(col("vec_id").as("qid"), col("v").as("qv")),
          tables = 4, planes = planes, topK = 3, excludeSelfMatches = true)
        .select(col("query_id").as("aid"), col("neighbor_id").as("bid"),
          col("cos_sim").as("sim"), col("rank").as("rn")))
    val annEdges = annEdgesAt(4).localCheckpoint(true)
    val brute = SparkEntry.queries("q116_mutual_knn")(spark, dir)

    val a = pairSet(annEdges, "a", "b")
    val a6 = pairSet(annEdgesAt(6), "a", "b")
    val b = pairSet(brute, "a", "b")
    assert(a.nonEmpty, "ANN produced no mutual edges — degenerate LSH setup")
    println(s"[mutual-knn] planes=4: ann=${a.size} brute=${b.size} " +
      s"common=${a.intersect(b).size} annOnly=${(a -- b).size}")
    println(s"[mutual-knn] planes=6: ann=${a6.size} brute=${b.size} " +
      s"common=${a6.intersect(b).size} annOnly=${(a6 -- b).size}")

    // Edge recall tracks the q111 pairwise collision probability (a
    // brute edge survives iff its pair collides in >= 1 table): measured
    // 154/306 = 50% at planes=4 (pair recall 0.53) vs 58/306 = 19% at
    // planes=6 (pair recall 0.21). The honest non-containment finding:
    // ANN-fed mutual edges are NOT a subset of the brute mutual graph —
    // when LSH misses an anchor's true top-3, sparser candidate lists
    // promote lower-similarity pairs into rank <= 3 on both sides
    // (annOnly above). The production dials are (L, planes) for recall
    // and a sim floor for the spurious tail; both measured here and in
    // SCALING.md rather than assumed.
    val recall4 = a.intersect(b).size.toDouble / b.size
    val recall6 = a6.intersect(b).size.toDouble / b.size
    assert(recall4 >= 0.4, s"planes=4 edge recall $recall4 below floor")
    assert(recall6 >= 0.12, s"planes=6 edge recall $recall6 below floor")
    assert(recall4 > recall6,
      "edge recall must rise as planes drop (fuller candidate lists)")

    // every edge carries exact cosine and a valid mutual rank pair
    val badRank = annEdges
      .filter(col("rank_ab") > 3 || col("rank_ba") > 3 || col("a") >= col("b"))
      .count()
    assert(badRank == 0)

    // CC composes on the ANN edge list exactly as on the brute list
    val cc = DedupQueries.connectedComponents(
      annEdges.select(col("a").as("doc_a"), col("b").as("doc_b")))
    val labeled = cc.count()
    val verts = pairSet(annEdges, "a", "b").flatMap(p => Seq(p._1, p._2))
    assert(labeled == verts.size,
      s"CC labeled $labeled vertices, edge list touches ${verts.size}")
  }

  private def subset300 = Tables(spark, dir, "embeddings")
    .filter(col("vec_id") < 300)
    .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    .localCheckpoint(true)

  test("the sim floor in mutualKnnEdgesFromCandidates bounds the worst " +
    "edge admitted to CC with true-edge recall provably unchanged — and " +
    "the measured 'spurious' tail on this corpus is near-miss mutual " +
    "top-10 pairs, not junk") {
    val e = subset300
    val directed = SimilarityQueries.lshMultiAnn(e,
        e.select(col("vec_id").as("qid"), col("v").as("qv")),
        tables = 4, planes = 4, topK = 3, excludeSelfMatches = true)
      .select(col("query_id").as("aid"), col("neighbor_id").as("bid"),
        col("cos_sim").as("sim"), col("rank").as("rn"))
      .localCheckpoint(true)
    val brute = SparkEntry.queries("q116_mutual_knn")(spark, dir)
      .localCheckpoint(true)
    val b = pairSet(brute, "a", "b")
    val bruteMinSim = brute.agg(min("sim")).head().getDouble(0)

    val open = SimilarityQueries.mutualKnnEdgesFromCandidates(directed)
      .localCheckpoint(true)
    val floored = SimilarityQueries
      .mutualKnnEdgesFromCandidates(directed, minSim = bruteMinSim)
      .localCheckpoint(true)
    val openPairs = pairSet(open, "a", "b")
    val flooredPairs = pairSet(floored, "a", "b")

    // recall is UNCHANGED by construction at floor <= min brute sim:
    // every common edge IS a brute edge, so its sim clears the floor
    assert(flooredPairs.intersect(b) == openPairs.intersect(b),
      "true-edge recall must be unchanged at floor = min brute-edge sim")
    // the floor's contract: no admitted edge sits below it — this is
    // what bounds the worst bridge CC can ever see
    assert(floored.filter(col("sim") < bruteMinSim).count() == 0)
    // and it strictly prunes the sub-floor tail (166 -> 146 measured)
    val spuriousOpen = (openPairs -- b).size
    val spuriousFloored = (flooredPairs -- b).size
    println(s"[mutual-knn floor] floor=$bruteMinSim spurious " +
      s"$spuriousOpen -> $spuriousFloored")
    assert(spuriousFloored < spuriousOpen,
      "the floor must remove the sub-floor spurious edges")
    // removed edges are EXACTLY the sub-floor ones (pure filter semantics)
    assert(open.filter(col("sim") >= bruteMinSim).count() == floored.count())

    // the honest characterization that sizes the floor dial: on this
    // NEAR-UNIFORM corpus the ann-only edges overlap the true-edge sim
    // range (so no floor separates them cleanly) — because they are
    // near-misses, not noise: >= 90% are mutual within the brute TOP-10
    // graph (measured 156/166). On clustered production corpora the
    // junk tail separates downward and the same dial removes it.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("aid").orderBy(col("sim").desc, col("bid").asc)
    val bdir = e.select(col("vec_id").as("aid"), col("v"))
      .crossJoin(broadcast(e.select(col("vec_id").as("bid"), col("v").as("bv"))))
      .filter(col("aid") =!= col("bid"))
      .select(col("aid"), col("bid"),
        graft.functions.VectorFunctions.cosine(col("v"), col("bv")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
    val brute10 = pairSet(
      SimilarityQueries.mutualKnnEdgesFromCandidates(bdir), "a", "b")
    val spuriousSet = openPairs -- b
    val nearMiss = spuriousSet.intersect(brute10).size
    println(s"[mutual-knn floor] spurious=${spuriousSet.size} " +
      s"ofWhichMutualTop10=$nearMiss")
    assert(nearMiss.toDouble >= 0.9 * spuriousSet.size,
      "ann-only edges on this corpus should be near-miss mutual-top-10 " +
        "pairs — if this drops, the generator is admitting real junk " +
        "and the floor default needs revisiting")
  }

  test("the binary Hamming index feeds the same mutuality tail: packed " +
    "sign-code candidates + exact cosine rerank recall MORE brute edges " +
    "than the 4-table LSH generator at ~10x less candidate work") {
    val e = subset300
    val codes = SimilarityQueries.binCodes(e)
    val ham = SimilarityQueries.binHammingSearch(codes,
      e.select(col("vec_id").as("qid"), col("v").as("qv")),
      topR = 25, excludeSelfMatches = true)
    // exact cosine rerank of the <= 25 Hamming candidates per anchor into
    // the directed top-3 lists the mutuality tail takes (the q128 rerank
    // move; the window is candidate-sized, never corpus-sized)
    val withVecs = ham
      .join(e.select(col("vec_id").as("qid"), col("v").as("qv")), "qid")
      .join(e.select(col("vec_id"), col("v").as("nv")), "vec_id")
      .withColumn("sim",
        graft.functions.VectorFunctions.cosine(col("qv"), col("nv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("sim").desc, col("vec_id").asc)
    val directed = withVecs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("qid").as("aid"), col("vec_id").as("bid"),
        col("sim"), col("rn"))
    val binEdges = SimilarityQueries.mutualKnnEdgesFromCandidates(directed)
      .localCheckpoint(true)
    val brute = SparkEntry.queries("q116_mutual_knn")(spark, dir)
    val b = pairSet(brute, "a", "b")
    val bin = pairSet(binEdges, "a", "b")
    val recall = bin.intersect(b).size.toDouble / b.size
    println(s"[mutual-knn binary] topR=25: bin=${bin.size} brute=${b.size} " +
      s"common=${bin.intersect(b).size} recall=$recall")
    // measured 194/306 = 63% edge recall vs the LSH generator's 154/306
    // (planes=4) — the cheaper candidate generator is also the better
    // one at this budget (16 B/vector scan vs 4 bucket explosions;
    // SCALING.md 0.64 s vs 3.3 s at sf0.1)
    assert(recall >= 0.55, s"binary-fed edge recall $recall below floor")
    val lshCommon = 154
    assert(bin.intersect(b).size > lshCommon,
      "binary-fed recall should beat the 4-table/4-plane LSH generator " +
        "at this budget (194 vs 154 measured) — a regression here means " +
        "the packed-lane rerank lost candidates")
    // mutual ranks stay valid through the composition
    assert(binEdges.filter(col("rank_ab") > 3 || col("rank_ba") > 3 ||
      col("a") >= col("b")).count() == 0)
  }
}
