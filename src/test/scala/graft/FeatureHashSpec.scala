package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.cosine
import graft.queries.{DedupQueries, QuantQueries, TextQueries}

/** Feature-hashed document embeddings: the text-native vector generator
  * must place lexical near-duplicates close in cosine and compose with
  * the quantization family — the properties that make it an embedding,
  * not just a checksum.
  */
class FeatureHashSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def emb = TextQueries.hashedEmbeddings(
      Tables(spark, dir, "documents"))
    .localCheckpoint(true)

  test("hashed vectors separate near-duplicates from random pairs: mean " +
    "cosine over CONFIRMED near-dup pairs (minhash estimate >= 0.5) " +
    "far exceeds the random-pair mean") {
    val docs = Tables(spark, dir, "documents")
    // LSH candidates alone include incidental low-jaccard band
    // collisions; the embedding claim is about actual near-dups, so
    // confirm candidates with the q72 signature estimate first
    val sig = DedupQueries.minhashSigs(docs).localCheckpoint(true)
    val cand = DedupQueries.lshCandidatePairsFromSigs(sig)
    val pairs = cand
      .join(sig.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sig.as("sb"), col("doc_b") === col("sb.doc_id"))
      .filter(DedupQueries.jaccardEstimate("sa", "sb") >= 0.5)
      .select("doc_a", "doc_b")
      .localCheckpoint(true)
    assert(pairs.count() > 0, "fixture corpus must contain near-dups")
    val a = emb.select(col("doc_id").as("doc_a"), col("v").as("va"))
    val b = emb.select(col("doc_id").as("doc_b"), col("v").as("vb"))
    val dupCos = pairs.join(a, "doc_a").join(b, "doc_b")
      .select(cosine(col("va"), col("vb")).as("c"))
      .agg(avg("c")).head().getDouble(0)
    // random pairs: a deterministic offset pairing, minus any candidates
    val rand = emb.select(col("doc_id").as("doc_a"))
      .withColumn("doc_b", col("doc_a") + 137L)
      .join(emb.select(col("doc_id").as("doc_b")), "doc_b")
      .join(pairs, Seq("doc_a", "doc_b"), "left_anti")
    val randCos = rand.join(a, "doc_a").join(b, "doc_b")
      .select(cosine(col("va"), col("vb")).as("c"))
      .agg(avg("c")).head().getDouble(0)
    println(s"[fh] mean cosine: near-dup pairs=$dupCos random pairs=$randCos")
    // measured at sf0.001: 0.69 vs 0.05 (the estimate>=0.5 set includes
    // true-jaccard ~0.3 pairs; exact-jaccard>=0.5 pairs measure ~0.98)
    assert(dupCos > 0.5, s"near-dup hashed cosine too low: $dupCos")
    assert(randCos < 0.2, s"random-pair baseline too high: $randCos " +
      "(bigram hashing exists to collapse exactly this)")
    assert(dupCos > randCos + 0.5,
      s"no separation: dup=$dupCos rand=$randCos")
  }

  test("hashed embeddings compose with the quantization family: SQ8 " +
    "codes build and the ADC search retrieves each query's own " +
    "near-duplicates first") {
    val e = emb.select(col("doc_id").as("vec_id"), col("v"))
    val params = QuantQueries.sqTrain(e).localCheckpoint(true)
    val codes = QuantQueries.sqCodes(params, e)
    // pick a doc with a CONFIRMED near-dup and query with it
    val docs = Tables(spark, dir, "documents")
    val sig = DedupQueries.minhashSigs(docs).localCheckpoint(true)
    val pair = DedupQueries.lshCandidatePairsFromSigs(sig)
      .join(sig.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sig.as("sb"), col("doc_b") === col("sb.doc_id"))
      .filter(DedupQueries.jaccardEstimate("sa", "sb") >= 0.5)
      .select("doc_a", "doc_b")
      .orderBy("doc_a", "doc_b")
      .head()
    val (qid, dup) = (pair.getLong(0), pair.getLong(1))
    val q = e.filter(col("vec_id") === qid)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val top = QuantQueries.sqAdcSearch(params, codes, q, topR = 5,
        excludeSelfMatches = true)
      .orderBy("arank").collect().map(_.getLong(1))
    assert(top.contains(dup),
      s"doc $qid's near-dup $dup missing from its hashed-SQ8 top-5: " +
        top.mkString(", "))
  }
}
