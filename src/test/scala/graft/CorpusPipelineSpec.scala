package graft

import org.apache.spark.sql.functions._
import graft.functions.{BloomFunctions, TextFunctions}
import graft.queries.DedupQueries

/** The end-to-end curation chain a real user runs, composed from the
  * LIBRARY surface (not the per-query harness forms): quality gate →
  * one CC run feeding near-dup survivor selection → bloom benchmark
  * decontamination → deterministic split. The oracle gate checks each
  * operator's output; this spec checks the global invariants only the
  * COMPOSITION can violate — content duplicates surviving the chain, eval
  * leakage after decontamination, a split that loses or duplicates
  * documents, nondeterminism across runs.
  */
class CorpusPipelineSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  /** Two identical one-token documents ("the" scores ~0.61 on the quality
    * gate: 0.008 length + 0.3 clean-punct + 0.3 stopword) — the shortest
    * possible duplicate pair, below the 2-gram shingle width.
    */
  private lazy val shortDups = {
    import spark.implicits._
    Seq((900001L, "the", "en", "srcX", 3L), (900002L, "the", "en", "srcX", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def runChain() = {
    // the corpus plus two adversarial rows: IDENTICAL one-token docs,
    // which pass the quality gate but are invisible to the 2-gram LSH
    // signatures — only the exact-hash stage can deduplicate them
    val docs = Tables(spark, dir, "documents")
      .unionByName(shortDups)

    // 1. quality gate (the q56/q105 move) — cheap per-row score first,
    // so every later stage touches fewer rows
    val gated = docs.filter(TextFunctions.qualityScore(col("text")) >= 0.4)

    // 2a. EXACT dedup first (content-hash keep-first, the q29/q30 move —
    // the SAME whitespace/case-normalized contentHash q29 uses, so
    // 'The ' and 'the' collapse): catches duplicates of any length,
    // including sub-shingle docs the LSH signatures cannot see
    val wch = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ch")).orderBy(col("doc_id"))
    val exact = gated.withColumn("ch", TextFunctions.contentHash(col("text")))
      .withColumn("rn", row_number().over(wch))
      .filter(col("rn") === 1).drop("ch", "rn")

    // 2b. near-dup removal: ONE connected-components run feeds survivor
    // selection (the q74/q75 production composition)
    val labels = DedupQueries.connectedComponents(
      DedupQueries.lshBucketStars(exact))
    val kept = exact.join(
      DedupQueries.dedupSurvivors(exact, labels).select("doc_id"),
      Seq("doc_id"), "left_semi")

    // 3. benchmark decontamination: eval set = doc_id % 50 == 0; the
    // bloom probe is the same per-row filter the streaming form uses
    // (CorpusStreams.decontaminated is plan-agnostic — batch here)
    val evalSh = TextFunctions.explodeShingles(
        docs.filter(col("doc_id") % 50 === 0).select("doc_id", "text"),
        col("text"), 5, "sh")
      .select("sh").distinct()
    val fp = evalSh.select(xxhash64(col("sh")).as("fp"))
    val bloom = BloomFunctions.buildLongBloom(fp, col("fp"), fp.count(), 0.01)
    val clean = graft.streaming.CorpusStreams.decontaminated(
      kept.filter(col("doc_id") % 50 =!= 0), bloom)

    // 4. deterministic hash split (the q66 move)
    val withH = clean.withColumn("h2",
      substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 2))
    val train = withH.filter(col("h2") < "cc").drop("h2")
    val test = withH.filter(col("h2") >= "cc").drop("h2")
    (docs, gated, kept, evalSh, clean, train, test)
  }

  test("composed chain: no exact-content duplicates survive, no eval " +
    "5-gram leaks, and the split partitions the clean corpus") {
    val (_, gated, kept, evalSh, clean, train, test) = runChain()

    // the dedup stages together kill EVERY exact-content duplicate:
    // the hash stage catches sub-shingle docs, the LSH/CC stage catches
    // the rest (same text → same signature → same bucket star)
    val dupContent = kept.groupBy(TextFunctions.contentHash(col("text"))).count()
      .filter(col("count") > 1).count()
    assert(dupContent == 0, s"$dupContent duplicated texts survived dedup")
    assert(kept.count() <= gated.count())
    // the adversarial sub-shingle pair: keep-first means 900001 survives
    val shortIds = kept.filter(col("doc_id") >= 900000L)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(shortIds == Seq(900001L),
      s"exact stage must keep exactly the first short dup, got $shortIds")

    // decontamination: EXACT check, not just the bloom's word — no clean
    // doc shares any 5-gram with the eval set (the bloom can only
    // over-drop, never leak)
    val leaked = TextFunctions.explodeShingles(
        clean.select("doc_id", "text"), col("text"), 5, "sh")
      .join(evalSh, "sh").count()
    assert(leaked == 0, s"$leaked eval shingles leaked through the bloom")

    // the split partitions clean exactly
    val (n, nTrain, nTest) = (clean.count(), train.count(), test.count())
    assert(nTrain + nTest == n, "split must partition the clean corpus")
    assert(train.join(test, Seq("doc_id"), "inner").count() == 0)
    assert(nTrain > 0 && nTest > 0, "both splits populated on testdata")
  }

  test("composed chain is deterministic: two independent runs select " +
    "identical document sets") {
    val ids1 = runChain()._6.select("doc_id").collect().map(_.getLong(0)).sorted
    val ids2 = runChain()._6.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids1.sameElements(ids2), "train split differs across runs")
  }
}
