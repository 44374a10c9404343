package graft

import org.apache.spark.sql.functions._

/** The documented contracts of the training-pipeline operators, asserted
  * on real testdata — the properties the oracle's value-compare cannot
  * express (it checks WHAT came back, these check the promised SHAPE).
  */
class PipelineInvariantSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q77 packing: every doc in exactly one bin, bins non-decreasing " +
    "in doc_id, and per-bin overflow bounded by one document") {
    val rows = run("q77_sequence_packing")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length == nDocs)
    // bin ids never decrease as doc_id increases (contiguous packing)
    assert(rows.sortBy(_._1).map(_._3).toSeq == rows.sortBy(_._1).map(_._3).sorted.toSeq)
    // documented overflow bound: bin total <= budget + (largest doc - 1)
    val maxDoc = rows.map(_._2).max
    val binTotals = rows.groupBy(_._3).map { case (_, rs) => rs.map(_._2).sum }
    assert(binTotals.forall(_ <= 512 + maxDoc - 1),
      s"bin overflow beyond one document: ${binTotals.max} vs 512+${maxDoc - 1}")
  }

  test("q80 chunking: windows cover every token and no chunk is fully " +
    "contained in another (the duplicate-tail regression)") {
    val chunks = run("q80_doc_chunking")
      .select(col("doc_id"), col("chunk_id"), col("n_chunk_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val nTok = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val n = nTok(doc)
      val spans = cs.map { case (_, cid, len) =>
        val start = cid.toInt * 10
        (start, start + len) // [start, end) in 0-based token positions
      }.sortBy(_._1)
      // coverage: consecutive windows overlap or abut, last window reaches n
      assert(spans.head._1 == 0 && spans.last._2 == n, s"doc $doc gap at edges")
      spans.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(s2 <= e1, s"doc $doc gap")
        case _ => ()
      }
      // no containment: with sorted distinct starts, ends must strictly
      // increase, else a window adds no new tokens
      assert(spans.map(_._2).distinct.length == spans.length
        && spans.map(_._2).toSeq == spans.map(_._2).sorted.toSeq,
        s"doc $doc has a contained chunk: $spans")
    }
  }

  test("q78 domain mix: under-budget sources keep every document") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"),
        size(graft.functions.TextFunctions.tokens(col("text"))).as("nt"))
    val bySrc = docs.groupBy("source").agg(sum("nt").as("st"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val budget = bySrc.map(_._2).sum / bySrc.length
    val kept = run("q78_domain_mix").groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bySrc.filter(_._2 <= budget).foreach { case (src, _, n) =>
      assert(kept.getOrElse(src, 0L) == n, s"under-budget source $src lost docs")
    }
    // no source ever gains docs; thinning of over-budget sources is
    // probabilistic per doc (hash < quantized rate), so a hard "someone
    // lost docs" assertion would be data-marginal — only the keep-side
    // contract is deterministic
    bySrc.foreach { case (src, _, n) =>
      assert(kept.getOrElse(src, 0L) <= n)
    }
  }

  test("q79 decontamination flags train-split docs only") {
    val flagged = run("q79_decontamination").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val trainIds = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("h2", substring(md5(concat(lit("split:"),
        col("doc_id").cast("string"))), 1, 2))
      .filter(col("h2") < "e6")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged.subsetOf(trainIds))
  }

  test("q106 shard assignment partitions the corpus: doc counts sum to the " +
    "corpus and the round-robin deal is balanced to within one document") {
    val shards = run("q106_shard_assignment")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(shards.map(_._2).sum == nDocs, "every doc in exactly one shard")
    assert(shards.length == math.min(16L, nDocs),
      "every non-empty shard reports")
    val counts = shards.map(_._2)
    assert(counts.max - counts.min <= 1,
      s"round-robin deal must balance to ±1 doc: $counts")
  }
}
