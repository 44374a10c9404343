package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.asDouble
import graft.queries.SimilarityQueries

/** The PQ production composition: codebooks are trained ONCE (pqTrain)
  * and the same trained index serves both the encoder/fidelity consumer
  * (q107) and ADC search (q108). Because every stage is deterministic,
  * "serves both" is provable by exact equality with the standalone query
  * results — the same one-run-feeds-all contract DedupClusterSpec proves
  * for connected components.
  */
class PqIndexSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("one pqTrain feeds both ADC search and the codeword encoder with " +
    "results identical to the standalone queries") {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val index = SimilarityQueries.pqTrain(emb)

    // search from the shared index == the standalone q108
    val fromIndex = SimilarityQueries.pqAdcSearch(index)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val standalone = SparkEntry.queries("q108_pq_adc_search")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(fromIndex.sameElements(standalone),
      "shared-index search must equal the standalone query result")

    // the encoder consumes the SAME index: every vector gets exactly one
    // codeword per subspace, drawn from that subspace's codebook
    val codes = SimilarityQueries.pqCodewords(index)
    val n = emb.count()
    assert(codes.count() == 4 * n, "one codeword per (vector, subspace)")
    assert(codes.groupBy("vec_id").count().filter(col("count") =!= 4).count() == 0)
  }
}
