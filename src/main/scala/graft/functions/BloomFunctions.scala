package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semijoin reduction — the scale path for "filter a huge fact
  * side by membership in a dimension too big to broadcast as a hash map but
  * cheap to broadcast as a bitset". The build is a distributed tree
  * aggregate (`stat.bloomFilter`); only the serialized bitset funnels
  * through the driver, exactly like any broadcast build side. The probe is
  * Spark's own codegen'd [[BloomFilterMightContain]] predicate (the
  * expression Catalyst's runtime row-level filtering injects), so probing
  * is map-side, stays in whole-stage codegen, and never shuffles the fact
  * side. False positives are possible (fpp-bounded), false negatives are
  * not — callers follow the probe with an exact confirm join over the
  * (now tiny) surviving rows.
  */
object BloomFunctions {

  /** Build a bloom filter over a long-valued column, serialized for
    * probing via [[mightContainLong]]. Runs one Spark job.
    */
  def buildLongBloom(df: DataFrame, c: Column, expectedItems: Long,
      fpp: Double): Array[Byte] = {
    // zero build rows → an empty filter (no bits set, rejects everything);
    // the distributed build path NPEs on a fully-empty aggregation
    val bf = if (expectedItems <= 0L)
      org.apache.spark.util.sketch.BloomFilter.create(1L, fpp)
    else df.stat.bloomFilter(c, expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Codegen'd membership probe of a long-valued column against a built
    * filter. The filter bytes ride the plan as a literal — on a cluster
    * they ship once per executor with the serialized plan.
    */
  def mightContainLong(bloom: Array[Byte], value: Column): Column =
    GraftColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), GraftColumnBridge.expression(value)))
}
