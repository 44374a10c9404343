package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.VersionedStore
import graft.queries.GovernanceQueries

/** Incrementally-maintained corpus card (q181's discipline): partial
  * aggregates append per increment, deletions append NEGATED partials,
  * and the report folds the partials store — never the corpus.
  */
class IncrementalCardSpec extends SparkSuite {

  import spark.implicits._

  private def docs(rows: (Long, String, String)*): DataFrame =
    rows.toDF("doc_id", "text", "source")

  private def card(df: DataFrame): Set[(String, Long, Long, Long)] =
    df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("merged partials equal the from-scratch card after appends and a " +
    "retraction; a fully-retracted source disappears; the report reads " +
    "ONLY the card store") {
    val base = tmpDir("card")
    val corpusPath = s"$base/raw_docs"
    docs((1L, "aa", "s1"), (2L, "bbbb", "s1"), (3L, "cc", "s2"),
      (4L, "ddd", "s3")).write.parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    val path = s"$base/store"
    VersionedStore.save(Map("card" ->
      GovernanceQueries.corpusCardPartials(corpus.filter(col("doc_id") <= 2))),
      path)
    VersionedStore.append(Map("card" ->
      GovernanceQueries.corpusCardPartials(corpus.filter(col("doc_id") > 2))),
      path)
    // retract doc 2 (s1 shrinks) and doc 4 (s3 vanishes entirely)
    VersionedStore.append(Map("card" ->
      GovernanceQueries.corpusCardPartials(
        corpus.filter(col("doc_id").isin(2L, 4L)), negate = true)), path)
    val report = GovernanceQueries.corpusCardMerge(
      VersionedStore.read(spark, path, "card"))
    assert(card(report) == Set(("s1", 1L, 2L, 1L), ("s2", 1L, 2L, 3L)),
      s"got ${card(report)}")
    // the scale claim: the report's scan is the partials store, not the corpus
    val files = report.inputFiles.mkString("\n")
    assert(!files.contains("raw_docs"),
      s"report must not re-scan the corpus:\n$files")
    assert(files.contains("__data__card"))
    // compact folds the partials chain; the card is unchanged
    VersionedStore.compact(spark, path)
    assert(card(GovernanceQueries.corpusCardMerge(
      VersionedStore.read(spark, path, "card"))) ==
      Set(("s1", 1L, 2L, 1L), ("s2", 1L, 2L, 3L)))
  }
}
