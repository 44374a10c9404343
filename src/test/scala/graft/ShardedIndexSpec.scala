package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.SearchQueries._

/** The sharded (federated) text index — the 100 TB shape of the store
  * family: hash-routed independent shard stores, searched with EXACT
  * global statistics. Sharding must be a pure storage layout: every
  * federated result is pinned bit-equal to the monolithic store over
  * the same corpus, through save, routed append, and routed delete.
  */
class ShardedIndexSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def docs: DataFrame = Tables(spark, dir, "documents")

  private def asTuples(df: DataFrame): Seq[(Long, Int, Double)] =
    df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-shspec").toString + "/idx"

  private def saveSharded(corpus: DataFrame, root: String, n: Int,
      positions: Boolean = false): Unit = {
    val (p, ds) = textIndexBuild(corpus)
    textIndexSaveSharded(p, ds, root, n,
      if (positions) Some(positionalPostings(corpus)) else None)
  }

  test("federated search BIT-equals the monolithic store AND the " +
    "in-query scorer — sharding is a storage layout, not a semantics " +
    "change (global idf/avgdl/df exact across shards)") {
    val root = freshRoot(); val mono = freshRoot()
    saveSharded(docs, root, 3)
    val (p, ds) = textIndexBuild(docs)
    textIndexSave(p, ds, mono)
    val federated = asTuples(textIndexSearchSharded(spark, root))
    assert(federated == asTuples(textIndexSearch(spark, mono)))
    assert(federated == asTuples(bm25Scores(docs)))
  }

  test("routed append: shard-save half + appendSharded the rest equals " +
    "the full federation; a replayed sharded append changes nothing") {
    val root = freshRoot()
    saveSharded(docs.filter(col("doc_id") % 2 === 0), root, 3)
    textIndexAppendSharded(docs.filter(col("doc_id") % 2 =!= 0), root)
    assert(asTuples(textIndexSearchSharded(spark, root)) ==
      asTuples(bm25Scores(docs)))
    textIndexAppendSharded(docs, root) // pure replay across every shard
    assert(asTuples(textIndexSearchSharded(spark, root)) ==
      asTuples(bm25Scores(docs)))
  }

  test("routed delete: the doc vanishes and the GLOBAL statistics move; " +
    "the tombstone lands ONLY on the owning shard; deletion is sticky " +
    "across a replayed sharded append") {
    import spark.implicits._
    val root = freshRoot()
    saveSharded(docs, root, 3)
    val victim = asTuples(textIndexSearchSharded(spark, root)).head._1
    textIndexDeleteSharded(Seq(victim).toDF("doc_id"), root)
    val after = asTuples(textIndexSearchSharded(spark, root))
    assert(!after.exists(_._1 == victim))
    // not just masked: federated idf/avgdl reflect the removal exactly
    assert(after == asTuples(bm25Scores(docs.filter(col("doc_id") =!= victim))))
    // the routing also routed the tombstone: exactly one shard carries it
    val carrying = (0 to 2).count { i =>
      val p = new org.apache.hadoop.fs.Path(s"$root/shard-$i/tombstones")
      p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
    }
    assert(carrying == 1, s"$carrying shards carry the tombstone, want 1")
    textIndexAppendSharded(docs.filter(col("doc_id") === victim), root)
    assert(!asTuples(textIndexSearchSharded(spark, root)).exists(_._1 == victim))
  }

  test("the router is the commit marker: a root without one (interrupted " +
    "sharded save) refuses every verb with re-run guidance; an empty " +
    "shard refuses at save with fewer-shards guidance") {
    val root = freshRoot()
    saveSharded(docs, root, 2)
    val rp = new org.apache.hadoop.fs.Path(s"$root/router")
    rp.getFileSystem(spark.sessionState.newHadoopConf()).delete(rp, true)
    val e = intercept[IllegalArgumentException](
      textIndexSearchSharded(spark, root))
    assert(e.getMessage.contains("re-run"))
    // pigeonhole: more shards than docs guarantees an empty shard
    val tiny = docs.limit(3)
    val (p, ds) = textIndexBuild(tiny)
    val e2 = intercept[IllegalArgumentException](
      textIndexSaveSharded(p, ds, freshRoot(), 50))
    assert(e2.getMessage.contains("fewer shards"))
  }

  test("federation keeps the per-shard term pushdown: the plan carries " +
    "one term-pushed postings scan PER SHARD, never a whole-store read") {
    val root = freshRoot()
    saveSharded(docs, root, 3)
    val plan = textIndexSearchSharded(spark, root)
      .queryExecution.executedPlan.toString
    // every postings scan (each subtree copy of each shard) must carry
    // the pushed term filter, and all three shard stores must appear
    val scans = "shard-\\d/postings".r.findAllIn(plan).size
    val pushed = "PushedFilters: \\[In\\(term".r.findAllIn(plan).size
    assert(scans > 0 && pushed == scans,
      s"$pushed of $scans postings scans term-pushed:\n$plan")
    (0 to 2).foreach(i => assert(plan.contains(s"shard-$i/postings"),
      s"shard-$i postings never scanned:\n$plan"))
  }

  test("federated phrase search equals the monolithic positional store — " +
    "phrases live inside one doc, shards partition docs, so the union " +
    "of per-shard join chains loses and adds nothing") {
    val root = freshRoot(); val mono = freshRoot()
    saveSharded(docs, root, 3, positions = true)
    val (p, ds) = textIndexBuild(docs)
    textIndexSave(p, ds, mono, Some(positionalPostings(docs)))
    val fed = textIndexPhraseSearchSharded(spark, root, Seq("data", "line"))
      .orderBy("doc_id", "pos").collect().toSeq
    val one = textIndexPhraseSearch(spark, mono, Seq("data", "line"))
      .orderBy("doc_id", "pos").collect().toSeq
    assert(fed == one)
    assert(fed.nonEmpty, "fixture phrase matches nothing — weak test")
  }
}
