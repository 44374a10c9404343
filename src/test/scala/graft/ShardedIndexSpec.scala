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

  test("federated proximity search equals the monolithic positional " +
    "store — NEAR pairs two positions of one doc, shards partition " +
    "docs, so the banded semi-joins never cross shards") {
    val root = freshRoot(); val mono = freshRoot()
    saveSharded(docs, root, 3, positions = true)
    val (p, ds) = textIndexBuild(docs)
    textIndexSave(p, ds, mono, Some(positionalPostings(docs)))
    for (w <- Seq(1, 3, 8)) {
      val fed = textIndexProximitySearchSharded(spark, root, "data", "line", w)
        .orderBy("doc_id", "pos").collect().toSeq
      val one = textIndexProximitySearch(spark, mono, "data", "line", w)
        .orderBy("doc_id", "pos").collect().toSeq
      assert(fed == one, s"window=$w")
      if (w >= 3) assert(fed.nonEmpty,
        s"fixture proximity (w=$w) matches nothing — weak test")
    }
  }

  test("federated champion layer: ONE root-level election under GLOBAL " +
    "statistics is bit-equal to the monolithic store's lists and search; " +
    "candidates come off the stored heads; a deeper m than elected falls " +
    "back to recompute, still exact") {
    import spark.implicits._
    val root = freshRoot(); val mono = freshRoot()
    saveSharded(docs, root, 3)
    val (p, ds) = textIndexBuild(docs)
    textIndexSave(p, ds, mono)
    textIndexChampionsSave(spark, mono, 10)
    textIndexChampionsSaveSharded(spark, root, 10)
    val queryTerms = Seq("spark", "window", "hash")
    def lists(path: String) = spark.read.parquet(s"$path/champions")
      .filter(col("term").isin(queryTerms: _*))
      .select("term", "doc_id", "tscore", "rank")
      .orderBy("term", "rank").collect().toSeq
    assert(lists(root) == lists(mono),
      "root-level election must bit-equal the monolithic election")
    val fed = asTuples(textIndexChampionSearchSharded(spark, root, m = 10))
    assert(fed == asTuples(textIndexChampionSearch(spark, mono, m = 10)))
    // the stored heads are actually USED: the root champions relation
    // appears in the search's file scans
    val files = textIndexChampionSearchSharded(spark, root, m = 10)
      .inputFiles.mkString("\n")
    assert(files.contains("/champions"),
      s"candidates must come off the stored heads:\n$files")
    // deeper m than elected: fallback recompute, results still exact
    assert(asTuples(textIndexChampionSearchSharded(spark, root, m = 40))
      == asTuples(textIndexChampionSearch(spark, mono, m = 40)))
  }

  test("federated champion maintenance: routed append re-elects the " +
    "batch terms under the GROWN federation, routed delete's tombstone " +
    "masks stale heads, forget sheds + re-elects — search stays exact " +
    "throughout") {
    import spark.implicits._
    val root = freshRoot()
    val half = docs.filter(col("doc_id") % 2 === 0)
    saveSharded(half, root, 3)
    textIndexChampionsSaveSharded(spark, root, 10)
    textIndexAppendSharded(
      docs.filter(col("doc_id") % 2 =!= 0).select("doc_id", "text"), root)
    val queryTerms = Seq("spark", "window", "hash")
    // batch terms' stored lists equal a fresh federated election
    val stored = spark.read.parquet(s"$root/champions")
      .filter(col("term").isin(queryTerms: _*))
      .select("term", "doc_id", "tscore", "rank")
      .orderBy("term", "rank").collect().toSeq
    val fresh = freshRoot()
    saveSharded(docs, fresh, 3)
    textIndexChampionsSaveSharded(spark, fresh, 10)
    val want = spark.read.parquet(s"$fresh/champions")
      .filter(col("term").isin(queryTerms: _*))
      .select("term", "doc_id", "tscore", "rank")
      .orderBy("term", "rank").collect().toSeq
    assert(stored == want,
      "appendSharded left the batch terms' root lists stale")
    // exactness against the unpruned federated search, then delete the
    // top doc: the tombstone must mask its stale head row immediately
    val exact0 = asTuples(textIndexSearchSharded(spark, root))
      .map(t => t._1 -> t).toMap
    asTuples(textIndexChampionSearchSharded(spark, root, m = 10))
      .foreach(t => assert(exact0(t._1) == t))
    val victim = textIndexSearchSharded(spark, root)
      .orderBy(col("score").desc, col("doc_id").asc).head.getLong(0)
    textIndexDeleteSharded(Seq(victim).toDF("doc_id"), root)
    val afterDel = asTuples(textIndexChampionSearchSharded(spark, root, m = 10))
    assert(!afterDel.exists(_._1 == victim),
      "a deleted doc re-entered via its stale champion head")
    // forget a different doc: its rows leave the lists physically
    val victim2 = afterDel.map(_._1).head
    textIndexForgetSharded(Seq(victim2).toDF("doc_id"), root)
    assert(spark.read.parquet(s"$root/champions")
      .filter(col("doc_id") === victim2).count() == 0,
      "forget must shed the forgotten doc's champion rows")
    val exact1 = asTuples(textIndexSearchSharded(spark, root))
      .map(t => t._1 -> t).toMap
    asTuples(textIndexChampionSearchSharded(spark, root, m = 10))
      .foreach(t => assert(exact1(t._1) == t))
  }

  test("routed forget: physical removal touches ONLY the owning shard, " +
    "the global statistics move, and a re-submitted copy RE-ADMITS " +
    "through the router — the contrast to routed delete's sticky " +
    "tombstone, federated") {
    import spark.implicits._
    val root = freshRoot()
    saveSharded(docs, root, 3)
    def shardDocCount(i: Int): Long =
      spark.read.parquet(s"${textIndexShardStorePath(root, i)}/docstats").count()
    val before = (0 to 2).map(shardDocCount)
    val victim = asTuples(textIndexSearchSharded(spark, root)).head._1
    textIndexForgetSharded(Seq(victim).toDF("doc_id"), root)
    val after = (0 to 2).map(shardDocCount)
    assert(before.zip(after).count { case (b, a) => a == b - 1 } == 1 &&
      before.zip(after).count { case (b, a) => a == b } == 2,
      s"forget rewrote the wrong shards: $before -> $after")
    assert(asTuples(textIndexSearchSharded(spark, root)) ==
      asTuples(bm25Scores(docs.filter(col("doc_id") =!= victim))))
    textIndexAppendSharded(docs.filter(col("doc_id") === victim), root)
    assert(asTuples(textIndexSearchSharded(spark, root)) ==
      asTuples(bm25Scores(docs)))
  }

  test("sharded compact: per-shard layout jobs leave the federated " +
    "search BIT-equal and every shard's postings files term-disjoint") {
    import spark.implicits._
    val root = freshRoot()
    saveSharded(docs.filter(col("doc_id") % 2 === 0), root, 3)
    textIndexAppendSharded(docs.filter(col("doc_id") % 2 =!= 0), root)
    val victim = asTuples(textIndexSearchSharded(spark, root)).head._1
    textIndexDeleteSharded(Seq(victim).toDF("doc_id"), root)
    val before = asTuples(textIndexSearchSharded(spark, root))
    textIndexCompactSharded(spark, root)
    assert(asTuples(textIndexSearchSharded(spark, root)) == before)
    def overlaps(i: Int): Int = {
      val rs = new java.io.File(s"${textIndexShardStorePath(root, i)}/postings")
        .listFiles.toSeq
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
        .flatMap { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(min("term"), max("term")).head
          if (r.isNullAt(0)) None else Some((r.getString(0), r.getString(1)))
        }
      rs.sortBy(_._1).sliding(2).count {
        case Seq(a, b) => b._1 <= a._2
        case _ => false
      }
    }
    (0 to 2).foreach(i => assert(overlaps(i) == 0,
      s"shard-$i postings files still hold overlapping term ranges"))
  }

  test("sharded ingest heals shards INDEPENDENTLY: crash residue on one " +
    "shard is recovered by the next batch (even an empty one) while the " +
    "other shards' appends land — then streaming e2e equals from-scratch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = freshRoot()
    graft.streaming.TextIngest.bootstrapSharded(
      docs.filter(col("doc_id") % 2 === 0), root, 2)
    // crash-inject into shard-0 ONLY: an increment's postings landed,
    // docstats didn't, the _inflight marker is still on disk
    val s0 = textIndexShardStorePath(root, 0)
    val inc = docs.filter(col("doc_id") % 2 =!= 0).select("doc_id", "text")
    val (pInc, _) = textIndexBuild(inc.limit(5))
    pInc.write.mode("append").parquet(s"$s0/postings")
    assert(new java.io.File(s"$s0/_inflight").createNewFile())
    intercept[IllegalArgumentException] { textIndexLoad(spark, s0) }
    // an EMPTY batch must still heal the broken shard
    graft.streaming.TextIngest.ingestBatchSharded(inc.limit(0), root)
    assert(!textIndexInflightSharded(spark, root))
    assert(asTuples(textIndexSearchSharded(spark, root)) ==
      asTuples(bm25Scores(docs.filter(col("doc_id") % 2 === 0))))
    // streaming e2e over the healed federation
    val input = MemoryStream[(Long, String)](spark)
    val q = graft.streaming.TextIngest.startSharded(
      input.toDF().toDF("doc_id", "text"), root, tmpDir("shingest-ckpt"))
    try {
      val rest = inc.as[(Long, String)].collect()
      val (b1, b2) = rest.splitAt(rest.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    assert(asTuples(textIndexSearchSharded(spark, root)) ==
      asTuples(bm25Scores(docs)))
  }
}
