package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.SearchQueries._
import graft.streaming.TextIngest

/** The text-index streaming ingest loop: incremental ingest equals the
  * from-scratch build, replays are no-ops, and every single-crash state
  * inside an append or forget is repaired by textIndexRecover with the
  * action named — the 8th family's exactly-once story.
  */
class TextIngestSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def docs: DataFrame = Tables(spark, dir, "documents")

  private def asTuples(df: DataFrame): Seq[(Long, Int, Double)] =
    df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft-tingest").toString + "/idx"

  test("streaming e2e: bootstrap + two micro-batches equals the " +
    "from-scratch build of the whole corpus") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = freshPath()
    TextIngest.bootstrap(docs.filter(col("doc_id") % 3 === 0), path)
    val input = MemoryStream[(Long, String)](spark)
    val q = TextIngest.start(input.toDF().toDF("doc_id", "text"), path,
      tmpDir("tingest-ckpt"))
    try {
      val rest = docs.filter(col("doc_id") % 3 =!= 0)
        .select("doc_id", "text").as[(Long, String)].collect()
      val (b1, b2) = rest.splitAt(rest.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val full = freshPath()
    val (p, ds) = textIndexBuild(docs)
    textIndexSave(p, ds, full)
    assert(asTuples(textIndexSearch(spark, path)) ==
      asTuples(textIndexSearch(spark, full)))
  }

  test("replayed batch is a no-op; a crash between the append's two " +
    "store writes is rolled back by recover and the replay lands whole") {
    val path = freshPath()
    TextIngest.bootstrap(docs.filter(col("doc_id") % 2 === 0), path)
    val inc = docs.filter(col("doc_id") % 2 =!= 0).select("doc_id", "text")
    TextIngest.ingestBatch(inc, path)
    val want = asTuples(textIndexSearch(spark, path))
    // replay: already-indexed docs are dropped by the probe
    TextIngest.ingestBatch(inc, path)
    assert(asTuples(textIndexSearch(spark, path)) == want)

    // a clean batch leaves no intent marker behind
    assert(!textIndexInflight(spark, path))

    // crash simulation on a fresh store: postings of an increment land,
    // docstats never do, and the _inflight marker is still on disk (a
    // real crash leaves it — the verbs clear it only after their last
    // write). The NEXT ingestBatch must self-heal (marker -> recover ->
    // rollback) and then apply the batch whole.
    val path2 = freshPath()
    TextIngest.bootstrap(docs.filter(col("doc_id") % 2 === 0), path2)
    val (pInc, _) = textIndexBuild(inc)
    pInc.write.mode("append").parquet(s"$path2/postings")
    assert(new java.io.File(s"$path2/_inflight").createNewFile())
    intercept[IllegalArgumentException] { textIndexLoad(spark, path2) }
    TextIngest.ingestBatch(inc, path2)
    assert(asTuples(textIndexSearch(spark, path2)) == want)
    assert(!textIndexInflight(spark, path2))
  }

  test("a crash after docstats but before the meta rewrite is healed " +
    "as a meta recompute; a crash inside forget finishes the shed") {
    val path = freshPath()
    TextIngest.bootstrap(docs.filter(col("doc_id") % 2 === 0), path)
    val inc = docs.filter(col("doc_id") % 2 =!= 0).select("doc_id", "text")
    // append's two store writes landed, meta didn't
    val (pInc, dInc) = textIndexBuild(inc)
    pInc.write.mode("append").parquet(s"$path/postings")
    dInc.write.mode("append").parquet(s"$path/docstats")
    intercept[IllegalArgumentException] { textIndexLoad(spark, path) }
    assert(textIndexRecover(spark, path) == "meta")
    val full = freshPath()
    val (pf, df_) = textIndexBuild(docs)
    textIndexSave(pf, df_, full)
    assert(asTuples(textIndexSearch(spark, path)) ==
      asTuples(textIndexSearch(spark, full)))
    // replay after the heal: no-op
    TextIngest.ingestBatch(inc, path)
    assert(asTuples(textIndexSearch(spark, path)) ==
      asTuples(textIndexSearch(spark, full)))

    // forget crash: postings shed, docstats not — recover finishes
    val victim = asTuples(textIndexSearch(spark, path)).head._1
    val shed = spark.read.parquet(s"$path/postings")
      .filter(col("doc_id") =!= victim).localCheckpoint(true)
    graft.operators.StoreRewrite.atomicOverwrite(shed, s"$path/postings")
    intercept[IllegalArgumentException] { textIndexLoad(spark, path) }
    assert(textIndexRecover(spark, path) == "forget-finish+meta")
    assert(asTuples(textIndexSearch(spark, path)) ==
      asTuples(bm25Scores(docs.filter(col("doc_id") =!= victim))))
  }

  test("a forget that crashes at ANY point — even the late state where " +
    "the stores are already consistent and only the tombstone removal " +
    "is pending — is replayed wholesale from the persisted intent; an " +
    "unrelated earlier delete survives the replay") {
    import spark.implicits._
    val path = freshPath()
    TextIngest.bootstrap(docs, path)
    val top = asTuples(textIndexSearch(spark, path)).map(_._1)
    val (deleted, forgotten) = (top.head, top(1))
    textIndexDelete(Seq(deleted).toDF("doc_id"), path)
    textIndexDelete(Seq(forgotten).toDF("doc_id"), path)
    // crash at the forget's FIRST possible point: intent + inflight are
    // on disk, the stores untouched — without the intent this state (and
    // every later one, including after the meta rewrite when no pairing
    // stamp fires) would recover as "none" and strand the tombstone
    graft.operators.StoreRewrite.atomicOverwrite(
      Seq(forgotten).toDF("doc_id"), s"$path/_forget_intent")
    assert(new java.io.File(s"$path/_inflight").createNewFile())
    assert(textIndexRecover(spark, path) == "forget-replay")
    assert(!textIndexInflight(spark, path))
    assert(!new java.io.File(s"$path/_forget_intent").exists())
    val after = asTuples(textIndexSearch(spark, path))
    assert(after == asTuples(bm25Scores(
      docs.filter(col("doc_id") =!= deleted && col("doc_id") =!= forgotten))))
    // the replayed forget removed ONLY its own tombstone: the forgotten
    // doc re-admits, the earlier delete stays sticky
    TextIngest.ingestBatch(
      docs.filter(col("doc_id").isin(deleted, forgotten))
        .select("doc_id", "text"), path)
    val readd = asTuples(textIndexSearch(spark, path))
    assert(readd.exists(_._1 == forgotten) && !readd.exists(_._1 == deleted))
  }

  test("an EMPTY micro-batch still heals crash residue: the store is " +
    "loadable again without waiting for a non-empty batch") {
    val path = freshPath()
    TextIngest.bootstrap(docs.filter(col("doc_id") % 2 === 0), path)
    val inc = docs.filter(col("doc_id") % 2 =!= 0).select("doc_id", "text")
    val (pInc, _) = textIndexBuild(inc)
    pInc.write.mode("append").parquet(s"$path/postings")
    assert(new java.io.File(s"$path/_inflight").createNewFile())
    intercept[IllegalArgumentException] { textIndexLoad(spark, path) }
    TextIngest.ingestBatch(inc.limit(0), path)
    assert(!textIndexInflight(spark, path))
    textIndexLoad(spark, path) // loads clean again
    assert(asTuples(textIndexSearch(spark, path)) ==
      asTuples(bm25Scores(docs.filter(col("doc_id") % 2 === 0))))
  }

  test("positions parity: a bootstrap with positions is maintained per " +
    "micro-batch by the SAME loop; a crash that orphans a half-appended " +
    "positions relation (positions land first) is rolled back and the " +
    "replay converges — store-served phrase results equal the " +
    "from-scratch build throughout") {
    import spark.implicits._
    val phrase = Seq("data", "line")
    def phraseSet(path: String): Set[(Long, Int)] =
      textIndexPhraseSearch(spark, path, phrase)
        .select("doc_id", "pos").as[(Long, Int)].collect().toSet
    val full = freshPath()
    TextIngest.bootstrap(docs, full, withPositions = true)
    // incremental ingest equals the full build
    val path = freshPath()
    TextIngest.bootstrap(docs.filter(col("doc_id") % 2 === 0), path,
      withPositions = true)
    val inc = docs.filter(col("doc_id") % 2 =!= 0).select("doc_id", "text")
    TextIngest.ingestBatch(inc, path)
    assert(phraseSet(path) == phraseSet(full))
    // crash: the increment's POSITIONS land, postings/docstats never do
    val path2 = freshPath()
    TextIngest.bootstrap(docs.filter(col("doc_id") % 2 === 0), path2,
      withPositions = true)
    positionalPostings(inc).write.mode("append").parquet(s"$path2/positions")
    assert(new java.io.File(s"$path2/_inflight").createNewFile())
    intercept[IllegalArgumentException] {
      textIndexPhraseSearch(spark, path2, phrase).count()
    }
    TextIngest.ingestBatch(inc, path2)
    assert(phraseSet(path2) == phraseSet(full))
    assert(!textIndexInflight(spark, path2))
    // and the BM25 side never diverged either
    assert(asTuples(textIndexSearch(spark, path2)) ==
      asTuples(textIndexSearch(spark, full)))
  }

  test("a champions rewrite that crashed between target delete and tmp " +
    "rename (complete __rewrite_tmp, no champions dir) is healed by " +
    "recover — the persisted lists return instead of being silently " +
    "lost to the fallback recompute forever") {
    val path = freshPath()
    TextIngest.bootstrap(docs, path)
    textIndexChampionsSave(spark, path, 10)
    val before = spark.read.parquet(s"$path/champions")
      .orderBy("term", "rank").collect().toSeq
    // crash injection: the atomicOverwrite state after the target delete,
    // before the rename — the full rewritten relation sits at the tmp path
    val cp = new java.io.File(s"$path/champions")
    val tmp = new java.io.File(
      s"$path/champions${graft.operators.StoreRewrite.TmpSuffix}")
    assert(cp.renameTo(tmp))
    assert(textIndexRecover(spark, path) == "none") // derived data: no action name
    assert(cp.exists() && !tmp.exists(),
      "recover must finish the champions rename")
    val after = spark.read.parquet(s"$path/champions")
      .orderBy("term", "rank").collect().toSeq
    assert(after == before)
  }

  test("an inflight marker with NO forget intent (the forget crashed " +
    "between its marker and intent writes) recovers as a clean no-op — " +
    "the marker-first order makes that crash state benign AND visible " +
    "to the loop's O(1) probe") {
    val path = freshPath()
    TextIngest.bootstrap(docs, path)
    val before = asTuples(textIndexSearch(spark, path))
    assert(new java.io.File(s"$path/_inflight").createNewFile())
    assert(textIndexInflight(spark, path),
      "the loop's probe must SEE this crash state — the old intent-first " +
        "order left the dual state (intent, no marker) invisible")
    assert(textIndexRecover(spark, path) == "none")
    assert(!textIndexInflight(spark, path))
    assert(asTuples(textIndexSearch(spark, path)) == before)
  }

  test("champions parity: the ingest loop maintains the champions layer " +
    "per micro-batch — batch terms' stored lists equal a fresh election " +
    "over the grown corpus, and the champion search stays exact") {
    val path = freshPath()
    TextIngest.bootstrap(docs.filter(col("doc_id") % 2 === 0), path)
    textIndexChampionsSave(spark, path, 10)
    TextIngest.ingestBatch(
      docs.filter(col("doc_id") % 2 =!= 0).select("doc_id", "text"), path)
    val queryTerms = Seq("spark", "window", "hash")
    val stored = spark.read.parquet(s"$path/champions")
      .filter(col("term").isin(queryTerms: _*))
      .select("term", "doc_id", "tscore", "rank")
      .orderBy("term", "rank").collect().toSeq
    val fresh = textIndexChampions(spark, path, 10)
      .filter(col("term").isin(queryTerms: _*))
      .orderBy("term", "rank").collect().toSeq
    assert(stored == fresh,
      "streamed batch left the batch terms' champion lists stale")
    val exact = asTuples(textIndexSearch(spark, path)).map(t => t._1 -> t).toMap
    asTuples(textIndexChampionSearch(spark, path, m = 10))
      .foreach(t => assert(exact(t._1) == t))
  }

  test("a DOUBLED append (direct textIndexAppend retried after a crash " +
    "between its postings and docstats writes) is healed by lossless " +
    "duplicate-row removal on BOTH the postings and positions relations " +
    "— the store converges to the clean incremental state") {
    import spark.implicits._
    val phrase = Seq("data", "line")
    val clean = freshPath(); val path = freshPath()
    TextIngest.bootstrap(docs, clean, withPositions = true)
    TextIngest.bootstrap(docs.filter(col("doc_id") % 2 === 0), path,
      withPositions = true)
    val inc = docs.filter(col("doc_id") % 2 =!= 0).select("doc_id", "text")
    // crash after positions+postings, before docstats...
    val (pInc, _) = textIndexBuild(inc)
    positionalPostings(inc).write.mode("append").parquet(s"$path/positions")
    pInc.write.mode("append").parquet(s"$path/postings")
    // ...then the caller retries the append DIRECTLY (not via the ingest
    // loop): the probe reads docstats (which lacks the increment), so
    // the whole increment lands a SECOND time
    textIndexAppend(inc, path)
    intercept[IllegalArgumentException] { textIndexLoad(spark, path) }
    val action = textIndexRecover(spark, path)
    assert(action.contains("postings-dedup") &&
      action.contains("positions-dedup"), s"unexpected repair: $action")
    assert(asTuples(textIndexSearch(spark, path)) ==
      asTuples(textIndexSearch(spark, clean)))
    def phraseSet(p: String): Set[(Long, Int)] =
      textIndexPhraseSearch(spark, p, phrase)
        .select("doc_id", "pos").as[(Long, Int)].collect().toSet
    assert(phraseSet(path) == phraseSet(clean))
  }

  test("a store broken in BOTH directions is not a single-crash state " +
    "and recover refuses with a rebuild message") {
    import spark.implicits._
    val path = freshPath()
    TextIngest.bootstrap(docs.filter(col("doc_id") % 2 === 0), path)
    // orphan postings (append residue) AND an unposted docstats row
    // (forget residue) at once
    val (pInc, _) = textIndexBuild(
      docs.filter(col("doc_id") % 2 =!= 0).limit(3))
    pInc.write.mode("append").parquet(s"$path/postings")
    Seq((999999999L, 7)).toDF("doc_id", "dl")
      .write.mode("append").parquet(s"$path/docstats")
    val e = intercept[IllegalArgumentException] {
      textIndexRecover(spark, path)
    }
    assert(e.getMessage.contains("rebuild"))
  }
}
