package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.DedupQueries._

/** The sharded signature index (q191): doc-routed federation of the
  * near-dup store. The monolithic store is the model — every probe must
  * be row-identical to the monolithic pruned probe (and to the
  * from-scratch recompute), and the routed maintenance verbs must touch
  * only the shards that own their ids.
  */
class ShardedSignatureSpec extends SparkSuite {
  import spark.implicits._

  private def oldDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs"),
    (3L, "how vexingly quick daft zebras jump today"),
    (4L, "sphinx of black quartz judge my vow now"),
    (5L, "jackdaws love my big sphinx of quartz too"),
    (6L, "bright vixens jump dozy fowl quack together"),
    (7L, "waltz bad nymph for quick jigs vex again"),
    (8L, "five quacking zephyrs jolt my wax bed daily")
  ).toDF("doc_id", "text")

  /** 101 duplicates doc 3; 102 duplicates doc 7; 103 is fresh. */
  private def increment = Seq(
    (101L, "how vexingly quick daft zebras jump today"),
    (102L, "waltz bad nymph for quick jigs vex again"),
    (103L, "an entirely fresh document with brand new content words")
  ).toDF("doc_id", "text")

  private def probeSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def shardFiles(root: String, i: Int): Set[String] =
    Option(new java.io.File(s"$root/shard-$i").listFiles())
      .fold(Set.empty[String])(_.map(_.getName).toSet)

  test("federated probe is row-identical to the monolithic pruned probe " +
    "and the from-scratch recompute, and scans only the shard stores") {
    val base = tmpDir("sigsh1")
    val mono = s"$base/mono"; val root = s"$base/sharded"
    buildSignatureIndex(oldDocs, mono)
    buildSignatureIndexSharded(oldDocs, root, nShards = 3)
    val fed = probeSignatureIndexSharded(spark, increment, root)
    assert(probeSet(fed) ==
      probeSet(probeSignatureIndexPruned(spark, increment, mono)))
    assert(probeSet(fed) == probeSet(incrementalReject(
      minhashSigs(oldDocs), minhashSigs(increment))))
    assert(probeSet(fed) == Set((101L, 3L, 1.0), (102L, 7L, 1.0)))
    val files = fed.inputFiles.mkString("\n")
    assert(files.nonEmpty && files.linesIterator.forall(_.contains("/shard-")),
      s"federated probe must scan ONLY the shard stores:\n$files")
    // the bloom prune sits in the plan (once per shard scan)
    assert(fed.queryExecution.executedPlan.toString.contains("might_contain"))
    // the scoring stage probes the shard union exchange-free: the
    // candidate side is broadcast, the stored signatures stream map-side
    PlanChecks.assertStoredSideExchangeFree(fed, "/shard-")
  }

  test("routed append makes the increment visible; routed forget touches " +
    "ONLY the owning shards' files, re-admits a fresh copy, and refuses " +
    "an emptying forget up front") {
    val base = tmpDir("sigsh2")
    val mono = s"$base/mono"; val root = s"$base/sharded"
    buildSignatureIndex(oldDocs, mono)
    buildSignatureIndexSharded(oldDocs, root, nShards = 3)
    val adm = Seq((103L, "an entirely fresh document with brand new content words"))
      .toDF("doc_id", "text")
    appendSignatureIndex(adm, mono)
    appendSignatureIndexSharded(adm, root)
    val probe2 = Seq((201L, "an entirely fresh document with brand new content words"))
      .toDF("doc_id", "text")
    assert(probeSet(probeSignatureIndexSharded(spark, probe2, root)) ==
      probeSet(probeSignatureIndexPruned(spark, probe2, mono)))
    assert(probeSet(probeSignatureIndexSharded(spark, probe2, root))
      .exists(_._2 == 103L), "appended doc must reject its copy")
    // forget 103: only its owning shard's file set may change
    val before = (0 until 3).map(i => shardFiles(root, i))
    forgetSignatureIndexSharded(spark, Seq(103L).toDF("doc_id"), root)
    val after = (0 until 3).map(i => shardFiles(root, i))
    val changed = (0 until 3).count(i => before(i) != after(i))
    assert(changed == 1,
      s"forget must rewrite exactly the owning shard, changed $changed")
    assert(probeSet(probeSignatureIndexSharded(spark, probe2, root)).isEmpty,
      "a fully forgotten doc must not reject its fresh copy")
    // emptying forget refuses up front, store unchanged
    val pre = probeSet(probeSignatureIndexSharded(spark, increment, root))
    intercept[IllegalArgumentException] {
      forgetSignatureIndexSharded(spark, (1L to 8L).toDF("doc_id"), root)
    }
    assert(probeSet(probeSignatureIndexSharded(spark, increment, root)) == pre)
  }

  test("router commit marker + compact: an interrupted build refuses " +
    "every verb; a replayed append appends NOTHING (left-anti guard) and " +
    "compact re-clusters with the probe unchanged") {
    val base = tmpDir("sigsh3")
    val root = s"$base/sharded"
    buildSignatureIndexSharded(oldDocs, root, nShards = 2)
    val adm = Seq((103L, "an entirely fresh document with brand new content words"))
      .toDF("doc_id", "text")
    appendSignatureIndexSharded(adm, root)
    val rowsOnce = (0 until 2)
      .map(i => spark.read.parquet(s"$root/shard-$i").count()).sum
    appendSignatureIndexSharded(adm, root) // replay: idempotent
    val probe2 = Seq((201L, "an entirely fresh document with brand new content words"))
      .toDF("doc_id", "text")
    val pre = probeSet(probeSignatureIndexSharded(spark, probe2, root))
    val rowsBefore = (0 until 2)
      .map(i => spark.read.parquet(s"$root/shard-$i").count()).sum
    assert(rowsBefore == rowsOnce,
      s"a replayed append must append nothing: $rowsOnce -> $rowsBefore")
    compactSignatureIndexSharded(spark, root)
    val rowsAfter = (0 until 2)
      .map(i => spark.read.parquet(s"$root/shard-$i").count()).sum
    assert(rowsAfter == rowsBefore, s"$rowsBefore -> $rowsAfter")
    assert(probeSet(probeSignatureIndexSharded(spark, probe2, root)) == pre)
    // un-commit (the crashed-rebuild state): every verb refuses
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(del); f.delete()
    }
    del(new java.io.File(s"$root/router"))
    intercept[IllegalArgumentException] {
      probeSignatureIndexSharded(spark, increment, root)
    }
    intercept[IllegalArgumentException] {
      appendSignatureIndexSharded(adm, root)
    }
    // empty-shard refusal: 2 docs cannot populate 64 shards
    intercept[IllegalArgumentException] {
      buildSignatureIndexSharded(oldDocs.limit(2), s"$base/tiny", 64)
    }
  }

  test("CDC maintenance: an append window then a delete->forget window " +
    "leave the sharded index BIT-equal to a fresh sharded build of " +
    "read(toRev); replaying a window changes nothing; a single window's " +
    "append-then-delete rows never enter the index") {
    import graft.operators.VersionedStore
    val base = tmpDir("sigsh4")
    val store = s"$base/corpus"; val root = s"$base/sig"
    val boot = oldDocs.filter(col("doc_id") <= 5)
    val rest = oldDocs.filter(col("doc_id") > 5)
    val extras = oldDocs.filter(col("doc_id") <= 2)
      .withColumn("doc_id", col("doc_id") + 1000L)
    val r1 = VersionedStore.save(Map("docs" -> boot), store)
    buildSignatureIndexSharded(
      VersionedStore.read(spark, store, "docs", Some(r1)), root, 3)
    val r2 = VersionedStore.append(
      Map("docs" -> rest.unionByName(extras)), store)
    maintainSignatureIndexShardedFromStore(spark, store, "docs", r1, r2, root)
    // window 1 admitted the extras: their signature rows are in the shards
    assert((0 until 3).map(i => spark.read.parquet(s"$root/shard-$i")
      .filter(col("doc_id") >= 1000L).count()).sum == 2,
      "the append window must admit the extras")
    val r3 = VersionedStore.delete(extras.select("doc_id"), "docs", store)
    maintainSignatureIndexShardedFromStore(spark, store, "docs", r2, r3, root)
    def content(p: String): Seq[Set[Seq[Any]]] = (0 until 3).map(i =>
      spark.read.parquet(s"$p/shard-$i").collect().map(_.toSeq).toSet)
    val fresh = s"$base/fresh"
    buildSignatureIndexSharded(
      VersionedStore.read(spark, store, "docs", Some(r3)), fresh, 3)
    assert(content(root) == content(fresh),
      "maintained shards must bit-equal a fresh build of read(toRev)")
    // replays: the last window, and the whole span (whose netting makes
    // the extras invisible on both sides) — nothing changes
    maintainSignatureIndexShardedFromStore(spark, store, "docs", r2, r3, root)
    maintainSignatureIndexShardedFromStore(spark, store, "docs", r1, r3, root)
    assert(content(root) == content(fresh))
    // single-window netting: a second index maintained over r1 -> r3 in
    // ONE call never even encodes the extras
    val direct = s"$base/direct"
    buildSignatureIndexSharded(
      VersionedStore.read(spark, store, "docs", Some(r1)), direct, 3)
    maintainSignatureIndexShardedFromStore(spark, store, "docs", r1, r3, direct)
    assert(content(direct) == content(fresh))
    assert((0 until 3).forall(i => spark.read.parquet(s"$direct/shard-$i")
      .filter(col("doc_id") >= 1000L).isEmpty))
  }

  test("sync: bootstrap builds the federation and checkpoints; one call " +
    "absorbs pending revisions bit-equal to a fresh build; no-op when " +
    "current; a marker tracking another store refuses") {
    import graft.operators.VersionedStore
    val base = tmpDir("sigsync")
    val store = s"$base/corpus"; val root = s"$base/sig"
    VersionedStore.save(Map("docs" -> oldDocs.filter(col("doc_id") <= 5)), store)
    assert(syncSignatureIndexShardedWithStore(
      spark, store, "docs", root).isDefined)
    assert(syncSignatureIndexShardedWithStore(
      spark, store, "docs", root).isEmpty)
    VersionedStore.append(
      Map("docs" -> oldDocs.filter(col("doc_id") > 5)), store)
    val r3 = VersionedStore.delete(
      oldDocs.filter(col("doc_id") === 2).select("doc_id"), "docs", store)
    assert(syncSignatureIndexShardedWithStore(
      spark, store, "docs", root).isDefined)
    val fresh = s"$base/fresh"
    buildSignatureIndexSharded(
      VersionedStore.read(spark, store, "docs", Some(r3)), fresh, 3)
    def content(p: String): Seq[Set[Seq[Any]]] = (0 until 3).map(i =>
      spark.read.parquet(s"$p/shard-$i").collect().map(_.toSeq).toSet)
    assert(content(root) == content(fresh))
    val store2 = s"$base/corpus2"
    VersionedStore.save(Map("docs" -> oldDocs), store2)
    val e = intercept[IllegalArgumentException] {
      syncSignatureIndexShardedWithStore(spark, store2, "docs", root)
    }
    assert(e.getMessage.contains("mix corpora"))
  }

  test("rebuilding with FEWER shards drops the orphaned higher-numbered " +
    "dirs (a forgotten doc's rows must not survive on disk); a crashed " +
    "mid-loop forget replays from its intent at the next mutation verb") {
    val base = tmpDir("sigsh5")
    val root = s"$base/sharded"
    buildSignatureIndexSharded(oldDocs, root, nShards = 3)
    assert(new java.io.File(s"$root/shard-2").exists())
    buildSignatureIndexSharded(oldDocs, root, nShards = 2)
    assert(!new java.io.File(s"$root/shard-2").exists(),
      "a 2-shard rebuild must not orphan the 3-shard layout's dirs")
    assert(probeSet(probeSignatureIndexSharded(spark, increment, root)) ==
      probeSet(incrementalReject(minhashSigs(oldDocs), minhashSigs(increment))))
    // crashed forget: intent persisted, no shard rewritten (the crash
    // right after the intent write) — the next mutation verb replays it
    graft.operators.StoreRewrite.atomicOverwrite(
      Seq(3L).toDF("doc_id"), s"$root/_forget_intent")
    appendSignatureIndexSharded(
      Seq((300L, "totally different content for shard health")).toDF("doc_id", "text"),
      root)
    assert(!new java.io.File(s"$root/_forget_intent").exists(),
      "the replayed intent must be cleared")
    assert((0 until 2).map(i => spark.read.parquet(s"$root/shard-$i")
      .filter(col("doc_id") === 3L).count()).sum == 0,
      "the crashed forget's doomed id must be physically gone")
    // the doc's fresh copy re-admits (forget semantics, not delete)
    val copy = Seq((301L, "how vexingly quick daft zebras jump today"))
      .toDF("doc_id", "text")
    assert(probeSet(probeSignatureIndexSharded(spark, copy, root)).isEmpty)
  }
}
