package graft

import org.apache.spark.sql.DataFrame
import graft.queries.DedupQueries._

/** The sharded winnow-fingerprint index (q188): federation is a storage
  * layout, never a semantics change. The monolithic store IS the model —
  * every test drives the same verbs against both and pins the probes
  * equal, including a seeded random interleaving.
  */
class ShardedWinnowSpec extends SparkSuite {
  import spark.implicits._

  private val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi",
    "omicron", "pi", "rho", "sigma", "tau", "upsilon")

  private val shared = "one two three four five six seven eight nine"

  /** Deterministic ≥10-token documents; every doc shares the 9-token
    * span with its (id % 4 == 0) siblings so cross-doc matches exist.
    */
  private def mkDoc(id: Long): (Long, String) = {
    val own = (0 until 10).map(j => vocab(((id * 7 + j * 3) % 20).toInt))
    val text = if (id % 4 == 0) s"${own.take(4).mkString(" ")} $shared " +
      own.drop(4).mkString(" ")
    else own.mkString(" ")
    (id, text)
  }

  private def docs(ids: Seq[Long]): DataFrame = ids.map(mkDoc).toDF("doc_id", "text")

  private def probeSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("federated probe is row-identical to the monolithic store probe " +
    "across cap/minShared settings, and its only file scans are the " +
    "shard stores — never the corpus") {
    val base = tmpDir("winsh1")
    val mono = s"$base/mono"
    val root = s"$base/sharded"
    val corpus = docs(1L to 40L)
    val inc = docs(Seq(100L, 101L, 104L)) // 100,104 share the span; 101 fresh
    buildWinnowIndex(corpus, mono)
    buildWinnowIndexSharded(corpus, root, nShards = 3)
    for (cap <- Seq(1, 300); ms <- Seq(1, 2)) {
      val m = probeSet(probeWinnowIndex(spark, inc, mono, dfCap = cap,
        minShared = ms))
      val f = probeSet(probeWinnowIndexSharded(spark, inc, root,
        dfCap = cap, minShared = ms))
      assert(f == m, s"dfCap=$cap minShared=$ms: sharded $f != mono $m")
    }
    val fed = probeWinnowIndexSharded(spark, inc, root, minShared = 1)
    assert(probeSet(fed).nonEmpty, "the fixture must produce matches")
    val files = fed.inputFiles.mkString("\n")
    assert(files.nonEmpty && files.linesIterator.forall(_.contains("/shard-")),
      s"federated probe must scan ONLY the shard stores:\n$files")
  }

  test("routed append and all-shard forget mirror the monolithic verbs; " +
    "a forgotten doc's fresh copy re-admits through the federation") {
    val base = tmpDir("winsh2")
    val mono = s"$base/mono"
    val root = s"$base/sharded"
    val corpus = docs(1L to 30L)
    buildWinnowIndex(corpus, mono)
    buildWinnowIndexSharded(corpus, root, nShards = 3)
    val incA = docs(Seq(200L, 204L))
    appendWinnowIndex(incA, mono)
    appendWinnowIndexSharded(incA, root)
    val probe = docs(Seq(300L, 304L))
    assert(probeSet(probeWinnowIndexSharded(spark, probe, root, minShared = 1))
      == probeSet(probeWinnowIndex(spark, probe, mono, minShared = 1)))
    // the appended docs are now visible old-side matches
    assert(probeSet(probeWinnowIndexSharded(spark, probe, root, minShared = 1))
      .exists(_._2 == 204L))
    forgetWinnowIndex(spark, Seq(204L).toDF("doc_id"), mono)
    forgetWinnowIndexSharded(spark, Seq(204L).toDF("doc_id"), root)
    val afterM = probeSet(probeWinnowIndex(spark, probe, mono, minShared = 1))
    val afterF = probeSet(probeWinnowIndexSharded(spark, probe, root, minShared = 1))
    assert(afterF == afterM)
    assert(!afterF.exists(_._2 == 204L),
      "a forgotten doc must not reject fresh copies")
    // re-admission: the same content appended again is matched again
    appendWinnowIndexSharded(docs(Seq(204L)), root)
    assert(probeSet(probeWinnowIndexSharded(spark, probe, root, minShared = 1))
      .exists(_._2 == 204L))
  }

  test("the router is the commit marker: an interrupted build (no router) " +
    "refuses every verb; the build refuses shards that would be empty; " +
    "a forget that would empty a shard refuses up front, store unchanged") {
    val base = tmpDir("winsh3")
    val root = s"$base/sharded"
    buildWinnowIndexSharded(docs(1L to 20L), root, nShards = 2)
    // simulate the crash: a rebuild un-commits the router, then dies
    val rf = new java.io.File(s"$root/router")
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(del); f.delete()
    }
    del(rf)
    intercept[IllegalArgumentException] {
      probeWinnowIndexSharded(spark, docs(Seq(100L)), root)
    }
    intercept[IllegalArgumentException] {
      appendWinnowIndexSharded(docs(Seq(100L)), root)
    }
    // empty-shard refusal: one short doc has a handful of fingerprints,
    // far fewer than 64 shards
    intercept[IllegalArgumentException] {
      buildWinnowIndexSharded(docs(Seq(1L)), s"$base/tiny", nShards = 64)
    }
    // rebuild the 2-shard store with one extra document of EXACTLY
    // k + w - 1 = 8 tokens — one full window, hence exactly ONE
    // fingerprint, which lives in exactly one shard. Forgetting every
    // other doc must empty the other shard -> up-front refusal, probes
    // unchanged afterwards
    val oneFp = Seq((21L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    buildWinnowIndexSharded(docs(1L to 20L).unionByName(oneFp), root,
      nShards = 2)
    val before = probeSet(probeWinnowIndexSharded(spark, docs(Seq(100L)),
      root, minShared = 1))
    intercept[IllegalArgumentException] {
      forgetWinnowIndexSharded(spark, (1L to 20L).toDF("doc_id"), root)
    }
    assert(probeSet(probeWinnowIndexSharded(spark, docs(Seq(100L)), root,
      minShared = 1)) == before, "the refused forget must not mutate shards")
  }

  test("seeded random verb interleaving (append / doubled append / forget " +
    "/ compact) keeps the federation probe-equal to the monolithic model " +
    "after EVERY verb") {
    val base = tmpDir("winsh4")
    val mono = s"$base/mono"
    val root = s"$base/sharded"
    buildWinnowIndex(docs(1L to 24L), mono)
    buildWinnowIndexSharded(docs(1L to 24L), root, nShards = 3)
    val rnd = new scala.util.Random(20260815L)
    var nextId = 400L
    var live = (1L to 24L).toVector
    val probe = docs(Seq(900L, 904L))
    (1 to 10).foreach { step =>
      rnd.nextInt(4) match {
        case 0 => // append a fresh doc
          val d = docs(Seq(nextId)); nextId += 4
          appendWinnowIndex(d, mono); appendWinnowIndexSharded(d, root)
          live :+= d.head.getLong(0)
        case 1 => // doubled append (replayed ingest)
          val d = docs(Seq(nextId)); nextId += 4
          appendWinnowIndex(d, mono); appendWinnowIndex(d, mono)
          appendWinnowIndexSharded(d, root); appendWinnowIndexSharded(d, root)
          live :+= d.head.getLong(0)
        case 2 => // forget one random live doc (never the last few)
          if (live.size > 6) {
            val id = live(rnd.nextInt(live.size))
            forgetWinnowIndex(spark, Seq(id).toDF("doc_id"), mono)
            forgetWinnowIndexSharded(spark, Seq(id).toDF("doc_id"), root)
            live = live.filterNot(_ == id)
          }
        case 3 =>
          compactWinnowIndex(spark, mono)
          compactWinnowIndexSharded(spark, root)
      }
      val m = probeSet(probeWinnowIndex(spark, probe, mono, minShared = 1))
      val f = probeSet(probeWinnowIndexSharded(spark, probe, root, minShared = 1))
      assert(f == m, s"step $step: sharded $f != mono $m")
    }
  }

  test("CDC maintenance: an append window then a delete->forget window " +
    "leave the federation PROBE-equal to a fresh sharded build of " +
    "read(toRev); replayed windows change no probe result; a single " +
    "window's append-then-delete rows never enter any shard") {
    import graft.operators.VersionedStore
    import org.apache.spark.sql.functions.col
    val base = tmpDir("winsh5")
    val store = s"$base/corpus"; val root = s"$base/winnow"
    val boot = docs(1L to 16L)
    val rest = docs(17L to 24L)
    val extras = docs(Seq(1000L, 1004L)) // 1004 carries the shared span
    val probe = docs(Seq(900L, 904L))
    val r1 = VersionedStore.save(Map("docs" -> boot), store)
    buildWinnowIndexSharded(
      VersionedStore.read(spark, store, "docs", Some(r1)), root, 3)
    val r2 = VersionedStore.append(
      Map("docs" -> rest.unionByName(extras)), store)
    maintainWinnowIndexShardedFromStore(spark, store, "docs", r1, r2, root)
    // window 1 admitted the extras: 904's probe now reaches 1004
    assert(probeSet(probeWinnowIndexSharded(spark, probe, root,
      minShared = 1)).exists(_._2 == 1004L),
      "the append window must admit the extras")
    val r3 = VersionedStore.delete(extras.select("doc_id"), "docs", store)
    maintainWinnowIndexShardedFromStore(spark, store, "docs", r2, r3, root)
    val fresh = s"$base/fresh"
    buildWinnowIndexSharded(
      VersionedStore.read(spark, store, "docs", Some(r3)), fresh, 3)
    val want = probeSet(probeWinnowIndexSharded(spark, probe, fresh,
      minShared = 1))
    assert(probeSet(probeWinnowIndexSharded(spark, probe, root,
      minShared = 1)) == want,
      "maintained federation must probe-equal a fresh build of read(toRev)")
    assert(!want.exists(_._2 >= 1000L))
    // replays: the delete window (absent forgets), then the whole span
    // (netting hides the extras on both sides; appends double rows
    // harmlessly) — every probe result unchanged
    maintainWinnowIndexShardedFromStore(spark, store, "docs", r2, r3, root)
    maintainWinnowIndexShardedFromStore(spark, store, "docs", r1, r3, root)
    assert(probeSet(probeWinnowIndexSharded(spark, probe, root,
      minShared = 1)) == want)
    // single-window netting: maintained over r1 -> r3 in ONE call, the
    // extras' fingerprints never land in any shard
    val direct = s"$base/direct"
    buildWinnowIndexSharded(
      VersionedStore.read(spark, store, "docs", Some(r1)), direct, 3)
    maintainWinnowIndexShardedFromStore(spark, store, "docs", r1, r3, direct)
    assert((0 until 3).forall(i => spark.read.parquet(s"$direct/shard-$i")
      .filter(col("doc_id") >= 1000L).isEmpty))
    assert(probeSet(probeWinnowIndexSharded(spark, probe, direct,
      minShared = 1)) == want)
  }

  test("sync: bootstrap builds the federation and checkpoints; one call " +
    "absorbs pending revisions probe-equal to a fresh build; no-op when " +
    "current") {
    import graft.operators.VersionedStore
    import org.apache.spark.sql.functions.col
    val base = tmpDir("winsync")
    val store = s"$base/corpus"; val root = s"$base/winnow"
    val probe = docs(Seq(900L, 904L))
    VersionedStore.save(Map("docs" -> docs(1L to 16L)), store)
    assert(syncWinnowIndexShardedWithStore(
      spark, store, "docs", root).isDefined)
    assert(syncWinnowIndexShardedWithStore(
      spark, store, "docs", root).isEmpty)
    VersionedStore.append(Map("docs" -> docs(17L to 24L)), store)
    val r3 = VersionedStore.delete(
      docs(Seq(4L)).select("doc_id"), "docs", store)
    assert(syncWinnowIndexShardedWithStore(
      spark, store, "docs", root).isDefined)
    val fresh = s"$base/fresh"
    buildWinnowIndexSharded(
      VersionedStore.read(spark, store, "docs", Some(r3)), fresh, 3)
    assert(probeSet(probeWinnowIndexSharded(spark, probe, root,
        minShared = 1)) ==
      probeSet(probeWinnowIndexSharded(spark, probe, fresh, minShared = 1)))
  }

  test("rebuilding with FEWER shards drops orphaned higher-numbered dirs; " +
    "a crashed mid-loop forget (intent persisted, shards untouched) " +
    "replays at the next mutation verb and the doomed doc is gone from " +
    "every shard") {
    import org.apache.spark.sql.functions.col
    val base = tmpDir("winsh6")
    val root = s"$base/sharded"
    buildWinnowIndexSharded(docs(1L to 24L), root, nShards = 4)
    assert(new java.io.File(s"$root/shard-3").exists())
    buildWinnowIndexSharded(docs(1L to 24L), root, nShards = 2)
    assert(!new java.io.File(s"$root/shard-2").exists() &&
      !new java.io.File(s"$root/shard-3").exists(),
      "a 2-shard rebuild must not orphan the 4-shard layout's dirs")
    // crashed forget of doc 4 (carries the shared span): intent written,
    // no shard rewritten — the next append replays it everywhere
    graft.operators.StoreRewrite.atomicOverwrite(
      Seq(4L).toDF("doc_id"), s"$root/_forget_intent")
    appendWinnowIndexSharded(docs(Seq(50L)), root)
    assert(!new java.io.File(s"$root/_forget_intent").exists())
    assert((0 until 2).map(i => spark.read.parquet(s"$root/shard-$i")
      .filter(col("doc_id") === 4L).count()).sum == 0,
      "the crashed forget's fingerprints must be physically gone")
    assert(!probeSet(probeWinnowIndexSharded(spark, docs(Seq(900L, 904L)),
      root, minShared = 1)).exists(_._2 == 4L))
  }
}
