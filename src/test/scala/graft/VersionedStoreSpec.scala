package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.VersionedStore

/** The rename-free commit protocol: manifest-committed revisions, time
  * travel, tombstone deletes, compaction, vacuum — and the crash story,
  * which is the point: a crash at ANY instant leaves a readable store at
  * the previous revision with NO recover verb, because the commit point
  * is the creation of one small manifest file and data dirs are
  * invisible until referenced.
  */
class VersionedStoreSpec extends SparkSuite {

  import spark.implicits._

  private def fs(path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  private def docs(ids: Long*): DataFrame =
    ids.toDF("doc_id").withColumn("text", concat(lit("doc-"), col("doc_id")))

  private def idsOf(df: DataFrame): Seq[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSeq.sorted

  test("save / append / delete / read with time travel: every retained " +
    "revision reads back its exact content") {
    val root = tmpDir("vstore") + "/s"
    val v1 = VersionedStore.save(Map("docs" -> docs(1, 2, 3)), root)
    val v2 = VersionedStore.append(Map("docs" -> docs(4, 5)), root)
    val v3 = VersionedStore.delete(Seq(2L, 4L).toDF("doc_id"), "docs", root)
    assert((v1, v2, v3) == (1L, 2L, 3L))
    assert(VersionedStore.currentVersion(spark, root).contains(3L))
    assert(idsOf(VersionedStore.read(spark, root, "docs", Some(1))) == Seq(1, 2, 3))
    assert(idsOf(VersionedStore.read(spark, root, "docs", Some(2))) == Seq(1, 2, 3, 4, 5))
    assert(idsOf(VersionedStore.read(spark, root, "docs")) == Seq(1, 3, 5))
    // non-key columns ride along untouched
    assert(VersionedStore.read(spark, root, "docs")
      .filter(col("doc_id") === 3).select("text").as[String].head() == "doc-3")
  }

  test("append writes ONLY the increment: prior data dirs are reused by " +
    "reference, not rewritten") {
    val root = tmpDir("vstore-inc") + "/s"
    VersionedStore.save(Map("docs" -> docs(1, 2, 3)), root)
    val before = fs(root).getContentSummary(new Path(root, "d000000001__data__docs"))
      .getLength
    VersionedStore.append(Map("docs" -> docs(4)), root)
    val after = fs(root).getContentSummary(new Path(root, "d000000001__data__docs"))
      .getLength
    assert(before == after, "append must not touch the base revision's dir")
    assert(fs(root).exists(new Path(root, "d000000002__data__docs")))
  }

  test("a crash BEFORE the manifest lands is invisible: data dirs written " +
    "without a commit leave every reader on the old revision, and no " +
    "recover verb exists or is needed") {
    val root = tmpDir("vstore-crash") + "/s"
    VersionedStore.save(Map("docs" -> docs(1, 2)), root)
    // simulate: an append wrote its delta dir, then the driver died
    VersionedStore.writeDataDir(docs(9), root, 2L, "data", "docs")
    assert(VersionedStore.currentVersion(spark, root).contains(1L))
    assert(idsOf(VersionedStore.read(spark, root, "docs")) == Seq(1, 2))
    // the retried append at the same revision number overwrites the
    // debris and commits — no repair step in between
    VersionedStore.append(Map("docs" -> docs(3)), root)
    assert(idsOf(VersionedStore.read(spark, root, "docs")) == Seq(1, 2, 3))
  }

  test("a torn manifest write (file exists, no commit footer) is treated " +
    "as never committed, and the retry replaces it") {
    val root = tmpDir("vstore-torn") + "/s"
    VersionedStore.save(Map("docs" -> docs(1)), root)
    // simulate a torn v2: header but no footer
    val torn = new Path(root, "_versions/v000000002")
    val out = fs(root).create(torn, false)
    out.write("graft-versioned-manifest v1\ndata\tdocs\tnope\n".getBytes("UTF-8"))
    out.close()
    assert(VersionedStore.currentVersion(spark, root).contains(1L))
    VersionedStore.append(Map("docs" -> docs(2)), root) // commits v2 over debris
    assert(VersionedStore.currentVersion(spark, root).contains(2L))
    assert(idsOf(VersionedStore.read(spark, root, "docs")) == Seq(1, 2))
  }

  test("optimistic-concurrency backstop: committing a revision another " +
    "writer already committed fails loudly") {
    val root = tmpDir("vstore-conflict") + "/s"
    VersionedStore.save(Map("docs" -> docs(1)), root)
    val e = intercept[IllegalArgumentException] {
      VersionedStore.commitManifest(spark, root, 1L,
        Seq(VersionedStore.Entry("data", "docs", "d000000001__data__docs")))
    }
    assert(e.getMessage.contains("concurrent commit"))
  }

  test("compact folds the dir chain and tombstones into one dir per " +
    "relation, content-identical; the pre-compact revision still time-travels") {
    val root = tmpDir("vstore-compact") + "/s"
    VersionedStore.save(Map("docs" -> docs(1, 2, 3)), root)
    VersionedStore.append(Map("docs" -> docs(4, 5)), root)
    VersionedStore.delete(Seq(2L).toDF("doc_id"), "docs", root)
    val v4 = VersionedStore.compact(spark, root)
    assert(v4 == 4L)
    assert(idsOf(VersionedStore.read(spark, root, "docs")) == Seq(1, 3, 4, 5))
    // one dir, no tombstone entries at the compacted revision
    assert(fs(root).exists(new Path(root, "d000000004__data__docs")))
    val pre = VersionedStore.read(spark, root, "docs", Some(3))
    assert(idsOf(pre) == Seq(1, 3, 4, 5), "content-identical")
    assert(idsOf(VersionedStore.read(spark, root, "docs", Some(2))) ==
      Seq(1, 2, 3, 4, 5), "pre-delete revision keeps the tombstoned row")
  }

  test("vacuum drops unretained revisions, unreferenced dirs, and crashed " +
    "debris — but preserves dirs above current (a possible in-flight writer)") {
    val root = tmpDir("vstore-vacuum") + "/s"
    VersionedStore.save(Map("docs" -> docs(1, 2, 3)), root)
    VersionedStore.append(Map("docs" -> docs(4)), root)
    VersionedStore.compact(spark, root) // v3: fresh dir, v1/v2 dirs unreferenced
    VersionedStore.writeDataDir(docs(99), root, 4L, "data", "docs") // in-flight
    val (dirs, mans) = VersionedStore.vacuum(spark, root, keep = 1)
    assert(mans == 2, s"v1 and v2 manifests reclaimed, got $mans")
    assert(dirs == 2, s"v1 and v2 data dirs reclaimed, got $dirs")
    assert(fs(root).exists(new Path(root, "d000000004__data__docs")),
      "an in-flight writer's dir above current must survive vacuum")
    assert(idsOf(VersionedStore.read(spark, root, "docs")) == Seq(1, 2, 3, 4))
    val e = intercept[IllegalArgumentException] {
      VersionedStore.read(spark, root, "docs", Some(1))
    }
    assert(e.getMessage.contains("vacuumed"))
    // the preserved in-flight dir commits cleanly afterwards
    VersionedStore.commitManifest(spark, root, 4L,
      Seq(VersionedStore.Entry("data", "docs", "d000000003__data__docs"),
        VersionedStore.Entry("data", "docs", "d000000004__data__docs")))
    assert(idsOf(VersionedStore.read(spark, root, "docs")) == Seq(1, 2, 3, 4, 99))
  }

  test("multi-relation snapshots version together: one manifest is one " +
    "consistent cut across relations") {
    val root = tmpDir("vstore-multi") + "/s"
    VersionedStore.save(Map(
      "docs" -> docs(1, 2),
      "stats" -> Seq((1L, 10L), (2L, 20L)).toDF("doc_id", "n_tokens")), root)
    VersionedStore.append(Map(
      "docs" -> docs(3),
      "stats" -> Seq((3L, 30L)).toDF("doc_id", "n_tokens")), root)
    assert(VersionedStore.relations(spark, root) == Seq("docs", "stats"))
    assert(idsOf(VersionedStore.read(spark, root, "docs")) == Seq(1, 2, 3))
    assert(VersionedStore.read(spark, root, "stats", Some(1)).count() == 2)
    assert(VersionedStore.read(spark, root, "stats").count() == 3)
  }

  test("empty relations round-trip (schema-only parquet), and reading an " +
    "unknown relation or vacuumed/absent revision fails loudly") {
    val root = tmpDir("vstore-empty") + "/s"
    VersionedStore.save(Map("docs" -> docs().limit(0)), root)
    assert(VersionedStore.read(spark, root, "docs").count() == 0)
    val e1 = intercept[IllegalArgumentException] {
      VersionedStore.read(spark, root, "nope")
    }
    assert(e1.getMessage.contains("no relation"))
    val e2 = intercept[IllegalArgumentException] {
      VersionedStore.read(spark, root, "docs", Some(7))
    }
    assert(e2.getMessage.contains("vacuumed"))
    val e3 = intercept[IllegalArgumentException] {
      VersionedStore.read(spark, tmpDir("vstore-none") + "/absent", "docs")
    }
    assert(e3.getMessage.contains("no committed revision"))
  }

  test("readRange prunes whole dirs off the manifest zone maps — result " +
    "identical to the precise filter, skipped dirs absent from the scan") {
    val root = tmpDir("vstore-range") + "/s"
    VersionedStore.save(Map("docs" -> docs(1L to 10L: _*)), root,
      statsCols = Seq("doc_id"))
    VersionedStore.append(Map("docs" -> docs(11L to 20L: _*)), root,
      statsCols = Seq("doc_id"))
    VersionedStore.append(Map("docs" -> docs(21L to 30L: _*)), root,
      statsCols = Seq("doc_id"))
    val ranged = VersionedStore.readRange(spark, root, "docs",
      "doc_id", 12L, 18L)
    assert(idsOf(ranged) == (12L to 18L))
    val files = ranged.inputFiles.mkString("\n")
    assert(!files.contains("d000000001__data__docs"),
      s"dir 1 ([1,10]) must be zone-map-skipped for [12,18]:\n$files")
    assert(!files.contains("d000000003__data__docs"),
      s"dir 3 ([21,30]) must be zone-map-skipped for [12,18]:\n$files")
    assert(files.contains("d000000002__data__docs"))
    // a dir WITHOUT stats is kept (conservative), result still exact
    VersionedStore.append(Map("docs" -> docs(31L)), root) // no statsCol
    assert(idsOf(VersionedStore.readRange(spark, root, "docs",
      "doc_id", 12L, 18L)) == (12L to 18L))
    // fully-disjoint range: every dir skipped, empty result, right schema
    val none = VersionedStore.readRange(spark, root, "docs",
      "doc_id", 500L, 600L)
    assert(none.count() == 0 && none.columns.toSeq == Seq("doc_id", "text"))
    // tombstones still apply under pruning
    VersionedStore.delete(Seq(15L).toDF("doc_id"), "docs", root)
    assert(idsOf(VersionedStore.readRange(spark, root, "docs",
      "doc_id", 12L, 18L)) == Seq(12L, 13L, 14L, 16L, 17L, 18L))
  }

  test("readPruned prunes on SEVERAL columns at once — a dir survives " +
    "only when every bounded column's zone map intersects — and on " +
    "string ranges; cross-domain bounds refuse; legacy single-long " +
    "readRange is a delegation") {
    val root = tmpDir("vstore-multi") + "/s"
    def batch(ids: Seq[Long], src: String): DataFrame =
      ids.toDF("doc_id").withColumn("text", concat(lit("doc-"), col("doc_id")))
        .withColumn("source", lit(src))
    val sc = Seq("doc_id", "source")
    VersionedStore.save(Map("docs" -> batch(1L to 10L, "arxiv")), root,
      statsCols = sc)
    VersionedStore.append(Map("docs" -> batch(11L to 20L, "web")), root,
      statsCols = sc)
    VersionedStore.append(Map("docs" -> batch(21L to 30L, "arxiv")), root,
      statsCols = sc)
    // doc_id window [5, 25] alone keeps all three dirs; conjoined with
    // source = arxiv it must drop dir 2 (web) even though its id range
    // intersects — the multi-column prune a single-column map cannot do
    val both = VersionedStore.readPruned(spark, root, "docs",
      Map("doc_id" -> (5L, 25L), "source" -> ("arxiv", "arxiv")))
    assert(idsOf(both) == ((5L to 10L) ++ (21L to 25L)))
    val files = both.inputFiles.mkString("\n")
    assert(!files.contains("d000000002__data__docs"),
      s"the web dir must be pruned by the source bound:\n$files")
    assert(files.contains("d000000001__data__docs") &&
      files.contains("d000000003__data__docs"))
    // string-only range: lexicographic window keeps only the web dir
    val webish = VersionedStore.readPruned(spark, root, "docs",
      Map("source" -> ("w", "x")))
    assert(idsOf(webish) == (11L to 20L))
    val wf = webish.inputFiles.mkString("\n")
    assert(!wf.contains("d000000001__data__docs") &&
      !wf.contains("d000000003__data__docs"), wf)
    // a long bound against the string-mapped column refuses loudly
    val e = intercept[IllegalArgumentException] {
      VersionedStore.readPruned(spark, root, "docs",
        Map("source" -> (1L, 5L))).count()
    }
    assert(e.getMessage.contains("cross-domain"))
    // tombstones still apply under multi-column pruning
    VersionedStore.delete(Seq(6L).toDF("doc_id"), "docs", root)
    assert(idsOf(VersionedStore.readPruned(spark, root, "docs",
      Map("doc_id" -> (5L, 25L), "source" -> ("arxiv", "arxiv"))))
      == ((5L to 10L).filterNot(_ == 6L) ++ (21L to 25L)))
    // compact folds the dirs and RE-MAPS the union of stat columns: the
    // folded dir carries both doc_id and source maps (a disjoint window
    // prunes everything)
    VersionedStore.compact(spark, root)
    val after = VersionedStore.readPruned(spark, root, "docs",
      Map("source" -> ("zzz", "zzzz")))
    assert(after.count() == 0 &&
      after.columns.toSeq == Seq("doc_id", "text", "source"))
  }

  test("readRange pushes the precise predicate into the kept dirs' parquet " +
    "scan (dir pruning composes with row-group pruning, not replaces it)") {
    val root = tmpDir("vstore-push") + "/s"
    VersionedStore.save(Map("docs" -> docs(1L to 10L: _*)), root,
      statsCols = Seq("doc_id"))
    VersionedStore.append(Map("docs" -> docs(11L to 20L: _*)), root,
      statsCols = Seq("doc_id"))
    val p = VersionedStore.readRange(spark, root, "docs", "doc_id", 3L, 7L)
      .queryExecution.executedPlan.toString
    assert("PushedFilters: \\[\\w".r.findFirstIn(p).isDefined,
      s"readRange's predicate must reach the scan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
  }

  test("changes() is O(delta) CDC: computed only from the window's added " +
    "dirs, roundtrips exactly, and refuses a window crossing a compact") {
    val root = tmpDir("vstore-cdc") + "/s"
    VersionedStore.save(Map("docs" -> docs(1, 2, 3)), root)     // v1
    VersionedStore.append(Map("docs" -> docs(4, 5)), root)      // v2
    VersionedStore.delete(Seq(2L, 4L).toDF("doc_id"), "docs", root) // v3
    VersionedStore.append(Map("docs" -> docs(6)), root)         // v4
    val (ins, delKeys) = VersionedStore.changes(spark, root, 1L, 4L, "docs")
    // 4 was appended AND tombstoned inside the window: nets out
    assert(idsOf(ins) == Seq(5, 6))
    assert(delKeys.collect().map(_.getLong(0)).toSeq.sorted == Seq(2L, 4L))
    // O(delta): the v1 base dir is not in the inserted scan
    assert(!ins.inputFiles.mkString.contains("d000000001__data__docs"))
    // roundtrip: content(from) anti delKeys union ins == content(to)
    val applied = VersionedStore.read(spark, root, "docs", Some(1L))
      .join(delKeys, Seq("doc_id"), "left_anti").unionByName(ins)
    assert(applied.select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
      == idsOf(VersionedStore.read(spark, root, "docs", Some(4L))))
    // append-only window: no deleted keys, inserts only
    val (ins2, delKeys2) = VersionedStore.changes(spark, root, 3L, 4L, "docs")
    assert(idsOf(ins2) == Seq(6) && delKeys2.count() == 0)
    VersionedStore.compact(spark, root) // v5 replaces every dir
    val e = intercept[IllegalArgumentException] {
      VersionedStore.changes(spark, root, 4L, 5L, "docs")
    }
    assert(e.getMessage.contains("crosses"))
  }

  test("illegal relation names are refused at every write verb") {
    val root = tmpDir("vstore-names") + "/s"
    intercept[IllegalArgumentException] {
      VersionedStore.save(Map("a__b" -> docs(1)), root)
    }
    intercept[IllegalArgumentException] {
      VersionedStore.save(Map("a/b" -> docs(1)), root)
    }
  }

  test("schema drift: an appended column / dropped column / retyped " +
    "column refuses with the drift spelled out; a pure reordering is " +
    "NORMALIZED; save() legitimately evolves the schema") {
    val root = tmpDir("vschema") + "/s"
    VersionedStore.save(Map("docs" -> docs(1, 2)), root)
    // added column
    val e1 = intercept[IllegalArgumentException] {
      VersionedStore.append(
        Map("docs" -> docs(3).withColumn("lang", lit("en"))), root)
    }
    assert(e1.getMessage.contains("schema drift") &&
      e1.getMessage.contains("lang") && e1.getMessage.contains("save()"))
    // dropped column
    val e2 = intercept[IllegalArgumentException] {
      VersionedStore.append(Map("docs" -> docs(3).drop("text")), root)
    }
    assert(e2.getMessage.contains("missing from the delta"))
    // retyped column
    val e3 = intercept[IllegalArgumentException] {
      VersionedStore.append(
        Map("docs" -> docs(3).withColumn("text", lit(7))), root)
    }
    assert(e3.getMessage.contains("recorded string"))
    // a refused append commits NOTHING (no revision, no debris)
    assert(VersionedStore.currentVersion(spark, root).contains(1L))
    assert(VersionedStore.debris(spark, root).isEmpty)
    // pure reordering: normalized to the recorded column order, read
    // stays aligned across dirs
    VersionedStore.append(
      Map("docs" -> docs(4).select("text", "doc_id")), root)
    val r = VersionedStore.read(spark, root, "docs")
    assert(r.columns.toSeq == Seq("doc_id", "text"))
    assert(idsOf(r) == Seq(1, 2, 4))
    assert(r.filter(col("doc_id") === 4).select("text").head().getString(0)
      == "doc-4")
    // schema evolution through save: full snapshot, new lineage, and
    // appends conform to the NEW schema afterwards
    VersionedStore.save(
      Map("docs" -> docs(1, 2).withColumn("lang", lit("en"))), root)
    VersionedStore.append(
      Map("docs" -> docs(5).withColumn("lang", lit("fr"))), root)
    assert(idsOf(VersionedStore.read(spark, root, "docs")) == Seq(1, 2, 5))
  }

  test("v1 manifests (no schema records) still read, still time-travel, " +
    "and appends against them drift-check off the parquet footers then " +
    "upgrade the manifest") {
    val root = tmpDir("v1compat") + "/s"
    VersionedStore.save(Map("docs" -> docs(1, 2)), root)
    // simulate a pre-upgrade store: strip the schema lines out of the
    // committed manifest (the v1 format had none)
    val mp = new Path(root, "_versions/v000000001")
    val f = fs(root)
    val lines = {
      val in = f.open(mp)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    }
    val v1Lines = lines.filterNot(_.startsWith("schema\t"))
    assert(v1Lines.size < lines.size, "fixture defect: no schema line to strip")
    f.delete(mp, false)
    val out = f.create(mp, false)
    try out.write((v1Lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    // reads fine without schema records
    assert(idsOf(VersionedStore.read(spark, root, "docs")) == Seq(1, 2))
    // drift still refused — recorded schema falls back to the footers
    val e = intercept[IllegalArgumentException] {
      VersionedStore.append(
        Map("docs" -> docs(3).withColumn("lang", lit("en"))), root)
    }
    assert(e.getMessage.contains("schema drift"))
    // a conforming append succeeds and upgrades the manifest
    VersionedStore.append(Map("docs" -> docs(3)), root)
    assert(idsOf(VersionedStore.read(spark, root, "docs")) == Seq(1, 2, 3))
    val mp2 = new Path(root, "_versions/v000000002")
    val in2 = f.open(mp2)
    val lines2 =
      try scala.io.Source.fromInputStream(in2, "UTF-8").getLines().toList
      finally in2.close()
    assert(lines2.exists(_.startsWith("schema\t")),
      "a post-upgrade append must record the schema going forward")
    // and CDC across the upgrading window still works (the new schema
    // entry must not read as a replaced dir)
    val (ins, _) = VersionedStore.changes(spark, root, 1L, 2L, "docs")
    assert(idsOf(ins) == Seq(3))
  }

  test("commitMixed: ONE revision appends one relation, tombstones a " +
    "second, and REPLACES a third — all visible atomically; the " +
    "replaced relation drops its accumulated tombstones; a replace of " +
    "a missing relation creates it") {
    val root = tmpDir("vmixed") + "/s"
    VersionedStore.save(Map(
      "a" -> docs(1, 2), "b" -> docs(10, 11), "c" -> docs(20, 21)), root)
    // pre-existing tombstone on c — the replace must retire it
    VersionedStore.delete(Seq(20L).toDF("doc_id"), "c", root)
    assert(idsOf(VersionedStore.read(spark, root, "c")) == Seq(21))
    val before = VersionedStore.currentVersion(spark, root).get
    val rev = VersionedStore.commitMixed(
      appends = Map("a" -> docs(3)),
      deletes = Map("b" -> Seq(10L).toDF("doc_id")),
      replaces = Map("c" -> docs(20, 22), "d" -> docs(30)), root)
    assert(rev == before + 1, "the whole mutation is one revision")
    assert(idsOf(VersionedStore.read(spark, root, "a")) == Seq(1, 2, 3))
    assert(idsOf(VersionedStore.read(spark, root, "b")) == Seq(11))
    assert(idsOf(VersionedStore.read(spark, root, "c")) == Seq(20, 22),
      "replace is authoritative: the old tombstone on 20 is dropped")
    assert(idsOf(VersionedStore.read(spark, root, "d")) == Seq(30),
      "replacing a relation the store does not hold yet creates it")
    // time travel still shows the pre-commit state
    assert(idsOf(VersionedStore.read(spark, root, "c", Some(before))) == Seq(21))
    assert(VersionedStore.relations(spark, root, Some(before)) ==
      Seq("a", "b", "c"))
  }

  test("commitMixed refusals: a relation both replaced and appended/" +
    "tombstoned is ambiguous; appends AND replaces are drift-gated " +
    "before any dir is written (commitDelta inherits the gate)") {
    val root = tmpDir("vmixedr") + "/s"
    VersionedStore.save(Map("a" -> docs(1), "b" -> docs(2)), root)
    val e1 = intercept[IllegalArgumentException] {
      VersionedStore.commitMixed(Map("a" -> docs(3)), Map.empty,
        Map("a" -> docs(4)), root)
    }
    assert(e1.getMessage.contains("both replaced"))
    val e2 = intercept[IllegalArgumentException] {
      VersionedStore.commitMixed(Map.empty, Map.empty,
        Map("b" -> docs(2).withColumn("lang", lit("en"))), root)
    }
    assert(e2.getMessage.contains("schema drift"))
    val e3 = intercept[IllegalArgumentException] {
      VersionedStore.commitDelta(
        Map("a" -> docs(3).withColumn("lang", lit("en"))), Map.empty, root)
    }
    assert(e3.getMessage.contains("schema drift"),
      "commitDelta rides the same gate — a streaming ingest cannot " +
        "silently commit a drifted micro-batch")
    // nothing above committed: the store still reads at revision 1
    assert(VersionedStore.currentVersion(spark, root).contains(1L))
    assert(idsOf(VersionedStore.read(spark, root, "a")) == Seq(1))
  }
}
