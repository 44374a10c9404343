package graft

import org.apache.spark.sql.DataFrame
import graft.operators.VersionedStore
import graft.queries.{QuantQueries, SimilarityQueries}

/** Model-based property check of the MANIFEST-COMMITTED vector code
  * stores — [[VersionedTextIndexPropertySpec]]'s discipline extended to
  * the family pair the streaming loops lean on hardest: sq8 (the
  * trained-artifact family — appends encode under FROZEN bootstrap
  * parameters) and bin (the parameterless sign-code family). A seeded
  * random stream of append / delete / re-append-tombstoned /
  * crashed-commit / compact verbs runs against a real on-disk versioned
  * store AND an in-memory id-set model; after EVERY verb the store's
  * visible codes must row-equal the codes encoded fresh from the
  * model's visible vectors (under the bootstrap parameters for sq8 —
  * maintenance must be indistinguishable from never having maintained).
  *
  * Model semantics (the protocol's own trades, shared with the text
  * twin): manifest tombstones are STICKY — a re-appended same vec_id
  * lands physically but stays masked until compact retires the
  * tombstones; appends are idempotent against the VISIBLE set (a
  * visible id nets to zero fresh rows and commits nothing); a crashed
  * commit (data dir without a manifest PUT, manifest torn mid-write)
  * changes nothing.
  */
class VersionedVectorPropertySpec extends SparkSuite {
  import spark.implicits._

  // deterministic 64-dim vectors with spread magnitudes (so sq8's
  // affine quantization has real work) — pure integer arithmetic, no
  // FP accumulation ambiguity
  private def vec(id: Long): Seq[Double] =
    Seq.tabulate(64)(j => (((id * 31 + j * 17) % 13) - 6).toDouble / 3.0)

  private def vecs(ids: Seq[Long]): DataFrame =
    ids.distinct.sorted.map(i => (i, vec(i))).toDF("vec_id", "v")

  private case class Model(indexed: Set[Long], tombs: Set[Long]) {
    def visible: Set[Long] = indexed -- tombs
  }

  private def crashCommit(path: String, rel: String): Unit = {
    val rev = VersionedStore.currentVersion(spark, path).get + 1
    VersionedStore.writeDataDir(vecs(Seq(999999L)).limit(1), path, rev,
      "data", rel)
    val mp = new org.apache.hadoop.fs.Path(s"$path/_versions", f"v$rev%09d")
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(mp, true)
    out.write("graft-versioned-manifest v1\n".getBytes("UTF-8"))
    out.close() // no #commit footer: torn
  }

  /** Drive one family through the interleaving. `expected` encodes the
    * model's visible vectors the family's own way; `storedVisible`
    * reads the store's visible codes; both project to comparable rows.
    */
  private def drive(label: String,
      bootstrap: Seq[Long] => String, // ids -> store path
      append: (DataFrame, String) => Long,
      delete: (DataFrame, String) => Long,
      expected: Seq[Long] => Set[Seq[Any]],
      storedVisible: String => Set[Seq[Any]]): Unit = {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(20260816L * 7 + seed)
      val init = Seq(0L, 1L, 2L, 3L, 4L, 5L)
      val path = bootstrap(init)
      var m = Model(init.toSet, Set.empty)
      var nextId = 100L

      (1 to 12).foreach { step =>
        val verb = rnd.nextInt(6)
        verb match {
          case 0 | 1 => // append fresh vectors (1-3)
            val n = 1 + rnd.nextInt(3)
            val ids = (0 until n).map(i => nextId + i)
            nextId += n
            append(vecs(ids), path)
            m = m.copy(indexed = m.indexed ++ ids)
          case 2 => // tombstone a known id (live, already-tombstoned,
            // or never-indexed — the last pre-masks a later append)
            val pool = m.indexed.toSeq.sorted :+ (nextId + 500)
            val id = pool(rnd.nextInt(pool.size))
            delete(Seq(id).toDF("vec_id"), path)
            m = m.copy(tombs = m.tombs + id)
          case 3 => // re-append a TOMBSTONED id: lands, stays masked
            if (m.tombs.nonEmpty) {
              val id = m.tombs.toSeq.sorted.head
              append(vecs(Seq(id)), path)
              m = m.copy(indexed = m.indexed + id)
            }
          case 4 => crashCommit(path, "codes") // invisible, model unchanged
          case 5 => // compact: fold + tombstone retirement
            VersionedStore.compact(spark, path)
            m = Model(m.indexed -- m.tombs, Set.empty)
        }
        val got = storedVisible(path)
        val want = expected(m.visible.toSeq.sorted)
        assert(got == want,
          s"$label seed=$seed step=$step verb=$verb model=$m:\n" +
            s" got=${got.toSeq.sortBy(_.toString)}\n" +
            s"want=${want.toSeq.sortBy(_.toString)}")
      }
    }
  }

  test("sq8 manifest store: random interleavings equal the frozen-" +
    "parameter encode of the model's visible vectors after every verb") {
    var boot: DataFrame = null
    drive("sq8",
      bootstrap = { ids =>
        val path = tmpDir("vsq8-prop") + "/idx"
        boot = QuantQueries.sqTrain(vecs(ids)).localCheckpoint(true)
        QuantQueries.sqSaveIndexVersioned(boot,
          QuantQueries.sqCodes(boot, vecs(ids)), path)
        path
      },
      append = (v, p) => QuantQueries.sqAppendCodesVersioned(v, p),
      delete = (ids, p) => QuantQueries.sqDeleteVectorsVersioned(ids, p),
      expected = ids =>
        if (ids.isEmpty) Set.empty
        else QuantQueries.sqCodes(boot, vecs(ids))
          .collect().map(r => Seq[Any](r.getLong(0),
            r.getSeq[Int](1).toList)).toSet,
      storedVisible = p =>
        QuantQueries.sqLoadIndexVersioned(spark, p)._2
          .collect().map(r => Seq[Any](r.getAs[Long]("vec_id"),
            r.getSeq[Int](r.fieldIndex("code")).toList)).toSet)
  }

  test("bin manifest store: random interleavings equal the fresh " +
    "sign-pack of the model's visible vectors after every verb") {
    drive("bin",
      bootstrap = { ids =>
        val path = tmpDir("vbin-prop") + "/idx"
        SimilarityQueries.binSaveIndexVersioned(
          SimilarityQueries.binCodes(vecs(ids)), path)
        path
      },
      append = (v, p) => SimilarityQueries.binAppendCodesVersioned(v, p),
      delete = (ids, p) => SimilarityQueries.binDeleteVectorsVersioned(ids, p),
      expected = ids =>
        if (ids.isEmpty) Set.empty
        else SimilarityQueries.binCodes(vecs(ids))
          .collect().map(r => Seq[Any](r.getAs[Long]("vec_id"),
            r.getAs[Long]("w0"), r.getAs[Long]("w1"))).toSet,
      storedVisible = p =>
        SimilarityQueries.binLoadIndexVersioned(spark, p)
          .select("vec_id", "w0", "w1")
          .collect().map(r => Seq[Any](r.getLong(0), r.getLong(1),
            r.getLong(2))).toSet)
  }
}
