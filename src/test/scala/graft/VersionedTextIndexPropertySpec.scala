package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import graft.operators.VersionedStore
import graft.queries.SearchQueries.{textIndexAppendVersioned,
  textIndexBuild, textIndexDeleteVersioned, textIndexSaveVersioned,
  textIndexSearchVersioned}

/** Model-based property check of the MANIFEST-COMMITTED text index —
  * the TextIndexPropertySpec discipline ported to the rename-free
  * protocol: a seeded random stream of append / delete / re-append-
  * tombstoned / crashed-commit / compact verbs executes against a real
  * on-disk versioned store AND an in-memory reference model; after
  * EVERY verb the store's visible relations must row-equal the index
  * built fresh from the model's visible corpus.
  *
  * Model semantics under test (the protocol's own trades): `indexed`
  * tracks physically committed doc rows, `tombs` are STICKY manifest
  * tombstones (masking re-appended same ids until compact); compact
  * folds tombstones out physically and RETIRES them (re-admission
  * opens); a crashed commit — data dirs written, manifest never PUT,
  * or a manifest torn mid-write — changes NOTHING (the protocol's
  * whole point: uncommitted state is invisible, no recover verb
  * exists).
  */
class VersionedTextIndexPropertySpec extends SparkSuite {
  import spark.implicits._

  private def textOf(id: Long): String =
    s"common corpus words doc$id plus shared token t${id % 5} tail t${id % 3}"

  private def docs(ids: Seq[Long]): DataFrame =
    ids.distinct.map(i => (i, textOf(i))).toDF("doc_id", "text")

  private case class Model(indexed: Set[Long], tombs: Set[Long]) {
    def visible: Set[Long] = indexed -- tombs
  }

  private def rowSets(po: DataFrame, ds: DataFrame)
      : (Set[(String, Long, Int)], Set[(Long, Int)]) =
    (po.select("term", "doc_id", "tf").collect()
       .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet,
      ds.select("doc_id", "dl").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet)

  private def storedRows(path: String) =
    rowSets(VersionedStore.read(spark, path, "postings"),
      VersionedStore.read(spark, path, "docstats"))

  private def modelRows(m: Model) =
    if (m.visible.isEmpty) (Set.empty[(String, Long, Int)], Set.empty[(Long, Int)])
    else rowSets _ tupled textIndexBuild(docs(m.visible.toSeq.sorted))

  test("random append/delete/re-append/crashed-commit/compact " +
    "interleavings: the visible index equals the from-scratch build of " +
    "the model's visible corpus after EVERY verb") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(20260816L + seed)
      val path = tmpDir(s"vtix-prop$seed") + "/idx"
      val init = Seq(0L, 1L, 2L, 3L, 4L)
      textIndexSaveVersioned(docs(init), path)
      var m = Model(init.toSet, Set.empty)
      var nextId = 100L

      (1 to 12).foreach { step =>
        val verb = rnd.nextInt(6)
        verb match {
          case 0 | 1 => // append fresh docs (1-3 of them)
            val n = 1 + rnd.nextInt(3)
            val ids = (0 until n).map(i => nextId + i)
            nextId += n
            textIndexAppendVersioned(docs(ids), path)
            m = m.copy(indexed = m.indexed ++ ids)
          case 2 => // tombstone-delete a random known id (maybe live,
            // maybe already tombstoned — idempotent), or a never-
            // indexed one (pre-masks a later append: sticky)
            val pool = m.indexed.toSeq.sorted :+ (nextId + 500)
            val id = pool(rnd.nextInt(pool.size))
            textIndexDeleteVersioned(Seq(id).toDF("doc_id"), path)
            m = m.copy(tombs = m.tombs + id)
          case 3 => // re-append a TOMBSTONED id: rows land but stay
            // masked (the protocol's sticky trade)
            if (m.tombs.nonEmpty) {
              val id = m.tombs.toSeq.sorted.head
              textIndexAppendVersioned(docs(Seq(id)), path)
              m = m.copy(indexed = m.indexed + id)
            }
          case 4 => // crashed commit: a data dir written for the NEXT
            // revision with no manifest PUT, and a manifest torn
            // mid-write (no footer) — both invisible, model unchanged
            val rev = VersionedStore.currentVersion(spark, path).get + 1
            VersionedStore.writeDataDir(
              docs(Seq(nextId + 900)).limit(1), path, rev, "data",
              "docstats")
            val mp = new org.apache.hadoop.fs.Path(
              s"$path/_versions", f"v$rev%09d")
            val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
            val out = fs.create(mp, true)
            out.write("graft-versioned-manifest v1\n".getBytes("UTF-8"))
            out.close() // no #commit footer: torn
          case 5 => // compact: content-identical fold, tombstones
            // retired (re-admission opens)
            VersionedStore.compact(spark, path)
            m = Model(m.indexed -- m.tombs, Set.empty)
        }
        val got = storedRows(path)
        val want = modelRows(m)
        assert(got == want,
          s"seed=$seed step=$step verb=$verb model=$m:\n got=$got\nwant=$want")
        // the search plan agrees too (cheap smoke on top of row equality)
        if (m.visible.nonEmpty)
          assert(textIndexSearchVersioned(spark, path).count() >= 0)
      }
    }
  }
}
