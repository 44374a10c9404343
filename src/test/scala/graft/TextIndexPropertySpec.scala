package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.SearchQueries.{textIndexBuild, textIndexSave,
  textIndexLoad, textIndexAppend, textIndexDelete, textIndexForget}

/** Model-based property check of the text-index family (the
  * VersionedStorePropertySpec discipline applied to the 8th store): random
  * verb sequences (append / delete / forget) execute against a real
  * on-disk index AND an in-memory reference model; after EVERY verb the
  * loaded index must row-equal the index built fresh from the model's
  * visible corpus — postings AND docstats — so the incremental verbs can
  * never drift from the from-scratch semantics.
  *
  * Model semantics under test: `indexed` tracks PHYSICAL rows (append
  * admits only ids without rows, tombstoned or not — replay-idempotent);
  * `tombs` are STICKY delete masks applied to both relations at load
  * (delete of a never-indexed id pre-masks a later append); forget
  * physically removes rows AND clears only the forgotten ids' OWN
  * tombstones (re-admission), leaving every other tombstone in force; a
  * forget that would empty the corpus refuses and changes nothing.
  */
class TextIndexPropertySpec extends SparkSuite {

  import spark.implicits._

  private sealed trait Verb
  private case class Append(ids: Seq[Long]) extends Verb
  private case class Delete(ids: Seq[Long]) extends Verb
  private case class Forget(ids: Seq[Long]) extends Verb
  private case class CrashedAppend(ids: Seq[Long]) extends Verb

  // CrashedAppend draws from 30..40 — disjoint from the normal verbs'
  // 0..24 — so the fabricated crash state is exactly the one a real
  // append can reach (orphan postings only for docs NEW to the store).
  private val genVerb: Gen[Verb] = Gen.frequency(
    5 -> Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 24L)).map(Append(_))),
    3 -> Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 24L)).map(Delete(_))),
    2 -> Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 24L)).map(Forget(_))),
    1 -> Gen.chooseNum(1, 2).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(30L, 40L)).map(CrashedAppend(_))))

  /** Deterministic id→text so the model never needs to store text; words
    * overlap across docs so postings exercise real term sharing.
    */
  private def textOf(id: Long): String =
    s"common corpus words doc$id plus shared token t${id % 5} tail t${id % 3}"

  private def docs(ids: Seq[Long]): DataFrame =
    ids.distinct.map(i => (i, textOf(i))).toDF("doc_id", "text")

  private case class Model(indexed: Set[Long], tombs: Set[Long]) {
    def visible: Set[Long] = indexed -- tombs
  }

  private def rowSets(po: DataFrame, ds: DataFrame): (Set[(String, Long, Int)], Set[(Long, Int)]) =
    (po.select("term", "doc_id", "tf").collect()
       .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet,
      ds.select("doc_id", "dl").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet)

  private def loadedRows(path: String): (Set[(String, Long, Int)], Set[(Long, Int)]) = {
    val (po, ds) = textIndexLoad(spark, path)
    rowSets(po, ds)
  }

  private def modelRows(m: Model): (Set[(String, Long, Int)], Set[(Long, Int)]) = {
    if (m.visible.isEmpty) return (Set.empty, Set.empty)
    val (po, ds) = textIndexBuild(docs(m.visible.toSeq))
    rowSets(po, ds)
  }

  test("random append/delete/forget interleavings: the loaded index equals " +
    "the from-scratch index of the model's visible corpus after EVERY verb") {
    (1 to 4).foreach { seed =>
      val verbs = Gen.listOfN(10, genVerb)
        .apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val path = tmpDir(s"tidx-prop$seed") + "/idx"
      val init = Seq(0L, 1L, 2L, 3L, 4L)
      val (p0, d0) = textIndexBuild(docs(init))
      textIndexSave(p0, d0, path)
      var m = Model(init.toSet, Set.empty)

      verbs.zipWithIndex.foreach { case (verb, step) =>
        verb match {
          case Append(ids) =>
            textIndexAppend(docs(ids), path)
            m = m.copy(indexed = m.indexed ++ ids)
          case Delete(ids) =>
            textIndexDelete(ids.toDF("doc_id"), path)
            m = m.copy(tombs = m.tombs ++ ids)
          case Forget(ids) =>
            val remaining = m.indexed -- ids
            if (remaining.isEmpty) {
              // the verb must refuse and leave the store untouched
              intercept[IllegalArgumentException] {
                textIndexForget(ids.toDF("doc_id"), path)
              }
            } else {
              textIndexForget(ids.toDF("doc_id"), path)
              m = Model(m.indexed -- ids, m.tombs -- ids)
            }
          case CrashedAppend(ids) =>
            // a real append's first crash point: fresh docs' postings on
            // disk, docstats and meta not, inflight marker set — recover
            // must shed the orphans; the model is UNCHANGED
            val fresh = ids.distinct.filterNot(m.indexed)
            if (fresh.nonEmpty) {
              val (pInc, _) = textIndexBuild(docs(fresh))
              pInc.write.mode("append").parquet(s"$path/postings")
              new java.io.File(s"$path/_inflight").createNewFile()
              graft.queries.SearchQueries.textIndexRecover(spark, path)
            }
        }
        val got = loadedRows(path)
        val want = modelRows(m)
        assert(got == want,
          s"seed=$seed step=$step verb=$verb model=$m:\n got=$got\nwant=$want")
      }
    }
  }
}
