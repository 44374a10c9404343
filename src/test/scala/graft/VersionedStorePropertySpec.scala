package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.VersionedStore

/** Model-based property check of the versioned store: random verb
  * sequences (append / delete / compact / vacuum / a crashed
  * uncommitted append) execute against a real store AND an in-memory
  * reference model; after every verb the store's current read must
  * equal the model, and at the end every RETAINED revision must
  * time-travel to the model's snapshot of it. Seeded generation keeps
  * runs deterministic (the repo's scalacheck idiom).
  *
  * Model semantics under test: appends accumulate rows (duplicates
  * allowed — the store never dedupes), tombstones are STICKY key
  * deletes until the next compact, compact folds content and RESETS
  * tombstones (the physical-reclaim point, after which a re-appended
  * key is re-admitted), vacuum(keep) drops the older revisions'
  * readability but never current content, and an uncommitted data dir
  * (crash debris) is invisible to everything.
  */
class VersionedStorePropertySpec extends SparkSuite {

  import spark.implicits._

  private sealed trait Verb
  private case class Append(ids: Seq[Long]) extends Verb
  private case class Delete(keys: Seq[Long]) extends Verb
  private case object Compact extends Verb
  private case class Vacuum(keep: Int) extends Verb
  private case class CrashedAppend(ids: Seq[Long]) extends Verb

  private val genVerb: Gen[Verb] = Gen.frequency(
    5 -> Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 30L)).map(Append(_))),
    3 -> Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 30L)).map(Delete(_))),
    1 -> Gen.const(Compact),
    1 -> Gen.chooseNum(1, 3).map(Vacuum(_)),
    1 -> Gen.chooseNum(1, 2).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(40L, 50L)).map(CrashedAppend(_))))

  private def docs(ids: Seq[Long]): DataFrame =
    ids.toDF("doc_id").withColumn("text", concat(lit("doc-"), col("doc_id")))

  private def stored(path: String, asOf: Option[Long] = None): Seq[Long] =
    VersionedStore.read(spark, path, "docs", asOf)
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted

  /** The reference model: appended row multiset + sticky tombstone keys,
    * snapshotted per committed revision.
    */
  private case class Model(rows: Seq[Long], tombs: Set[Long]) {
    def content: Seq[Long] = rows.filterNot(tombs).sorted
  }

  test("random verb interleavings: current read equals the model after " +
    "every verb; every retained revision time-travels to its snapshot") {
    (1 to 6).foreach { seed =>
      val verbs = Gen.listOfN(8, genVerb)
        .apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val path = tmpDir(s"vstore-prop$seed") + "/s"
      val init = Seq(1L, 2L, 3L)
      VersionedStore.save(Map("docs" -> docs(init)), path)
      var model = Model(init, Set.empty)
      // committed revision -> model snapshot; revisions below `floor`
      // were vacuumed and must refuse time travel
      var snaps = Map(1L -> model)
      var floor = 1L
      verbs.foreach { v =>
        v match {
          case Append(ids) =>
            val rev = VersionedStore.append(Map("docs" -> docs(ids)), path)
            model = model.copy(rows = model.rows ++ ids)
            snaps += rev -> model
          case Delete(keys) =>
            val rev = VersionedStore.delete(keys.toDF("doc_id"), "docs", path)
            model = model.copy(tombs = model.tombs ++ keys)
            snaps += rev -> model
          case Compact =>
            val rev = VersionedStore.compact(spark, path)
            model = Model(model.content, Set.empty)
            snaps += rev -> model
          case Vacuum(keep) =>
            VersionedStore.vacuum(spark, path, keep)
            val retained = snaps.keys.toSeq.sorted.takeRight(keep)
            floor = math.max(floor, retained.min)
          case CrashedAppend(ids) =>
            val cur = VersionedStore.currentVersion(spark, path).get
            VersionedStore.writeDataDir(docs(ids), path, cur + 1L,
              "data", "docs")
          // model unchanged: uncommitted dirs are invisible
        }
        assert(stored(path) == model.content,
          s"seed=$seed after $v: store ${stored(path)} != model ${model.content}")
      }
      // time travel: every retained revision reads its snapshot exactly;
      // vacuumed revisions refuse
      snaps.toSeq.sortBy(_._1).foreach { case (rev, snap) =>
        if (rev >= floor)
          assert(stored(path, Some(rev)) == snap.content,
            s"seed=$seed rev=$rev time travel mismatch")
        else {
          val e = intercept[IllegalArgumentException] {
            VersionedStore.read(spark, path, "docs", Some(rev))
          }
          assert(e.getMessage.contains("vacuumed"), s"seed=$seed rev=$rev")
        }
      }
    }
  }
}
