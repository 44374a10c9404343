package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.DataFrame

import graft.streaming.IngestPipeline

/** Model-based check of the incremental-ingest lifecycle (the 4th family
  * under the model-check discipline): random interleavings of
  * new-document batches, duplicate submissions, batch replays, and
  * forgets run against the real three-store pipeline AND an in-memory
  * model. Texts are class-tagged so admission is exactly predictable:
  * every document's text is either its own disjoint vocabulary (nothing
  * to match — always admitted) or a verbatim copy of a class already
  * seen (jaccard 1.0 against the class's surviving owner — rejected iff
  * any owner is still in the index, ADMITTED if every owner was
  * forgotten: the re-admission contract).
  *
  * Invariant after every verb: the signature index's doc set equals the
  * model's (initial ∪ admitted − forgotten), and the admitted corpus
  * store holds exactly the model's post-bootstrap admissions.
  */
class IngestPipelinePropertySpec extends SparkSuite {

  import spark.implicits._

  private sealed trait Verb
  private case class NewDocs(n: Int) extends Verb
  private case class DupDocs(n: Int) extends Verb
  private case object Replay extends Verb
  private case class Forget(picks: Seq[Int]) extends Verb

  private val genVerb: Gen[Verb] = Gen.frequency(
    4 -> Gen.chooseNum(1, 3).map(NewDocs(_)),
    3 -> Gen.chooseNum(1, 2).map(DupDocs(_)),
    2 -> Gen.const(Replay),
    2 -> Gen.chooseNum(1, 2).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 1000)).map(Forget(_))))

  /** Disjoint per-class vocabulary: no two classes share a bigram. */
  private def textOf(cls: Long): String =
    s"c${cls}a c${cls}b c${cls}c c${cls}d c${cls}e"

  private def df(rows: Seq[(Long, Long)]): DataFrame =
    rows.map { case (id, cls) => (id, textOf(cls)) }.toDF("doc_id", "text")

  private case class Model(index: Map[Long, Long], admitted: Set[Long]) {
    def classAlive(cls: Long): Boolean = index.valuesIterator.contains(cls)
  }

  private def ids(path: String): Set[Long] =
    spark.read.parquet(path).select("doc_id").collect()
      .map(_.getLong(0)).toSet

  test("random new/dup/replay/forget interleavings: index and admitted " +
    "store equal the model after every verb, including re-admission of " +
    "a fully forgotten class") {
    (1 to 3).foreach { seed =>
      val verbs = Gen.listOfN(12, genVerb)
        .apply(Gen.Parameters.default, Seed(200L + seed)).get
      val root = tmpDir(s"ingest-prop$seed")
      val (idx, lab, adm) =
        (s"$root/idx", s"$root/lab", s"$root/adm")
      val init = (0L to 4L).map(i => (i, i))
      IngestPipeline.bootstrap(df(init), idx, lab)
      var m = Model(init.toMap, Set.empty)
      var nextId = 100L
      var lastBatch: Option[DataFrame] = None

      def run(batch: Seq[(Long, Long)]): Unit = {
        val b = df(batch)
        IngestPipeline.ingestBatch(b, idx, lab, adm)
        lastBatch = Some(b)
      }

      verbs.zipWithIndex.foreach { case (verb, step) =>
        verb match {
          case NewDocs(n) =>
            val batch = (0 until n).map { k =>
              (nextId + k, nextId + k) // own class: always admitted
            }
            nextId += n
            run(batch)
            m = Model(m.index ++ batch, m.admitted ++ batch.map(_._1))
          case DupDocs(n) =>
            // copy classes deterministically from classes EVER seen;
            // admitted iff no owner of that class survives in the index
            val classes = m.index.values.toSeq.sorted ++
              (0L to 4L) // forgotten initial classes stay candidates
            val batch = (0 until n).map { k =>
              val cls = classes((step + k) % classes.size)
              (nextId + k, cls)
            }
            nextId += n
            run(batch)
            val landed = batch.filterNot { case (_, cls) => m.classAlive(cls) }
              // two in-batch copies of the same DEAD class both admit
              // (in-batch dups are admitted by contract) — keep both
            m = Model(m.index ++ landed, m.admitted ++ landed.map(_._1))
          case Replay =>
            // model unchanged: an (un-forgotten) replayed batch converges
            lastBatch.foreach(b => IngestPipeline.ingestBatch(b, idx, lab, adm))
          case Forget(picks) =>
            val all = m.index.keys.toSeq.sorted
            if (all.nonEmpty) {
              val doomed = picks.map(p => all(p % all.size)).distinct
              IngestPipeline.forget(spark, doomed.toDF("doc_id"), idx, lab, adm)
              m = Model(m.index -- doomed, m.admitted -- doomed)
              // a replay AFTER a forget is a re-submission, not a replay:
              // forgotten content legitimately re-admits — drop the batch
              lastBatch = None
            }
        }
        assert(ids(idx) == m.index.keySet,
          s"seed=$seed step=$step verb=$verb index mismatch")
        val admGot = if (new java.io.File(adm).exists()) ids(adm) else Set.empty[Long]
        assert(admGot == m.admitted,
          s"seed=$seed step=$step verb=$verb admitted mismatch: " +
            s"got $admGot want ${m.admitted}")
      }
    }
  }
}
