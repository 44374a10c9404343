package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.VectorIngestPipeline
import graft.queries.SimilarityQueries

/** Model-based check of the vector ingest lifecycle (5th family under
  * the model-check discipline): random interleavings of new vectors,
  * duplicate sign-patterns, same-id replays, tombstone deletes, and
  * forgets against the real binary-store pipeline AND an in-memory
  * model. Vectors are class-tagged by SIGN PATTERN (radius 0 gate:
  * Hamming distance 0 = same pattern), so every gate decision is exactly
  * predictable: a fresh pattern always admits; a copied pattern rejects
  * iff some OTHER id with that pattern is stored un-tombstoned (a
  * tombstoned or forgotten owner lets the copy re-admit).
  *
  * Invariants after every verb: raw code ids == model, vector-store ids
  * == model, tombstone-masked loaded ids == model minus tombs, and a
  * whole-corpus forget refuses without touching the stores.
  */
class VectorIngestPropertySpec extends SparkSuite {

  import spark.implicits._

  private sealed trait Verb
  private case class NewVecs(n: Int) extends Verb
  private case class DupVecs(n: Int) extends Verb
  private case object SameIdReplay extends Verb
  private case class Delete(picks: Seq[Int]) extends Verb
  private case class Forget(picks: Seq[Int]) extends Verb

  private val genVerb: Gen[Verb] = Gen.frequency(
    4 -> Gen.chooseNum(1, 3).map(NewVecs(_)),
    3 -> Gen.chooseNum(1, 2).map(DupVecs(_)),
    1 -> Gen.const(SameIdReplay),
    2 -> Gen.chooseNum(1, 2).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 1000)).map(Delete(_))),
    2 -> Gen.chooseNum(1, 2).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 1000)).map(Forget(_))))

  /** 64-dim sign vector whose pattern is class `c`'s low 16 bits (spread
    * over the first 16 dims) — distinct classes differ in >= 1 sign.
    */
  private def vecOf(cls: Long): Array[Double] =
    Array.tabulate(64)(i =>
      if (i < 16 && ((cls >> i) & 1L) == 1L) 1.0 else -1.0)

  private def df(rows: Seq[(Long, Long)]): DataFrame =
    rows.map { case (id, cls) => (id, vecOf(cls)) }.toDF("vec_id", "v")

  private case class Model(stored: Map[Long, Long], tombs: Set[Long]) {
    def gateAlive(cls: Long, selfId: Long): Boolean =
      stored.exists { case (id, c) =>
        c == cls && id != selfId && !tombs(id) }
  }

  private def ids(path: String): Set[Long] =
    spark.read.parquet(path).select("vec_id").collect()
      .map(_.getLong(0)).toSet

  test("random new/dup/replay/delete/forget interleavings: code store, " +
    "vector store, and masked load equal the model after every verb; a " +
    "whole-corpus forget refuses") {
    (1 to 3).foreach { seed =>
      val verbs = Gen.listOfN(12, genVerb)
        .apply(Gen.Parameters.default, Seed(300L + seed)).get
      val root = tmpDir(s"vingest-prop$seed")
      val (idx, vec) = (s"$root/idx", s"$root/vec")
      val init = (0L to 3L).map(i => (i, i))
      VectorIngestPipeline.bootstrap(df(init), idx, vec)
      // NOTE: bootstrap's vector store holds the initial corpus too
      var m = Model(init.toMap, Set.empty)
      var nextId = 100L
      var nextCls = 100L

      verbs.zipWithIndex.foreach { case (verb, step) =>
        verb match {
          case NewVecs(n) =>
            val batch = (0 until n).map(k => (nextId + k, nextCls + k))
            nextId += n; nextCls += n
            VectorIngestPipeline.ingestBatch(df(batch), idx, vec)
            m = m.copy(stored = m.stored ++ batch)
          case DupVecs(n) =>
            val classes = (m.stored.values.toSeq ++ init.map(_._2)).sorted
            val batch = (0 until n).map { k =>
              (nextId + k, classes((step + k) % classes.size))
            }
            nextId += n
            VectorIngestPipeline.ingestBatch(df(batch), idx, vec)
            val landed = batch.filterNot { case (id, cls) =>
              m.gateAlive(cls, id) }
            m = m.copy(stored = m.stored ++ landed)
          case SameIdReplay =>
            // resubmit an existing id with its own pattern: the gate
            // excludes self and the commit marker skips the id — no-op
            m.stored.headOption.foreach { case (id, cls) =>
              VectorIngestPipeline.ingestBatch(df(Seq((id, cls))), idx, vec)
            }
          case Delete(picks) =>
            val all = m.stored.keys.toSeq.sorted
            if (all.nonEmpty) {
              val doomed = picks.map(p => all(p % all.size)).distinct
              SimilarityQueries.binDeleteVectors(
                doomed.toDF("vec_id"), idx)
              m = m.copy(tombs = m.tombs ++ doomed)
            }
          case Forget(picks) =>
            val all = m.stored.keys.toSeq.sorted
            if (all.nonEmpty) {
              val doomed = picks.map(p => all(p % all.size)).distinct
              if (doomed.toSet == m.stored.keySet) {
                intercept[IllegalArgumentException] {
                  VectorIngestPipeline.forget(spark,
                    doomed.toDF("vec_id"), idx, vec)
                }
              } else {
                VectorIngestPipeline.forget(spark,
                  doomed.toDF("vec_id"), idx, vec)
                m = Model(m.stored -- doomed, m.tombs -- doomed)
              }
            }
        }
        assert(ids(s"$idx/codes") == m.stored.keySet,
          s"seed=$seed step=$step verb=$verb codes mismatch")
        assert(ids(vec) == m.stored.keySet,
          s"seed=$seed step=$step verb=$verb vector store mismatch")
        val masked = SimilarityQueries.binLoadIndex(spark, idx)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        assert(masked == m.stored.keySet -- m.tombs,
          s"seed=$seed step=$step verb=$verb masked load mismatch")
      }
    }
  }
}
