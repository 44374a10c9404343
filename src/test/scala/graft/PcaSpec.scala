package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{asDouble, dot}
import graft.queries.{QuantQueries, SimilarityQueries}

/** The PCA/rotation half of the quantization family: eigen-iteration
  * sanity, whitening semantics, and the MEASURED claim that justifies
  * the verb — variance-balanced rotation (OPQ-lite) must not lose PQ
  * recall at the same code budget, and the numbers land in SCALING.md.
  */
class PcaSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables(spark, dir, "embeddings")
    .select(col("vec_id"), asDouble(col("embedding")).as("v"))

  test("power-iteration eigenvalues are positive, ordered, and agree " +
    "with the Jacobi decomposition of the same covariance to float " +
    "precision on the well-separated head") {
    val (comps, trace) = QuantQueries.pcaTopComponents(emb, k = 4)
    val lams = comps.map(_._1)
    assert(lams.forall(_ > 0), s"covariance eigenvalues must be positive: $lams")
    assert(lams == lams.sortBy(-_), s"deflation must order eigenvalues: $lams")
    assert(trace > lams.head, "trace bounds any single eigenvalue")

    val (cov, _, _) = QuantQueries.pcaCovarianceAndMean(emb)
    val (jl, _) = QuantQueries.jacobiEigen(cov)
    // the top power-iteration eigenvalue is Rayleigh-quotient-accurate
    // even under slow convergence (near-degenerate spectrum): it must
    // sit within the Jacobi top eigenvalue, never above it
    assert(lams.head <= jl.head + 1e-9,
      s"power head ${lams.head} exceeds Jacobi head ${jl.head}")
    assert(lams.head >= 0.9 * jl.head,
      s"power head ${lams.head} far below Jacobi head ${jl.head} — " +
        "iteration count too low even for a Rayleigh estimate")
  }

  test("the Jacobi basis is orthonormal and reproduces the covariance " +
    "trace — the property opqRotate's distance preservation rests on") {
    val (cov, _, _) = QuantQueries.pcaCovarianceAndMean(emb)
    val (jl, jv) = QuantQueries.jacobiEigen(cov)
    for (a <- 0 until 8; b <- a until 8) {
      val d = jv(a).zip(jv(b)).map { case (x, y) => x * y }.sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-9,
        s"basis rows $a,$b not orthonormal: dot = $d")
    }
    val trace = (0 until 64).map(i => cov(i)(i)).sum
    assert(math.abs(jl.sum - trace) < 1e-9,
      s"eigenvalue sum ${jl.sum} must equal trace $trace")
  }

  test("whitened projections have unit variance per component (on the " +
    "training corpus, up to convergence error of the eigenpair)") {
    val (cov, mean, n) = QuantQueries.pcaCovarianceAndMean(emb)
    val (jl, jv) = QuantQueries.jacobiEigen(cov)
    val comps = (0 until 3).map(i => (jl(i), jv(i)))
    val scores = QuantQueries.pcaProject(emb, comps, mean, whiten = true)
      .collect().groupBy(_.getInt(1))
    comps.indices.foreach { i =>
      val xs = scores(i + 1).map(_.getDouble(2))
      val varc = xs.map(x => x * x).sum / n // mean is 0 by centering
      assert(math.abs(varc - 1.0) < 0.05,
        s"whitened pc${i + 1} variance $varc should be ~1")
    }
  }

  test("OPQ-lite: PQ recall@5 on the variance-balanced rotated frame " +
    "matches or beats PQ on the raw frame at the same 4x8 code budget " +
    "(orthogonal rotation preserves L2, so both answer the same " +
    "queries)") {
    val (cov, mean, _) = QuantQueries.pcaCovarianceAndMean(emb)
    val (_, jv) = QuantQueries.jacobiEigen(cov)
    val rotated = QuantQueries.opqRotate(emb, jv, mean)
      .localCheckpoint(true)

    // ground truth: exact L2 top-5 in the ORIGINAL space (the rotation
    // is orthogonal, so this is the rotated-space truth too)
    val q = emb.filter(col("vec_id") < 25)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val l2 = dot(col("qv"), col("qv")) - lit(2.0) * dot(col("qv"), col("v")) +
      dot(col("v"), col("v"))
    val truth = emb.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), l2.as("d"))
      .collect().groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        qid -> rows.sortBy(r => (r.getDouble(2), r.getLong(1)))
          .take(5).map(_.getLong(1)).toSet
      }

    def recallOf(frame: org.apache.spark.sql.DataFrame): Double = {
      val qs = frame.filter(col("vec_id") < 25)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val index = SimilarityQueries.pqTrain(frame)
      val got = SimilarityQueries.pqAdcSearch(index,
          SimilarityQueries.pqCodes(index, frame), qs,
          excludeSelfMatches = true)
        .collect().groupBy(_.getLong(0))
        .map { case (qid, rows) => qid -> rows.map(_.getLong(1)).toSet }
      truth.toSeq.map { case (qid, t) =>
        t.count(got.getOrElse(qid, Set.empty).contains)
      }.sum.toDouble / (truth.size * 5)
    }

    val raw = recallOf(emb.localCheckpoint(true))
    val rot = recallOf(rotated)
    println(s"[opq] PQ 4x8 recall@5: raw=$raw rotated(balanced)=$rot " +
      s"(25 queries, sf0.001)")
    assert(rot >= raw - 0.02,
      s"variance-balanced rotation must not lose recall: raw=$raw rot=$rot")
  }
}
