package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.asDouble
import graft.queries.SimilarityQueries

/** The PQ production composition: codebooks are trained ONCE (pqTrain)
  * and the same trained index serves both the encoder/fidelity consumer
  * (q107) and ADC search (q108). Because every stage is deterministic,
  * "serves both" is provable by exact equality with the standalone query
  * results — the same one-run-feeds-all contract DedupClusterSpec proves
  * for connected components.
  */
class PqIndexSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("one pqTrain + one pqCodes feed ADC search and the codeword " +
    "encoder with results identical to the standalone queries") {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val index = SimilarityQueries.pqTrain(emb)
    val codes = SimilarityQueries.pqCodes(index, emb) // encoded ONCE, reused

    // search from the shared index + persisted codes == the standalone q108
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val fromIndex = SimilarityQueries
      .pqAdcSearch(index, codes, queries, excludeSelfMatches = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val standalone = SparkEntry.queries("q108_pq_adc_search")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(fromIndex.sameElements(standalone),
      "shared-index search must equal the standalone query result")

    // the codeword encoder consumes the SAME index: one codeword per
    // (vector, subspace), and the code-id form agrees row-for-row
    val cw = SimilarityQueries.pqCodewords(index, emb)
    val n = emb.count()
    assert(cw.count() == 4 * n, "one codeword per (vector, subspace)")
    assert(codes.count() == 4 * n, "one code id per (vector, subspace)")
    assert(cw.groupBy("vec_id").count().filter(col("count") =!= 4).count() == 0)
  }

  test("ADC search accepts EXTERNAL query vectors — a vector that is not " +
    "a corpus member still retrieves a full top-k") {
    import spark.implicits._
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val index = SimilarityQueries.pqTrain(emb)
    val codes = SimilarityQueries.pqCodes(index, emb)
    // synthetic query: qid outside the corpus id space, constant vector
    val external = Seq((-1L, Array.fill(64)(0.1)))
      .toDF("qid", "qv")
      .select(col("qid"), col("qv").cast("array<double>").as("qv"))
    val got = SimilarityQueries.pqAdcSearch(index, codes, external, topK = 3)
      .collect()
    assert(got.length == 3, s"expected a full top-3, got ${got.length}")
    assert(got.map(_.getLong(0)).forall(_ == -1L))
    assert(got.map(_.getInt(2)).toSeq == Seq(1, 2, 3))
  }

  test("an external qid colliding with a corpus vec_id does NOT lose that " +
    "candidate: self-exclusion is opt-in") {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val index = SimilarityQueries.pqTrain(emb)
    val codes = SimilarityQueries.pqCodes(index, emb)
    // query = corpus vector 0 itself, under the colliding qid 0. Its own
    // codes are the per-subspace argmin for this exact vector, so no code
    // combination scores lower and ties break to the lowest vec_id: rank 1
    // MUST be vec 0 — unless the self-filter wrongly drops it.
    val q0 = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val top = SimilarityQueries.pqAdcSearch(index, codes, q0, topK = 1)
      .collect()
    assert(top.length == 1 && top.head.getLong(1) == 0L,
      s"colliding external qid must keep corpus vec 0: ${top.toSeq}")
  }

  test("pqSaveIndex/pqLoadIndex round-trips: a search from the loaded " +
    "index equals the in-memory search, and its plan reads ONLY the " +
    "persisted codes plus the queries — never the embeddings") {
    import spark.implicits._
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val trained = SimilarityQueries.pqTrain(emb)
    val codes = SimilarityQueries.pqCodes(trained, emb)
    val path = tmpDir("pqidx") + "/pq_index_store"
    SimilarityQueries.pqSaveIndex(trained, codes, path)
    val (loaded, loadedCodes) = SimilarityQueries.pqLoadIndex(spark, path)
    assert(loaded.fingerprint == trained.fingerprint,
      "round-trip must preserve the codebook fingerprint")
    assert((loaded.subspaces, loaded.subDim)
      == (trained.subspaces, trained.subDim))

    // external query so the ONLY legitimate scans are codes + literal
    val external = Seq((-1L, Array.fill(64)(0.1))).toDF("qid", "qv")
      .select(col("qid"), col("qv").cast("array<double>").as("qv"))
    val fromDisk = SimilarityQueries
      .pqAdcSearch(loaded, loadedCodes, external, topK = 3)
    val inMemory = SimilarityQueries
      .pqAdcSearch(trained, codes, external, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(fromDisk.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .sameElements(inMemory),
      "loaded-index search must equal the in-memory search")
    val plan = fromDisk.queryExecution.executedPlan.toString
    assert(plan.contains("pq_index_store"),
      s"search plan must scan the persisted codes:\n$plan")
    assert(!plan.contains("embeddings.parquet"),
      s"search plan must NOT re-scan the embeddings:\n$plan")
  }

  test("codes encoded by a DIFFERENT training fail the fingerprint check " +
    "instead of silently joining on colliding code ids") {
    import spark.implicits._
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val indexA = SimilarityQueries.pqTrain(emb)
    // same geometry, different training corpus -> different codebooks
    val indexB = SimilarityQueries.pqTrain(
      emb.filter(col("vec_id") >= 100), subspaces = 4, subDim = 16)
    assert(indexA.fingerprint != indexB.fingerprint)
    val codesB = SimilarityQueries.pqCodes(indexB, emb)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val ex = intercept[Exception] {
      SimilarityQueries.pqAdcSearch(indexA, codesB, q, topK = 1).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("fingerprint mismatch")),
      s"expected the fingerprint assert, got: $ex")

    // and codes with no fingerprint column at all are rejected up front
    val bare = codesB.drop("fp")
    val ex2 = intercept[IllegalArgumentException] {
      SimilarityQueries.pqAdcSearch(indexA, bare, q, topK = 1)
    }
    assert(ex2.getMessage.contains("fp"))
  }

  test("the FULL persisted ANN index: IVF centroids/cells and PQ " +
    "codebooks/codes round-trip, and searching from the four loaded " +
    "relations equals the in-memory IVF-PQ search") {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val (cents, cells) = SimilarityQueries.ivfTrain(emb)
    val index = SimilarityQueries.pqTrain(emb)
    val codes = SimilarityQueries.pqCodes(index, emb)
    val base = tmpDir("annidx")
    SimilarityQueries.ivfSaveIndex(cents, cells, s"$base/ivf_store")
    SimilarityQueries.pqSaveIndex(index, codes, s"$base/pq_store")
    val (lCents, lCells) = SimilarityQueries.ivfLoadIndex(spark, s"$base/ivf_store")
    val (lIndex, lCodes) = SimilarityQueries.pqLoadIndex(spark, s"$base/pq_store")
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    def run(cl: org.apache.spark.sql.DataFrame, ct: org.apache.spark.sql.DataFrame,
        ix: SimilarityQueries.PqIndex, cd: org.apache.spark.sql.DataFrame) =
      SimilarityQueries.ivfPqSearch(cl, ct, ix, cd, q, excludeSelfMatches = true)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(run(lCells, lCents, lIndex, lCodes)
      .sameElements(run(cells, cents, index, codes)),
      "search from the persisted index must equal the in-memory search")
  }

  test("a mixed IVF store — cells assigned by a different centroid " +
    "training — fails at load instead of pruning the wrong cells") {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val (centsA, cellsA) = SimilarityQueries.ivfTrain(emb)
    val (centsB, cellsB) =
      SimilarityQueries.ivfTrain(emb.filter(col("vec_id") >= 100))
    val base = tmpDir("annidx-mixed")
    SimilarityQueries.ivfSaveIndex(centsA, cellsA, s"$base/a")
    SimilarityQueries.ivfSaveIndex(centsB, cellsB, s"$base/b")
    // splice B's cells under A's centroids (preserving B's stamp)
    spark.read.parquet(s"$base/b/cells")
      .write.mode("overwrite").parquet(s"$base/a/cells")
    val ex = intercept[IllegalArgumentException] {
      SimilarityQueries.ivfLoadIndex(spark, s"$base/a")
    }
    assert(ex.getMessage.contains("different centroid set"),
      s"expected the mixed-store check, got: ${ex.getMessage}")
  }

  test("an APPENDED foreign cell assignment — not just an overwrite — " +
    "fails the IVF load check (every row's stamp is validated, never " +
    "one sampled row)") {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val (centsA, cellsA) = SimilarityQueries.ivfTrain(emb)
    val (centsB, cellsB) =
      SimilarityQueries.ivfTrain(emb.filter(col("vec_id") >= 100))
    val base = tmpDir("annidx-append")
    SimilarityQueries.ivfSaveIndex(centsA, cellsA, s"$base/a")
    SimilarityQueries.ivfSaveIndex(centsB, cellsB, s"$base/b")
    // the append lifecycle gone wrong: B's assignment lands ON TOP of A's
    spark.read.parquet(s"$base/b/cells")
      .write.mode("append").parquet(s"$base/a/cells")
    val ex = intercept[IllegalArgumentException] {
      SimilarityQueries.ivfLoadIndex(spark, s"$base/a")
    }
    assert(ex.getMessage.contains("different centroid set"),
      s"expected the mixed-store check, got: ${ex.getMessage}")
  }

  test("a mis-paired SAVE — cells assigned by one training, centroids " +
    "from another — fails at save time, before a self-consistent-looking " +
    "store can exist") {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val (centsA, _) = SimilarityQueries.ivfTrain(emb)
    val (_, cellsB) =
      SimilarityQueries.ivfTrain(emb.filter(col("vec_id") >= 100))
    val ex = intercept[IllegalArgumentException] {
      SimilarityQueries.ivfSaveIndex(centsA, cellsB,
        tmpDir("annidx-mispair") + "/store")
    }
    assert(ex.getMessage.contains("different centroid set"),
      s"expected the mis-pair check, got: ${ex.getMessage}")
    // and unstamped cells (not produced by ivfTrain) are refused outright
    val ex2 = intercept[IllegalArgumentException] {
      SimilarityQueries.ivfSaveIndex(centsA,
        cellsB.drop("fp"), tmpDir("annidx-nostamp") + "/store")
    }
    assert(ex2.getMessage.contains("no provenance stamp"),
      s"expected the missing-stamp check, got: ${ex2.getMessage}")
  }

  test("the APPEND verb: a new batch encoded/assigned with the LOADED " +
    "index lands in both stores, the appended stores pass load " +
    "validation, and search sees the increment") {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val old = emb.filter(col("vec_id") >= 10)
    val inc = emb.filter(col("vec_id") < 10)
    val (cents, cells) = SimilarityQueries.ivfTrain(old)
    val index = SimilarityQueries.pqTrain(old)
    val base = tmpDir("annidx-appendverb")
    SimilarityQueries.ivfSaveIndex(cents, cells, s"$base/ivf")
    SimilarityQueries.pqSaveIndex(index,
      SimilarityQueries.pqCodes(index, old), s"$base/pq")

    // append the increment using ONLY loaded state (the production path)
    val (lCents, _) = SimilarityQueries.ivfLoadIndex(spark, s"$base/ivf")
    val (lIndex, _) = SimilarityQueries.pqLoadIndex(spark, s"$base/pq")
    SimilarityQueries.pqAppendCodes(lIndex, inc, s"$base/pq")
    SimilarityQueries.ivfAppendCells(lCents, inc, s"$base/ivf")

    // appended stores reload cleanly (row-wise stamp checks included)
    val (rCents, rCells) = SimilarityQueries.ivfLoadIndex(spark, s"$base/ivf")
    val (rIndex, rCodes) = SimilarityQueries.pqLoadIndex(spark, s"$base/pq")
    val n = emb.count()
    assert(rCells.count() == n, "cells must cover old + increment")
    assert(rCodes.count() == 4 * n, "codes must cover old + increment")

    // search sees the increment: query = increment vector 0 itself; its
    // own codes are the per-subspace argmin for this exact vector, so no
    // code combination scores lower and ties break to the lowest vec_id
    val q0 = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val flatTop = SimilarityQueries.pqAdcSearch(rIndex, rCodes, q0, topK = 1)
      .collect()
    assert(flatTop.length == 1 && flatTop.head.getLong(1) == 0L,
      s"flat ADC over the appended store must retrieve the increment: " +
        s"${flatTop.toSeq}")
    val ivfTop = SimilarityQueries
      .ivfPqSearch(rCells, rCents, rIndex, rCodes, q0, topK = 1)
      .collect()
    assert(ivfTop.length == 1 && ivfTop.head.getLong(1) == 0L,
      s"IVF-PQ over the appended store must retrieve the increment " +
        s"(its cell is the query's nearest): ${ivfTop.toSeq}")

    // a foreign index cannot append: fails BEFORE touching the store
    val foreign = SimilarityQueries.pqTrain(emb.filter(col("vec_id") >= 100))
    val ex = intercept[IllegalArgumentException] {
      SimilarityQueries.pqAppendCodes(foreign, inc, s"$base/pq")
    }
    assert(ex.getMessage.contains("different training"))
    val (foreignCents, _) =
      SimilarityQueries.ivfTrain(emb.filter(col("vec_id") >= 100))
    val ex2 = intercept[IllegalArgumentException] {
      SimilarityQueries.ivfAppendCells(foreignCents, inc, s"$base/ivf")
    }
    assert(ex2.getMessage.contains("different centroids"))
    assert(SimilarityQueries.pqLoadIndex(spark, s"$base/pq")
      ._2.count() == 4 * n, "failed appends must leave the store intact")

    // a RETRIED append of the same batch (crash after the write, rerun
    // of the job) is a no-op — duplicate (vec_id, sub) rows would double
    // those vectors' summed ADC distances and silently demote them
    SimilarityQueries.pqAppendCodes(lIndex, inc, s"$base/pq")
    SimilarityQueries.ivfAppendCells(lCents, inc, s"$base/ivf")
    assert(SimilarityQueries.pqLoadIndex(spark, s"$base/pq")._2.count() == 4 * n,
      "re-appending an already-stored batch must not duplicate codes")
    assert(SimilarityQueries.ivfLoadIndex(spark, s"$base/ivf")._2.count() == n,
      "re-appending an already-stored batch must not duplicate cells")
  }

  test("the assignment metric is part of the IVF index identity: an " +
    "L2-assigned store round-trips, but a cosine append onto it fails " +
    "the provenance gate") {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val old = emb.filter(col("vec_id") >= 5)
    val (cents, cells) = SimilarityQueries.ivfTrain(old, byL2 = true)
    val base = tmpDir("annidx-metric")
    SimilarityQueries.ivfSaveIndex(cents, cells, s"$base/ivf")
    val (lCents, lCells) = SimilarityQueries.ivfLoadIndex(spark, s"$base/ivf")
    assert(lCells.count() == old.count(), "L2 store must round-trip")
    val inc = emb.filter(col("vec_id") < 5)
    val ex = intercept[IllegalArgumentException] {
      SimilarityQueries.ivfAppendCells(lCents, inc, s"$base/ivf") // cosine!
    }
    assert(ex.getMessage.contains("different metric"),
      s"metric mismatch must fail the gate, got: ${ex.getMessage}")
    SimilarityQueries.ivfAppendCells(lCents, inc, s"$base/ivf", byL2 = true)
    assert(SimilarityQueries.ivfLoadIndex(spark, s"$base/ivf")
      ._2.count() == emb.count(), "same-metric append must land")
  }

  test("lshMultiAnn's self-exclusion is opt-in: an external qid that " +
    "collides with a corpus vec_id keeps that corpus vector as a " +
    "candidate by default") {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    // external query whose id collides with corpus vec 0 AND whose vector
    // IS corpus vec 0's — its nearest neighbor is exactly the collision
    val external = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val kept = SimilarityQueries.lshMultiAnn(emb, external)
      .filter(col("neighbor_id") === 0).count()
    assert(kept == 1L,
      "external qid 0 must keep corpus vec 0 (sim = 1.0) as a candidate")
    val dropped = SimilarityQueries
      .lshMultiAnn(emb, external, excludeSelfMatches = true)
      .filter(col("neighbor_id") === 0).count()
    assert(dropped == 0L,
      "corpus-member queries (excludeSelfMatches = true) must drop the self pair")
  }

  test("the COMPOSED residual store: save/load round-trips and a search " +
    "from the four loaded relations equals the in-session q127 exactly") {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    // train exactly as q127 does (32 coarse cells, residual-space PQ)
    val (cents, cells0) = SimilarityQueries.ivfTrain(emb, k = 32)
    val cells = cells0.localCheckpoint(true)
    val rv = SimilarityQueries.ivfResiduals(emb, cents, cells)
      .select("vec_id", "v").localCheckpoint(true)
    val index = SimilarityQueries.pqTrain(rv)
    val base = tmpDir("annidx-residual") + "/store"
    SimilarityQueries.residualSaveIndex(cents, cells, index,
      SimilarityQueries.pqCodes(index, rv), base)
    val (lCents, lCells, lIndex, lCodes) =
      SimilarityQueries.residualLoadIndex(spark, base)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val fromStore = SimilarityQueries
      .ivfPqSearchResidual(lCells, lCents, lIndex, lCodes, q,
        excludeSelfMatches = true)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val inSession = SparkEntry.queries("q127_ivf_pq_residual")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(fromStore.sameElements(inSession),
      "the persisted residual index must reproduce q127 exactly — " +
        "otherwise production serves the flat encoding the residual " +
        "pipeline exists to beat")
  }

  test("a flat pq/ tree spliced into a residual store — same geometry, " +
    "raw-space training — fails the composed pairing at load") {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val (cents, cells0) = SimilarityQueries.ivfTrain(emb)
    val cells = cells0.localCheckpoint(true)
    val rv = SimilarityQueries.ivfResiduals(emb, cents, cells)
      .select("vec_id", "v").localCheckpoint(true)
    val index = SimilarityQueries.pqTrain(rv)
    val base = tmpDir("annidx-splice") + "/store"
    SimilarityQueries.residualSaveIndex(cents, cells, index,
      SimilarityQueries.pqCodes(index, rv), base)
    // the splice: a FLAT-trained store of identical geometry overwrites
    // pq/ — it passes pqLoadIndex's own checks (it is self-consistent)
    val flat = SimilarityQueries.pqTrain(emb)
    SimilarityQueries.pqSaveIndex(flat,
      SimilarityQueries.pqCodes(flat, emb), s"$base/pq")
    val ex = intercept[IllegalArgumentException] {
      SimilarityQueries.residualLoadIndex(spark, base)
    }
    assert(ex.getMessage.contains("composed stamp"),
      s"expected the composed-pairing check, got: ${ex.getMessage}")
  }

  test("the composed residual APPEND verb: an increment assigned, " +
    "subtracted, and encoded with the LOADED halves lands in both " +
    "stores; foreign halves fail before the store is touched; a " +
    "retried append is a no-op") {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val old = emb.filter(col("vec_id") >= 10)
    val inc = emb.filter(col("vec_id") < 10)
    val (cents, cells0) = SimilarityQueries.ivfTrain(old)
    val cells = cells0.localCheckpoint(true)
    val rv = SimilarityQueries.ivfResiduals(old, cents, cells)
      .select("vec_id", "v").localCheckpoint(true)
    val index = SimilarityQueries.pqTrain(rv)
    val base = tmpDir("annidx-res-append") + "/store"
    SimilarityQueries.residualSaveIndex(cents, cells, index,
      SimilarityQueries.pqCodes(index, rv), base)

    val (lCents, _, lIndex, _) = SimilarityQueries.residualLoadIndex(spark, base)
    SimilarityQueries.residualAppendVectors(lCents, lIndex, inc, base)

    val (rCents, rCells, rIndex, rCodes) =
      SimilarityQueries.residualLoadIndex(spark, base)
    val n = emb.count()
    assert(rCells.count() == n, "cells must cover old + increment")
    assert(rCodes.count() == 4 * n, "codes must cover old + increment")

    // search sees the increment: vector 0 queries itself; in residual
    // space its own codes are the per-subspace argmin for its exact
    // residual, so no code combination scores lower, ties to lowest id
    val q0 = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val top = SimilarityQueries
      .ivfPqSearchResidual(rCells, rCents, rIndex, rCodes, q0, topK = 1)
      .collect()
    assert(top.length == 1 && top.head.getLong(1) == 0L,
      s"residual search over the appended store must retrieve the " +
        s"increment: ${top.toSeq}")

    // foreign halves fail the pairing gate before any write
    val (fCents, fCells0) =
      SimilarityQueries.ivfTrain(emb.filter(col("vec_id") >= 100))
    val fCells = fCells0.localCheckpoint(true)
    val fRv = SimilarityQueries
      .ivfResiduals(emb.filter(col("vec_id") >= 100), fCents, fCells)
      .select("vec_id", "v")
    val foreign = SimilarityQueries.pqTrain(fRv)
    val ex = intercept[IllegalArgumentException] {
      SimilarityQueries.residualAppendVectors(fCents, foreign, inc, base)
    }
    assert(ex.getMessage.contains("pairing"),
      s"expected the pairing gate, got: ${ex.getMessage}")
    assert(SimilarityQueries.residualLoadIndex(spark, base)._4.count() == 4 * n,
      "a failed append must leave the store intact")

    // retried append of the same batch (crash-after-write rerun): no-op
    SimilarityQueries.residualAppendVectors(lCents, lIndex, inc, base)
    val (_, cells2, _, codes2) = SimilarityQueries.residualLoadIndex(spark, base)
    assert(cells2.count() == n && codes2.count() == 4 * n,
      "re-appending an already-stored batch must not duplicate rows")
  }
}
