package graft

/** Bench store-reuse parity gate (round 14): under SPARK_GRAFT_REUSE_STORES
  * (default on) [[Bench]] builds each lifecycle query's stores once and
  * reuses them for runs 2..n — [[BenchPhases.build]] skips its body and
  * returns the memoized value once the query is warm. This spec drives
  * queries through exactly that lifecycle at sf0.001 and asserts the WARM
  * sample returns the identical rows, so a read path that mutates its
  * store (the q177 vacuum shape) or a bracket whose return value isn't
  * self-contained can never reach the bench silently.
  *
  * Round 15 (the r14 verdict's item 1 — the full-suite run must fit the
  * driver's time budget): the DEFAULT run drives a pinned 13-query sample
  * chosen to cover every store family and verb class (text store +
  * federation, versioned text + time travel, signature + sharded +
  * versioned-sharded, winnow, sq8/pq/residual inline, versioned knn,
  * migration, and the q216 triage sweep, which exercises every family's
  * doctor path in one query). SPARK_GRAFT_PARITY_FULL=1 restores the full
  * 216-query sweep (run it when the reuse machinery itself changes); the
  * full sweep also re-takes the lifecycle census so a drift between the
  * pinned list and reality fails loudly there.
  *
  * Safe as a plain suite because suites within one forked test JVM run
  * sequentially and no other suite registers a bench query; every query's
  * reuse state is invalidated before moving on, so the spec leaves the
  * JVM cold.
  */
class StoreReuseParitySpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  /** One lifecycle query per store family / verb class (see class doc). */
  private val sampled = Seq(
    "q112_ivf_pq_search",
    "q127_ivf_pq_residual",
    "q136_sq8_adc_search",
    "q163_bm25_indexed",
    "q174_bm25_sharded",
    "q177_versioned_time_travel",
    "q178_bloom_pruned_probe",
    "q187_winnow_index_probe",
    "q191_signature_sharded_probe",
    "q205_versioned_knn_expand",
    "q208_sq8_sharded_versioned",
    "q213_migrated_text_search",
    "q216_store_triage")

  private val full = sys.env.get("SPARK_GRAFT_PARITY_FULL").contains("1")

  private def driveLifecycle(name: String,
      fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Boolean = {
    BenchPhases.setCurrent(name)
    try {
      val df1 = fn(spark, sfDir) // brackets run during construction
      val built = BenchPhases.drain(name)
      if (built > 0.0) {
        val r1 = df1.collect().map(_.toString).sorted.toSeq
        BenchPhases.markWarm(name)
        BenchPhases.setCurrent(name) // sample 2: counters reset, brackets skip
        val r2 = fn(spark, sfDir).collect().map(_.toString).sorted.toSeq
        assert(BenchPhases.drain(name) == 0.0,
          s"$name: a warm sample recorded build time — a bracket did not skip")
        assert(r2 == r1, s"$name: warm sample diverged from the building sample")
        true
      } else false
    } finally {
      BenchPhases.invalidate(name)
      BenchPhases.clearCurrent()
    }
  }

  test("sampled lifecycle queries return identical rows from a reused store") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
    assume(!full, "full sweep requested — covered by the test below")
    val unknown = sampled.filterNot(SparkEntry.queries.contains)
    assert(unknown.isEmpty,
      s"pinned parity sample names not in SparkEntry.queries: " +
        s"${unknown.mkString(", ")} — update the sample list")
    sampled.foreach { name =>
      assert(driveLifecycle(name, SparkEntry.queries(name)),
        s"$name recorded NO build phase — it is no longer a lifecycle " +
          "query; replace it in the pinned sample")
    }
  }

  test("FULL sweep: every lifecycle query (SPARK_GRAFT_PARITY_FULL=1)") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
    assume(full, "set SPARK_GRAFT_PARITY_FULL=1 to run the full sweep")
    var lifecycle = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (driveLifecycle(name, fn)) lifecycle += 1
    }
    // the gate must actually exercise the reuse path: the lifecycle
    // census is ~50 queries; a refactor that stops registering builds
    // would otherwise pass vacuously
    assert(lifecycle >= 40, s"only $lifecycle queries recorded a build phase")
  }
}
