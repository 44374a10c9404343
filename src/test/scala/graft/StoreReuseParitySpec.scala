package graft

/** Bench store-reuse parity gate (round 14): under SPARK_GRAFT_REUSE_STORES
  * (default on) [[Bench]] builds each lifecycle query's stores once and
  * reuses them for runs 2..n — [[BenchPhases.build]] skips its body and
  * returns the memoized value once the query is warm. This spec drives
  * every registered query through exactly that lifecycle at sf0.001 and
  * asserts the WARM sample returns the identical rows, so a read path
  * that mutates its store (the q177 vacuum shape) or a bracket whose
  * return value isn't self-contained can never reach the bench silently.
  *
  * Safe as a plain suite because the forked test JVM runs suites
  * sequentially (build.sbt: Test/fork, no forked parallelism) and no
  * other suite registers a bench query; every query's reuse state is
  * invalidated before moving on, so the spec leaves the JVM cold.
  */
class StoreReuseParitySpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("every lifecycle query returns identical rows from a reused store") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
    var lifecycle = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      BenchPhases.setCurrent(name)
      try {
        val df1 = fn(spark, sfDir) // brackets run during construction
        val built = BenchPhases.drain(name)
        if (built > 0.0) {
          lifecycle += 1
          val r1 = df1.collect().map(_.toString).sorted.toSeq
          BenchPhases.markWarm(name)
          BenchPhases.setCurrent(name) // sample 2: counters reset, brackets skip
          val r2 = fn(spark, sfDir).collect().map(_.toString).sorted.toSeq
          assert(BenchPhases.drain(name) == 0.0,
            s"$name: a warm sample recorded build time — a bracket did not skip")
          assert(r2 == r1, s"$name: warm sample diverged from the building sample")
        }
      } finally {
        BenchPhases.invalidate(name)
        BenchPhases.clearCurrent()
      }
    }
    // the gate must actually exercise the reuse path: the lifecycle
    // census is ~49 queries; a refactor that stops registering builds
    // would otherwise pass vacuously
    assert(lifecycle >= 40, s"only $lifecycle queries recorded a build phase")
  }
}
