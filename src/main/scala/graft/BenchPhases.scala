package graft

/** Build-vs-query cost attribution for the in-query store harnesses.
  *
  * The store-served queries (q163, q167, q170-q176, q178/q187/q188,
  * q179-q181, q189, ...) deliberately run the FULL store lifecycle per
  * execution — build, save, stamp-verify, then the actual search — so
  * the one timed number mixes a cost production amortizes over the
  * store's lifetime with the per-query cost users actually pay. That
  * mix hides real search regressions inside lifecycle noise (a bench
  * delta on such a query needs an A/B to even classify). The harnesses
  * therefore bracket their store-construction phase with [[build]];
  * [[Bench]] registers the query under measurement around each sample
  * and splits the artifact into `build_s` / `query_s` per query.
  *
  * Outside a bench run (Verify, tests, library use) no query is
  * registered and [[build]] is a zero-cost pass-through. Accumulation
  * is keyed by the registered name, not thread, because a harness may
  * run its build jobs on Spark's own threads while the bench loop owns
  * exactly one query at a time.
  */
object BenchPhases {

  private val current = new java.util.concurrent.atomic.AtomicReference[String](null)
  private val acc = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  /** Bench-only: attribute subsequent [[build]] spans to `name`. */
  def setCurrent(name: String): Unit = current.set(name)

  def clearCurrent(): Unit = current.set(null)

  /** Bracket a store-construction phase. Returns the body's value;
    * accumulates its wall time to the registered query, if any.
    */
  def build[A](body: => A): A = {
    val t0 = System.nanoTime()
    try body
    finally {
      val q = current.get()
      if (q != null)
        acc.merge(q, Double.box((System.nanoTime() - t0) / 1e9),
          (a, b) => Double.box(a.doubleValue + b.doubleValue))
    }
  }

  /** Bench-only: drain `name`'s accumulated build seconds (0.0 if the
    * query recorded none), resetting it for the next sample.
    */
  def drain(name: String): Double =
    Option(acc.remove(name)).map(_.doubleValue).getOrElse(0.0)
}
