package graft.operators

/** Driver-side overlap of independent per-shard work (guide §2.6):
  * Spark happily runs several jobs at once inside one application —
  * per-shard store opens are only sequential because the driver calls
  * them sequentially. A federated probe's per-shard setup is a chain of
  * TINY jobs (parquet footer/schema reads, 1-row meta collects, stamp
  * aggregates), each ~25 ms of work plus ~30 ms of driver gap; run for
  * n shards in a row that is the dominant cost of a warm probe at low
  * SF, and at scale it serializes n store-sized verification scans.
  * Constructing the per-shard relations on a small pool overlaps those
  * jobs; results come back in shard order, so the composed plan is the
  * same relation the sequential loop built.
  *
  * Scope: plan CONSTRUCTION and store reads only — callers must not
  * mutate shared state in `f`. Exceptions propagate unwrapped (the
  * store gates' require messages must reach the caller verbatim).
  */
object Parallel {

  /** Map `f` over 0 until n on a bounded pool, preserving index order.
    * n <= 1 short-circuits to a plain call (no pool, no overhead).
    */
  def shards[A](n: Int)(f: Int => A): IndexedSeq[A] = {
    if (n <= 1) return (0 until n).map(f)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(n, 8))
    try {
      val futures = (0 until n).map(i =>
        pool.submit(new java.util.concurrent.Callable[A] {
          override def call(): A = f(i)
        }))
      futures.map { fut =>
        try fut.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause // the gate's own exception, verbatim
        }
      }
    } finally pool.shutdown()
  }
}
