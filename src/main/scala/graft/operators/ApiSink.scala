package graft.operators

import org.apache.spark.sql.DataFrame

/** Database-to-API sink (the reference's aiohttp recipe,
  * docs/recipes/database_to_api.rst, made a first-class distributed sink):
  * rows serialize to JSON and post in bounded batches from every partition
  * concurrently — the reference's "async consumer downstream" speedup is the
  * default here because partitions ship in parallel.
  *
  * The transport is injected (`send`) so the sink is testable and
  * backend-agnostic (HTTP client, queue producer, ...). Failures in a batch
  * raise and fail the task — retries follow Spark task-retry semantics, so
  * `send` should be idempotent (e.g. keyed PUT) for exactly-once targets.
  */
object ApiSink {

  /** Post each partition's rows as JSON-string batches of `batchSize`.
    * Returns the exact number of rows shipped (accumulator-counted).
    */
  def postJson(df: DataFrame, batchSize: Int = 500)(
      send: Seq[String] => Unit): Long = {
    val shipped = df.sparkSession.sparkContext.longAccumulator("api.shipped")
    df.toJSON.foreachPartition { (it: Iterator[String]) =>
      it.grouped(batchSize).foreach { batch =>
        send(batch)
        shipped.add(batch.size)
      }
    }
    shipped.value
  }
}
