package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.{DbParams, Identifiers}
import graft.operators.{Db, Load}

/** Exactly-once JDBC streaming sink via an epoch ledger.
  *
  * Structured Streaming's foreachBatch is at-least-once: after a crash the
  * last epoch replays from the checkpoint. JDBC appends are not idempotent,
  * so replay means duplicates. The production recipe layered here:
  *
  *   1. skip the epoch entirely if the ledger already records it
  *      (fast path for full replays);
  *   2. write the batch with `appendIfAbsent` keyed on the natural key, so
  *      a PARTIAL epoch (crash mid-write, ledger not yet updated) finishes
  *      without duplicating the rows that did land;
  *   3. record the epoch in the ledger last.
  *
  * Steps 2+3 make redelivery idempotent even though the distributed data
  * write and the driver-side ledger insert cannot share a transaction.
  * State per query is one ledger row per epoch — prune old epochs freely.
  */
object IdempotentSink {

  /** DDL helper for the ledger (caller runs once per database). */
  def ledgerDdl(epochTable: String): String = {
    Identifiers.validate(epochTable)
    s"CREATE TABLE $epochTable (query_name VARCHAR(100), epoch_id BIGINT, " +
      "PRIMARY KEY (query_name, epoch_id))"
  }

  /** The per-epoch handler — exposed for direct testing of the redelivery
    * semantics; `start` wires it into foreachBatch.
    */
  def processEpoch(batch: DataFrame, epochId: Long, db: DbParams,
      table: String, epochTable: String, keyCols: Seq[String],
      queryName: String, passwordVariable: Option[String] = None): Boolean = {
    Identifiers.validate(epochTable)
    Identifiers.validate(queryName) // interpolation-free, but keep the gate
    // one-row ledger probe as a driver-side JDBC read with bound parameters
    // — spinning up a Spark job per micro-batch would dominate epoch latency
    val done = Db.queryScalarLong(db,
      s"SELECT COUNT(*) FROM $epochTable WHERE query_name = ? AND epoch_id = ?",
      Seq(queryName, java.lang.Long.valueOf(epochId)), passwordVariable) > 0
    if (done) false
    else {
      val result = Load.appendIfAbsent(batch, db, table, keyCols, passwordVariable)
      // an epoch with quarantined failures must NOT enter the ledger: the
      // replay would be skipped and the failed rows lost forever — fail the
      // micro-batch instead so the checkpoint retries it
      if (result.failed > 0)
        throw new graft.EtlInsertError(
          s"epoch $epochId of $queryName left ${result.failed} rows unwritten; " +
            "refusing to record it as complete",
          s"INSERT INTO $table")
      Db.execute(db, s"INSERT INTO $epochTable (query_name, epoch_id) VALUES (?, ?)",
        Seq(queryName, java.lang.Long.valueOf(epochId)), passwordVariable)
      true
    }
  }

  def start(stream: DataFrame, db: DbParams, table: String, epochTable: String,
      keyCols: Seq[String], checkpoint: String, queryName: String,
      passwordVariable: Option[String] = None): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        processEpoch(batch, epochId, db, table, epochTable, keyCols,
          queryName, passwordVariable)
        ()
      }
      .start()
}
