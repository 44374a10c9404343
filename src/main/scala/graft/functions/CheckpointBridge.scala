package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, PartitioningCollection, UnknownPartitioning}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Bridge around `Dataset.localCheckpoint`'s one blind spot under AQE.
  *
  * The iterative kernels (connected components, PageRank, label
  * propagation) materialize their loop state every round to truncate
  * lineage. `Dataset.localCheckpoint` wraps the persisted internal-row
  * RDD in a `LogicalRDD` carrying the physical plan's
  * `outputPartitioning` — but with adaptive execution enabled the plan
  * root is an `AdaptiveSparkPlanExec`, whose reported partitioning is
  * unknown, so the checkpointed state comes back unpartitioned and EVERY
  * downstream key-clustered operation (the next round's groupBy/join on
  * the same key) re-shuffles rows that are already correctly placed.
  * Across an O(log d)-round loop that is O(rounds) redundant shuffles of
  * the full state.
  *
  * [[GraftCheckpointBridge.localCheckpointKeyed]] does exactly what
  * `Dataset.localCheckpoint(eager = true)` does — copy, persist and
  * count the internal-row RDD, then wrap it in a `LogicalRDD` — but
  * reads the partitioning off the FINAL adaptive plan (available once
  * the RDD is materialized) instead of the adaptive root, so a state
  * relation shaped `repartition(n, key).<keyed op>` re-enters the next
  * round still declared hash-partitioned by `key` and the round plans
  * with zero exchanges on the state side. The declared partitioning is
  * whatever the executed plan actually produced — never an assumption.
  */
object GraftCheckpointBridge {

  /** The session's configured shuffle parallelism — the partition count
    * loop kernels pin their state to so that separately checkpointed
    * relations stay co-partitioned across rounds (explicit counts also
    * keep AQE from coalescing one side of a to-be-colocated join).
    */
  def numShufflePartitions(spark: SparkSession): Int =
    spark.asInstanceOf[classic.SparkSession].sessionState.conf.numShufflePartitions

  /** Eager localCheckpoint that PRESERVES the executed plan's output
    * partitioning across the materialization boundary (see class doc).
    * Row set, schema and values are byte-identical to
    * `df.localCheckpoint(true)` — only the partitioning metadata on the
    * returned relation differs.
    */
  def localCheckpointKeyed(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val spark = ds.sparkSession
    // let Dataset.localCheckpoint do the copy/persist/count — it runs as
    // a Dataset ACTION, so attached Observation metrics complete (a bare
    // RDD count would leave observe() blocked forever) and the persisted
    // blocks get the ContextCleaner lifecycle the loops already rely on
    val ck = ds.localCheckpoint(true).asInstanceOf[classic.Dataset[Row]]
    val checkpointed = ck.queryExecution.analyzed.collectFirst {
      case l: LogicalRDD => l
    }.getOrElse(return ck) // unexpected shape: fall back, never break
    // the materialization above finalized the adaptive plan; read the
    // partitioning it actually produced off the FINAL plan
    val finalPlan = ds.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // Dataset.checkpoint's own normalization: a join's collection of
    // equivalent partitionings collapses to its first representative
    def firstLeaf(p: Partitioning): Partitioning = p match {
      case c: PartitioningCollection => firstLeaf(c.partitionings.head)
      case other => other
    }
    // The materialized blocks' exact size is known to the BlockManager —
    // hand it to the re-wrapped relation as its statistics. Without
    // stats a LogicalRDD reports defaultSizeInBytes (effectively
    // infinite), and the planner then "fixes" a perfectly placed
    // single-partition state by re-shuffling it for parallelism
    // (spark.sql.maxSinglePartitionBytes) — undoing the placement this
    // bridge exists to keep.
    val stats = {
      val info = spark.sparkContext.getRDDStorageInfo
        .find(_.id == checkpointed.rdd.id)
      info.map(i => org.apache.spark.sql.catalyst.plans.logical.Statistics(
        sizeInBytes = BigInt((i.memSize + i.diskSize).max(1L))))
    }
    firstLeaf(finalPlan.outputPartitioning) match {
      case _: UnknownPartitioning => ck // nothing to preserve
      // AQE coalesced the state to ONE partition (the routine outcome for
      // loop-state relations below the advisory size): SinglePartition is
      // the truthful declaration — and unlike CoalescedHashPartitioning,
      // which downstream planning only honors for clustering (aggregates)
      // but not for join co-partitioning, it colocates joins too
      case _ if checkpointed.rdd.getNumPartitions == 1 =>
        val plan = LogicalRDD(checkpointed.output, checkpointed.rdd,
          org.apache.spark.sql.catalyst.plans.physical.SinglePartition,
          Nil, isStreaming = false, None)(spark, stats, None)
        classic.Dataset.ofRows(spark, plan)
      case part =>
        val plan = LogicalRDD(checkpointed.output, checkpointed.rdd, part,
          Nil, isStreaming = false, None)(spark, stats, None)
        classic.Dataset.ofRows(spark, plan)
    }
  }
}
