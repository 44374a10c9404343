package graft

import org.apache.spark.sql.{DataFrame, GraftCheckpointBridge}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import graft.queries.DedupQueries

/** Round-14 plan contract for the iterative kernels: loop state that is
  * checkpointed through GraftCheckpointBridge re-enters the next round
  * still hash-placed on its key, so one hash-to-min round and one
  * PageRank iteration each plan with EXACTLY ONE shuffle exchange (the
  * inherent message/inflow re-key) and zero sort-merge joins — before
  * the bridge, plain localCheckpoint dropped the partitioning under AQE
  * and every round re-shuffled state that was already placed. The
  * mechanism is pinned at an explicit multi-partition width (the 100 TB
  * shape, where AQE does not coalesce); the AQE-coalesced single-
  * partition degenerate (the small-scale shape) is pinned separately.
  * These are plan-TREE assertions in the PlanChecks discipline: a
  * regression that reintroduces a state shuffle fails here, not in a
  * bench delta.
  */
class CcLoopPlanSpec extends SparkSuite {
  import spark.implicits._

  // NOT a.inputPlan (PlanChecks' unwrap): inputPlan predates the
  // EnsureRequirements pass, so the very exchanges these tests count are
  // absent from it; executedPlan is the current physical plan with
  // requirement exchanges in place
  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  private def shuffles(df: DataFrame): Seq[ShuffleExchangeLike] =
    unwrap(df.queryExecution.executedPlan).collect {
      case e: ShuffleExchangeLike => e
    }

  private def smjs(df: DataFrame): Seq[SortMergeJoinExec] =
    unwrap(df.queryExecution.executedPlan).collect {
      case j: SortMergeJoinExec => j
    }

  private def stateDf: DataFrame =
    Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 1L), (2L, 2L),
      (3L, 3L), (9L, 9L)).toDF("v", "u")

  // explicit width (no AQE coalescing) — the at-scale shape
  private def keyedState: DataFrame =
    GraftCheckpointBridge.localCheckpointKeyed(
      stateDf.repartition(4, col("v")).dropDuplicates("v", "u"))

  test("keyed checkpoint preserves hash placement: groupBy on the key plans with zero exchanges") {
    assert(shuffles(keyedState.groupBy("v").agg(min("u"))).isEmpty,
      "groupBy(v) over bridge-checkpointed state must not re-shuffle")
    // the control: a PLAIN localCheckpoint of the same relation loses the
    // placement under AQE and the same aggregate pays an exchange — the
    // asymmetry the bridge exists to remove
    val plain = stateDf.repartition(4, col("v")).dropDuplicates("v", "u")
      .localCheckpoint(true)
    assert(shuffles(plain.groupBy("v").agg(min("u"))).nonEmpty,
      "control failed: plain localCheckpoint now preserves partitioning — " +
        "the bridge may be redundant, re-evaluate")
  }

  test("one CC round plans with exactly one shuffle and no sort-merge join") {
    val round = DedupQueries.ccRoundShape(keyedState)
    assert(shuffles(round).size == 1,
      s"CC round must pay exactly the message re-key:\n${round.queryExecution.executedPlan}")
    assert(smjs(round).isEmpty,
      "the min-attach join must be hash-based (no per-round state sorts)")
  }

  test("CC round output equals the pre-bridge formulation (groupBy+join+distinct)") {
    val c = keyedState
    val mins = c.groupBy("v").agg(min("u").as("m"))
    val wm = c.join(mins, "v")
    val reference = wm.select(col("u").as("v"), col("m").as("u"))
      .union(wm.select(col("m").as("v"), col("u"))).distinct()
    val round = DedupQueries.ccRoundShape(c)
    assert(round.exceptAll(reference).isEmpty && reference.exceptAll(round).isEmpty)
  }

  private def prRelations(width: Option[Int]) = {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
      .toDF("doc_a", "doc_b").localCheckpoint(true)
    val arms = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
    val edges = GraftCheckpointBridge.localCheckpointKeyed(
      width.map(w => arms.repartition(w, col("u")))
        .getOrElse(arms.repartition(col("u"))))
    val nodes = GraftCheckpointBridge.localCheckpointKeyed(
      edges.select(col("u").as("doc_id")).dropDuplicates("doc_id"))
    val edgesD = GraftCheckpointBridge.localCheckpointKeyed(
      edges.join(
        edges.groupBy("u").agg(count(lit(1)).as("d")).hint("shuffle_hash"),
        "u"))
    val r = GraftCheckpointBridge.localCheckpointKeyed(
      nodes.withColumn("r", lit(250000000L)))
    (r, edgesD, nodes)
  }

  test("one PageRank iteration plans with exactly one shuffle and no sort-merge join") {
    val (r, edgesD, nodes) = prRelations(Some(4))
    val iter = DedupQueries.prIterShape(r, edgesD, nodes, 37500000L)
    assert(shuffles(iter).size == 1,
      s"PR iteration must pay exactly the inflow re-key:\n${iter.queryExecution.executedPlan}")
    assert(smjs(iter).isEmpty,
      "PR iteration joins must be hash-based (no per-iteration |E| sorts)")
  }

  test("AQE-coalesced loop state degrades to SinglePartition; the share join is colocated") {
    // with no explicit width AQE coalesces this tiny state to one
    // partition; the bridge must declare SinglePartition (the truthful
    // placement) WITH the materialized size as stats — without stats the
    // planner re-shuffles an "oversized" single partition for
    // parallelism (spark.sql.maxSinglePartitionBytes) and the placement
    // is wasted. The share join (the |E|-sized work) must colocate; the
    // stages above it may still re-shuffle at this degenerate scale
    // because a join OUTPUT's size estimate is the product of its
    // children's (no CBO), which trips the same oversize rule.
    val (r, edgesD, nodes) = prRelations(None)
    assert(edgesD.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.outputPartitioning
    }.exists(_ == org.apache.spark.sql.catalyst.plans.physical.SinglePartition))
    val share = edgesD.join(r.hint("shuffle_hash"),
        col("u") === col("doc_id"))
      .select(col("v"), expr("r div d").as("s"))
    assert(shuffles(share).isEmpty,
      s"colocated single-partition share join must plan shuffle-free:\n${share.queryExecution.executedPlan}")
  }

  test("pagerank over the keyed shapes equals the 4-node closed form") {
    // 1-2, 2-3, 3-4, 1-4 is a 4-cycle: symmetric, every rank equals
    // scale/4 at every iteration under the integer update
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("doc_a", "doc_b")
    val got = DedupQueries.pagerank(pairs, iters = 3)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val scale = 1000000000L
    val tele = (15L * scale) / (100L * 4)
    // per iteration: inflow = 2 * (r div 2) = r (cycle, deg 2 everywhere)
    var rank = scale / 4
    (1 to 3).foreach(_ => rank = tele + (85L * rank) / 100L)
    assert(got.toSeq == Seq(1L, 2L, 3L, 4L).map(d => (d, rank)))
  }
}
