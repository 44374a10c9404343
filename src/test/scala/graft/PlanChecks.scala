package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec}

/** Physical-plan tree assertions shared by the store-probe specs — the
  * string-matching in PlanShapeSpec can't express "no exchange BETWEEN
  * this scan and its join", which is exactly the 100 TB contract for the
  * persisted-index scoring stages: the stored relation must be probed
  * map-side (streamed side of a BroadcastHashJoin), never shuffled or
  * broadcast itself.
  */
object PlanChecks {

  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.inputPlan
    case other => other
  }

  private def scansOf(p: SparkPlan, frag: String): Seq[FileSourceScanExec] =
    p.collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.mkString(",").contains(frag) => f
    }

  /** Asserts the stored relation (any FileScan whose path contains
    * `frag`) reaches its LOWEST enclosing join with no exchange on its
    * side: that join is a BroadcastHashJoin, and within the join's
    * subtree the scan sits under neither a ShuffleExchange nor a
    * BroadcastExchange — i.e. it is the streamed (probe) side, touched
    * exactly once, map-side. Exchanges ABOVE the join (e.g. the
    * best-match aggregation) are fine: they carry join OUTPUT, which is
    * candidate-bounded by construction.
    */
  def assertStoredSideExchangeFree(df: DataFrame, frag: String): Unit = {
    val p = unwrap(df.queryExecution.executedPlan)
    assert(scansOf(p, frag).nonEmpty,
      s"expected a FileScan of '$frag' in the plan:\n$p")
    val joins = p.collect {
      case j: BaseJoinExec if scansOf(j, frag).nonEmpty => j
    }
    assert(joins.nonEmpty,
      s"no join above the '$frag' scan in the plan:\n$p")
    val lowest = joins.filter { j =>
      j.children.flatMap(_.collect { case jj: BaseJoinExec => jj })
        .forall(jj => scansOf(jj, frag).isEmpty)
    }
    lowest.foreach { j =>
      assert(j.isInstanceOf[BroadcastHashJoinExec],
        s"lowest join above the '$frag' scan must be a BroadcastHashJoin " +
          s"probing the store, got ${j.nodeName}:\n$p")
      val offending = j.collect {
        case e: ShuffleExchangeLike if scansOf(e, frag).nonEmpty => e
        case e: BroadcastExchangeLike if scansOf(e, frag).nonEmpty => e
      }
      assert(offending.isEmpty,
        s"the '$frag' scan sits under ${offending.map(_.nodeName)} inside " +
          s"its scoring join — the stored side must stream exchange-free:\n$p")
    }
  }
}
