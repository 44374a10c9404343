package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed per-group top-k — the scale-correct replacement for
  * `row_number() over (partition by group)` when a single group's
  * candidate set can be corpus-sized (ANN mining with few queries,
  * per-source ranking with few sources): a plain group-keyed window puts
  * corpus/#groups rows on ONE task.
  *
  * Two stages, both bounded: rows are first cut into `numBuckets` hash
  * cells per group (on the tiebreaker column, so the split is uniform
  * and deterministic) and ranked LOCALLY within each (group, cell) —
  * no partition ever exceeds one cell of one group — then the ≤
  * k·numBuckets survivors per group are ranked globally. The pruning is
  * EXACT when `order` is a TOTAL order (include a unique tiebreaker,
  * e.g. the id ascending): every global top-k row wins its own cell, so
  * it survives stage 1.
  *
  * Unlike the two-pass prefix-sum (q94/q106), top-k needs no
  * order-prefix bucketing — ANY deterministic partition of the group
  * works — so the cells are hash buckets and no range-width aggregate
  * or broadcast join is needed at all.
  */
object GroupTopK {

  private val bkCol = "__graft_topk_bk"

  /** Per-group top-k rows of `df` under `order` (must be total for
    * exactness), with the 1-based rank appended as `rankName`.
    *
    * @param tie column the hash cells split on — use the unique
    *            tiebreaker that also terminates `order`
    */
  def topK(df: DataFrame, groupCols: Seq[Column], order: Seq[Column],
      tie: Column, k: Int, numBuckets: Int = 256,
      rankName: String = "rank"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    require(!df.columns.exists(_.startsWith("__graft_topk_")),
      "input already carries a reserved __graft_topk_* column")
    require(!df.columns.contains(rankName),
      s"input already carries the rank column $rankName — pass a free name")
    val wl = Window.partitionBy(groupCols :+ col(bkCol): _*).orderBy(order: _*)
    val wg = Window.partitionBy(groupCols: _*).orderBy(order: _*)
    df.withColumn(bkCol, pmod(xxhash64(tie), lit(numBuckets)))
      .withColumn("__graft_topk_lrn", row_number().over(wl))
      .filter(col("__graft_topk_lrn") <= k)
      .withColumn(rankName, row_number().over(wg))
      .filter(col(rankName) <= k)
      .drop(bkCol, "__graft_topk_lrn")
  }
}
