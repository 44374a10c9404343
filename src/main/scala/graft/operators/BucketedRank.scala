package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed (optionally per-group) global rank — the two-pass
  * replacement for `row_number() over (order by ...)` (Exchange
  * SinglePartition: the whole input sorts on ONE task) and for
  * `row_number() over (partition by group order by ...)` when one group
  * can be corpus-sized (the q105 partition-per-source trap).
  *
  * Pass 1 counts rows per (group, bucket) — tiny — and turns the counts
  * into exclusive prefix offsets with a window over buckets WITHIN each
  * group (bucket-count-sized partitions, never input-sized). Pass 2
  * ranks within each (group, bucket) cell and adds the broadcast
  * offset.
  *
  * CORRECTNESS CONTRACT: `bucketCol` must be a PREFIX of the total
  * `order` — every row of bucket b (in `bucketAsc` direction) must sort
  * before every row of bucket b+1 — e.g. a range bucket of the leading
  * sort key (`doc_id div 4096` for doc_id order, `floor(q*1024)` DESC
  * for quality-DESC order, a hash-string prefix for hash order). Hash
  * buckets (fine for [[GroupTopK]]) would be WRONG here: rank needs the
  * bucket order to BE the row order. `bucketCol` must also be NON-NULL
  * on every row — the offsets join is a null-unsafe equi-join, so a
  * null bucket would silently drop its rows from the ranking; the
  * operator fails loudly instead (coalesce the bucket expression to a
  * sentinel range first if nulls are expected). The prefix-SUM twin of
  * this pattern (running sums instead of ranks) lives inline in
  * q94/q115.
  */
object BucketedRank {

  /** Appends `rankName` — the exact 1-based rank under `order` within
    * each `groupCols` group (global when empty) — to `df`, which must
    * already carry `bucketCol`.
    */
  def rank(df: DataFrame, groupCols: Seq[String], bucketCol: String,
      bucketAsc: Boolean, order: Seq[Column],
      rankName: String = "rank"): DataFrame = {
    require(df.columns.contains(bucketCol),
      s"bucket column $bucketCol not in input (${df.columns.mkString(", ")})")
    require(!df.columns.contains(rankName),
      s"input already carries the rank column $rankName — pass a free name")
    require(!df.columns.exists(_.startsWith("__graft_rank_")),
      "input already carries a reserved __graft_rank_* column")
    val keys = groupCols :+ bucketCol
    val bOrd = if (bucketAsc) col(bucketCol).asc else col(bucketCol).desc
    // a NULL bucket cannot take part in the offsets equi-join below —
    // its rows would vanish from the ranking (counted in nothing,
    // joined to nothing) while the naive window this operator replaces
    // would have ranked them. Fail per-row and loudly instead; the
    // check is a codegen'd map-side predicate, free at any scale.
    val checked = df.filter(
      assert_true(col(bucketCol).isNotNull,
        lit(s"BucketedRank: NULL $bucketCol — null buckets would be " +
          "silently dropped by the offsets join; coalesce the bucket " +
          "expression to a sentinel range first")).isNull)
    val counts = checked.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__graft_rank_c"))
    val offW = Window.partitionBy(groupCols.map(col): _*).orderBy(bOrd)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts
      .withColumn("__graft_rank_off",
        coalesce(sum("__graft_rank_c").over(offW), lit(0L)))
      .select(keys.map(col) :+ col("__graft_rank_off"): _*)
    val wb = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    checked.join(broadcast(offs), keys)
      .withColumn(rankName, col("__graft_rank_off") + row_number().over(wb))
      .drop("__graft_rank_off")
  }
}
