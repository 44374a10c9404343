package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.StoreRewrite

/** Crash durability of in-place store rewrites (the FORGET verbs rewrite
  * up to three stores each): the old store must survive until the new one
  * is completely on disk, and every intermediate crash state must be
  * recoverable.
  */
class StoreRewriteSpec extends SparkSuite {

  import spark.implicits._

  private def fs(path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  test("rewrite replaces content in place, including self-referential " +
    "filters (read from the path being rewritten)") {
    val base = tmpDir("rewrite")
    (1L to 10L).toDF("id").write.parquet(s"$base/store")
    // the FORGET shape: filter the store against itself, write back
    StoreRewrite.atomicOverwrite(
      spark.read.parquet(s"$base/store").filter(col("id") <= 7),
      s"$base/store")
    assert(spark.read.parquet(s"$base/store").count() == 7)
    assert(!fs(base).exists(new Path(s"$base/store${StoreRewrite.TmpSuffix}")),
      "temp dir must not survive a successful rewrite")
  }

  test("a crash BEFORE the swap (stale incomplete temp dir) is discarded: " +
    "the old store was never touched and the next rewrite starts clean") {
    val base = tmpDir("rewrite-stale")
    (1L to 5L).toDF("id").write.parquet(s"$base/store")
    // simulate: prior rewrite died mid-write, leaving a partial temp
    (100L to 200L).toDF("id").write
      .parquet(s"$base/store${StoreRewrite.TmpSuffix}")
    StoreRewrite.atomicOverwrite(
      spark.read.parquet(s"$base/store").filter(col("id") =!= 3), s"$base/store")
    val got = spark.read.parquet(s"$base/store")
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 4L, 5L),
      s"stale temp content leaked into the store: $got")
  }

  test("a crash BETWEEN delete and rename (target gone, complete temp " +
    "present) is recovered — by recover() and automatically by the next " +
    "rewrite") {
    val base = tmpDir("rewrite-crash")
    (1L to 5L).toDF("id").write
      .parquet(s"$base/store${StoreRewrite.TmpSuffix}")
    // no target: exactly the microsecond-window crash state
    assert(StoreRewrite.recover(spark, s"$base/store"))
    assert(spark.read.parquet(s"$base/store").count() == 5)
    assert(!StoreRewrite.recover(spark, s"$base/store"),
      "recover must be a no-op on a healthy store")

    // same state, healed implicitly by the next rewrite of the path.
    // (A SELF-referential rewrite must recover() first — spark.read
    // resolves the schema eagerly, before atomicOverwrite can heal.)
    val b2 = tmpDir("rewrite-crash2")
    (1L to 4L).toDF("id").write
      .parquet(s"$b2/store${StoreRewrite.TmpSuffix}")
    StoreRewrite.atomicOverwrite((10L to 11L).toDF("id"), s"$b2/store")
    assert(spark.read.parquet(s"$b2/store").as[Long].collect().sorted.toSeq
      == Seq(10L, 11L))
  }
}
