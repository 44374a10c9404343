package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.{DbParams, Identifiers}

/** Cross-store copy (reference O7/O8, /root/reference/etlhelper/etl.py:368-506).
  *
  * The reference pipes iter_rows(select) into executemany(insert) on one
  * thread — extraction pulled chunk-by-chunk by the loader. In Spark the
  * same composition is ONE lazy plan: read -> transform -> write, and the
  * chunk interleaving becomes true pipelined parallelism across partitions
  * (a strict upgrade: partitions stream concurrently, constant memory per
  * executor, no driver materialization).
  */
object Copy {

  /** O7 copy_rows: arbitrary source DataFrame + in-flight transform into a
    * JDBC sink with the error channel's exact counts.
    */
  def copyRows(src: DataFrame, db: DbParams, table: String,
      transform: DataFrame => DataFrame = identity,
      passwordVariable: Option[String] = None,
      chunkSize: Int = 5000): LoadResult = {
    val r = Load.loadWithErrorChannel(transform(src), db, table,
      passwordVariable, chunkSize)
    // the reference closes every copy with 'N rows processed in total'
    // (etl.py:327-328, pinned at test_etl_logging.py:21)
    graft.Logging.logTotalProcessed(r.processed)
    r
  }

  /** O8 copy_table_rows: whole-table copy by validated name. */
  def copyTableRows(spark: SparkSession, srcDb: DbParams, destDb: DbParams,
      table: String, target: Option[String] = None,
      passwordVariable: Option[String] = None,
      chunkSize: Int = 5000): LoadResult = {
    Identifiers.validate(table)
    val src = Extract.fromJdbc(spark, srcDb, s"SELECT * FROM $table",
      passwordVariable, chunkSize)
    copyRows(src, destDb, target.getOrElse(table), identity, passwordVariable, chunkSize)
  }

  /** File-store copy: parquet -> transform -> parquet as one lazy plan.
    * `repartitionBy` co-partitions the output on join keys (write-side
    * bucketing prep) so downstream joins at scale avoid a shuffle.
    */
  def copyParquet(spark: SparkSession, srcPath: String, destPath: String,
      transform: DataFrame => DataFrame = identity,
      partitionByCols: Seq[String] = Nil): Unit = {
    val out = transform(spark.read.parquet(srcPath))
    val writer = out.write.mode(SaveMode.Overwrite)
    (if (partitionByCols.nonEmpty) writer.partitionBy(partitionByCols: _*) else writer)
      .parquet(destPath)
  }

  /** Small-file compaction: rewrite a parquet dataset into
    * ceil(bytes / targetFileBytes) files. Streaming sinks and incremental
    * loads accrete thousands of small files; at scan time each costs a task
    * plus a footer read, and at 100 TB the footer metadata alone can
    * dominate planning. Sizing comes from the filesystem (no data scan);
    * the rewrite is one job with a round-robin repartition (no key skew).
    * Returns the output file count.
    */
  def compactParquet(spark: SparkSession, srcPath: String, destPath: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    // qualify each path against ITS OWN filesystem (a scheme-less dest
    // belongs to the default FS, not the source's), then reject equality
    // AND nesting in either direction: a dest that is an ancestor of the
    // source would delete the source tree on Overwrite, and a dest nested
    // inside the source sits in the very tree being read
    val srcP = new org.apache.hadoop.fs.Path(srcPath)
    val fs = srcP.getFileSystem(conf)
    val srcQ = fs.makeQualified(srcP)
    val destP = new org.apache.hadoop.fs.Path(destPath)
    val destQ = destP.getFileSystem(conf).makeQualified(destP)
    val srcStr = srcQ.toString.stripSuffix("/") + "/"
    val destStr = destQ.toString.stripSuffix("/") + "/"
    require(!srcStr.startsWith(destStr) && !destStr.startsWith(srcStr),
      s"compactParquet input and output overlap ($srcQ vs $destQ): " +
        "Overwrite would destroy data the lazy read still needs")
    val totalBytes = fs.getContentSummary(srcQ).getLength
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(srcPath)
      .repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(destPath)
    nFiles
  }
}
