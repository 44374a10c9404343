package graft

/** Totality on empty input: every registered query must plan and execute
  * against 0-row tables without throwing — the guarantee that a pipeline
  * stage fed an empty upstream partition (or a fresh day with no data)
  * degrades to an empty result, never to a crash.
  */
class EmptyInputSpec extends SparkSuite {

  /** Mirror of the testdata layout with every table's RAW file schema and
    * no rows (events keeps whatever physical ts type this testdata
    * generation carries — Tables.normalizeTs dispatches on the read schema,
    * so the empty file must look like the source file, not like the
    * normalized DataFrame).
    */
  private lazy val emptyDir: String = {
    val src = "/root/testdata/sf0.001"
    val d = tmpDir("empty-sf")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.names.foreach { t =>
      val schema = spark.read.parquet(s"$src/$t.parquet").schema
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.mode("overwrite").parquet(s"$d/$t.parquet")
    }
    d
  }

  /** Global aggregates (no GROUP BY) correctly emit ONE summary row even on
    * empty input — (0, 0, null) — exactly as SQL semantics demand. q134
    * unions TWO global audit aggregates (one per split strategy), so its
    * empty-corpus report is two zero-count rows; q146 reports from a fixed
    * 5-row threshold axis (zero-survivor thresholds still report — the
    * left-join-from-axis design), so its empty-corpus curve is five
    * all-zero rows.
    */
  private val globalAggregates = Map("q71_funnel_conversion" -> 1L,
    "q99_lsh_precision_recall" -> 1L, "q100_dataset_card" -> 1L,
    "q134_split_leakage_audit" -> 2L, "q146_dedup_threshold_curve" -> 5L,
    "q148_bin_recall_audit" -> 1L, "q151_corpus_funnel" -> 4L,
    // q165 is a FIXED constraint battery (the q146 fixed-axis design):
    // an empty warehouse still reports all 8 constraints, each with
    // n_checked = 0 violations = 0 — "nothing to check" is itself a pass
    "q165_data_quality_audit" -> 8L,
    // q177 summarizes each of its five lifecycle revisions with a global
    // aggregate — an empty corpus still versions, compacts, and vacuums,
    // reporting five all-zero/null rows
    "q177_versioned_time_travel" -> 5L)

  test("every registered query executes on empty tables and returns 0 rows " +
    "(global aggregates: their single summary row)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val n = fn(spark, emptyDir).count()
        val expected = globalAggregates.getOrElse(name, 0L)
        if (n == expected) None
        else Some(s"$name returned $n rows on empty input (expected $expected)")
      } catch {
        case e: Throwable => Some(s"$name threw ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
