package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-query JOB profile — how many Spark jobs a query's
  * execution submits and where the wall time goes between them. The
  * sharded/store-served probes' cost at low SF is dominated by driver-
  * sequential setup jobs (per-shard stamp scans, marker reads), which a
  * plan dump cannot show; this tool can. Usage:
  *   SPARK_GRAFT_CPUS=32 runMain graft.Profile <sfDir> <query> [query ...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val wanted = args.drop(1)
    require(wanted.nonEmpty, "name at least one query")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach(t => Tables(spark, sfDir, t).count()) // warmup

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = scala.collection.mutable.ListBuffer.empty[(Int, Double, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(js.stageInfos.lastOption.map(_.name))
          .getOrElse("?")
        jobs.put(js.jobId, (js.time, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (t0, desc) =>
          done.synchronized {
            done += ((je.jobId, (je.time - t0) / 1e3, desc)); ()
          }
        }
      }
    })

    wanted.foreach { name =>
      val fn = SparkEntry.queries(name)
      // pass 1 builds the stores and warms codegen/JIT; registering the
      // query with BenchPhases and marking it warm makes pass 2 the
      // bench's steady-state QUERY-ONLY sample (build brackets skip) —
      // exactly the job set behind the artifact's query_s
      (1 to 2).foreach { pass =>
        done.synchronized(done.clear())
        BenchPhases.setCurrent(name)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        val built = BenchPhases.drain(name)
        if (pass == 1) BenchPhases.markWarm(name)
        BenchPhases.clearCurrent()
        Thread.sleep(300) // let the listener bus drain the last job-end
        val snap = done.synchronized(done.toList)
        println(f"\n=== $name pass=$pass wall=$wall%.2f s (build=$built%.2f) " +
          f"jobs=${snap.size} job-sum=${snap.map(_._2).sum}%.2f s ===")
        if (pass == 2) {
          snap.sortBy(_._1).foreach { case (id, s, desc) =>
            println(f"  job $id%4d  $s%7.3f s  ${desc.take(110)}")
          }
        }
      }
      BenchPhases.invalidate(name)
    }
    spark.stop()
  }
}
