package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{bit_xor, struct, xxhash64}

/** Dev utility: per-JOB wall-time breakdown of one query by name — the
  * measurement §1 of the optimization guide asks for before touching
  * anything. A bench entry that spends its seconds in many small jobs
  * is fixed-overhead-bound (fold jobs, cache earlier); one that spends
  * them inside a single job is stage-bound (look at the plan). Runs the
  * query once at the warm dir first (codegen/JIT), then `runs` timed
  * repetitions at the target dir, printing every job of the LAST run
  * with its description, duration, and task count.
  *
  * Usage: JobProfile <sfDir> <query> [query...]   (env: SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_RUNS, SPARK_GRAFT_WARM_DIR)
  */
object JobProfile {
  private case class Job(id: Int, desc: String, start: Long,
      var end: Long = -1L, var tasks: Int = 0)

  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      // AQE coalescing inside cached plans (guide §2.2/§6): the
      // operator caches (CacheRegistry) otherwise materialize at the
      // static shuffle width and every downstream stage inherits the
      // tiny-partition layout; nothing here depends on cached output
      // partitioning. Measured −24% on x_neardup_append.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHED_AQE", "true"))
      .withExtensions(new graft.plans.GraftExtensions())
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (record) {
          val desc = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(js.stageInfos.lastOption.map(_.name))
            .getOrElse("?")
          jobs.put(js.jobId, Job(js.jobId,
            desc.linesIterator.next().take(110), js.time,
            tasks = js.stageInfos.map(_.numTasks).sum))
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val j = jobs.get(je.jobId)
        if (j != null) j.end = je.time
      }
    })

    def consume(df: org.apache.spark.sql.DataFrame): Unit =
      df.agg(bit_xor(xxhash64(struct(df.columns.map(df.col): _*)))).collect()

    args.tail.foreach { name =>
      val fn = SparkEntry.queries(name)
      try { consume(fn(spark, warmDir)) } catch { case _: Throwable => () }
      spark.catalog.clearCache()
      var best = Double.MaxValue
      (1 to runs).foreach { i =>
        jobs.clear()
        record = true
        val t0 = System.nanoTime()
        consume(fn(spark, sfDir))
        val dt = (System.nanoTime() - t0) / 1e9
        record = false
        spark.catalog.clearCache()
        best = math.min(best, dt)
        System.err.println(f"[prof] $name run $i: $dt%.2f s")
        if (i == runs) {
          import scala.jdk.CollectionConverters._
          val js = jobs.values.asScala.toSeq.sortBy(_.id)
          val acct = js.map(j => (j.end - j.start) / 1e3).sum
          println(f"===== $name  last-run ${dt}%.2f s  best $best%.2f s  " +
            f"jobs ${js.size}  job-time-sum $acct%.2f s =====")
          var prevEnd = -1L
          js.foreach { j =>
            val d = if (j.end > 0) f"${(j.end - j.start) / 1e3}%7.3f" else "  (run)"
            // driver-side gap since the previous job ended (planning,
            // FS metadata, clone I/O, manifest commits ...)
            val gap = if (prevEnd > 0) f"${(j.start - prevEnd) / 1e3}%7.3f" else "      -"
            if (j.end > 0) prevEnd = math.max(prevEnd, j.end)
            println(f"  job ${j.id}%4d  $d s  gap $gap s  ${j.tasks}%4d tasks  ${j.desc}")
          }
        }
      }
    }
    spark.stop()
  }
}
