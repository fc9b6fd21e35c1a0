package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time one query by name. Usage: QueryTimer <sfDir> <name...> */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // events.ts is written tz-naive (isAdjustedToUTC=false); read it as
      // TIMESTAMP (session tz is UTC, so values are identical) so that
      // withWatermark / window accept it — NTZ has no streaming event time.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // same cached-plan AQE as Bench — timings must match its plans
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1).count() // warm
    // SPARK_GRAFT_CONSUME=hash reduces a hash over every output column
    // (the Bench action — count() lets Catalyst prune the work under
    // test, e.g. a left join survives count() as its left side only)
    val hashConsume = sys.env.get("SPARK_GRAFT_CONSUME").contains("hash")
    args.tail.foreach { name =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val label =
        if (hashConsume) {
          import org.apache.spark.sql.functions.{bit_xor, struct, xxhash64}
          val h = df.agg(bit_xor(xxhash64(struct(df.columns.map(df.col): _*))))
            .collect().head
          s"hash ${if (h.isNullAt(0)) "∅ (0 rows)" else h.getLong(0).toString}"
        } else s"${df.count()} rows"
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  $label")
    }
    spark.stop()
  }
}
