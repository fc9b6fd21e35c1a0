package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan of queries by name. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // events.ts is written tz-naive (isAdjustedToUTC=false); read it as
      // TIMESTAMP (session tz is UTC, so values are identical) so that
      // withWatermark / window accept it — NTZ has no streaming event time.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // same cached-plan AQE as Bench — dumps must show its plans
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
