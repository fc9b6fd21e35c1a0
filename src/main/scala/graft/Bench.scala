package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{struct, sum, xxhash64}
object Bench {
  /** Force every output column to be computed: count() lets Catalyst prune
    * the projection under test (a scalar query would be timed as a bare
    * parquet scan), so reduce a hash over the full row instead. */
  private def consume(df: DataFrame): Unit =
    df.agg(sum(xxhash64(struct(df.columns.map(df.col): _*)))).collect()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // Warm the JIT/codegen paths of every query at the smallest scale
    // factor first: 43 distinct whole-stage-codegen plans otherwise
    // saturate the compile queue and charge minutes of interpreter time
    // to whichever heavy query runs next. Warmup is not timed.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    ordered.foreach { case (_, fn) =>
      try { consume(fn(spark, warmDir)) } catch { case _: Throwable => () }
    }
    spark.catalog.clearCache() // warmup caches must not serve the timed run
    System.gc() // settle warmup garbage before any timing starts
    val results = ordered.map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        try { consume(fn(spark, sfDir)) } catch { case _: Throwable => () }
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] $name%-28s $dt%8.2f s")
        spark.catalog.clearCache() // operator-internal caches are per-query
        // 47 queries in one JVM: without a nudge, allocation-heavy late
        // queries pay the accumulated old-gen debt of everything before
        // them (observed as 10x bimodal md5-query times)
        System.gc()
        name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
