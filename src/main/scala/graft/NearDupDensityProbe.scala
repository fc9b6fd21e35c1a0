package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main for the banded-LSH near-dup chain's scaling: for
  * each dataset dir argument, report vectors, band-bucket occupancy,
  * CANDIDATE pairs (Σ per-bucket nC2, and after the cross-band
  * distinct), and VERIFIED pairs. Separates the two possible causes of
  * a super-10× wall-clock ratio at 10× data — candidate-pair DENSITY
  * (a data property: bucket occupancy grows, so Σ nC2 grows faster
  * than n) vs shuffle WIDTH (a plan property: bytes per candidate) —
  * the distinction the sf1 probe's plan audit needs measured, not
  * argued. Usage:
  *   tools/run.sh graft.NearDupDensityProbe /root/testdata/sf0.1 /tmp/graft-sf1
  */
object NearDupDensityProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{ExtQueries, Similarity}
    // override the band geometry to measure the documented remedy
    // (rowsPerBand growing with ln n) against the default
    val rows = sys.env.get("SPARK_GRAFT_PROBE_ROWS").map(_.toInt)
      .getOrElse(ExtQueries.NearDupRows)
    args.foreach { d =>
      val e = spark.read.parquet(s"$d/embeddings.parquet")
      val n = e.count()
      val bands = Similarity.bandRelation(e, ExtQueries.NearDupBands,
        rows, ExtQueries.EmbeddingDim)
      val occ = bands.groupBy(col("band"), col("bkey"))
        .agg(count(lit(1)).as("n"))
      val r = occ.agg(
        sum(col("n") * (col("n") - 1) / 2).as("cand_sum"),
        max(col("n")).as("max_bucket"),
        count(lit(1)).as("n_buckets")).collect().head
      val distinctCands = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") &&
            col("x.bkey") === col("y.bkey") &&
            col("x.id") < col("y.id"))
        .select(col("x.id"), col("y.id")).distinct().count()
      val verified = Similarity.nearDupPairsLsh(e,
        ExtQueries.CosineThreshold, ExtQueries.NearDupBands,
        rows, ExtQueries.EmbeddingDim).count()
      println(s"[density] dir=$d rowsPerBand=$rows vectors=$n " +
        s"cand_sum=${r.getAs[java.math.BigDecimal]("cand_sum")} " +
        s"distinct_cands=$distinctCands verified=$verified " +
        s"max_bucket=${r.getAs[Long]("max_bucket")} " +
        s"n_buckets=${r.getAs[Long]("n_buckets")}")
    }
    spark.stop()
  }
}
