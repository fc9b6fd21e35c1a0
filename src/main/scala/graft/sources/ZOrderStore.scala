package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.{LayoutExpressions, LayoutKernels}

/** Z-ordered table layout — multi-column file skipping at 100 TB.
  *
  * A range-sorted layout serves ONE filter column; a rectangle
  * predicate on two columns leaves the second unclustered and every
  * file a candidate. Writing in Morton (Z-curve) order interleaves the
  * bits of both keys, so rows close in (a, b) space land in the same
  * files and parquet min/max footer stats on the stored `zval` column
  * prune files for 2-D rectangle scans — the layout Delta's
  * OPTIMIZE ZORDER produces, expressed as repartitionByRange + sorted
  * parquet. The scan path exploits Z-curve monotonicity in each
  * coordinate: every point of `[aLo,aHi]×[bLo,bHi]` has
  * `zval ∈ [z(aLo,bLo), z(aHi,bHi)]`, so that single pushed-down range
  * predicate is a correct superset prefilter (the classic BIGMIN
  * refinement would split it tighter; the two exact residual
  * predicates make correctness independent of it either way).
  *
  * Single-writer, like [[StateStore]]: concurrent writers to one
  * layout path are not supported.
  */
object ZOrderStore {

  /** Write `df` Z-clustered on the two bounded non-negative grid
    * columns (values must already sit in `[0, 2^bits)` — production
    * normalizes/bins first, which keeps the layout math integer-exact
    * and engine-replayable). `files` range-partitions the Z-space, so
    * each output file covers a compact Z-interval. */
  def writeZOrdered(df: DataFrame, path: String, aCol: String,
      bCol: String, bits: Int, files: Int): Unit = {
    df.withColumn("zval",
        LayoutExpressions.zValue(col(aCol).cast("long"),
          col(bCol).cast("long"), bits))
      .repartitionByRange(files, col("zval"))
      .sortWithinPartitions("zval")
      .write.mode("overwrite").parquet(path)
  }

  /** Marker-gated [[writeZOrdered]]: skip the write when the layout at
    * `path` was already built with the same recipe (same gate protocol
    * as `VectorIndexStore.ensureIvfPq` — marker written LAST, so a
    * crash mid-write rebuilds instead of serving a half-written
    * layout). Returns build seconds, or None when warm. */
  def ensureZOrdered(df: DataFrame, path: String, aCol: String,
      bCol: String, bits: Int, files: Int): Option[Double] =
    StoreFiles.markerGate(df.sparkSession, path,
      s"""{"a":"$aCol","b":"$bCol","bits":$bits,"files":$files}""") {
      writeZOrdered(df, path, aCol, bCol, bits, files)
    }

  /** Rectangle scan over a Z-ordered layout: one pushed-down `zval`
    * range predicate does the file/row-group skipping, the two exact
    * column predicates cut the Z-range's false positives. */
  def zRangeScan(spark: SparkSession, path: String, aCol: String,
      bCol: String, aLo: Long, aHi: Long, bLo: Long, bHi: Long,
      bits: Int): DataFrame = {
    val zLo = LayoutKernels.interleave(aLo, bLo, bits)
    val zHi = LayoutKernels.interleave(aHi, bHi, bits)
    spark.read.parquet(path)
      .filter(col("zval").between(zLo, zHi))
      .filter(col(aCol).between(aLo, aHi) &&
        col(bCol).between(bLo, bHi))
  }
}
