package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.{LayoutExpressions, LayoutKernels}

/** Hilbert-ordered table layout — the locality rung above
  * [[ZOrderStore]].
  *
  * Both curves cluster two filter columns into one sort key, but the
  * Z-curve takes long diagonal jumps (bit carries teleport across the
  * grid), so a file covering a Z-interval can span two far-apart
  * blobs of (a, b) space and its min/max footer stats go wide. The
  * Hilbert curve's consecutive indices are ALWAYS grid neighbors
  * (unit Manhattan steps — spec-pinned), so every file covers one
  * CONNECTED blob and rectangle scans touch fewer files — which is
  * why Databricks liquid clustering and spatial stores (S2, Uber H3)
  * moved from Morton to Hilbert.
  *
  * The price: Hilbert d is NOT monotone per coordinate, so the
  * Z-store's one corner-to-corner interval prefilter is unavailable.
  * The production answer — implemented here — is covering-range
  * DECOMPOSITION: a driver-side quadtree descent over the (bounded,
  * e.g. 256×256) grid emits the exact set of curve intervals covering
  * the rectangle (boundary cells fragment, interior cells emit whole
  * — a quadtree cell is always a CONTIGUOUS curve interval whose
  * entry point is a cell corner), adjacent intervals merge, and the
  * smallest inter-range gaps merge until at most `maxRanges` remain
  * (a superset — the exact residual predicates keep correctness
  * independent of the coarsening). The scan pushes the OR-of-BETWEEN
  * prefilter into the parquet footer stats. Grid-level compute is
  * driver-side BOUNDED METADATA (≤ 4·perimeter cells at descent,
  * never a data row).
  *
  * Single-writer, like [[ZOrderStore]]. */
object HilbertStore {

  /** Write `df` Hilbert-clustered on the two bounded non-negative grid
    * columns (values in `[0, 2^bits)`; production normalizes first).
    * `files` range-partitions the curve, so each file covers one
    * contiguous — hence spatially CONNECTED — curve interval. */
  def writeHilbert(df: DataFrame, path: String, aCol: String,
      bCol: String, bits: Int, files: Int): Unit = {
    df.withColumn("hval",
        LayoutExpressions.hilbertValue(col(aCol).cast("long"),
          col(bCol).cast("long"), bits))
      .repartitionByRange(files, col("hval"))
      .sortWithinPartitions("hval")
      .write.mode("overwrite").parquet(path)
  }

  /** Marker-gated [[writeHilbert]] (the [[ZOrderStore.ensureZOrdered]]
    * protocol). Returns build seconds, or None when warm. */
  def ensureHilbert(df: DataFrame, path: String, aCol: String,
      bCol: String, bits: Int, files: Int): Option[Double] =
    StoreFiles.markerGate(df.sparkSession, path,
      s"""{"curve":"hilbert","a":"$aCol","b":"$bCol","bits":$bits,""" +
        s""""files":$files}""") {
      writeHilbert(df, path, aCol, bCol, bits, files)
    }

  /** Exact covering curve intervals of `[aLo,aHi]×[bLo,bHi]`, merged
    * down to at most `maxRanges` (merging smallest gaps first — each
    * merge widens the prefilter but never drops a covered point).
    * Quadtree descent: a cell inside the rectangle emits its whole
    * contiguous curve interval `[entry, entry + size² − 1]` (the
    * curve enters and exits quadtree cells at corners, so the entry
    * index is the min over the cell's corners); a disjoint cell emits
    * nothing; a boundary cell recurses. */
  def coveringRanges(aLo: Long, aHi: Long, bLo: Long, bHi: Long,
      bits: Int, maxRanges: Int = 32): Seq[(Long, Long)] = {
    require(maxRanges >= 1, s"maxRanges=$maxRanges")
    // the boundary fragments into O(perimeter) = O(2^bits) cells, so
    // an unbounded grid would turn the driver-side descent into the
    // very data-sized work the decomposition exists to avoid — the
    // "bounded grid" assumption is enforced, not just documented
    require(bits <= 16,
      s"coveringRanges: bits=$bits — the quadtree decomposition is " +
        "bounded-metadata only for grids up to 2^16 per side; " +
        "normalize coarser grid cells for the prefilter (the exact " +
        "residual predicates keep correctness at any granularity)")
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    def cellBase(x0: Long, y0: Long, size: Long): Long = {
      val m = size - 1
      Seq((x0, y0), (x0 + m, y0), (x0, y0 + m), (x0 + m, y0 + m))
        .map { case (x, y) => LayoutKernels.hilbertD(x, y, bits) }.min
    }
    def descend(x0: Long, y0: Long, size: Long): Unit = {
      val x1 = x0 + size - 1
      val y1 = y0 + size - 1
      if (x1 < aLo || x0 > aHi || y1 < bLo || y0 > bHi) ()
      else if (x0 >= aLo && x1 <= aHi && y0 >= bLo && y1 <= bHi) {
        val base = cellBase(x0, y0, size)
        out += ((base, base + size * size - 1))
      } else {
        val h = size / 2
        descend(x0, y0, h); descend(x0 + h, y0, h)
        descend(x0, y0 + h, h); descend(x0 + h, y0 + h, h)
      }
    }
    descend(0L, 0L, 1L << bits)
    // sort, merge touching/overlapping, then coarsen smallest gaps
    val sorted = out.sortBy(_._1)
    val merged = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    sorted.foreach { r =>
      if (merged.nonEmpty && r._1 <= merged.last._2 + 1)
        merged(merged.length - 1) =
          (merged.last._1, math.max(merged.last._2, r._2))
      else merged += r
    }
    while (merged.length > maxRanges) {
      var best = 1
      var bestGap = Long.MaxValue
      var i = 1
      while (i < merged.length) {
        val gap = merged(i)._1 - merged(i - 1)._2
        if (gap < bestGap) { bestGap = gap; best = i }
        i += 1
      }
      merged(best - 1) = (merged(best - 1)._1, merged(best)._2)
      merged.remove(best)
    }
    merged.toSeq
  }

  /** Rectangle scan over a Hilbert layout: the covering-range
    * OR-of-BETWEEN prefilter does the file/row-group skipping, the
    * two exact column predicates cut residual false positives. */
  def rectScan(spark: SparkSession, path: String, aCol: String,
      bCol: String, aLo: Long, aHi: Long, bLo: Long, bHi: Long,
      bits: Int, maxRanges: Int = 32): DataFrame = {
    val ranges = coveringRanges(aLo, aHi, bLo, bHi, bits, maxRanges)
    val pre: Column = ranges
      .map { case (lo, hi) => col("hval").between(lo, hi) }
      .reduceOption(_ || _).getOrElse(lit(false))
    spark.read.parquet(path)
      .filter(pre)
      .filter(col(aCol).between(aLo, aHi) &&
        col(bCol).between(bLo, bHi))
  }
}
