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
  * INCREMENTAL layout (fmt 2 — the lakehouse OPTIMIZE shape): the
  * clustered table lives in a [[SnapshotDir]] version
  * (`hilb-NNNNNNNN/`); arriving batches land in the version's
  * `_tail/` subdir UNCLUSTERED (batch-sized append — re-sorting the
  * whole table per batch is exactly the write amplification liquid
  * clustering exists to avoid), [[rectScan]] unions clustered + tail
  * under the SAME pushed prefilter and exact residuals (tail rows
  * carry `hval` too — the prefilter prunes weakly there, residuals
  * keep it correct), and [[optimize]] re-sorts the tail in as the
  * NEXT committed version. The underscore name keeps tail files
  * invisible to the clustered scan of the version dir; a crashed
  * optimize leaves an uncommitted dir the next GC sweeps; a crashed
  * tail append leaves only the job committer's `_temporary` debris.
  *
  * Single-writer, like [[ZOrderStore]]. */
object HilbertStore {

  private val Prefix = "hilb-"
  private val TailSub = "_tail"

  private def clustered(df: DataFrame, aCol: String, bCol: String,
      bits: Int, files: Int): DataFrame =
    df.withColumn("hval",
        LayoutExpressions.hilbertValue(col(aCol).cast("long"),
          col(bCol).cast("long"), bits))
      .repartitionByRange(files, col("hval"))
      .sortWithinPartitions("hval")

  /** Write `df` Hilbert-clustered on the two bounded non-negative grid
    * columns (values in `[0, 2^bits)`; production normalizes first)
    * into `dir`. `files` range-partitions the curve, so each file
    * covers one contiguous — hence spatially CONNECTED — curve
    * interval. */
  def writeHilbert(df: DataFrame, dir: String, aCol: String,
      bCol: String, bits: Int, files: Int): Unit =
    clustered(df, aCol, bCol, bits, files)
      .write.mode("overwrite").parquet(dir)

  private def currentDir(spark: SparkSession, path: String): String =
    SnapshotDir.current(spark, path, Prefix).getOrElse(
      throw new IllegalStateException(
        s"no committed hilbert store under $path"))

  /** Recipe-gated build of version 1 (the
    * [[ZOrderStore.ensureZOrdered]] protocol, on the versioned
    * layout). A recipe change rebuilds from a clean root — stale
    * layouts under another recipe are meaningless. Returns build
    * seconds, or None when warm. */
  def ensureHilbert(df: DataFrame, path: String, aCol: String,
      bCol: String, bits: Int, files: Int): Option[Double] = {
    val spark = df.sparkSession
    val marker = s"$path/_built.json"
    val recipe =
      s"""{"curve":"hilbert","fmt":2,"a":"$aCol","b":"$bCol",""" +
        s""""bits":$bits,"files":$files}"""
    if (StoreFiles.readText(spark, marker).contains(recipe) &&
        SnapshotDir.current(spark, path, Prefix).isDefined) None
    else {
      val t0 = System.nanoTime()
      val (fs, hp) = StoreFiles.fsOf(spark, path)
      if (fs.exists(hp)) fs.delete(hp, true)
      SnapshotDir.withWriterLock(spark, path) {
        val v = SnapshotDir.next(spark, path, Prefix)
        writeHilbert(df, s"$path/${SnapshotDir.name(Prefix, v)}",
          aCol, bCol, bits, files)
        SnapshotDir.commit(spark, path, Prefix, v)
      }
      StoreFiles.writeText(spark, marker, recipe)
      Some((System.nanoTime() - t0) / 1e9)
    }
  }

  /** Append a batch UNCLUSTERED into the current version's tail:
    * rows get their curve index (same expression as the clustered
    * write) but no global re-sort — the recurring ingest cost is
    * batch-sized. Runs under the writer lock so an append cannot race
    * an [[optimize]]'s read pass into the old version.
    *
    * `sub` writes the batch into its own tail SUBDIR with overwrite
    * semantics — the streaming sink's idempotence device: a
    * redelivered at-least-once trigger re-overwrites `b<batchId>`
    * with the identical replayed rows instead of duplicating them
    * (stronger than a probe: even a partially-written batch dir heals
    * on retry). Tail reads are recursive, so flat and per-batch
    * layouts mix freely. */
  def appendTail(df: DataFrame, path: String, aCol: String,
      bCol: String, bits: Int, sub: Option[String] = None): Unit = {
    val spark = df.sparkSession
    SnapshotDir.withWriterLock(spark, path) {
      val tail = s"${currentDir(spark, path)}/$TailSub"
      val target = sub.fold(tail)(b => s"$tail/$b")
      df.withColumn("hval",
          LayoutExpressions.hilbertValue(col(aCol).cast("long"),
            col(bCol).cast("long"), bits))
        .write.mode(if (sub.isDefined) "overwrite" else "append")
        .parquet(target)
      spark.catalog.refreshByPath(tail)
    }
  }

  private def readTail(spark: SparkSession, tail: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(tail)

  /** Re-sort the tail in: clustered ∪ tail rewritten as the NEXT
    * committed version (rows unchanged — only layout), the
    * lakehouse OPTIMIZE. In-flight readers keep the old version
    * through the GC grace window. No-op when there is no tail. */
  def optimize(spark: SparkSession, path: String, files: Int): Unit = {
    SnapshotDir.withWriterLock(spark, path) {
      val cur = currentDir(spark, path)
      val (fs, tailHp) = StoreFiles.fsOf(spark, s"$cur/$TailSub")
      if (fs.exists(tailHp)) {
        val all = spark.read.parquet(cur)
          .unionByName(readTail(spark, s"$cur/$TailSub"))
        val v = SnapshotDir.next(spark, path, Prefix)
        all.repartitionByRange(files, col("hval"))
          .sortWithinPartitions("hval")
          .write.parquet(s"$path/${SnapshotDir.name(Prefix, v)}")
        SnapshotDir.commit(spark, path, Prefix, v)
      }
    }
    SnapshotDir.gc(spark, path, Prefix)
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
    * two exact column predicates cut residual false positives. The
    * SAME predicates run over the unclustered tail (if any) — its
    * rows carry `hval` too, so correctness is identical and only the
    * skipping power differs until the next [[optimize]]. */
  def rectScan(spark: SparkSession, path: String, aCol: String,
      bCol: String, aLo: Long, aHi: Long, bLo: Long, bHi: Long,
      bits: Int, maxRanges: Int = 32): DataFrame = {
    val ranges = coveringRanges(aLo, aHi, bLo, bHi, bits, maxRanges)
    val pre: Column = ranges
      .map { case (lo, hi) => col("hval").between(lo, hi) }
      .reduceOption(_ || _).getOrElse(lit(false))
    def filt(df: DataFrame): DataFrame = df.filter(pre)
      .filter(col(aCol).between(aLo, aHi) &&
        col(bCol).between(bLo, bHi))
    val cur = currentDir(spark, path)
    val main = filt(spark.read.parquet(cur))
    val (fs, tailHp) = StoreFiles.fsOf(spark, s"$cur/$TailSub")
    if (fs.exists(tailHp))
      main.unionByName(filt(readTail(spark, s"$cur/$TailSub")))
    else main
  }
}
