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
  * INCREMENTAL layout (fmt 3 — the lakehouse OPTIMIZE shape on
  * [[ManifestDir]]): the table is two manifest relations —
  * `clustered` (one range-sorted segment, REPLACED by optimize) and
  * `tail` (one unclustered segment per arriving batch, ADDITIVE).
  * Every ingest is an atomic manifest commit: a crashed append leaves
  * an orphan segment no reader resolves (swept by vacuum) and the
  * prior version intact; [[rectScan]] unions clustered + tail under
  * the SAME pushed prefilter and exact residuals (tail rows carry
  * `hval` too — the prefilter prunes weakly there, residuals keep it
  * correct); [[optimize]] re-sorts clustered ∪ tail into one new
  * clustered segment and drops the tail relation, in-flight readers
  * keeping the old manifest through the GC grace window.
  *
  * Streaming idempotence: each appended batch's tag joins the DURABLE
  * `tail_tags` set carried by every later manifest (optimize
  * included), so a redelivered at-least-once trigger — even a full
  * replay from a fresh checkpoint — is recognized and skipped instead
  * of duplicating rows. The set is bounded by the stream's trigger
  * count; callers owning their own exactly-once contract simply pass
  * no tag.
  *
  * Locked writers by default; [[appendTailOptimistic]] runs the
  * segment write lock-free and takes the root lock only across the
  * commit point ([[Branches.commitWindow]]) — tail appends are purely
  * additive, so concurrent writers on different lineages interleave
  * freely and a same-lineage race loses loudly. */
object HilbertStore {

  private val Prefix = "hilb-"
  private val ClusteredRel = "clustered"
  private val TailRel = "tail"
  private val TailTagsKey = "tail_tags"

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

  private def currentManifest(spark: SparkSession,
      path: String): ManifestDir.Manifest =
    ManifestDir.current(spark, path, Prefix).getOrElse(
      throw new IllegalStateException(
        s"no committed hilbert store under $path"))

  private def tagsOf(m: ManifestDir.Manifest): Set[String] =
    m.meta.get(TailTagsKey)
      .map(_.split(",").filter(_.nonEmpty).toSet).getOrElse(Set.empty)

  private def withTags(meta: Map[String, String],
      tags: Set[String]): Map[String, String] =
    if (tags.isEmpty) meta - TailTagsKey
    else meta + (TailTagsKey -> tags.toSeq.sorted.mkString(","))

  private val BatchTagPattern = "^(.*b)(\\d+)$".r

  /** Prune the durable tail-tag set to each namespace's HIGHEST batch
    * tag — run when OPTIMIZE absorbs the tail. foreachBatch redelivery
    * is strictly "the one trigger whose commit-log write was lost",
    * and the engine never re-runs batch N-1 after batch N reached the
    * commit log, so within one checkpoint namespace only the MAX
    * batch id can ever arrive again; every lower tag is dead weight
    * that would otherwise re-serialize into every later manifest
    * forever (one entry per trigger, unbounded). Tags that don't
    * parse as `<ns>b<digits>` are kept verbatim (foreign callers own
    * their tags' lifecycle). */
  private def pruneTags(tags: Set[String]): Set[String] = {
    val parsed = tags.toSeq.flatMap {
      case t @ BatchTagPattern(ns, id) => Some((ns, BigInt(id), t))
      case _ => None
    }
    val opaque = tags -- parsed.map(_._3)
    parsed.groupBy(_._1).values.map(_.maxBy(_._2)._3).toSet ++ opaque
  }

  /** Recipe-gated build of version 1 (the
    * [[ZOrderStore.ensureZOrdered]] protocol, on the manifest
    * layout). A recipe change rebuilds from a clean root — stale
    * layouts under another recipe are meaningless. Returns build
    * seconds, or None when warm. */
  def ensureHilbert(df: DataFrame, path: String, aCol: String,
      bCol: String, bits: Int, files: Int): Option[Double] = {
    val spark = df.sparkSession
    val marker = s"$path/_built.json"
    val recipe =
      s"""{"curve":"hilbert","fmt":3,"a":"$aCol","b":"$bCol",""" +
        s""""bits":$bits,"files":$files}"""
    if (StoreFiles.readText(spark, marker).contains(recipe) &&
        SnapshotDir.current(spark, path, Prefix).isDefined) None
    else {
      val t0 = System.nanoTime()
      SnapshotDir.withWriterLock(spark, path) {
        // wipe inside the lock (sparing the held lock file): a live
        // concurrent writer is excluded rather than unlocked mid-commit
        SnapshotDir.wipeRootKeepLock(spark, path)
        val seg = ManifestDir.segDir(ManifestDir.newSegmentId(),
          ClusteredRel)
        writeHilbert(df, s"$path/$seg", aCol, bCol, bits, files)
        ManifestDir.commit(spark, path, Prefix, ManifestDir.Manifest(
          Map(ClusteredRel -> Vector(seg)), Map.empty))
        ()
      }
      StoreFiles.writeText(spark, marker, recipe)
      Some((System.nanoTime() - t0) / 1e9)
    }
  }

  /** Append a batch UNCLUSTERED as one new tail segment + one atomic
    * manifest commit: rows get their curve index (same expression as
    * the clustered write) but no global re-sort — the recurring
    * ingest cost is batch-sized, clustered segments are never
    * touched, and a crash leaves an orphan segment plus the prior
    * version intact. `batchTag` joins the durable `tail_tags` set; an
    * arriving tag already in the set is a REDELIVERY and is skipped
    * whole (the streaming sink's idempotence device; tags assume
    * identical replayed content, the at-least-once contract). Callers
    * must NAMESPACE tags per checkpoint lineage — bare batch ids
    * collide when a stream restarts on a fresh checkpoint (ids
    * restart at 0) and would silently skip genuinely new batches;
    * [[graft.streaming.StreamingSync.hilbertMaintSink]] scopes its
    * tags by the checkpoint for exactly this reason.
    *
    * WIDTH CONTRACT (`maxTailSegments`, the codes-relation guard's
    * twin on the layout store): each append adds one unclustered tail
    * segment, and every rectangle scan unions one branch per tail
    * segment with no skipping power until the next OPTIMIZE — past
    * the bound the append runs [[optimize]] as part of the SAME
    * locked admission (the lock is reentrant), folding the tail in at
    * the clustered layout's existing file width. "Optimize
    * periodically" is thereby structural: no ingest stream can append
    * its way into a thousand-branch unclustered scan. */
  def appendTail(df: DataFrame, path: String, aCol: String,
      bCol: String, bits: Int, batchTag: Option[String] = None,
      maxTailSegments: Int = MaxTailSegments): Unit = {
    batchTag.foreach(t => require(!t.contains(","),
      s"tail tags join the comma-separated applied set: '$t'"))
    val spark = df.sparkSession
    SnapshotDir.withWriterLock(spark, path) {
      val cur = currentManifest(spark, path)
      if (batchTag.exists(tagsOf(cur).contains)) ()
      else {
        val seg = ManifestDir.segDir(ManifestDir.newSegmentId(), TailRel)
        df.withColumn("hval",
            LayoutExpressions.hilbertValue(col(aCol).cast("long"),
              col(bCol).cast("long"), bits))
          .write.parquet(s"$path/$seg")
        ManifestDir.commit(spark, path, Prefix,
          cur.withSegment(TailRel, seg)
            .copy(meta = withTags(cur.meta, tagsOf(cur) ++ batchTag)))
        if (cur.segments(TailRel).size + 1 > maxTailSegments)
          optimize(spark, path, clusteredFileCount(spark, path))
        ()
      }
    }
    SnapshotDir.gc(spark, path, Prefix)
  }

  /** Tail segments auto-fold past this bound — see [[appendTail]]. */
  val MaxTailSegments = 32

  /** Parquet file count of the current clustered relation — the
    * auto-OPTIMIZE's output width, so the guard preserves the layout
    * the original build chose instead of inventing one. */
  private def clusteredFileCount(spark: SparkSession,
      path: String): Int = {
    val cur = currentManifest(spark, path)
    val (fs, _) = StoreFiles.fsOf(spark, path)
    val n = cur.segments(ClusteredRel).map { seg =>
      val p = new org.apache.hadoop.fs.Path(s"$path/$seg")
      if (!fs.exists(p)) 0
      else fs.listStatus(p).count(s =>
        s.isFile && s.getPath.getName.endsWith(".parquet"))
    }.sum
    math.max(1, n)
  }

  /** OPTIMISTIC tail append — the [[Branches.commitWindow]] envelope
    * on the layout store: the batch's segment writes with NO lock
    * held (segments are immutable and uid-unique), and only the
    * manifest publish runs inside the short root-lock window, which
    * re-verifies the lineage still sits at the claimed version. Tail
    * appends are purely additive, so this is the fingerprint store's
    * exact concurrency shape; a same-lineage race loses LOUDLY with
    * `ConcurrentModificationException` — retry republishes the
    * already-written segment against the new current. */
  def appendTailOptimistic(df: DataFrame, path: String, aCol: String,
      bCol: String, bits: Int,
      batchTag: Option[String] = None): Unit = {
    batchTag.foreach(t => require(!t.contains(","),
      s"tail tags join the comma-separated applied set: '$t'"))
    val spark = df.sparkSession
    val claimed = SnapshotDir.versions(spark, path, Prefix)
      .filter(_._2).map(_._1).foldLeft(0L)(math.max)
    require(claimed > 0L,
      s"no committed hilbert store at $path — build first")
    val seg = ManifestDir.segDir(ManifestDir.newSegmentId(), TailRel)
    df.withColumn("hval",
        LayoutExpressions.hilbertValue(col(aCol).cast("long"),
          col(bCol).cast("long"), bits))
      .write.parquet(s"$path/$seg")
    Branches.commitWindow(spark, path, Prefix, claimed) { cur =>
      if (batchTag.exists(tagsOf(cur).contains)) ()
      else ManifestDir.commit(spark, path, Prefix,
        cur.withSegment(TailRel, seg)
          .copy(meta = withTags(cur.meta, tagsOf(cur) ++ batchTag)))
    }
    SnapshotDir.gc(spark, path, Prefix)
    ()
  }

  /** TAKEDOWN on the layout store: anti-join the removed `ids` out of
    * clustered ∪ tail and republish the survivors as ONE clustered
    * segment (the optimize shape with a filter — rows carry their
    * `hval`, so no re-derivation), the tail relation dropped, tags
    * pruned and carried. The stored rows ARE content (a layout store
    * persists the fact rows it clusters), so a compliance sweep must
    * reach it like every other persisted family; idempotent by
    * construction (anti-join form). Pre-takedown versions age out
    * through the normal GC grace window — retention policy governs
    * history, exactly as on the other families. */
  def takedown(spark: SparkSession, path: String, ids: DataFrame,
      idCol: String): Unit = {
    SnapshotDir.withWriterLock(spark, path) {
      val cur = currentManifest(spark, path)
      val clusteredRows =
        ManifestDir.readRelation(spark, path, cur, ClusteredRel)
      val all =
        if (cur.segments(TailRel).isEmpty) clusteredRows
        else clusteredRows.unionByName(
          ManifestDir.readRelation(spark, path, cur, TailRel))
      val kept = all.join(ids.select(col(idCol)).distinct(),
        Seq(idCol), "left_anti")
      val files = clusteredFileCount(spark, path)
      val seg = ManifestDir.segDir(ManifestDir.newSegmentId(),
        ClusteredRel)
      kept.repartitionByRange(files, col("hval"))
        .sortWithinPartitions("hval")
        .write.parquet(s"$path/$seg")
      ManifestDir.commit(spark, path, Prefix, cur
        .withRelation(ClusteredRel, Seq(seg))
        .withoutRelation(TailRel)
        .copy(meta = withTags(cur.meta, pruneTags(tagsOf(cur)))))
      SnapshotDir.gc(spark, path, Prefix)
      ManifestDir.vacuum(spark, path,
        Branches.allPrefixes(spark, path, Prefix),
        minAgeMs = ManifestDir.MaintAgeMs)
      ()
    }
    spark.catalog.refreshByPath(path)
  }

  /** Re-sort the tail in: clustered ∪ tail rewritten as ONE new
    * clustered segment in the next committed manifest, the tail
    * relation dropped — the lakehouse OPTIMIZE. Rows unchanged, only
    * layout; applied tail tags carry FORWARD pruned to each
    * namespace's highest batch ([[pruneTags]] — a post-optimize
    * redelivery can only be the latest trigger, which must still be
    * recognized and not folded in twice, while the dead lower tags
    * stop re-serializing into every later manifest).
    * In-flight readers keep the old manifest through the GC grace
    * window; the closing vacuum sweeps segments no retained version
    * references. No-op when there is no tail. */
  def optimize(spark: SparkSession, path: String, files: Int): Unit = {
    SnapshotDir.withWriterLock(spark, path) {
      val cur = currentManifest(spark, path)
      if (cur.segments(TailRel).nonEmpty) {
        val all = ManifestDir.readRelation(spark, path, cur,
            ClusteredRel)
          .unionByName(ManifestDir.readRelation(spark, path, cur,
            TailRel))
        val seg = ManifestDir.segDir(ManifestDir.newSegmentId(),
          ClusteredRel)
        all.repartitionByRange(files, col("hval"))
          .sortWithinPartitions("hval")
          .write.parquet(s"$path/$seg")
        ManifestDir.commit(spark, path, Prefix, cur
          .withRelation(ClusteredRel, Seq(seg))
          .withoutRelation(TailRel)
          .copy(meta = withTags(cur.meta, pruneTags(tagsOf(cur)))))
        SnapshotDir.gc(spark, path, Prefix)
        // age-guarded: OPTIMIZE's lock does not exclude an optimistic
        // tail appender's in-flight segments ([[ManifestDir.MaintAgeMs]])
        ManifestDir.vacuum(spark, path,
          Branches.allPrefixes(spark, path, Prefix),
          minAgeMs = ManifestDir.MaintAgeMs)
        ()
      }
    }
    spark.catalog.refreshByPath(path)
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
    * SAME predicates run over the unclustered tail segments (if any)
    * — their rows carry `hval` too, so correctness is identical and
    * only the skipping power differs until the next [[optimize]]. The
    * whole scan pins ONE committed manifest. */
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
    val cur = currentManifest(spark, path)
    rectScanManifest(spark, path, cur, filt)
  }

  /** TIME TRAVEL: [[rectScan]] against a SPECIFIC committed version —
    * "which exact layout state (clustered ∪ which tail batches)
    * served this run" stays answerable until retention GC ages the
    * version out. Fails loudly on an expired pin. */
  def rectScanAt(spark: SparkSession, path: String, version: Long,
      aCol: String, bCol: String, aLo: Long, aHi: Long, bLo: Long,
      bHi: Long, bits: Int, maxRanges: Int = 32): DataFrame = {
    val ranges = coveringRanges(aLo, aHi, bLo, bHi, bits, maxRanges)
    val pre: Column = ranges
      .map { case (lo, hi) => col("hval").between(lo, hi) }
      .reduceOption(_ || _).getOrElse(lit(false))
    def filt(df: DataFrame): DataFrame = df.filter(pre)
      .filter(col(aCol).between(aLo, aHi) &&
        col(bCol).between(bLo, bHi))
    SnapshotDir.atVersion(spark, path, Prefix, version) match {
      case Some(vd) => rectScanManifest(spark, path,
        ManifestDir.read(spark, vd), filt)
      case None => throw new IllegalStateException(
        s"hilbert version $version at $path is not committed or has " +
          "been GC'd — pin expired; committed: " +
          committedVersions(spark, path).mkString("[", ", ", "]"))
    }
  }

  /** Committed main-lineage versions at `path`, ascending. */
  def committedVersions(spark: SparkSession, path: String): Seq[Long] =
    SnapshotDir.versions(spark, path, Prefix)
      .filter(_._2).map(_._1).sorted

  private def rectScanManifest(spark: SparkSession, path: String,
      m: ManifestDir.Manifest,
      filt: DataFrame => DataFrame): DataFrame = {
    val main = filt(ManifestDir.readRelation(spark, path, m,
      ClusteredRel))
    if (m.segments(TailRel).isEmpty) main
    else main.unionByName(filt(
      ManifestDir.readRelation(spark, path, m, TailRel)))
  }
}
