package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, pmod, xxhash64}
import org.apache.spark.sql.types.{DataType, StructType}

import graft.operators.Similarity

/** Persisted residual-IVFPQ index layout — the 100 TB serving shape for
  * the ANN family (extension track; the reference has no vector ops).
  *
  * Build once, search many: [[writeIvfPq]] materializes the four index
  * relations of [[Similarity.buildIvfPqIndex]], with the one
  * corpus-sized relation — the codes table, m small codes + a list id
  * per vector — written `PARTITIONED BY (cent_id)`, one directory per
  * IVF list. [[ivfPqTopKFromIndex]] then reads back only the lists a
  * query batch actually probes: the probed list ids (index metadata,
  * bounded by the centroid count — the same order as a broadcast
  * threshold) become a static `IN` predicate on the partition column,
  * so the scan's `PartitionFilters` prune to nprobe/C of the table
  * before a single row is read (PlanSpec pins this). At 100 TB that is
  * the difference between re-reading the full code table per query
  * batch and reading only the probed fraction; the three
  * metadata-sized relations (centroids, codebooks, centroid×code cross
  * table) are read whole and broadcast, exactly as the in-query path
  * does.
  *
  * Concurrency contract: ONE writer at a time per index path (there is
  * no compare-and-swap on a plain filesystem), but probes MAY run
  * concurrently with ANY maintenance. The index is VERSIONED as a
  * unit: each rebuild/compaction lands codes + the three metadata
  * relations + the schema sidecar inside a fresh `codes-NNNNNNNN`
  * directory (metadata under `_`-prefixed subdirs, which partition
  * discovery skips) and becomes visible only when its `_committed`
  * marker file appears — a single atomic create, no directory rename
  * anywhere (renames are not atomic on object stores), and no instant
  * where a probe can pair new metadata with old codes. Readers
  * resolve the highest committed version at scan time; GC keeps the
  * previous committed version as a grace window for in-flight readers
  * — the degenerate single-table form of the snapshot-commit protocol
  * table formats (Iceberg/Delta) build manifests on top of.
  * [[appendIvfPq]] adds files to the CURRENT version in place:
  * parquet files appear atomically one by one, so a concurrent probe
  * sees either the old or a partially-extended list — acceptable for
  * ANN recall, which is approximate by contract; anything that
  * REMOVES or REPLACES data, where a partial view would be wrong,
  * always goes through a new committed version.
  */
object VectorIndexStore {

  /** Bump when the on-disk layout or the deterministic build recipe
    * changes: [[ensureIvfPq]] markers from older versions stop
    * matching and the index rebuilds instead of serving stale codes. */
  private val FormatVersion = 4

  /** The build-recipe marker content — public so observability
    * consumers ([[StoreCatalog]] oracles) can derive the expected
    * string from the same constants the builder stamps. */
  def recipe(ivfCentroidMod: Int, pqCentroidMod: Int, m: Int, dim: Int,
      idCol: String, vecCol: String, saltFilesPerList: Int): String =
    s"""{"v":$FormatVersion,"ivf":$ivfCentroidMod,""" +
      s""""pq":$pqCentroidMod,"m":$m,"dim":$dim,"id":"$idCol",""" +
      s""""vec":"$vecCol","salt":$saltFilesPerList}"""

  // -- tiny sidecar-file helpers (shared: [[StoreFiles]]) -------------

  private def fsOf(spark: SparkSession, p: String) =
    StoreFiles.fsOf(spark, p)

  private def writeText(spark: SparkSession, p: String, s: String): Unit =
    StoreFiles.writeText(spark, p, s)

  private def readText(spark: SparkSession, p: String): Option[String] =
    StoreFiles.readText(spark, p)

  // -- versioned codes directories ([[SnapshotDir]] protocol) ---------

  private val CodesPrefix = "codes-"

  private def codesName(v: Long): String = SnapshotDir.name(CodesPrefix, v)

  /** Directory of the codes version probes should read: the highest
    * COMMITTED version; falls back to the legacy unversioned `codes/`
    * for indexes written before the protocol existed. */
  private[graft] def currentCodesPath(spark: SparkSession,
      path: String): String =
    SnapshotDir.current(spark, path, CodesPrefix)
      .getOrElse(s"$path/codes")

  private def gcCodes(spark: SparkSession, path: String): Unit =
    // the pre-protocol layout counts as the oldest version of all:
    // remove it (data dir + its root-level metadata) once it has aged
    // out of the reader grace window
    if (SnapshotDir.gc(spark, path, CodesPrefix)) {
      val (fs, _) = fsOf(spark, path)
      Seq("codes", "cents", "codebooks", "crosst", "codes_schema.json")
        .foreach(n => fs.delete(
          new org.apache.hadoop.fs.Path(s"$path/$n"), true))
    }

  /** Metadata relation directory for the version probes read:
    * underscore-prefixed inside the version dir (partition discovery
    * ignores `_`-paths, so they coexist with the `cent_id=` dirs and
    * are published by the SAME commit marker as the codes); legacy
    * indexes keep their root-level dirs. */
  private def metaPath(spark: SparkSession, path: String,
      name: String): String = {
    val versioned = s"${currentCodesPath(spark, path)}/_$name"
    val (fs, hp) = fsOf(spark, versioned)
    if (fs.exists(hp)) versioned else s"$path/$name"
  }

  /** Read the codes table with its WRITTEN schema, not an inferred one.
    * `partitionBy(cent_id)` stores the list id in directory names, and
    * schema inference re-types it from the string values (IntegerType
    * while ids fit an int) — the joins and `isin` pruning then work
    * only via implicit casts, and a corpus whose ids cross
    * Int.MaxValue would silently flip the inferred type between
    * appends. The build writes the exact pre-write schema to a sidecar
    * (`_schema.json` in the version dir; root `codes_schema.json` on
    * legacy indexes); readers declare it, which pins the
    * partition-column round-trip to bigint. Indexes written before the
    * sidecar existed fall back to inference. */
  private def readCodes(spark: SparkSession, path: String): DataFrame = {
    val cur = currentCodesPath(spark, path)
    val sidecar = readText(spark, s"$cur/_schema.json")
      .orElse(readText(spark, s"$path/codes_schema.json"))
    val reader = sidecar match {
      case Some(json) => spark.read.schema(
        DataType.fromJson(json).asInstanceOf[StructType])
      case None => spark.read
    }
    val codes = reader.parquet(cur)
    // tombstones (deleteIvfPq) shade their ids out of every consumer —
    // probes AND compaction, so compacting materializes the filtered
    // view and physically drops the rows. The tombstone relation is
    // deletes-sized (broadcast anti-join); the codes scan and its
    // partition pruning are untouched.
    val tombs = s"$cur/$TombstoneDir"
    val (fsys, _) = fsOf(spark, tombs)
    if (fsys.exists(new org.apache.hadoop.fs.Path(tombs)))
      codes.join(
        org.apache.spark.sql.functions.broadcast(
          // declared schema, never inferred: a probe racing the FIRST
          // deleteIvfPq can see the dir exist before any part file
          // commits — inference would throw; the declared schema
          // reads the partial dir as an empty relation (probes take
          // no lock by design)
          spark.read.schema("match_id LONG").parquet(tombs)),
        Seq("match_id"), "left_anti")
    else codes
  }

  private val TombstoneDir = "_tombstones"

  /** Delete vectors from the served index by TOMBSTONE: the ids land
    * as a deletes-sized parquet inside the CURRENT codes version, and
    * [[readCodes]] shades them from every consumer immediately — no
    * list partition is rewritten at delete time (the codes table is
    * append-only between compactions). The next [[compactIvfPq]]
    * reads the shaded view, so the rewrite physically drops the rows
    * and the new version carries no tombstones.
    *
    * Contract: a tombstone shades its id REGARDLESS of append time —
    * re-inserting a deleted id resurfaces it only after a compaction
    * has absorbed the tombstone (spec-pinned). Runs under the writer
    * lock: a delete racing a compaction must not land its tombstones
    * in a version the compaction is about to replace unshaded. */
  def deleteIvfPq(spark: SparkSession, path: String, ids: DataFrame,
      idCol: String = "vec_id"): Unit =
    SnapshotDir.withWriterLock(spark, path) {
      ids.select(col(idCol).cast("long").as("match_id")).distinct()
        .coalesce(1).write.mode(SaveMode.Append)
        .parquet(s"${currentCodesPath(spark, path)}/$TombstoneDir")
    }

  /** Build the deterministic residual-IVFPQ index over `corpus` and
    * persist it under `path` as one committed version directory:
    * codes partitioned by list id, plus `_cents`/`_codebooks`/
    * `_crosst` (metadata-sized, unpartitioned) and the `_schema.json`
    * sidecar (see [[readCodes]]), all published by one marker.
    *
    * `saltFilesPerList` bounds per-file size: 1 (default) clusters each
    * list into ONE file — right while lists fit a block; at real scale
    * a hot list's single file outgrows the block size, so salting
    * spreads each list over up to that many files (`pmod(hash(id),
    * salt)` is deterministic, so the layout is reproducible). Probe
    * plans are unchanged either way — pruning is on the partition
    * DIRECTORY; the salt only splits files inside it. */
  def writeIvfPq(corpus: DataFrame, path: String,
      ivfCentroidMod: Int = 37, pqCentroidMod: Int = 41, m: Int = 8,
      dim: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding", saltFilesPerList: Int = 1): Unit = {
    require(saltFilesPerList >= 1,
      s"saltFilesPerList must be >= 1, got $saltFilesPerList")
    val ix = Similarity.buildIvfPqIndex(corpus, ivfCentroidMod,
      pqCentroidMod, m, dim, idCol, vecCol)
    val codes = ix.codes()
    // cluster on the partition column before the partitioned write:
    // otherwise every upstream shuffle partition writes a sliver into
    // every list dir — P x C tiny files (observed ~4000 here) instead
    // of one file per list (or saltFilesPerList files when salted).
    val clustered =
      if (saltFilesPerList == 1) codes.repartition(col("cent_id"))
      else codes.repartition(col("cent_id"),
        // the codes relation keys vectors as match_id; each (list,
        // salt) pair lands in one task → ≤ salt files per list dir
        pmod(xxhash64(col("match_id")), org.apache.spark.sql.functions
          .lit(saltFilesPerList.toLong)))
    val spark = corpus.sparkSession
    // the ENTIRE rebuild — codes, the three metadata relations, the
    // schema sidecar — lands inside one fresh version dir and becomes
    // visible at a single commit-marker create, so even a
    // recipe-CHANGING rebuild never leaves a probe reading new
    // metadata against old codes (or a half-deleted cents dir). The
    // metadata dirs are underscore-prefixed: partition discovery skips
    // them, so they ride inside the partitioned codes table's dir.
    SnapshotDir.withWriterLock(spark, path) {
      val next = SnapshotDir.next(spark, path, CodesPrefix)
      val vdir = s"$path/${codesName(next)}"
      clustered
        .write.mode(SaveMode.Overwrite).partitionBy("cent_id")
        .parquet(vdir)
      writeText(spark, s"$vdir/_schema.json", codes.schema.json)
      ix.cents.write.mode(SaveMode.Overwrite).parquet(s"$vdir/_cents")
      ix.codebooks.write.mode(SaveMode.Overwrite)
        .parquet(s"$vdir/_codebooks")
      ix.crossTable.write.mode(SaveMode.Overwrite)
        .parquet(s"$vdir/_crosst")
      SnapshotDir.commit(spark, path, CodesPrefix, next)
    }
    gcCodes(spark, path)
  }

  /** [[writeIvfPq]] gated by a build marker: skip the (expensive)
    * build when an index with the SAME recipe is already persisted at
    * `path`. The marker records the format version and every build
    * parameter; any mismatch — including a library layout bump —
    * rebuilds. Input data is identified by the caller's `path` choice
    * (the query layer keys the path on the dataset dir), which is the
    * usual warehouse contract for a derived table. Returns the build
    * seconds, or None when the warm index was reused — callers
    * benchmarking the serve path get build cost separated for free. */
  def ensureIvfPq(corpus: DataFrame, path: String,
      ivfCentroidMod: Int = 37, pqCentroidMod: Int = 41, m: Int = 8,
      dim: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding",
      saltFilesPerList: Int = 1): Option[Double] = {
    val spark = corpus.sparkSession
    val marker = s"$path/_built.json"
    val recipe = VectorIndexStore.recipe(ivfCentroidMod, pqCentroidMod,
      m, dim, idCol, vecCol, saltFilesPerList)
    // warm = matching recipe AND a committed codes version actually on
    // disk (same guard as FingerprintStore.ensureFingerprints): a tmp
    // cleaner that removes aged version dirs but spares the
    // recently-touched marker must trigger a rebuild, not a session of
    // path-does-not-exist serve failures
    if (readText(spark, marker).contains(recipe) &&
        SnapshotDir.current(spark, path, CodesPrefix).isDefined) None
    else {
      val t0 = System.nanoTime()
      // recipe change = new index: old-recipe codes are meaningless
      // under the new one, so rebuild from a clean root (deterministic
      // version numbering, no cross-format debris)
      val (fsys, hp) = fsOf(spark, path)
      if (fsys.exists(hp)) fsys.delete(hp, true)
      writeIvfPq(corpus, path, ivfCentroidMod, pqCentroidMod, m, dim,
        idCol, vecCol, saltFilesPerList)
      // marker last: a crash mid-build leaves no marker → next ensure
      // rebuilds instead of serving a half-written index
      writeText(spark, marker, recipe)
      Some((System.nanoTime() - t0) / 1e9)
    }
  }

  /** Copy a persisted index to a new path (clobbering it). This is a
    * TEST/BENCH idempotency device — maintenance experiments run
    * against a clone so the pristine warm index is never mutated and
    * every attempt starts from the same bytes. Production appends
    * mutate in place; nobody copies a 100 TB codes table. */
  def cloneIndex(spark: SparkSession, src: String, dst: String): Unit = {
    val (fs, srcP) = fsOf(spark, src)
    val dstP = new org.apache.hadoop.fs.Path(dst)
    if (fs.exists(dstP)) fs.delete(dstP, true)
    org.apache.hadoop.fs.FileUtil.copy(fs, srcP, fs, dstP,
      false, true, spark.sparkContext.hadoopConfiguration)
    spark.catalog.refreshByPath(dst)
  }

  /** Incremental index maintenance: append a new vector batch to a
    * persisted index. The batch is coarse-assigned with the FROZEN
    * stored centroids and PQ-encoded with the FROZEN stored codebooks,
    * then appended into only the list partitions its vectors land in —
    * the metadata relations never change, and untouched lists are
    * never rewritten. This is classic IVF maintenance: appends are
    * cheap and local; a periodic rebuild re-trains the centroid/
    * codebook samples when the data distribution drifts. Single
    * writer, no concurrent probes (see the object doc). */
  def appendIvfPq(spark: SparkSession, path: String, batch: DataFrame,
      m: Int = 8, dim: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit =
    // The ENTIRE append — metadata resolution, encode, codes write —
    // runs under the writer lock. Two races it closes: (1) an append
    // racing a [[compactIvfPq]] would land its files in the OLD
    // version after the compaction's read pass, and the compacted
    // version (plus the old dir's GC) would silently drop the batch;
    // (2) metadata resolved BEFORE the lock could belong to a version
    // a concurrent rebuild replaces mid-gap — the batch would encode
    // against old centroids/codebooks yet land in the new version's
    // lists, silently corrupting probes. Append, compact, and rebuild
    // are all WRITERS under the single-writer contract; the lock makes
    // that enforced instead of assumed, which the streaming
    // [[graft.streaming.StreamingSync.vectorAppendSink]] relies on.
    // Concurrent PROBES stay safe either way (additive files).
    SnapshotDir.withWriterLock(spark, path) {
      val cents = spark.read.parquet(metaPath(spark, path, "cents"))
      val cb = spark.read.parquet(metaPath(spark, path, "codebooks"))
      Similarity.encodeForIndex(batch, cents, cb, m, dim, idCol, vecCol)
        .repartition(col("cent_id"))
        .write.mode(SaveMode.Append).partitionBy("cent_id")
        .parquet(currentCodesPath(spark, path))
    }

  /** Compact the codes table back to one file per list. Every
    * [[appendIvfPq]] adds a file to each touched list partition;
    * after many appends a probe pays per-file open/footer costs, so
    * periodic compaction rewrites the table clustered on the list id.
    * Codes are unchanged — only the file layout.
    *
    * Concurrent-serving safe: the rewrite lands in the NEXT version
    * directory and becomes visible at a single atomic commit-marker
    * create — no rename, no instant where the codes table is missing
    * or half-moved (the failure mode of the previous temp-dir+rename
    * swap on object stores). A probe that already resolved the old
    * version keeps reading it: GC retains one previous committed
    * version as the in-flight-reader grace window. A compaction that
    * CRASHES before its marker leaves an invisible dir the next GC
    * sweeps; the live index is never touched. */
  def compactIvfPq(spark: SparkSession, path: String): Unit = {
    val vdir = SnapshotDir.withWriterLock(spark, path) {
      val codes = readCodes(spark, path)
      val prev = currentCodesPath(spark, path)
      val next = SnapshotDir.next(spark, path, CodesPrefix)
      val vd = s"$path/${codesName(next)}"
      codes.repartition(col("cent_id"))
        .write.mode(SaveMode.Overwrite).partitionBy("cent_id")
        .parquet(vd)
      // carry the (unchanged, metadata-sized) relations and sidecar
      // forward so the new version is self-contained under one marker
      val (fsys, _) = fsOf(spark, path)
      val conf = spark.sparkContext.hadoopConfiguration
      Seq("cents", "codebooks", "crosst").foreach { n =>
        org.apache.hadoop.fs.FileUtil.copy(
          fsys, new org.apache.hadoop.fs.Path(metaPath(spark, path, n)),
          fsys, new org.apache.hadoop.fs.Path(s"$vd/_$n"),
          false, true, conf)
      }
      readText(spark, s"$prev/_schema.json")
        .orElse(readText(spark, s"$path/codes_schema.json"))
        .foreach(j => writeText(spark, s"$vd/_schema.json", j))
      SnapshotDir.commit(spark, path, CodesPrefix, next)
      vd
    }
    gcCodes(spark, path)
    spark.catalog.refreshByPath(vdir)
  }

  /** ANN top-k served from a persisted index: identical output to
    * [[Similarity.ivfPqTopK]] over the same corpus (the index build is
    * deterministic and doubles round-trip parquet exactly), but the
    * codes scan is partition-pruned to the probed lists. */
  def ivfPqTopKFromIndex(spark: SparkSession, path: String,
      queries: DataFrame, corpus: DataFrame, k: Int, nprobe: Int = 2,
      m: Int = 8, dim: Int = 64, shortlistFactor: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // codes is NOT read eagerly here: the pruned reader below is the
    // only consumer, and an eager full read would pay a partition
    // discovery over every list directory just to be discarded (the
    // whole point of the layout is to avoid that)
    val ix = Similarity.IvfPqIndex(
      cents = spark.read.parquet(metaPath(spark, path, "cents")),
      codes = () => readCodes(spark, path),
      codebooks = spark.read.parquet(metaPath(spark, path, "codebooks")),
      crossTable = spark.read.parquet(metaPath(spark, path, "crosst")))
    Similarity.ivfPqSearch(ix, queries, corpus, k, nprobe, m, dim,
      shortlistFactor, idCol, vecCol,
      prunedCodes = Some(ids => readCodes(spark, path)
        .filter(col("cent_id").isin(ids: _*))))
  }
}
