package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.sources.StoreFiles.{readText, writeText}

/** Persisted similarity-graph edge list — the near-dup pair table the
  * embedding curation queries share. At corpus scale the LSH pair list
  * is the EXPENSIVE artifact (banded candidate join + exact-cosine
  * verify over the whole embedding table); recomputing it inside every
  * consumer (triangle census, cluster labeling, BFS reach, PageRank
  * authority) multiplies that cost by the consumer count. The scale
  * shape is the one the text side already has with
  * [[FingerprintStore]]: build the pairs ONCE under the [[SnapshotDir]]
  * commit protocol (versioned, atomically published, writer-locked,
  * time-travelable) and let every graph consumer read the committed
  * table.
  *
  * One relation per version: `(id_a, id_b, cos)` with `id_a < id_b`
  * canonical ordering — exactly what
  * [[graft.operators.Similarity.nearDupPairsLsh]] emits, so a stored
  * read is bit-identical to an inline recompute (cos is 6dp-rounded
  * before persisting; doubles round-trip parquet exactly).
  *
  * Scale shape: the pair table is edge-count sized (linear in the
  * corpus under a banding that works — quadratic pair lists mean the
  * threshold is wrong, not the store), partitioned by parquet row
  * groups like any fact table; consumers run keyed equi-joins and
  * aggregates against it, never all-pairs. */
object EdgeStore {

  private val Prefix = "edges-"
  val FormatVersion = 2 // v2: + the `_bands` admission index

  private def currentDir(spark: SparkSession, path: String): String =
    SnapshotDir.current(spark, path, Prefix).getOrElse(
      throw new IllegalStateException(
        s"no committed edge store under $path"))

  /** Write + commit the next version — CALLER HOLDS the writer lock
    * (the file lock is not reentrant, and appendBatch must read the
    * current version inside the same critical section it commits in). */
  private def commitVersion(pairs: DataFrame, bandRel: DataFrame,
      path: String): Unit = {
    val spark = pairs.sparkSession
    val next = SnapshotDir.next(spark, path, Prefix)
    val vdir = s"$path/${SnapshotDir.name(Prefix, next)}"
    pairs.write.mode(SaveMode.Overwrite).parquet(vdir)
    bandRel.write.mode(SaveMode.Overwrite).parquet(s"$vdir/_bands")
    SnapshotDir.commit(spark, path, Prefix, next)
  }

  /** Publish `pairs` (`id_a`, `id_b`, `cos`) and the `_bands` admission
    * index (`id`, `band`, `bkey`) as the next committed version. */
  def writePairs(pairs: DataFrame, bandRel: DataFrame,
      path: String): Unit = {
    val spark = pairs.sparkSession
    SnapshotDir.withWriterLock(spark, path) {
      commitVersion(pairs, bandRel, path)
    }
    SnapshotDir.gc(spark, path, Prefix)
  }

  /** Build (or confirm warm) the embedding near-dup pair store:
    * [[graft.operators.Similarity.nearDupPairsLsh]] persisted behind a
    * recipe marker (marker last — a crash mid-build leaves no marker
    * and rebuilds; a recipe change rebuilds), alongside the banded
    * signature relation that lets later batches admit against the
    * corpus without re-banding it. Returns the build seconds, or None
    * when the warm store was reused. */
  def ensureNearDupPairs(embeddings: DataFrame, path: String,
      threshold: Double, bands: Int, rowsPerBand: Int, dim: Int)
      : Option[Double] = {
    val spark = embeddings.sparkSession
    val marker = s"$path/_built.json"
    val recipe = s"""{"v":$FormatVersion,"t":$threshold,"b":$bands,""" +
      s""""r":$rowsPerBand,"d":$dim}"""
    if (readText(spark, marker).contains(recipe) &&
        SnapshotDir.current(spark, path, Prefix).isDefined) None
    else {
      val t0 = System.nanoTime()
      writePairs(graft.operators.Similarity.nearDupPairsLsh(
        embeddings, threshold, bands = bands, rowsPerBand = rowsPerBand,
        dim = dim),
        graft.operators.Similarity.bandRelation(embeddings, bands,
          rowsPerBand, dim), path)
      writeText(spark, marker, recipe)
      Some((System.nanoTime() - t0) / 1e9)
    }
  }

  /** Stored pair list `(id_a, id_b, cos)` of the current version. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(currentDir(spark, path))

  /** Stored banded signatures `(id, band, bkey)`. */
  def readBands(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"${currentDir(spark, path)}/_bands")

  /** INCREMENTAL admission: fold an arriving embedding batch into the
    * committed store with batch-sized work AND a batch-sized commit —
    * the continuous-ingest path ([[FingerprintStore.appendBatch]]'s
    * shape on the vector side). New candidate pairs come from (1) the
    * batch's band keys equi-joined against the STORED corpus bands
    * (the corpus is never re-banded or re-scanned beyond the
    * candidate-id vector lookups) and (2) the batch joined against
    * itself; both verify with the exact cosine against `vectors` (the
    * id-keyed source table carrying BOTH sides). Banding is
    * deterministic per vector, so the committed result EQUALS a
    * from-scratch rebuild over the union — the spec pins
    * `admit(base, batch) ≡ full(base ∪ batch)` bit for bit. IDEMPOTENT
    * under redelivery: ids already in the stored band index are
    * dropped before banding (one batch-vs-ids anti-join), so an
    * at-least-once streaming trigger that re-runs admits nothing —
    * the same discipline as the fingerprint admission.
    *
    * CONTRACT — ids are immutable: an id names one embedding forever.
    * The redelivery drop keys on id alone, so a re-arriving id whose
    * payload CHANGED is treated as a duplicate and skipped (its stale
    * pairs stay). An updated embedding must arrive under a new id (and
    * the old id be tombstoned by the caller's curation layer), exactly
    * as in [[VectorIndexStore]].
    *
    * Commit shape: the batch's band rows and verified pairs are
    * APPENDED as new parquet files inside the current committed
    * version — the recurring write is batch-sized; the corpus-sized
    * pair table is never rewritten (file-count hygiene is [[compact]],
    * an explicit maintenance action). The two appends are not one
    * atomic commit on a plain FS (the [[SnapshotDir]] class doc's
    * stated limit; a lakehouse table format is the swap that makes
    * them one transaction): bands land FIRST, so a writer that dies
    * between the writes leaves a store where the batch is indexed but
    * its pairs are missing — a redelivery then correctly no-ops, and
    * the repair for the FAILED (loudly, to its orchestrator) admit is
    * a store rebuild via [[ensureNearDupPairs]] after deleting the
    * recipe marker. Pairs-first would invert the failure into
    * duplicate pair rows on redelivery — silent corruption of every
    * degree/census consumer — which is why the under-admit order
    * wins. */
  def appendBatch(batch: DataFrame, vectors: DataFrame, path: String,
      threshold: Double, bands: Int, rowsPerBand: Int, dim: Int)
      : Long = {
    val spark = batch.sparkSession
    import org.apache.spark.sql.functions._
    // the current version is resolved INSIDE the critical section: an
    // append racing a [[compact]] would otherwise land its files in
    // the OLD version after compact's read pass and be GC'd away
    SnapshotDir.withWriterLock(spark, path) {
      val cur = currentDir(spark, path)
      val stored = graft.operators.CacheRegistry.tracked(
        spark.read.parquet(s"$cur/_bands"))
      // same-id rows within one batch are redelivery duplicates of
      // identical payloads (the vectors table is the id-keyed source of
      // truth), so keep one; ids the index already holds drop out —
      // together the admission is idempotent and the band index stays
      // one row per (id, band)
      val fresh = graft.operators.CacheRegistry.tracked(
        batch.dropDuplicates("vec_id")
          .join(stored.select(col("id").as("vec_id")).distinct(),
            Seq("vec_id"), "left_anti"))
      if (fresh.isEmpty) 0L // full redelivery: nothing to commit
      else {
        val batchBands = graft.operators.CacheRegistry.tracked(
          graft.operators.Similarity.bandRelation(fresh, bands,
            rowsPerBand, dim))
        val crossCands = batchBands.as("n").join(stored.as("o"),
            col("n.band") === col("o.band") &&
              col("n.bkey") === col("o.bkey") &&
              col("n.id") =!= col("o.id"))
          .select(least(col("n.id"), col("o.id")).as("id_a"),
            greatest(col("n.id"), col("o.id")).as("id_b"))
        val selfCands = batchBands.as("x").join(batchBands.as("y"),
            col("x.band") === col("y.band") &&
              col("x.bkey") === col("y.bkey") &&
              col("x.id") < col("y.id"))
          .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
        // EAGER localCheckpoint, not cache: the bands append below
        // lands inside `$cur/_bands`, and Spark's write path recaches
        // every plan whose lineage reads that path — a merely-cached
        // newPairs would be invalidated and RECOMPUTED for its own
        // write against the now-extended band index, where the whole
        // batch reads as a redelivery and zero pairs come out. The
        // checkpoint pins the verified pairs as data, severing the
        // file lineage. (Executor loss between checkpoint and write
        // fails the admit loudly — acceptable for a batch-sized
        // artifact; the orchestrator retries.)
        val newPairs = graft.operators.Similarity.verifyCosinePairs(
          crossCands.unionByName(selfCands).distinct(), vectors,
          threshold, dim).localCheckpoint()
        val n = newPairs.count()
        // bands before pairs — see the crash-window ordering argument
        // in the method doc
        batchBands.write.mode(SaveMode.Append).parquet(s"$cur/_bands")
        if (n > 0) {
          newPairs.write.mode(SaveMode.Append).parquet(cur)
          // derived cluster labels ride the same critical section:
          // merge only the components the new pairs touch. A crash
          // between the pair append and this call leaves a label-meta
          // signature mismatch that the next label read REPAIRS
          // ([[ClusterStore.ensureLabels]]) — stale labels are never
          // served silently.
          ClusterStore.maintain(spark, cur, newPairs)
        }
        spark.catalog.refreshByPath(cur)
        n
      }
    }
  }

  /** Rewrite the append-accumulated store back to a compact file
    * layout in the NEXT committed version (the [[SnapshotDir]]
    * protocol: no rename, in-flight readers keep their version through
    * the GC grace window). Rows are unchanged — only files. Both the
    * read-side file listing and the version claim run inside the
    * writer lock: an [[appendBatch]] committing between an outside
    * listing and the lock acquisition would leave its files out of the
    * compacted version, and the old dir's GC would silently drop the
    * batch (the [[FingerprintStore.compact]] discipline). */
  def compact(spark: SparkSession, path: String): Unit = {
    val vdir = SnapshotDir.withWriterLock(spark, path) {
      val cur = currentDir(spark, path)
      val pairs = spark.read.parquet(cur)
      val bandRel = spark.read.parquet(s"$cur/_bands")
      val next = SnapshotDir.next(spark, path, Prefix)
      val vd = s"$path/${SnapshotDir.name(Prefix, next)}"
      pairs.write.mode(SaveMode.Overwrite).parquet(vd)
      bandRel.repartition(org.apache.spark.sql.functions.col("band"))
        .write.mode(SaveMode.Overwrite).parquet(s"$vd/_bands")
      // labels (when built) compact with their pairs — one resolved
      // row per endpoint in the new version, signature re-recorded
      // against the new pair files
      ClusterStore.compactInto(spark, cur, vd)
      SnapshotDir.commit(spark, path, Prefix, next)
      vd
    }
    SnapshotDir.gc(spark, path, Prefix)
    spark.catalog.refreshByPath(vdir)
  }
}
