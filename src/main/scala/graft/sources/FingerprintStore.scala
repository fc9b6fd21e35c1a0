package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Persisted MinHash fingerprint store — the 100 TB shape for
  * INCREMENTAL near-dup deduplication (extension track; the reference
  * has no corpus ops).
  *
  * A production corpus is not deduped from scratch per run: batches
  * arrive continuously, and each batch must be checked against
  * everything already accepted WITHOUT rescanning the accepted text.
  * The store persists the two relations the MinHash+LSH family needs
  * to answer "is this new doc a near-dup of anything we kept":
  *
  *   - `buckets` (id, band, key): the LSH band index — one row per
  *     (doc, band), the join-able form of the banded signature.
  *   - arrays `_arrays` (id, shs): the df-capped per-doc shingle
  *     arrays the exact-Jaccard verify reads. Corpus-sized but
  *     columnar, and only candidate ids' rows are ever joined.
  *
  * [[dedupBatchAgainst]] then runs the batch through the SAME
  * deterministic signature pipeline ([[Dedup.seededHash]] md5 hashes —
  * reproducible in any engine, which is what makes the whole path
  * oracle-checkable) and joins the batch's band buckets against the
  * stored index. The batch side is BROADCAST: the recurring cost of
  * admitting a batch is one scan of the store's bucket relation with a
  * map-side hash join — the corpus never shuffles, and nothing ever
  * reads the accepted corpus TEXT again. Exact-Jaccard verification
  * touches only the candidate ids' stored array rows. Accepted
  * survivors are folded in by [[appendBatch]] — batch-sized file
  * appends, mirroring [[VectorIndexStore.appendIvfPq]]'s maintenance
  * contract.
  *
  * Versioning: a full [[writeFingerprints]] build lands in a fresh
  * `fp-NNNNNNNN` directory published by one atomic [[SnapshotDir]]
  * commit-marker create; appends extend the current version in place
  * (additive parquet files — a concurrent dedup probe sees either the
  * old or a partially-extended index, which can only UNDER-flag the
  * in-flight batch, never corrupt it; a pipeline that needs a strict
  * admission order runs batches through one writer anyway).
  * Single writer per store path; any number of concurrent readers.
  */
object FingerprintStore {

  /** Bump when the on-disk layout or signature recipe changes —
    * [[ensureFingerprints]] markers stop matching and the store
    * rebuilds instead of serving stale fingerprints. */
  private val FormatVersion = 1

  private val Prefix = "fp-"

  /** The build-recipe marker content — public so observability
    * consumers ([[StoreCatalog]] oracles) can derive the expected
    * string from the same constants the builder stamps. */
  def recipe(n: Int, numHashes: Int, bands: Int, maxShingleDf: Int,
      idCol: String, textCol: String): String =
    s"""{"v":$FormatVersion,"n":$n,"h":$numHashes,""" +
      s""""b":$bands,"df":$maxShingleDf,"id":"$idCol","text":"$textCol"}"""

  private def fsOf(spark: SparkSession, p: String) =
    StoreFiles.fsOf(spark, p)

  private def writeText(spark: SparkSession, p: String, s: String): Unit =
    StoreFiles.writeText(spark, p, s)

  private def readText(spark: SparkSession, p: String): Option[String] =
    StoreFiles.readText(spark, p)

  private def currentDir(spark: SparkSession, path: String): String =
    SnapshotDir.current(spark, path, Prefix).getOrElse(
      throw new IllegalStateException(
        s"no committed fingerprint store at $path"))

  /** Build the fingerprint relations for `docs` with the standard
    * df-capped MinHash recipe: (buckets, arrays). Shared by the full
    * build and the batch side of dedup/append — one code path means
    * the store and its probes can never disagree on the signature. */
  private def fingerprints(docs: DataFrame, idCol: String,
      textCol: String, n: Int, numHashes: Int, bands: Int,
      maxShingleDf: Int): (DataFrame, DataFrame) = {
    val postings =
      Dedup.cappedPostings(docs, idCol, textCol, n, maxShingleDf)
    (Dedup.bandBuckets(
      Dedup.minhashSignaturesFrom(postings, numHashes), numHashes, bands),
      Dedup.shingleArrays(postings))
  }

  /** Build the store over `docs` and publish it as one committed
    * version: the bucket index plus the `_arrays` verify relation
    * (underscore-prefixed so a future partitioned bucket layout would
    * skip it in discovery), under a single marker. */
  def writeFingerprints(docs: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 3,
      numHashes: Int = 8, bands: Int = 4,
      maxShingleDf: Int = Dedup.DefaultMaxShingleDf): Unit = {
    val spark = docs.sparkSession
    val (buckets, arrays) =
      fingerprints(docs, idCol, textCol, n, numHashes, bands, maxShingleDf)
    SnapshotDir.withWriterLock(spark, path) {
      val next = SnapshotDir.next(spark, path, Prefix)
      val vdir = s"$path/${SnapshotDir.name(Prefix, next)}"
      buckets.write.mode(SaveMode.Overwrite).parquet(vdir)
      arrays.write.mode(SaveMode.Overwrite).parquet(s"$vdir/_arrays")
      SnapshotDir.commit(spark, path, Prefix, next)
    }
    SnapshotDir.gc(spark, path, Prefix)
  }

  /** [[writeFingerprints]] gated by a recipe marker, mirroring
    * [[VectorIndexStore.ensureIvfPq]]: skip the corpus-sized build when
    * a store with the SAME recipe is already committed. Returns the
    * build seconds, or None when the warm store was reused. */
  def ensureFingerprints(docs: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 3,
      numHashes: Int = 8, bands: Int = 4,
      maxShingleDf: Int = Dedup.DefaultMaxShingleDf): Option[Double] = {
    val spark = docs.sparkSession
    val marker = s"$path/_built.json"
    val recipe = FingerprintStore.recipe(n, numHashes, bands,
      maxShingleDf, idCol, textCol)
    if (readText(spark, marker).contains(recipe) &&
      SnapshotDir.current(spark, path, Prefix).isDefined) None
    else {
      val t0 = System.nanoTime()
      // recipe change = new store: old-recipe versions are meaningless
      // under the new one, so rebuild from a clean root (deterministic
      // version numbering, no cross-format debris)
      val (fsys, hp) = StoreFiles.fsOf(spark, path)
      if (fsys.exists(hp)) fsys.delete(hp, true)
      writeFingerprints(docs, path, idCol, textCol, n, numHashes, bands,
        maxShingleDf)
      // marker last: a crash mid-build leaves no marker → rebuild
      writeText(spark, marker, recipe)
      Some((System.nanoTime() - t0) / 1e9)
    }
  }

  /** True once a committed store version exists at `path`. */
  def exists(spark: SparkSession, path: String): Boolean =
    SnapshotDir.current(spark, path, Prefix).isDefined

  /** Create an EMPTY committed store (schemas derived from `like`'s id
    * column through the real fingerprint pipeline) when none exists —
    * the cold-start of a continuously-admitting pipeline: the first
    * batch then flows through the same admit path as every later one,
    * finding zero matches instead of needing a special bootstrap
    * branch. */
  def bootstrapIfMissing(spark: SparkSession, path: String,
      like: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3, numHashes: Int = 8,
      bands: Int = 4,
      maxShingleDf: Int = Dedup.DefaultMaxShingleDf): Unit =
    if (!exists(spark, path))
      writeFingerprints(like.limit(0), path, idCol, textCol, n,
        numHashes, bands, maxShingleDf)

  /** Check a new `batch` against the stored corpus: one row per batch
    * doc with its near-dup evidence against the ACCEPTED corpus —
    * `n_dups` matching stored docs (0 = clean), the smallest matching
    * stored id as provenance, the best Jaccard, and the admission
    * verdict. The batch never sees the corpus text: candidates come
    * from the broadcast band join, verification from the stored
    * arrays.
    *
    * Within-batch duplicates are out of scope by design — the batch
    * self-check is [[Dedup.minhashLshPairs]] over the batch alone
    * (batch-sized, trivially cheap); this operator prices only the
    * batch-vs-corpus question, whose naive form is corpus-sized.
    *
    * `broadcastBatch = false` is the escape hatch for a batch too big
    * to broadcast (a bulk backfill rather than an incremental drip):
    * the same candidate join runs as a shuffle equi-join on
    * (band, key) — identical results, both sides partition by the
    * band key — instead of OOMing the driver on a forced broadcast
    * build (the [[graft.operators.Contamination.ngramOverlap]]
    * contract, applied here). */
  def dedupBatchAgainst(spark: SparkSession, path: String,
      batch: DataFrame, threshold: Double, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3, numHashes: Int = 8,
      bands: Int = 4, maxShingleDf: Int = Dedup.DefaultMaxShingleDf,
      broadcastBatch: Boolean = true): DataFrame = {
    val cur = currentDir(spark, path)
    val stored = spark.read.parquet(cur)
    val storedArrays = spark.read.parquet(s"$cur/_arrays")
    val (batchBuckets0, batchArrays0) = fingerprints(batch, idCol,
      textCol, n, numHashes, bands, maxShingleDf)
    // both batch relations feed two consumers (join + the final left
    // join); cache so the md5-heavy signature agg runs once
    val batchBuckets = graft.operators.CacheRegistry.tracked(batchBuckets0)
    val batchArrays = graft.operators.CacheRegistry.tracked(batchArrays0)
    // the admission-time join: broadcast the batch-sized bucket side so
    // the corpus-sized stored index streams through a map-side hash
    // join — no shuffle of the store, ever (PlanSpec pins this)
    val probeSide =
      if (broadcastBatch) broadcast(batchBuckets.as("b"))
      else batchBuckets.as("b")
    val cands = stored.as("c")
      .join(probeSide,
        col("c.band") === col("b.band") && col("c.key") === col("b.key"))
      .select(col("b.id").as("id_a"), col("c.id").as("id_b"))
      .distinct()
    val matches = Dedup
      .verifyJaccard(cands, batchArrays, storedArrays, threshold)
      .groupBy(col("id_a"))
      .agg(count(lit(1)).as("n_dups"), min(col("id_b")).as("dup_of"),
        max(col("jaccard")).as("best_jaccard"))
    batch.select(col(idCol).as("batch_id"))
      .join(matches.withColumnRenamed("id_a", "batch_id"),
        Seq("batch_id"), "left")
      .select(col("batch_id"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"), col("dup_of"),
        col("best_jaccard"), col("n_dups").isNull.as("survived"))
  }

  /** Fold an ACCEPTED batch into the store: compute its fingerprints
    * with the same recipe and append them into the current version —
    * batch-sized file appends to both relations, never a corpus
    * rewrite. The caller decides acceptance (usually the `survived`
    * rows of [[dedupBatchAgainst]], after its own within-batch dedup).
    * Single writer; see the class doc for the concurrent-reader
    * contract. */
  def appendBatch(spark: SparkSession, path: String, accepted: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 3,
      numHashes: Int = 8, bands: Int = 4,
      maxShingleDf: Int = Dedup.DefaultMaxShingleDf): Unit = {
    val (buckets, arrays) = fingerprints(accepted, idCol, textCol, n,
      numHashes, bands, maxShingleDf)
    // under the writer lock: an append racing a [[compact]] would land
    // its files in the OLD version after compact's read pass, and the
    // compacted version (plus GC of the old dir) would silently drop
    // the batch — append and compact are both writers and serialize.
    // The version is resolved INSIDE the lock for the same reason.
    SnapshotDir.withWriterLock(spark, path) {
      val cur = currentDir(spark, path)
      buckets.write.mode(SaveMode.Append).parquet(cur)
      arrays.write.mode(SaveMode.Append).parquet(s"$cur/_arrays")
      spark.catalog.refreshByPath(cur)
    }
  }

  /** Rewrite the append-accumulated store back to a compact file
    * layout in the NEXT committed version (the [[SnapshotDir]]
    * protocol: no rename, in-flight readers keep their version through
    * the GC grace window). Fingerprints are unchanged — only files. */
  def compact(spark: SparkSession, path: String): Unit = {
    // version resolution AND the read-side file listing happen inside
    // the lock (spark.read.parquet lists eagerly): an appendBatch
    // committing between an outside listing and the lock acquisition
    // would leave its files out of the compacted version, and the old
    // dir's GC would silently drop the batch
    val vdir = SnapshotDir.withWriterLock(spark, path) {
      val cur = currentDir(spark, path)
      val buckets = spark.read.parquet(cur)
      val arrays = spark.read.parquet(s"$cur/_arrays")
      val next = SnapshotDir.next(spark, path, Prefix)
      val vd = s"$path/${SnapshotDir.name(Prefix, next)}"
      buckets.repartition(col("band"))
        .write.mode(SaveMode.Overwrite).parquet(vd)
      arrays.write.mode(SaveMode.Overwrite).parquet(s"$vd/_arrays")
      SnapshotDir.commit(spark, path, Prefix, next)
      vd
    }
    SnapshotDir.gc(spark, path, Prefix)
    spark.catalog.refreshByPath(vdir)
  }
}
