package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

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
  * does. */
object VectorIndexStore {

  /** Build the deterministic residual-IVFPQ index over `corpus` and
    * persist it under `path`: `codes/` partitioned by list id, plus
    * `cents/`, `codebooks/`, `crosst/` (metadata-sized, unpartitioned). */
  def writeIvfPq(corpus: DataFrame, path: String,
      ivfCentroidMod: Int = 37, pqCentroidMod: Int = 41, m: Int = 8,
      dim: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val ix = Similarity.buildIvfPqIndex(corpus, ivfCentroidMod,
      pqCentroidMod, m, dim, idCol, vecCol)
    // cluster on the partition column before the partitioned write:
    // otherwise every upstream shuffle partition writes a sliver into
    // every list dir — P x C tiny files (observed ~4000 here) instead
    // of one file per list. At real scale, repartition on (cent_id,
    // salt) instead to hold per-file size near the block size.
    ix.codes().repartition(col("cent_id"))
      .write.mode(SaveMode.Overwrite).partitionBy("cent_id")
      .parquet(s"$path/codes")
    ix.cents.write.mode(SaveMode.Overwrite).parquet(s"$path/cents")
    ix.codebooks.write.mode(SaveMode.Overwrite)
      .parquet(s"$path/codebooks")
    ix.crossTable.write.mode(SaveMode.Overwrite)
      .parquet(s"$path/crosst")
  }

  /** Incremental index maintenance: append a new vector batch to a
    * persisted index. The batch is coarse-assigned with the FROZEN
    * stored centroids and PQ-encoded with the FROZEN stored codebooks,
    * then appended into only the list partitions its vectors land in —
    * the metadata relations never change, and untouched lists are
    * never rewritten. This is classic IVF maintenance: appends are
    * cheap and local; a periodic rebuild re-trains the centroid/
    * codebook samples when the data distribution drifts. */
  def appendIvfPq(spark: SparkSession, path: String, batch: DataFrame,
      m: Int = 8, dim: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val cents = spark.read.parquet(s"$path/cents")
    val cb = spark.read.parquet(s"$path/codebooks")
    Similarity.encodeForIndex(batch, cents, cb, m, dim, idCol, vecCol)
      .repartition(col("cent_id"))
      .write.mode(SaveMode.Append).partitionBy("cent_id")
      .parquet(s"$path/codes")
  }

  /** Compact the codes table back to one file per list. Every
    * [[appendIvfPq]] adds a file to each touched list partition;
    * after many appends a probe pays per-file open/footer costs, so
    * periodic compaction rewrites the table clustered on the list id
    * (atomic swap via a temp dir + rename, same discipline as
    * [[StateStore]]'s overwrite-merge). Codes are unchanged — only the
    * file layout. */
  def compactIvfPq(spark: SparkSession, path: String): Unit = {
    val codes = spark.read.parquet(s"$path/codes")
    val tmp = s"$path/codes__compact"
    codes.repartition(col("cent_id"))
      .write.mode(SaveMode.Overwrite).partitionBy("cent_id").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val live = new org.apache.hadoop.fs.Path(s"$path/codes")
    val fs = live.getFileSystem(conf)
    val old = new org.apache.hadoop.fs.Path(s"$path/codes__old")
    if (fs.exists(old)) fs.delete(old, true)
    // every rename is checked BEFORE anything is deleted: an unchecked
    // failure of the second rename followed by delete(old) would
    // destroy the only surviving copy of the codes table
    if (!fs.rename(live, old))
      throw new java.io.IOException(
        s"compactIvfPq: could not move $live aside; index unchanged")
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), live)) {
      fs.rename(old, live) // roll back; original data still intact
      throw new java.io.IOException(
        s"compactIvfPq: could not promote $tmp; original restored")
    }
    fs.delete(old, true)
    spark.catalog.refreshByPath(s"$path/codes")
  }

  /** ANN top-k served from a persisted index: identical output to
    * [[Similarity.ivfPqTopK]] over the same corpus (the index build is
    * deterministic and doubles round-trip parquet exactly), but the
    * codes scan is partition-pruned to the probed lists. */
  def ivfPqTopKFromIndex(spark: SparkSession, path: String,
      queries: DataFrame, corpus: DataFrame, k: Int, nprobe: Int = 2,
      m: Int = 8, dim: Int = 64, shortlistFactor: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // codes is NOT read here: the pruned reader below is the only
    // consumer, and an eager spark.read.parquet would pay a full
    // partition discovery over every list directory just to be
    // discarded (the whole point of the layout is to avoid that)
    val ix = Similarity.IvfPqIndex(
      cents = spark.read.parquet(s"$path/cents"),
      codes = () => spark.read.parquet(s"$path/codes"),
      codebooks = spark.read.parquet(s"$path/codebooks"),
      crossTable = spark.read.parquet(s"$path/crosst"))
    Similarity.ivfPqSearch(ix, queries, corpus, k, nprobe, m, dim,
      shortlistFactor, idCol, vecCol,
      prunedCodes = Some(ids => spark.read.parquet(s"$path/codes")
        .filter(col("cent_id").isin(ids: _*))))
  }
}
