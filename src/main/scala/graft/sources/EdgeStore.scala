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
  val FormatVersion = 1

  private def currentDir(spark: SparkSession, path: String): String =
    SnapshotDir.current(spark, path, Prefix).getOrElse(
      throw new IllegalStateException(
        s"no committed edge store under $path"))

  /** Publish `pairs` (`id_a`, `id_b`, `cos`) as the next committed
    * version. */
  def writePairs(pairs: DataFrame, path: String): Unit = {
    val spark = pairs.sparkSession
    SnapshotDir.withWriterLock(spark, path) {
      val next = SnapshotDir.next(spark, path, Prefix)
      val vdir = s"$path/${SnapshotDir.name(Prefix, next)}"
      pairs.write.mode(SaveMode.Overwrite).parquet(vdir)
      SnapshotDir.commit(spark, path, Prefix, next)
    }
    SnapshotDir.gc(spark, path, Prefix)
  }

  /** Build (or confirm warm) the embedding near-dup pair store:
    * [[graft.operators.Similarity.nearDupPairsLsh]] persisted behind a
    * recipe marker (marker last — a crash mid-build leaves no marker
    * and rebuilds; a recipe change rebuilds). Returns the build
    * seconds, or None when the warm store was reused. */
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
        dim = dim), path)
      writeText(spark, marker, recipe)
      Some((System.nanoTime() - t0) / 1e9)
    }
  }

  /** Stored pair list `(id_a, id_b, cos)` of the current version. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(currentDir(spark, path))
}
