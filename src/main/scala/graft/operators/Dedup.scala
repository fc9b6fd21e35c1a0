package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, and SimHash near-dup detection.
  *
  * Scale design: everything is expressed as explode → shuffle-on-key →
  * aggregate. Candidate generation never builds the O(n²) cross product —
  * pairs only materialize for documents sharing a shingle (Jaccard), an LSH
  * band (MinHash), or a SimHash band bucket, which is the standard
  * inverted-index bound. No driver-side state anywhere. Small intermediate
  * frames that feed several branches of one job (signatures, the exploded
  * shingle index) are cached — the LSH plan reads them from both sides of
  * its self-join, and recomputing the hash aggregation per branch is the
  * difference between seconds and minutes (at any scale, this is where
  * you'd checkpoint instead).
  */
object Dedup {

  /** Exact dedup by content fingerprint: one keeper (min id) per group. */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), TextAnalysis.fingerprint(col(textCol))
        .as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_docs"))

  /** A small parquet corpus arrives as one partition; everything downstream
    * (hashing, inverted-index joins, 64-column aggregates) is compute-bound,
    * so fan the rows out to the session's shuffle width first. At real
    * scale the input already has many partitions. */
  private def fanOut(docs: DataFrame): DataFrame =
    docs.repartition(docs.sparkSession.sessionState.conf.numShufflePartitions)

  /** Exploded distinct (id, shingle) pairs — the inverted-index input. */
  private def shingleIndex(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    fanOut(docs).select(col(idCol).as("id"),
      explode(TextAnalysis.shingles(col(textCol), n)).as("sh"))

  /** Intersection counts + Jaccard for pairs sharing ≥1 shingle, optionally
    * restricted to a candidate-pair set. `ex` must be distinct per (id,sh). */
  private def jaccardOver(ex: DataFrame, threshold: Double,
      candidates: Option[DataFrame]): DataFrame = {
    val sizes = ex.groupBy(col("id")).agg(count(lit(1)).as("nsh"))
    val joined = candidates match {
      case None =>
        ex.as("a").join(ex.as("b"),
          col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      case Some(cands) =>
        // verify only the LSH candidates: join the index to the (small)
        // pair list from both ends; AQE broadcasts the pair list
        cands.join(ex.as("a"), col("id_a") === col("a.id"))
          .join(ex.as("b"),
            col("id_b") === col("b.id") && col("a.sh") === col("b.sh"))
          .select(col("id_a"), col("id_b"))
    }
    joined
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("id").as("id_a"), col("nsh").as("size_a")),
        "id_a")
      .join(sizes.select(col("id").as("id_b"), col("nsh").as("size_b")),
        "id_b")
      .withColumn("jaccard", col("inter").cast("double") /
        (col("size_a") + col("size_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("inter"), col("size_a"),
        col("size_b"), col("jaccard"))
  }

  /** Pairwise n-gram Jaccard over documents sharing at least one shingle.
    * Returns (id_a, id_b, inter, size_a, size_b, jaccard) for
    * jaccard ≥ threshold, id_a < id_b. */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 3)
      : DataFrame = {
    val ex = shingleIndex(docs, idCol, textCol, n).cache()
    jaccardOver(ex, threshold, None)
  }

  /** Deterministic 60-bit shingle hash for seed `k`, reproducible in any
    * engine with md5 (the oracle uses the same construction). Two hashes
    * share one digest (chars 1-15 / 17-31) — md5 dominates signature cost,
    * and Catalyst's subexpression elimination evaluates the shared digest
    * once per row. */
  def seededHash(sh: Column, k: Int): Column =
    conv(substring(md5(concat(sh, lit(s"#${k / 2}"))), 1 + (k % 2) * 16, 15),
      16, 10).cast("long")

  /** MinHash signatures: `numHashes` min-hash values per document. */
  def minhashSignatures(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3, numHashes: Int = 8): DataFrame =
    minhashSignaturesFrom(shingleIndex(docs, idCol, textCol, n), numHashes)

  private def minhashSignaturesFrom(ex: DataFrame, numHashes: Int): DataFrame =
    ex.groupBy(col("id"))
      .agg(min(seededHash(col("sh"), 0)).as("mh0"),
        (1 until numHashes).map(k =>
          min(seededHash(col("sh"), k)).as(s"mh$k")): _*)

  /** MinHash+LSH near-dup pairs: band the signature (`bands` bands of
    * `numHashes/bands` rows), bucket-join on (band, band-key), then verify
    * the candidates with exact n-gram Jaccard ≥ threshold. Only candidate
    * pairs are ever verified — the full inverted-index join never runs. */
  def minhashLshPairs(docs: DataFrame, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 3,
      numHashes: Int = 8, bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    val ex = shingleIndex(docs, idCol, textCol, n).cache()
    val sigs = minhashSignaturesFrom(ex, numHashes)
    val bandKeys = (0 until bands).map { b =>
      md5(concat_ws(",",
        (0 until rows).map(r => col(s"mh${b * rows + r}")): _*))
    }
    val buckets = sigs
      .select(col("id"), posexplode(array(bandKeys: _*)).as(Seq("band", "key")))
      .cache()
    val cands = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    jaccardOver(ex, threshold, Some(cands))
  }

  val SimhashBits = 60
  val SimhashBands = 4
  private val SimhashBandBits = SimhashBits / SimhashBands // 15
  private val SimhashBandMask = (1L << SimhashBandBits) - 1

  /** 60-bit SimHash per document: per-word md5-derived 60-bit hashes
    * ([[seededHash]] — reproducible in any engine with md5, so the DuckDB
    * oracle can recompute signatures exactly), each bit weighted by term
    * frequency, sign of the weighted sum becomes the bit. One shuffle
    * (groupBy id) with 60 partial-aggregated sums. */
  def simhash(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val wordRows = fanOut(docs).select(col(idCol).as("id"),
      explode(TextAnalysis.words(col(textCol))).as("w"))
      .groupBy(col("id"), col("w")).agg(count(lit(1)).as("tf"))
      .withColumn("h", seededHash(col("w"), 0))
    val bitSums = (0 until SimhashBits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, col("tf"))
        .otherwise(-col("tf"))).as(s"s$b")
    }
    val agg = wordRows.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until SimhashBits).map { b =>
      when(col(s"s$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    agg.select(col("id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs: bucket on 4×15-bit bands. By pigeonhole a
    * pair within hamming distance ≤ 3 of 60 bits MUST agree on at least
    * one band, so the banding is exhaustive for `maxHamming ≤ 3` — higher
    * thresholds would silently drop pairs that differ in every band. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxHamming < SimhashBands,
      s"banded bucketing is exhaustive only for hamming < $SimhashBands")
    val sigs = simhash(docs, idCol, textCol).cache()
    val buckets = sigs.select(col("id"), col("simhash"),
      posexplode(array((0 until SimhashBands).map(b =>
        shiftright(col("simhash"), b * SimhashBandBits)
          .bitwiseAND(SimhashBandMask)): _*))
        .as(Seq("band", "key")))
    buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
