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

  /** Apply exact dedup: the corpus with only each group's keeper row —
    * what a pipeline actually feeds downstream. A broadcast-friendly
    * semi-join of the corpus against the keeper ids. */
  def dedupedCorpus(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.join(
      exactGroups(docs, idCol, textCol).select(col("keeper_id").as(idCol)),
      Seq(idCol), "left_semi")

  /** A small parquet corpus arrives as one partition; everything downstream
    * (hashing, inverted-index joins, 64-column aggregates) is compute-bound,
    * so fan the rows out to the session's shuffle width first. At real
    * scale the input already has many partitions. */
  private def fanOut(docs: DataFrame): DataFrame =
    docs.repartition(docs.sparkSession.sessionState.conf.numShufflePartitions)

  /** Shingles appearing in more than this many documents are dropped from
    * the shingle vocabulary before ANY similarity work: a shingle shared
    * by f docs contributes f² inverted-index join rows, so one boilerplate
    * trigram ("terms and conditions" class) makes pair generation
    * quadratic at corpus scale while carrying zero dedup signal. The cap
    * applies uniformly — sizes, intersections, and MinHash signatures all
    * see the same capped sets — so Jaccard stays a true Jaccard (of the
    * informative vocabulary) and the exact and LSH paths remain mutually
    * consistent. Below the cap (all test scale factors) results are
    * bit-identical to the uncapped computation. */
  val DefaultMaxShingleDf = 1000

  /** Df-capped inverted index: exploded distinct (id, shingle) pairs minus
    * the ubiquitous-shingle vocabulary. The raw exploded index is cached —
    * it feeds both the hot-set aggregate and the anti-join, and the
    * shingle construction is an interpreted higher-order expression you
    * only want to pay once. The hot set is tiny by construction
    * (≤ |corpus|/maxDf distinct shingles can exceed the cap), so the
    * removal plans as a broadcast anti-join. */
  private def cappedShingleIndex(docs: DataFrame, idCol: String,
      textCol: String, n: Int, maxDf: Int): DataFrame = {
    val ex = CacheRegistry.tracked(
      fanOut(docs).select(col(idCol).as("id"),
        explode(TextAnalysis.shingles(col(textCol), n)).as("sh")))
    val hot = ex.groupBy(col("sh")).agg(count(lit(1)).as("df_cnt"))
      .filter(col("df_cnt") > maxDf).select(col("sh"))
    ex.join(broadcast(hot), Seq("sh"), "left_anti")
  }

  /** Jaccard from inverted-index self-join: pair intersection counts come
    * straight from the join (one narrow shuffle, no per-pair set work),
    * sizes join in after the aggregate. The right shape when candidates ≈
    * all sharing pairs (the exact path). */
  private def jaccardBySelfJoin(idx: DataFrame, threshold: Double)
      : DataFrame = {
    val sizes = idx.groupBy(col("id")).agg(count(lit(1)).as("nsh"))
    idx.as("a").join(idx.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
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

  /** Exact Jaccard verification of a SPARSE candidate-pair set against
    * per-doc shingle arrays: two equi-joins and a per-row
    * `array_intersect` — linear in the candidate count, and the inverted
    * index is never re-joined. The right shape when candidates are few
    * (the LSH path). */
  private def verifyJaccard(cands: DataFrame, arrays: DataFrame,
      threshold: Double): DataFrame =
    cands
      .join(arrays.select(col("id").as("id_a"), col("shs").as("shs_a")),
        "id_a")
      .join(arrays.select(col("id").as("id_b"), col("shs").as("shs_b")),
        "id_b")
      .withColumn("inter", size(array_intersect(col("shs_a"), col("shs_b")))
        .cast("long"))
      .withColumn("size_a", size(col("shs_a")).cast("long"))
      .withColumn("size_b", size(col("shs_b")).cast("long"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("size_a") + col("size_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("inter"), col("size_a"),
        col("size_b"), col("jaccard"))

  /** Pairwise n-gram Jaccard over documents sharing at least one
    * non-ubiquitous shingle. Returns (id_a, id_b, inter, size_a, size_b,
    * jaccard) for jaccard ≥ threshold, id_a < id_b. */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 3,
      maxShingleDf: Int = DefaultMaxShingleDf): DataFrame =
    // the capped index derives from the cached raw index by one broadcast
    // anti-join, cheap to replay per read — no second cache needed
    jaccardBySelfJoin(
      cappedShingleIndex(docs, idCol, textCol, n, maxShingleDf), threshold)

  /** Deterministic 60-bit shingle hash for seed `k`, reproducible in any
    * engine with md5 (the oracle uses the same construction). Two hashes
    * share one digest (chars 1-15 / 17-31) — md5 dominates signature cost,
    * and Catalyst's subexpression elimination evaluates the shared digest
    * once per row. */
  def seededHash(sh: Column, k: Int): Column =
    conv(substring(md5(concat(sh, lit(s"#${k / 2}"))), 1 + (k % 2) * 16, 15),
      16, 10).cast("long")

  /** MinHash signatures: `numHashes` min-hash values per document over the
    * df-capped shingle vocabulary. */
  def minhashSignatures(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3, numHashes: Int = 8,
      maxShingleDf: Int = DefaultMaxShingleDf): DataFrame =
    minhashSignaturesFrom(
      cappedShingleIndex(docs, idCol, textCol, n, maxShingleDf), numHashes)

  private def minhashSignaturesFrom(ex: DataFrame, numHashes: Int): DataFrame =
    ex.groupBy(col("id"))
      .agg(min(seededHash(col("sh"), 0)).as("mh0"),
        (1 until numHashes).map(k =>
          min(seededHash(col("sh"), k)).as(s"mh$k")): _*)

  /** MinHash+LSH near-dup pairs: band the signature (`bands` bands of
    * `numHashes/bands` rows), bucket-join on (band, band-key), then verify
    * only the candidates with exact n-gram Jaccard ≥ threshold from the
    * per-doc shingle arrays — neither the full inverted-index self-join
    * nor an index re-join ever runs. */
  def minhashLshPairs(docs: DataFrame, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 3,
      numHashes: Int = 8, bands: Int = 4,
      maxShingleDf: Int = DefaultMaxShingleDf): DataFrame = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    val idx = cappedShingleIndex(docs, idCol, textCol, n, maxShingleDf)
    val arrays = idx.groupBy(col("id")).agg(collect_list(col("sh")).as("shs"))
    val sigs = minhashSignaturesFrom(idx, numHashes)
    val bandKeys = (0 until bands).map { b =>
      md5(concat_ws(",",
        (0 until rows).map(r => col(s"mh${b * rows + r}")): _*))
    }
    val buckets = CacheRegistry.tracked( // self-joined: don't recompute
      sigs.select(col("id"), // the md5-heavy signature agg per side
        posexplode(array(bandKeys: _*)).as(Seq("band", "key"))))
    val cands = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    verifyJaccard(cands, arrays, threshold)
  }

  val SimhashBits = 60
  val SimhashBands = 4

  /** Smallest divisor of [[SimhashBits]] that yields at least
    * `maxHamming + 1` bands — the pigeonhole condition for exhaustive
    * banded bucketing at that threshold. 60 divides richly (4, 5, 6, 10,
    * 12, 15, 20, 30, 60), so every `maxHamming ≤ 59` has a valid banding;
    * more bands = more bucket rows, so take the fewest that suffice. */
  def bandsFor(maxHamming: Int): Int = {
    require(maxHamming >= 0 && maxHamming < SimhashBits)
    (maxHamming + 1 to SimhashBits).find(SimhashBits % _ == 0).get
  }

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

  /** SimHash near-dup pairs, EXHAUSTIVE at any threshold: bucket on
    * `bandsFor(maxHamming)` equal bands of the 60-bit signature — by
    * pigeonhole, a pair within hamming ≤ maxHamming must agree on at
    * least one of maxHamming+1 bands, so banding never drops a
    * qualifying pair. The default (3 → 4×15-bit bands) is the classic
    * near-dup setting; higher thresholds automatically take more,
    * narrower bands (wider buckets → more candidates to verify — the
    * standard recall/cost dial). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bands = bandsFor(maxHamming)
    val bandBits = SimhashBits / bands
    val mask = (1L << bandBits) - 1
    val sigs = CacheRegistry.tracked(simhash(docs, idCol, textCol))
    val buckets = sigs.select(col("id"), col("simhash"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("simhash"), b * bandBits).bitwiseAND(mask)): _*))
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
