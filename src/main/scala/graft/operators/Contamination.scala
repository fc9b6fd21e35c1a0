package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data hygiene operators: benchmark decontamination and PII
  * scrubbing.
  */
object Contamination {

  /** Test-set decontamination: flag corpus documents that share at least
    * one word `n`-gram with any benchmark document — the standard
    * n-gram-overlap contamination check run before training. Returns one
    * row per contaminated corpus doc: distinct overlapping shingle count
    * and the smallest matching benchmark id as provenance.
    *
    * Shape: explode both sides to (id, shingle), equi-join on the
    * shingle — inverted-index bound, never a doc × doc product. The
    * benchmark side is usually the small one (test sets are thousands of
    * rows, corpora are billions): with `broadcastIndex = true` (default)
    * its exploded index broadcasts, so the corpus never shuffles. When
    * the benchmark suite outgrows the broadcast threshold (hundreds of
    * evals × thousands of rows), pass `broadcastIndex = false`: the same
    * plan runs as a shuffle equi-join on the shingle — both sides
    * partition by shingle hash, identical results — instead of OOMing
    * the driver on a forced broadcast build. No df cap here —
    * contamination wants exact overlap, and the join fan-out is bounded
    * by the benchmark's vocabulary, not the corpus's. */
  def ngramOverlap(corpus: DataFrame, benchmark: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 5,
      broadcastIndex: Boolean = true): DataFrame = {
    def index(docs: DataFrame, as: String) =
      docs.select(col(idCol).as(as),
        explode(TextAnalysis.shingles(col(textCol), n)).as("sh"))
    val bench = index(benchmark, "bench_id")
    index(corpus, "doc_id")
      .join(if (broadcastIndex) broadcast(bench) else bench, "sh")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("sh")).as("n_shared"),
        min(col("bench_id")).as("first_bench_id"))
  }

  /** Serialized Bloom filter over the benchmark's word n-gram
    * vocabulary — the PRODUCTION decontamination shape: at web scale
    * the corpus side must stay a pure scan, and even the broadcast
    * inverted-index join of [[ngramOverlap]] pays an explode + join
    * per corpus shingle. A Bloom filter compresses the benchmark
    * vocabulary to `~1.44 · n · log2(1/fpp)` BITS (≈ 1.2 MB per
    * million n-grams at 1%), ships to every executor as a literal, and
    * turns the membership probe into a per-row expression.
    *
    * Built DISTRIBUTED with Spark's own `BloomFilterAggregate` over
    * `xxhash64(shingle)` (the same construction the runtime join-filter
    * optimization uses — mergeable map-side partial filters, one
    * reduce); the single collected row is the filter itself, bounded by
    * `numBits/8` bytes — metadata-sized, like a broadcast threshold.
    * `expectedItems` only tunes the bit budget: an undercount raises
    * the false-positive rate, never creates false negatives. */
  def benchmarkNgramBloom(benchmark: DataFrame, textCol: String = "text",
      n: Int = 5, expectedItems: Long = 1L << 18,
      fpp: Double = 0.01): Array[Byte] = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val numBits = math.ceil(-expectedItems * math.log(fpp) /
      (math.log(2) * math.log(2))).toLong
    val agg = new BloomFilterAggregate(
      GraftBridge.expression(xxhash64(col("sh"))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    Option(benchmark
      .select(explode(TextAnalysis.shingles(col(textCol), n)).as("sh"))
      .select(GraftBridge.column(agg).as("bf"))
      .head().getAs[Array[Byte]](0))
      // zero benchmark n-grams → the aggregate yields NULL; an empty
      // filter (nothing flagged) is the correct degenerate answer
      .getOrElse {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.spark.util.sketch.BloomFilter.create(1, fpp)
          .writeTo(out)
        out.toByteArray
      }
  }

  /** Per-doc Bloom contamination flag: TRUE iff ANY of the doc's word
    * `n`-grams might be in the benchmark filter. A single projection —
    * `exists` over the shingle array probing the broadcast-literal
    * filter — so the corpus pays one SCAN with no explode, no join and
    * no shuffle (PlanSpec pins the join-free plan). May over-flag at
    * the filter's false-positive rate (quarantine-and-verify is the
    * production protocol: only flagged docs hit the exact
    * [[ngramOverlap]] path); NEVER under-flags — Bloom filters have no
    * false negatives, which is what decontamination must guarantee. */
  def bloomContaminated(bloom: Array[Byte], text: Column,
      n: Int = 5): Column = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    exists(TextAnalysis.shingles(text, n), sh => GraftBridge.column(
      BloomFilterMightContain(GraftBridge.expression(lit(bloom)),
        GraftBridge.expression(xxhash64(sh)))))
  }

  /** SELF-VALIDATING form of the Bloom path (the driver-facing query):
    * Bloom bits are engine-specific, so instead of hashing the raw
    * flags the query projects, per corpus doc, the EXACT overlap count
    * (DuckDB replays it) plus `no_false_negative` — the Bloom
    * guarantee itself, TRUE iff the filter flagged every exactly-
    * contaminated doc. The raw Bloom flag stays un-hashed; ExtSpec
    * separately bounds the observed false-positive RATE. */
  def bloomDecontamSelfCheck(corpus: DataFrame, benchmark: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 5,
      expectedItems: Long = 1L << 18, fpp: Double = 0.01): DataFrame = {
    val bloom = benchmarkNgramBloom(benchmark, textCol, n,
      expectedItems, fpp)
    val exact = ngramOverlap(corpus, benchmark, idCol, textCol, n)
    corpus
      .select(col(idCol),
        bloomContaminated(bloom, col(textCol), n).as("bloom_hit"))
      .join(exact.select(col(idCol), col("n_shared")), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"),
        (col("bloom_hit") || coalesce(col("n_shared"), lit(0L)) === 0)
          .as("no_false_negative"))
  }

  /** PII redaction patterns, deliberately engine-portable (no lookahead,
    * no backrefs — safe in Java regex and RE2 alike). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  val LongDigitsRe = "[0-9]{7,}"
  private val Replacements = Seq(
    EmailRe -> "<EMAIL>", UrlRe -> "<URL>", LongDigitsRe -> "<NUM>")

  /** Count of PII matches in `text` (emails + URLs + long digit runs). */
  def piiCount(text: Column): Column =
    Replacements.map { case (re, _) =>
      size(regexp_extract_all(text, lit(re), lit(0)))
    }.reduce(_ + _)

  /** `text` with every PII match replaced by its placeholder tag.
    * Pure codegen'd string expressions — scan speed, no shuffle. */
  def piiScrub(text: Column): Column =
    Replacements.foldLeft(text) { case (c, (re, tag)) =>
      regexp_replace(c, re, tag)
    }
}
