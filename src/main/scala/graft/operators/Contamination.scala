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
