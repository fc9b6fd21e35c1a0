package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (one JSON object per line) corpus source/sink — the
  * interchange format LLM training corpora actually ship as (extension
  * track; the reference's only sources are sheet ranges).
  *
  * Read contract: PERMISSIVE with explicit schema — a malformed line
  * can NEVER poison the clean frame or abort the scan (ANSI mode makes
  * unschema'd reads throw mid-job at line 4 billion of a crawl dump).
  * Quarantine keeps the raw line: a syntactically-broken record lands
  * with its text preserved for repair, and a well-formed object that
  * violates the schema CONTRACT (missing id) is quarantined too —
  * "parses" is not "valid". Scale shape: a JSONL directory splits by
  * line across tasks like any text source; the explicit schema skips
  * the full-corpus inference pass `spark.read.json` would otherwise
  * pay before reading a single row. */
object JsonlCorpus {

  /** The documents-table schema as the JSONL contract. */
  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val Corrupt = "_corrupt_line"

  /** Export a documents frame as JSONL. */
  def write(docs: DataFrame, path: String): Unit =
    docs
      .select(to_json(struct(DocSchema.fieldNames.map(col): _*))
        .as("value"))
      .write.text(path)

  /** Read a JSONL directory → (clean, quarantine). Quarantine rows
    * carry the offending raw line and a reason; clean rows are exactly
    * [[DocSchema]]. */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val withCorrupt =
      StructType(DocSchema.fields :+ StructField(Corrupt, StringType))
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .json(path)
    val clean = raw
      .filter(col(Corrupt).isNull && col("doc_id").isNotNull)
      .select(DocSchema.fieldNames.map(col): _*)
    val quarantine = raw
      .filter(col(Corrupt).isNotNull || col("doc_id").isNull)
      .select(
        coalesce(col(Corrupt),
          to_json(struct(DocSchema.fieldNames.map(col): _*)))
          .as("raw_line"),
        when(col(Corrupt).isNotNull, "malformed json")
          .otherwise("missing doc_id").as("motivo_rechazo"))
    (clean, quarantine)
  }
}
