package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TSV corpus source/sink — the flat-file sibling of [[JsonlCorpus]]
  * (extension track). Many public text corpora ship as tab-separated
  * dumps; the failure modes differ from JSONL (token-count drift and
  * type garbage instead of broken syntax), so the quarantine path is a
  * genuinely different parser contract, not a re-export.
  *
  * Write contract: tabs/newlines/carriage returns inside `text` are
  * escaped to `\t`/`\n`/`\r` sequences BEFORE the write (backslash
  * itself doubles first), so every record is exactly one physical
  * line. That keeps the read side line-splittable — the alternative,
  * quoted multi-line fields with `multiLine=true`, forces Spark to
  * read each file in ONE task, which is unusable on a 100 TB dump.
  * NUL bytes are stripped on write (never legitimate text), which
  * frees NUL up as the decode placeholder that keeps `\\t` (escaped
  * backslash + literal t) from turning into a tab on read. [[read]]
  * reverses the escaping, so the round-trip is lossless (ExtSpec pins
  * tab/newline/backslash material through it).
  *
  * Read contract: explicit schema + PERMISSIVE + corrupt-record
  * column, like the JSONL side — a line with garbage types lands in
  * quarantine with its raw text; a line that parses but misses the id
  * CONTRACT is quarantined too. The scan stays line-splittable and
  * never aborts (ANSI would otherwise throw mid-crawl-dump). */
object TsvCorpus {

  val DocSchema: StructType = JsonlCorpus.DocSchema

  private val Corrupt = "_corrupt_line"
  private val Nul = "\u0000"

  private def esc(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(c, Nul, ""),
      "\\\\", "\\\\\\\\"), "\t", "\\\\t"), "\n", "\\\\n"),
      "\r", "\\\\r")

  private def unesc(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(c, "\\\\\\\\", Nul), "\\\\t", "\t"),
      "\\\\n", "\n"), "\\\\r", "\r"), Nul, "\\\\")

  /** Export a documents frame as headerless TSV, one record per line.
    * Every field is null-coalesced to "" BEFORE concat_ws: concat_ws
    * SKIPS null arguments (separator included), so an uncoalesced null
    * field would emit a line one column short and the read would
    * silently shift every later field left — field-order corruption,
    * not a quarantine. The contract stays "null renders as empty". */
  def write(docs: DataFrame, path: String): Unit = {
    def f(c: Column) = coalesce(c.cast("string"), lit(""))
    docs
      .select(concat_ws("\t",
        f(col("doc_id")), f(esc(col("text"))), f(col("lang")),
        f(col("source")), f(col("n_chars"))).as("value"))
      .write.text(path)
  }

  /** Read a TSV directory → (clean, quarantine). */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val withCorrupt =
      StructType(DocSchema.fields :+ StructField(Corrupt, StringType))
    val raw = spark.read
      .schema(withCorrupt)
      .option("sep", "\t")
      .option("header", "false")
      // the writer never quotes (plain text sink); a data field that
      // merely STARTS with a quote char must not trigger CSV quote
      // parsing (it would swallow tabs up to the next quote)
      .option("quote", "")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .csv(path)
    val clean = raw
      .filter(col(Corrupt).isNull && col("doc_id").isNotNull)
      // TSV cannot distinguish null from empty string; the contract
      // picks "" on both sides for EVERY string field (write coalesces
      // null fields to "", read restores the empty slot as "")
      .select(col("doc_id"),
        coalesce(unesc(col("text")), lit("")).as("text"),
        coalesce(col("lang"), lit("")).as("lang"),
        coalesce(col("source"), lit("")).as("source"),
        col("n_chars"))
    val quarantine = raw
      .filter(col(Corrupt).isNotNull || col("doc_id").isNull)
      .select(
        // reconstructed line must match the physical one: text stays
        // ESCAPED (no unesc), and every null slot renders as "" — the
        // writer's own null contract — because concat_ws would SKIP a
        // null argument outright and silently shorten the line
        coalesce(col(Corrupt),
          concat_ws("\t", DocSchema.fieldNames.map(f =>
            coalesce(col(f).cast("string"), lit(""))): _*))
          .as("raw_line"),
        when(col(Corrupt).isNotNull, "malformed tsv")
          .otherwise("missing doc_id").as("motivo_rechazo"))
    (clean, quarantine)
  }
}
