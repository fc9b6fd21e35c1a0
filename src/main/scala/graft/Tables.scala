package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Testdata loaders (TESTDATA.md). One parquet file per table; the driver's
  * DuckDB oracle sees the same files under the bare table name.
  *
  * `events.ts` has shipped as both TIMESTAMP(NANOS) (readable only with
  * `spark.sql.legacy.parquet.nanosAsLong=true`, set by every session in
  * this repo; the loader converts raw nanos back with exact integer
  * division) and tz-naive TIMESTAMP(MICROS); the loader normalizes either
  * form to TimestampType so watermarked/windowed operators always see a
  * valid event-time column. */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" &&
      df.schema.find(_.name == "ts").exists(_.dataType == LongType))
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else if (name == "events" &&
      df.schema.find(_.name == "ts").exists(_.dataType == TimestampNTZType))
      // a session that infers parquet NTZ (we disable that in ours, but the
      // driver's session is not ours to configure) still needs TIMESTAMP:
      // watermarks/windows reject NTZ. The naive values are semantically
      // UTC, so pin that interpretation instead of letting a bare cast
      // read them in whatever tz the foreign session runs: shift the
      // naive wall from UTC to the session tz first, then cast (which
      // interprets in session tz) — identity under UTC, and the same
      // instant under any other session tz.
      df.withColumn("ts", expr(
        "cast(convert_timezone('UTC', current_timezone(), ts) as timestamp)"))
    else df
  }

  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
