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
      // UTC, so pin that interpretation with pure field arithmetic on the
      // naive value — a cast (or convert_timezone + cast) resolves a wall
      // time in the SESSION zone, which both shifts instants and collapses
      // the DST repeated hour in any zone that observes it. Date and
      // time-of-day extraction from NTZ never touch the session zone, so
      // this is exact everywhere.
      df.withColumn("ts", expr(
        "timestamp_micros(" +
          "cast(unix_date(cast(ts as date)) as bigint) * 86400000000 + " +
          "cast(extract(HOUR FROM ts) as bigint) * 3600000000 + " +
          "cast(extract(MINUTE FROM ts) as bigint) * 60000000 + " +
          "cast(round(extract(SECOND FROM ts) * 1000000) as bigint))"))
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
