package graft

import org.apache.spark.sql.functions._

/** Loader normalization guards — the events NTZ fallback exists for
  * FOREIGN sessions (NTZ inference on, arbitrary session timezone), so
  * it must produce the same instants there as in this repo's own UTC
  * sessions. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("NTZ events fallback reads naive timestamps as UTC in any session tz") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ntz-events").toString
    Seq((1L, java.time.LocalDateTime.of(2025, 1, 3, 10, 0, 0)))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val savedTz = spark.conf.get("spark.sql.session.timeZone")
    val savedInfer =
      spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    try {
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      // a non-UTC, non-whole-hour-history zone: a bare cast would shift
      // the instant by the local offset here
      spark.conf.set("spark.sql.session.timeZone", "America/Mexico_City")
      val got = Tables(spark, dir, "events")
        .select(unix_timestamp($"ts")).as[Long].head()
      assert(got === 1735898400L) // 2025-01-03T10:00:00Z
    } finally {
      spark.conf.set("spark.sql.session.timeZone", savedTz)
      spark.conf.set(
        "spark.sql.parquet.inferTimestampNTZ.enabled", savedInfer)
    }
  }
}
