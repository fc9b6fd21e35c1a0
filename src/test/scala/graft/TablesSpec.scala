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
    Seq((1L, java.time.LocalDateTime.of(2025, 1, 3, 10, 0, 0)),
        (2L, java.time.LocalDateTime.of(2025, 11, 2, 6, 30, 0)))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val savedTz = spark.conf.get("spark.sql.session.timeZone")
    val savedInfer =
      spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    try {
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      // zones where a bare cast shifts the instant — including a DST
      // zone whose repeated autumn hour makes 06:30Z (= 01:30 local,
      // ambiguous) resolve to the WRONG instant under wall-time casting
      for (tz <- Seq("America/Mexico_City", "America/New_York")) {
        spark.conf.set("spark.sql.session.timeZone", tz)
        val got = Tables(spark, dir, "events")
          .orderBy($"event_id")
          .select(unix_timestamp($"ts")).as[Long].collect().toSeq
        assert(got === Seq(1735898400L, 1762065000L),
          s"under $tz") // 2025-01-03T10:00:00Z, 2025-11-02T06:30:00Z
      }
    } finally {
      spark.conf.set("spark.sql.session.timeZone", savedTz)
      spark.conf.set(
        "spark.sql.parquet.inferTimestampNTZ.enabled", savedInfer)
    }
  }
}
