package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Privacy / governance screens over the fact table — the release
  * gates a data platform runs before handing an extract to a wider
  * audience, beside the text side's PII scrub
  * ([[Contamination.piiScrub]]):
  *
  *  - [[kAnonymity]] — Sweeney's k-anonymity: every quasi-identifier
  *    combination must describe at least k distinct individuals, or
  *    the cell re-identifies;
  *  - [[lDiversity]] — Machanavajjhala et al.: a k-anonymous cell
  *    whose SENSITIVE attribute is constant still leaks ("everyone in
  *    this cell purchased"); each cell needs ≥ l distinct sensitive
  *    values;
  *  - [[dpNoisyCounts]] — the Laplace mechanism's release shape:
  *    per-category counts plus Laplace(Δ/ε) noise. The draw is the
  *    suite's md5 hash through the inverse CDF, NOT an RNG — every
  *    engine replays every noise value, which makes the release
  *    oracle-checkable. (A replayable seed is NOT differential
  *    privacy — a real deployment swaps the hash for a secret RNG;
  *    the mechanism, sensitivity accounting, and output shape are
  *    what this operator pins.)
  *
  * The reference has no privacy surface (its PII lives in sheet ACLs);
  * these are extension operators in the suite's exactness discipline:
  * k/l screens are pure integer aggregates, and the one transcendental
  * in the Laplace inverse (ln) closes behind a 6dp round.
  *
  * Scale shape: each screen is ONE partial-combining aggregate to the
  * QI-cells frame (cells-sized, never fact-sized); the noisy release
  * adds one hash+ln per CELL. */
object Privacy {

  /** Dialect-neutral day-of-week: epoch days mod 7 (the engines'
    * dayofweek() conventions disagree). */
  private def dow7(tsCol: Column): Column =
    pmod(datediff(to_date(tsCol), to_date(lit("1970-01-01"))), lit(7))

  /** Quasi-identifier projection: (event_type, dow, value-band) — the
    * kind of "harmless" attribute triple that re-identifies when a
    * cell gets small. The value band is an exact integer: cents div
    * 10000 (a $100 bucket). */
  private def qiCells(events: DataFrame): DataFrame =
    events.select(col("event_type").as("qi_type"),
      dow7(col("ts")).as("qi_dow"),
      // floor over an exact integer-valued double, mirrored in SQL —
      // a long `cast` after `/` would TRUNCATE in Spark but ROUND in
      // DuckDB; floor agrees everywhere
      floor((col("value").cast(DecimalType(18, 2)) * 100).cast("long")
        .cast("double") / lit(10000.0)).cast("long").as("qi_band"),
      col("user_id"))

  /** k-anonymity audit per QI cell: the number of DISTINCT individuals
    * the cell describes (record counts overstate anonymity when one
    * user repeats), the record count, and the pass flag. The release
    * gate is `min(n_users) >= k` over the whole frame; per-cell rows
    * name exactly which cells block it. */
  def kAnonymity(events: DataFrame, k: Int = 5): DataFrame =
    qiCells(events)
      .groupBy(col("qi_type"), col("qi_dow"), col("qi_band"))
      .agg(count(lit(1)).as("n_records"),
        countDistinct(col("user_id")).as("n_users"))
      .withColumn("k_anonymous", col("n_users") >= k)

  /** l-diversity audit: within each QI cell, the count of DISTINCT
    * sensitive values (here the user's purchase-size band — the
    * attribute an attacker wants). A k-anonymous cell with one
    * sensitive value still discloses it for everyone in the cell. */
  def lDiversity(events: DataFrame, l: Int = 3): DataFrame =
    qiCells(events)
      .groupBy(col("qi_type"), col("qi_dow"))
      .agg(count(lit(1)).as("n_records"),
        countDistinct(col("qi_band")).as("n_sensitive"))
      .withColumn("l_diverse", col("n_sensitive") >= l)

  /** Laplace-mechanism count release per category: true count (never
    * released in production — kept here so the oracle can audit the
    * noise), the replayable noise draw, and the noised value. Noise =
    * −b·sgn(u−½)·ln(1−2|u−½|) with u = md5(key)/2⁶⁰ ∈ [0,1) and
    * b = sensitivity/ε (count queries: Δ=1). ln is the chain's one
    * transcendental; the 6dp round closes it. */
  def dpNoisyCounts(events: DataFrame, epsilon: Double = 1.0,
      keyCol: String = "event_type"): DataFrame = {
    val counts = events.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_true"))
    val u = Dedup.seededHash(col("key").cast("string"), 0)
      .cast("double") / lit(1152921504606846976.0) // h / 2^60
    val c = u - lit(0.5)
    val b = lit(1.0 / epsilon)
    val noise = -b * signum(c) * log(lit(1.0) - lit(2.0) * abs(c))
    counts
      .withColumn("noise", round(noise, 6))
      .withColumn("n_released",
        round(col("n_true").cast("double") + col("noise"), 6))
  }
}
