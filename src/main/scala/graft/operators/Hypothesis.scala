package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Experimentation statistics over the events stream: Welch's t-test,
  * the Mann–Whitney rank-sum test, the two-sample Kolmogorov–Smirnov
  * distance, and CUPED variance reduction — the A/B analysis layer a
  * data platform bolts onto its metrics tables.
  *
  * The reference has no experimentation surface (its closest analog is
  * the daily-totals comparison sheet, `Code.gs:1545-1620`); these are
  * extension operators in the same determinism discipline as the rest
  * of the repo:
  *
  *   - Variant assignment is the md5-seeded hash (`Dedup.seededHash`,
  *     seed 0 — the `splitAssign` family), never randomness: the same
  *     user lands in the same arm on every engine and every replay.
  *   - Sufficient statistics are EXACT (bigint / decimal(38,0) sums;
  *     the CUPED covariance uses the n-scaled form `Σ(n·x−Sx)(n·y−Sy)`
  *     so no engine-specific mean quotient enters the sum — the
  *     `x_acf_daily` trick).
  *   - The closing statistics are a FIXED sequence of scalar IEEE ops
  *     mirrored verbatim in the oracle SQL (each double conversion is
  *     correctly rounded, so identical op order ⇒ identical bits),
  *     rounded to 6dp only where a transcendental (sqrt) ends the
  *     chain.
  *
  * Scale shape: every test reduces the fact table to a per-(key,
  * variant) — or per-(key, distinct-value) — frame in ONE partial-
  * combining aggregate; the rank/cdf windows of Mann–Whitney and KS
  * run over the distinct-VALUE frame, not the fact frame, so the sort
  * cost is value-cardinality-bounded. Int64 headroom: the rank sums
  * cap at 2N² and the tie term at N³ — fine to ~10⁶ rows per key;
  * beyond that the documented swap is decimal(38,0) widening on the
  * three window sums (same plan, wider buffers).
  */
object Hypothesis {

  /** Deterministic 50/50 arm from the seed-0 md5 hash of the user id —
    * `pmod(h, 2)`: 0 → "a", 1 → "b". */
  def variantOf(userCol: Column): Column =
    when(pmod(Dedup.seededHash(userCol.cast("string"), 0), lit(2)) === 0,
      lit("a")).otherwise(lit("b"))

  private val d38 = DecimalType(38, 0)

  /** Integer cents via the repo's proven exact form (`Temporal.trendOls`
    * / its oracle): decimal(18,2) quantization then ×100 — never a
    * double round, so both engines land the identical bigint. */
  private def centsOf(valueCol: String): Column =
    (col(valueCol).cast(DecimalType(18, 2)) * 100).cast("long")

  /** Welch's unequal-variance t-test per key: exact per-arm
    * (n, Σcents, Σcents²) in one aggregate, then the t statistic and
    * Welch–Satterthwaite degrees of freedom as mirrored scalar IEEE
    * ops. Arms with n < 2 yield NULL t/df (variance undefined) rather
    * than an error. */
  /** The wide per-key arm-stats frame shared by [[welchTTest]] and
    * [[powerMde]]: exact (n, Σcents, Σcents²) per arm, pivoted. */
  private def armStatsWide(events: DataFrame, variant: Column,
      keyCol: String, valueCol: String): DataFrame =
    armStatsOf(events.select(col(keyCol).as("key"),
      variant.as("v"), centsOf(valueCol).as("c")))

  def welchTTest(events: DataFrame, variant: Column,
      keyCol: String = "event_type", valueCol: String = "value")
      : DataFrame = {
    val wide = armStatsWide(events, variant, keyCol, valueCol)
    // the mirrored scalar chain — op order is the contract
    def mean(s: Column, n: Column) = s.cast("double") / n.cast("double")
    def variance(ss: Column, s: Column, n: Column) =
      (ss.cast("double") -
        (s.cast("double") * s.cast("double")) / n.cast("double")) /
        (n - 1).cast("double")
    val mA = mean(col("sum_a_cents"), col("n_a"))
    val mB = mean(col("sum_b_cents"), col("n_b"))
    val vA = variance(col("ss_a"), col("sum_a_cents"), col("n_a"))
    val vB = variance(col("ss_b"), col("sum_b_cents"), col("n_b"))
    val seA = vA / col("n_a").cast("double")
    val seB = vB / col("n_b").cast("double")
    val se2 = seA + seB
    val t = (mA - mB) / sqrt(se2)
    val dfW = (se2 * se2) /
      ((seA * seA) / (col("n_a") - 1).cast("double") +
        (seB * seB) / (col("n_b") - 1).cast("double"))
    wide.select(col("key"), col("n_a"), col("n_b"),
      col("sum_a_cents"), col("sum_b_cents"),
      mA.as("mean_a"), mB.as("mean_b"),
      when(col("n_a") >= 2 && col("n_b") >= 2, round(t, 6)).as("t_stat"),
      when(col("n_a") >= 2 && col("n_b") >= 2, round(dfW, 6)).as("df"))
  }

  /** Experiment-design read-out per key: the minimum detectable effect
    * (MDE) at two-sided α = 0.05 / power 0.8, from the SAME exact
    * per-arm sufficient stats as [[welchTTest]] —
    * `mde = (z_{α/2} + z_β) · √(s²_a/n_a + s²_b/n_b)`, with the z-sum
    * fixed as the literal 2.801585 (1.959964 + 0.841621, both engines
    * see the identical constant; no inverse-normal evaluation at query
    * time). Answers "is this experiment big enough" BEFORE the test
    * answers "did it move": an observed lift below `mde_cents` is noise
    * at the declared power no matter what the t says. `mde_rel` scales
    * by the control mean. Same one-aggregate reduction; arms with
    * n < 2 yield NULL (variance undefined). */
  def powerMde(events: DataFrame, variant: Column,
      keyCol: String = "event_type", valueCol: String = "value")
      : DataFrame = {
    val wide = armStatsWide(events, variant, keyCol, valueCol)
    def mean(s: Column, n: Column) = s.cast("double") / n.cast("double")
    def variance(ss: Column, s: Column, n: Column) =
      (ss.cast("double") -
        (s.cast("double") * s.cast("double")) / n.cast("double")) /
        (n - 1).cast("double")
    val mA = mean(col("sum_a_cents"), col("n_a"))
    val seA = variance(col("ss_a"), col("sum_a_cents"), col("n_a")) /
      col("n_a").cast("double")
    val seB = variance(col("ss_b"), col("sum_b_cents"), col("n_b")) /
      col("n_b").cast("double")
    val mde = lit(2.801585) * sqrt(seA + seB)
    val ok = col("n_a") >= 2 && col("n_b") >= 2
    wide.select(col("key"), col("n_a"), col("n_b"),
      mA.as("mean_a_cents"),
      when(ok, round(mde, 6)).as("mde_cents"),
      when(ok && mA =!= 0.0, round(mde / mA, 6)).as("mde_rel"))
  }

  /** Mann–Whitney U per key, tie-corrected: doubled rank sums stay
    * exact integers (2·avgrank of a tie group = 2·cnt_lt + cnt + 1),
    * the U statistics are exact bigints, and the normal-approximation
    * z (with the Σ(t³−t) tie correction) is the one mirrored
    * double chain, 6dp-rounded behind the closing sqrt. The rank
    * window runs over the DISTINCT-value frame. */
  def mannWhitneyU(events: DataFrame, variant: Column,
      keyCol: String = "event_type", valueCol: String = "value")
      : DataFrame = {
    val base = events.select(col(keyCol).as("key"),
      variant.as("v"), centsOf(valueCol).as("c"))
    val perVal = base.groupBy(col("key"), col("c"))
      .agg(sum(when(col("v") === "a", 1L).otherwise(0L)).as("ca"),
        sum(when(col("v") === "b", 1L).otherwise(0L)).as("cb"))
      .withColumn("cnt", col("ca") + col("cb"))
    val byKey = Window.partitionBy(col("key")).orderBy(col("c"))
    val cumLt = coalesce(
      sum(col("cnt")).over(byKey.rowsBetween(
        Window.unboundedPreceding, -1)), lit(0L))
    val scored = perVal.withColumn("r2",
      lit(2L) * cumLt + col("cnt") + lit(1L))
    val agg = scored.groupBy(col("key")).agg(
      sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
      sum(col("ca") * col("r2")).as("r_a_x2"),
      sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("ties"))
    val uAx2 = col("r_a_x2") - col("n_a") * (col("n_a") + 1)
    val uBx2 = lit(2L) * col("n_a") * col("n_b") - col("u_a_x2")
    val n = col("n_a") + col("n_b")
    // (2σ)² = n_a·n_b/3 · ((N+1) − T/(N(N−1))); z = (2U−2μ)/(2σ)
    val var4 = (col("n_a") * col("n_b")).cast("double") / lit(3.0) *
      ((n + 1).cast("double") -
        col("ties").cast("double") / (n * (n - 1)).cast("double"))
    val z = (col("u_a_x2") - col("n_a") * col("n_b")).cast("double") /
      sqrt(var4)
    agg.withColumn("u_a_x2", uAx2)
      .withColumn("u_b_x2", uBx2)
      .select(col("key"), col("n_a"), col("n_b"),
        col("u_a_x2"), col("u_b_x2"), col("ties"),
        when(col("n_a") > 0 && col("n_b") > 0 && var4 > 0,
          round(z, 6)).as("z"))
  }

  /** Two-sample Kolmogorov–Smirnov distance per key: the sup-distance
    * numerator `max |cdfA·n_b − cdfB·n_a|` is an exact bigint over the
    * distinct-value frame (running counts ≤ each value), `d` is ONE
    * closing division, and `at_cents` (the smallest value attaining
    * the sup) makes the location part of the hashed contract. */
  def ksTwoSample(events: DataFrame, variant: Column,
      keyCol: String = "event_type", valueCol: String = "value")
      : DataFrame = {
    val base = events.select(col(keyCol).as("key"),
      variant.as("v"), centsOf(valueCol).as("c"))
    val perVal = base.groupBy(col("key"), col("c"))
      .agg(sum(when(col("v") === "a", 1L).otherwise(0L)).as("ca"),
        sum(when(col("v") === "b", 1L).otherwise(0L)).as("cb"))
    val byKey = Window.partitionBy(col("key")).orderBy(col("c"))
    val running = byKey.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val stepped = perVal
      .withColumn("cum_a", sum(col("ca")).over(running))
      .withColumn("cum_b", sum(col("cb")).over(running))
      .withColumn("n_a", sum(col("ca")).over(Window.partitionBy(col("key"))))
      .withColumn("n_b", sum(col("cb")).over(Window.partitionBy(col("key"))))
      .withColumn("dev",
        abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
      .withColumn("dev_max",
        max(col("dev")).over(Window.partitionBy(col("key"))))
    stepped.groupBy(col("key"))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(col("dev")).as("d_num"),
        min(when(col("dev") === col("dev_max"), col("c")))
          .as("at_cents"))
      .withColumn("d", when(col("n_a") > 0 && col("n_b") > 0,
        col("d_num").cast("double") /
          (col("n_a") * col("n_b")).cast("double")))
      .select(col("key"), col("n_a"), col("n_b"), col("d_num"),
        col("at_cents"), col("d"))
  }

  /** CUPED variance reduction: per-user pre-period metric x (first
    * `preDays` days from the corpus min day) and post-period metric y,
    * θ = cov(x,y)/var(x) over ALL users in the n-scaled exact form,
    * then per-variant ADJUSTED means computed algebraically —
    * `mean(y_adj | v) = ȳ_v − θ·(x̄_v − x̄)` — so no per-user double
    * ever enters a sum (per-user adjustment then summation would be
    * order-dependent across engines). Output: one row per arm with
    * exact per-arm sufficient stats, the arm means, the adjusted mean,
    * plus the global θ and ρ² (the variance-reduction fraction). */
  def cuped(events: DataFrame, variant: Column, preDays: Int = 31,
      userCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    val anchor = events.agg(min(to_date(col(tsCol))).as("day0"))
    val perUser = events.crossJoin(broadcast(anchor))
      .select(col(userCol).as("user_id"),
        (datediff(to_date(col(tsCol)), col("day0")) < preDays).as("pre"),
        centsOf(valueCol).as("c"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("pre"), col("c")).otherwise(0L)).as("x"),
        sum(when(col("pre"), 0L).otherwise(col("c"))).as("y"))
      .withColumn("v", variant)
    val users = CacheRegistry.tracked(perUser)
    val tot = users.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"))
    val d19 = DecimalType(19, 0)
    val scaled = users.crossJoin(broadcast(tot))
      .withColumn("dx", (col("n") * col("x") - col("sx")).cast(d19))
      .withColumn("dy", (col("n") * col("y") - col("sy")).cast(d19))
    val moments = scaled.agg(
      max(col("n")).as("n"), max(col("sx")).as("sx"),
      max(col("sy")).as("sy"),
      sum(col("dx") * col("dy")).as("sxy"),
      sum(col("dx") * col("dx")).as("sxx"),
      sum(col("dy") * col("dy")).as("syy"))
    val perArm = users.groupBy(col("v"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("x")).as("x_cents"), sum(col("y")).as("y_cents"))
    val theta = col("sxy").cast("double") /
      nullif(col("sxx").cast("double"), lit(0.0))
    val rho2 = (col("sxy").cast("double") * col("sxy").cast("double")) /
      nullif(col("sxx").cast("double") * col("syy").cast("double"),
        lit(0.0))
    val meanXAll = col("sx").cast("double") / col("n").cast("double")
    val meanXArm = col("x_cents").cast("double") /
      col("n_users").cast("double")
    val meanYArm = col("y_cents").cast("double") /
      col("n_users").cast("double")
    perArm.crossJoin(broadcast(moments))
      .select(col("v").as("variant"), col("n_users"),
        col("x_cents"), col("y_cents"),
        meanXArm.as("mean_x"), meanYArm.as("mean_y"),
        round(theta, 6).as("theta"),
        round(rho2, 6).as("rho2"),
        round(meanYArm - theta * (meanXArm - meanXAll), 6)
          .as("mean_y_adj"))
  }

  /** Two-proportion z-test on the BINARY per-user metric "did the
    * user convert" (≥1 `convEvent` event) — the binary companion to
    * [[welchTTest]]'s continuous means, and the test most experiments
    * actually run (conversion moved?). Pooled standard error:
    * `z = (p_a − p_b) / √(p̂(1−p̂)(1/n_a + 1/n_b))`. Every input is an
    * exact integer from one combining aggregate over the user frame;
    * the closing chain is mirrored IEEE ops, 6dp behind the sqrt.
    * Degenerate pools (all or none converted: SE = 0) yield NULL z,
    * replayably. */
  def propZTest(events: DataFrame, variant: Column,
      convEvent: String = "purchase"): DataFrame = {
    val users = events
      .groupBy(col("user_id").as("u"), variant.as("v"))
      .agg(max(when(col("event_type") === convEvent, 1L)
        .otherwise(0L)).as("conv"))
    def arm(a: String, c: Column) =
      coalesce(sum(when(col("v") === a, c)), lit(0L))
    val wide = users.agg(
      arm("a", lit(1L)).as("n_a"), arm("a", col("conv")).as("conv_a"),
      arm("b", lit(1L)).as("n_b"), arm("b", col("conv")).as("conv_b"))
    val pA = col("conv_a").cast("double") / col("n_a").cast("double")
    val pB = col("conv_b").cast("double") / col("n_b").cast("double")
    val pPool = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val se = sqrt(pPool * (lit(1.0) - pPool) *
      (lit(1.0) / col("n_a").cast("double") +
        lit(1.0) / col("n_b").cast("double")))
    wide.select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      when(col("n_a") > 0, pA).as("rate_a"),
      when(col("n_b") > 0, pB).as("rate_b"),
      when(col("n_a") > 0 && col("n_b") > 0 &&
        col("conv_a") + col("conv_b") > 0 &&
        col("conv_a") + col("conv_b") < col("n_a") + col("n_b"),
        round((pA - pB) / se, 6)).as("z"))
  }

  /** Cumulative Poisson(1) probabilities e⁻¹·Σ 1/k! as the EXACT
    * decimal literals both engines parse to identical doubles — the
    * quantile table of the bootstrap weight draw. */
  private val PoissonCdf = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563)

  /** Percentile-bootstrap confidence interval for the between-arm mean
    * difference, per key — the distribution-free companion to
    * [[welchTTest]] (no normality assumption; the honest CI when the
    * per-user metric is skewed, which revenue always is). POISSON
    * bootstrap (Chamandy et al., "Estimating uncertainty for massive
    * data streams", Google 2012): instead of resampling n users with
    * replacement (which needs global coordination), each user draws an
    * independent Poisson(1) replicate weight — the large-n limit of
    * Binomial(n, 1/n) multiplicity — so the whole resample is one
    * embarrassingly-parallel map over the per-user frame. The draw is
    * the suite's md5 hash (`u01 = h/2⁶⁰` through the Poisson(1)
    * quantile table), never an RNG: every engine replays every weight.
    *
    * Exactness discipline: per-user cents are exact ints; each
    * replicate's arm mean is ONE division of exact ints; the diff is
    * one subtraction — correctly-rounded IEEE with identical op order,
    * so the CI endpoints hash UNROUNDED. The CI is order statistics
    * k_lo = ⌈R'·0.025⌉, k_hi = ⌈R'·0.975⌉ over the R' valid replicate
    * diffs, computed in INTEGER arithmetic (`(R'·25+999) div 1000`) so
    * no double percentile enters the rank; a replicate where an arm
    * drew all-zero weights (possible only at toy n) is dropped from
    * R', replayably. `significant` = 0 outside [ci_lo, ci_hi].
    *
    * Scale shape: one partial-combining aggregate to the per-user
    * frame, an R-way generator fan-out (users·R rows, codegen'd —
    * no HOF lambda), one (key, rep)-keyed combine down to R rows per
    * key, and a window over those R rows. Nothing driver-side. */
  def bootstrapCiDiff(events: DataFrame, variant: Column,
      reps: Int = 40, keyCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    val perUser = events
      .groupBy(col(keyCol).as("key"), col("user_id").as("u"),
        variant.as("v"))
      .agg(sum(centsOf(valueCol)).as("y"))
    val u01 = Dedup.seededHash(
      concat(col("u").cast("string"), lit("|"), col("r").cast("string")),
      0).cast("double") / lit(1152921504606846976.0) // h / 2^60
    val w = PoissonCdf.zipWithIndex
      .foldLeft(when(lit(false), lit(0L))) { case (acc, (p, k)) =>
        acc.when(u01 < p, lit(k.toLong))
      }.otherwise(lit(5L))
    val expanded = perUser
      .withColumn("r", explode(sequence(lit(0), lit(reps - 1))))
      .withColumn("w", w)
    def arm(a: String, c: Column) =
      coalesce(sum(when(col("v") === a, c)), lit(0L))
    val repArm = expanded.groupBy(col("key"), col("r"))
      .agg(arm("a", col("w")).as("wa"),
        arm("a", col("w") * col("y")).as("wya"),
        arm("b", col("w")).as("wb"),
        arm("b", col("w") * col("y")).as("wyb"))
    val diffs = repArm.filter(col("wa") > 0 && col("wb") > 0)
      .select(col("key"),
        (col("wya").cast("double") / col("wa").cast("double") -
          col("wyb").cast("double") / col("wb").cast("double"))
          .as("diff"))
    val ranked = diffs
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("key")).orderBy(col("diff"))))
      .withColumn("nr", count(lit(1)).over(
        Window.partitionBy(col("key"))))
    val ci = ranked
      .groupBy(col("key"))
      .agg(max(col("nr")).as("n_reps"),
        min(when(col("rn") ===
          greatest(expr("(nr * 25 + 999) div 1000"), lit(1)),
          col("diff"))).as("ci_lo"),
        min(when(col("rn") === expr("(nr * 975 + 999) div 1000"),
          col("diff"))).as("ci_hi"))
    val obs = perUser.groupBy(col("key"))
      .agg(arm("a", lit(1L)).as("n_a"), arm("a", col("y")).as("ya"),
        arm("b", lit(1L)).as("n_b"), arm("b", col("y")).as("yb"))
      .select(col("key"), col("n_a"), col("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0,
          col("ya").cast("double") / col("n_a").cast("double") -
            col("yb").cast("double") / col("n_b").cast("double"))
          .as("diff_obs"))
    obs.join(ci, Seq("key"), "left")
      .select(col("key"), col("n_a"), col("n_b"), col("diff_obs"),
        col("n_reps"), col("ci_lo"), col("ci_hi"),
        (col("ci_lo") > 0.0 || col("ci_hi") < 0.0).as("significant"))
  }

  /** Abramowitz & Stegun 26.2.17 normal-tail constants — the published
    * polynomial approximation of Φ (|ε| < 7.5·10⁻⁸), shared VERBATIM
    * with the oracle SQL (the `x_fdr_bh` / `x_msprt_seq` CTEs are
    * generated from these values) so both engines evaluate the
    * identical literal chain. exp() is the one op the IEEE standard
    * does not require correctly rounded, so a last-ulp cross-engine
    * wobble is possible — every consumer of the resulting p either
    * rounds at 6dp or ORDERS by an exactly-rounded surrogate
    * (|z| — sqrt and division ARE correctly rounded), never by the
    * exp output. */
  val NormB = 0.2316419
  val NormA1 = 0.319381530
  val NormA2 = -0.356563782
  val NormA3 = 1.781477937
  val NormA4 = -1.821255978
  val NormA5 = 1.330274429
  val InvSqrt2Pi = 0.3989422804014327

  /** Two-sided normal p from a z statistic: p = 2·φ(|z|)·poly(t) — the
    * A&S form expands the upper tail DIRECTLY (no 1−Φ cancellation),
    * Horner order fixed as the cross-engine contract. */
  private def normTwoSidedP(z: Column): Column = {
    val az = abs(z)
    val t = lit(1.0) / (lit(1.0) + lit(NormB) * az)
    val poly = t * (lit(NormA1) + t * (lit(NormA2) +
      t * (lit(NormA3) + t * (lit(NormA4) + t * lit(NormA5)))))
    val phi = exp((az * az) / lit(-2.0)) * lit(InvSqrt2Pi)
    least(lit(1.0), lit(2.0) * phi * poly)
  }

  /** Per-(arm-stats) z and two-sided p for a pre-projected frame with
    * (key, v, c) — the large-sample Welch z the FDR layer consumes. */
  private def armStatsOf(base: DataFrame): DataFrame = {
    val perArm = base.groupBy(col("key"), col("v"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum((col("c").cast(DecimalType(19, 0)) *
          col("c").cast(DecimalType(19, 0))).cast(d38)).as("ss"))
    def arm(a: String, c: String) = max(when(col("v") === a, col(c)))
    perArm.groupBy(col("key")).agg(
      arm("a", "n").as("n_a"), arm("b", "n").as("n_b"),
      arm("a", "s").as("sum_a_cents"), arm("b", "s").as("sum_b_cents"),
      arm("a", "ss").as("ss_a"), arm("b", "ss").as("ss_b"))
  }

  /** Benjamini–Hochberg FDR control across a FAMILY of between-arm
    * tests — the missing closing step of every metrics dashboard: run
    * one test per segment and 5% of "winners" are false positives
    * unless the p-values are jointly adjusted. Hypotheses are the
    * (event_type × day-of-week) segments (dow as `epoch_days mod 7` —
    * dialect-neutral, unlike the engines' disagreeing dayofweek()
    * conventions); per segment a large-sample Welch z on exact
    * per-arm (n, Σc, Σc²), p two-sided via [[normTwoSidedP]].
    *
    * BH (1995): rank defined p ascending (rank i of m), adjusted
    * p_(i) = min_{j≥i}(p_(j)·m/j) capped at 1 — the reverse cumulative
    * min — discovery when adjusted p ≤ q. The RANKING orders by |z|
    * DESC (exactly equivalent: p is strictly decreasing in |z|) because
    * |z| is built from correctly-rounded IEEE ops only, while p passes
    * through exp(); ties break on the segment key. Segments with an
    * arm under 2 observations or zero pooled spread carry NULL p and
    * sit outside the family (m counts defined p only).
    *
    * Scale shape: ONE partial-combining aggregate reduces the fact
    * table to the segments frame; every window after that is
    * #hypotheses-sized (here 35 rows), never fact-sized. */
  def fdrBh(events: DataFrame, variant: Column, q: Double = 0.10,
      valueCol: String = "value"): DataFrame = {
    val dow = pmod(datediff(to_date(col("ts")),
      to_date(lit("1970-01-01"))), lit(7))
    val base = events.select(
      concat(col("event_type"), lit("#"), dow.cast("string")).as("key"),
      variant.as("v"), centsOf(valueCol).as("c"))
    val wide = armStatsOf(base)
    def mean(s: Column, n: Column) = s.cast("double") / n.cast("double")
    def variance(ss: Column, s: Column, n: Column) =
      (ss.cast("double") -
        (s.cast("double") * s.cast("double")) / n.cast("double")) /
        (n - 1).cast("double")
    val mA = mean(col("sum_a_cents"), col("n_a"))
    val mB = mean(col("sum_b_cents"), col("n_b"))
    val seA = variance(col("ss_a"), col("sum_a_cents"), col("n_a")) /
      col("n_a").cast("double")
    val seB = variance(col("ss_b"), col("sum_b_cents"), col("n_b")) /
      col("n_b").cast("double")
    val se2 = seA + seB
    val defined = col("n_a") >= 2 && col("n_b") >= 2 && se2 > 0.0
    val scored = wide.select(col("key"), col("n_a"), col("n_b"),
      when(defined, (mA - mB) / sqrt(se2)).as("z_full"))
      .withColumn("p_full", when(col("z_full").isNotNull,
        normTwoSidedP(col("z_full"))))
    val wRank = Window.orderBy(abs(col("z_full")).desc_nulls_last,
      col("key"))
    val wAll = Window.partitionBy()
    val wCum = Window.orderBy(col("rnk").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("rnk", row_number().over(wRank))
      .withColumn("m", count(col("p_full")).over(wAll))
      .withColumn("adj_raw",
        col("p_full") * col("m").cast("double") / col("rnk").cast("double"))
      .withColumn("p_adj_full", when(col("p_full").isNotNull,
        least(lit(1.0), min(col("adj_raw")).over(wCum))))
      .select(col("key"), col("n_a"), col("n_b"),
        round(col("z_full"), 6).as("z"),
        round(col("p_full"), 6).as("p_raw"),
        when(col("p_full").isNotNull, col("rnk").cast("long"))
          .as("p_rank"),
        col("m").as("m_tests"),
        round(col("p_adj_full"), 6).as("p_adj"),
        (col("p_adj_full") <= lit(q)).as("discovery"))
  }

  /** The mixture prior variance τ² (cents²) of [[msprtSeq]] — a $1
    * effect-size prior, shared with the oracle SQL as a literal. */
  val MsprtTau2 = 10000.0

  /** Always-valid sequential test (mSPRT — Johari, Pekelis & Walsh,
    * "Peeking at A/B tests", KDD 2017): the p-value a dashboard may
    * be PEEKED AT every day without inflating false positives, unlike
    * the fixed-horizon [[welchTTest]]. Per key and day, cumulative
    * exact per-arm (n, Σc, Σc²) via a running window over the per-day
    * aggregate; the normal-mixture likelihood ratio against H₀: θ=0
    * with prior N(0, τ²) on the lift is
    *
    *   Λ = √(V/(V+τ²)) · exp(θ̂²τ² / (2V(V+τ²))),
    *   V = σ̂²·(1/n_a + 1/n_b),  θ̂ = x̄_a − x̄_b,
    *
    * and the always-valid p is the RUNNING MIN of 1/Λ capped at 1 —
    * monotone by construction, so a decision once made never un-makes
    * itself. σ̂² is the pooled variance from the cumulative exact sums.
    * Days before both arms have 2 observations (or with zero pooled
    * spread) contribute no Λ; the p holds at its running level (1.0
    * before any is defined).
    *
    * Scale shape: one partial-combining aggregate to the (key × day)
    * frame, then key-partitioned running windows over days — every
    * post-aggregate stage is calendar-sized. The closing chain is the
    * suite's mirrored-IEEE discipline; exp() wobble is absorbed by the
    * 6dp round (the running min never feeds an ordering). */
  def msprtSeq(events: DataFrame, variant: Column,
      tau2: Double = MsprtTau2, keyCol: String = "event_type",
      valueCol: String = "value"): DataFrame =
    msprtFromPerDayArm(perDayArmStats(events, variant, keyCol,
      valueCol), tau2)

  /** The per-(key, day, arm) exact sufficient statistics `(n, Σc,
    * Σc²)` — [[msprtSeq]]'s one fact-table pass, exposed separately
    * because the sums are MERGEABLE: the streaming maintenance sink
    * appends one such frame per micro-batch and the read-time re-sum
    * equals this one-shot aggregate exactly. */
  private[graft] def perDayArmStats(events: DataFrame, variant: Column,
      keyCol: String = "event_type", valueCol: String = "value")
      : DataFrame =
    events.select(col(keyCol).as("key"),
      to_date(col("ts")).as("day"), variant.as("v"),
      centsOf(valueCol).as("c"))
      .groupBy(col("key"), col("day"), col("v"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum((col("c").cast(DecimalType(19, 0)) *
          col("c").cast(DecimalType(19, 0))).cast(d38)).as("ss"))

  /** The mSPRT closing chain over a `(key, day, v, n, s, ss)` frame —
    * shared by the in-query path and the store-served streaming
    * monitor (identical inputs ⇒ identical bits ⇒ one oracle). */
  private[graft] def msprtFromPerDayArm(perDayArm: DataFrame,
      tau2: Double = MsprtTau2): DataFrame = {
    def arm(a: String, c: String, zero: Column) =
      coalesce(max(when(col("v") === a, col(c))), zero)
    val zeroD = lit(0).cast(d38)
    val wide = perDayArm.groupBy(col("key"), col("day")).agg(
      arm("a", "n", lit(0L)).as("dn_a"), arm("b", "n", lit(0L)).as("dn_b"),
      arm("a", "s", lit(0L)).as("ds_a"), arm("b", "s", lit(0L)).as("ds_b"),
      arm("a", "ss", zeroD).as("dss_a"), arm("b", "ss", zeroD).as("dss_b"))
    val wc = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = wide.select(col("key"), col("day"),
      sum(col("dn_a")).over(wc).as("n_a"),
      sum(col("dn_b")).over(wc).as("n_b"),
      sum(col("ds_a")).over(wc).as("s_a"),
      sum(col("ds_b")).over(wc).as("s_b"),
      sum(col("dss_a")).over(wc).as("ss_a"),
      sum(col("dss_b")).over(wc).as("ss_b"))
    val theta = col("s_a").cast("double") / col("n_a").cast("double") -
      col("s_b").cast("double") / col("n_b").cast("double")
    val sig2 = ((col("ss_a").cast("double") -
      (col("s_a").cast("double") * col("s_a").cast("double")) /
        col("n_a").cast("double")) +
      (col("ss_b").cast("double") -
        (col("s_b").cast("double") * col("s_b").cast("double")) /
          col("n_b").cast("double"))) /
      (col("n_a") + col("n_b") - 2).cast("double")
    val vv = sig2 * (lit(1.0) / col("n_a").cast("double") +
      lit(1.0) / col("n_b").cast("double"))
    val lam = sqrt(vv / (vv + lit(tau2))) *
      exp((theta * theta * lit(tau2)) /
        ((lit(2.0) * vv) * (vv + lit(tau2))))
    val defined = col("n_a") >= 2 && col("n_b") >= 2 && sig2 > 0.0
    val pInst = when(defined, least(lit(1.0), lit(1.0) / lam))
    val wMin = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum.withColumn("p_inst_full", pInst)
      .withColumn("p_always_full",
        coalesce(min(col("p_inst_full")).over(wMin), lit(1.0)))
      .select(col("key"), col("day"), col("n_a"), col("n_b"),
        when(defined, round(theta, 6)).as("theta"),
        round(col("p_inst_full"), 6).as("p_inst"),
        round(col("p_always_full"), 6).as("p_always"),
        (col("p_always_full") <= lit(0.05)).as("reject_05"))
  }
}
