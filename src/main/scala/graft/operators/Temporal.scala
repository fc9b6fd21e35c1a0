package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Temporal operators over event streams: session windows and as-of
  * joins. Both are expressed so the SAME code runs batch and (for
  * sessionize) Structured Streaming — `session_window` is Spark's native
  * streaming session operator, and the as-of join is the union+carry-
  * forward window pattern that scales as one shuffle per side instead of
  * a range join.
  */
object Temporal {

  /** Sessionization: group events into per-user sessions separated by
    * `gap` of inactivity. Uses Spark's native `session_window` — the same
    * expression works under `readStream` with a watermark, where state
    * eviction is automatic past the watermark. Session end is
    * last-event + gap (Spark's convention). Aggregates use decimal sums
    * (order-independent) with double final projection. */
  def sessionize(events: DataFrame, gap: String = "4 hours",
      userCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame =
    events
      .groupBy(col(userCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast(DecimalType(18, 2))).cast("double")
          .as("total_value"))
      .select(col(userCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"),
        col("total_value"))

  /** Sliding-window totals: native `window(ts, size, slide)` — each
    * event lands in size/slide overlapping windows (epoch-aligned), so
    * a 1h window sliding by 15m yields the rolling-hour view refreshed
    * four times an hour. The same expression streams under a watermark.
    * Decimal sums (order-independent) with double final projection. */
  def slidingCounts(events: DataFrame, size: String = "1 hour",
      slide: String = "15 minutes", tsCol: String = "ts",
      typeCol: String = "event_type", valueCol: String = "value")
      : DataFrame =
    events
      .groupBy(window(col(tsCol), size, slide), col(typeCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast(DecimalType(18, 2))).cast("double")
          .as("total_value"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col(typeCol), col("n_events"),
        col("total_value"))

  /** Backward as-of join: for each left row, the most recent right row
    * with `right.ts <= left.ts` on the same key (ties at equal ts
    * include the right row; among equal-ts right rows the highest
    * `rightIdCol` wins, making the result deterministic).
    *
    * NOT a range join (which Spark plans as a broadcast-nested-loop or
    * a cartesian at scale): both sides are tagged and unioned, then one
    * window pass per key carries the latest right-row id forward — one
    * shuffle on the key, linear scan per partition, skew-bounded by the
    * hottest key like any per-key window. The carried id then equi-joins
    * back for the payload columns. */
  def asofJoinBackward(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, leftIdCol: String,
      rightIdCol: String): DataFrame = {
    val l = left.select(col(keyCol), col(tsCol), lit(1).as("is_l"),
      col(leftIdCol).as("l_id"), lit(null).cast("long").as("r_id"))
    val r = right.select(col(keyCol), col(tsCol), lit(0).as("is_l"),
      lit(null).cast("long").as("l_id"), col(rightIdCol).as("r_id"))
    // right rows sort before left rows at the same ts (is_l 0 < 1), so
    // an equal-ts right row is visible to the left row; r_id last so the
    // max id among equal-ts right rows is the one carried
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("is_l"), col("r_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("asof_id", last(col("r_id"), ignoreNulls = true).over(w))
      .filter(col("is_l") === 1)
      .select(col("l_id"), col(keyCol), col(tsCol), col("asof_id"))
  }

  /** PURE range join (no equi key) via bin bucketing: points join the
    * intervals containing them by first meeting on a synthetic
    * `floor(epoch / binSeconds)` bucket key — each point lands in
    * exactly ONE bucket and each interval explodes into every bucket
    * it overlaps, so every qualifying (point, interval) pair meets in
    * exactly one bucket (no post-join dedup) and the exact containment
    * predicate trims the bucket's false positives.
    *
    * This is the range-join answer Catalyst doesn't pick on its own: a
    * bare `ts BETWEEN start AND end` join plans as a
    * BroadcastNestedLoopJoin (all-pairs per partition — the 100 TB
    * killer); bucketing turns it into an ordinary shuffled equi-join
    * whose fan-out is bounded by interval-length / binSeconds. Pick
    * `binSeconds` near the typical interval length: shorter bins mean
    * more replicas per interval, longer bins mean more false-positive
    * pairs per bucket. The ExtSpec pin asserts the plan carries a real
    * equi-join and no nested loop. */
  def binnedRangeJoin(points: DataFrame, intervals: DataFrame,
      binSeconds: Long, tsCol: String = "ts",
      startCol: String = "wstart", endCol: String = "wend")
      : DataFrame = {
    // bin arithmetic runs in MICROSECONDS (timestamp precision): a
    // seconds-truncating cast would compute the exclusive end's last
    // covered bin one too low for sub-second ends (end 20.5 s, bin
    // 10 s: truncation says last bin 1, but a 20.3 s point bins to 2 —
    // the pair would never meet)
    val binMicros = binSeconds * 1000000L
    val p = points.withColumn("bin",
      floor(unix_micros(col(tsCol)) / binMicros))
    val i = intervals.withColumn("bin", explode(sequence(
      floor(unix_micros(col(startCol)) / binMicros),
      // end is exclusive: the last covered instant is end - 1 µs
      floor((unix_micros(col(endCol)) - 1) / binMicros))))
    p.join(i, Seq("bin"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("bin")
  }

  /** Interval join (the Flink pattern): every (left, right) pair on the
    * same key with `right.ts` in `[left.ts − lookback, left.ts]` — e.g.
    * all purchases within the hour before each click, where the as-of
    * join keeps only the latest. Built as a key equi-join with the time
    * band as a post-filter: Spark plans the JOIN on the key (shuffle
    * hash / sort-merge — never a nested loop; asserted in PlanSpec), and
    * the band prunes pairs per key group. Per-key pair volume is bounded
    * by activity within the lookback, not total history.
    *
    * The SAME expression runs under Structured Streaming: with
    * watermarks on both sides and the band condition in the join, Spark
    * bounds each side's state to the lookback window
    * (StreamingSyncSpec proves batch ≡ stream on the fixture). */
  def intervalJoin(left: DataFrame, right: DataFrame, lookback: String,
      keyCol: String, tsCol: String, leftIdCol: String,
      rightIdCol: String): DataFrame = {
    val l = left.select(col(keyCol), col(leftIdCol).as("l_id"),
      col(tsCol).as("l_ts"))
    val r = right.select(col(keyCol), col(rightIdCol).as("r_id"),
      col(tsCol).as("r_ts"))
    l.join(r, Seq(keyCol))
      .filter(col("r_ts") <= col("l_ts") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $lookback"))
      .select(col(keyCol), col("l_id"), col("l_ts"), col("r_id"),
        col("r_ts"))
  }

  /** Sequence-pattern detection (CEP, the FlinkCEP "followed-by …
    * within" primitive): one MATCH row per occurrence of the final
    * step whose chain completes — each step binds to its MOST RECENT
    * preceding-step occurrence ("skip-till-next-match" chaining), other
    * events may intervene, and the whole chain must span ≤
    * `withinSeconds` from its step-1 anchor. [[funnel]] answers "how
    * many users ever got this far"; this answers "WHICH events
    * completed the sequence, anchored where" — the alert/trigger form.
    *
    * Shape: ONE user-keyed exchange. Chains thread through running
    * window maxima of a packed bigint `rn·10⁶ + rn₀` (this step's
    * per-user row number carrying its chain-anchor's row number — max
    * picks the latest step occurrence because rn dominates the
    * packing; headroom: 10⁶ events per user per the pack base —
    * GUARDED at runtime, a busier user raises instead of wrapping —
    * and rn·10⁶ ≤ 10¹² in int64), so no self-join per step — the one join
    * is the final anchor-attribute fetch on (user, rn₀). Exact
    * integers throughout; duration closes as a `unix_micros`
    * difference. Same-timestamp events order by the seq column — a
    * total order, so matches are engine-exact. */
  def cepPattern(events: DataFrame, steps: Seq[String],
      withinSeconds: Long, userCol: String = "user_id",
      tsCol: String = "ts", seqCol: String = "event_id",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.size >= 2, s"a pattern needs ≥ 2 steps: $steps")
    // repeated step types would make the batch window chain and the
    // streaming slot map disagree — rejected identically in both forms
    require(steps.distinct.size == steps.size,
      s"pattern steps must be distinct: $steps")
    val byUser = Window.partitionBy(col("u"))
      .orderBy(col("t"), col("q"))
    val before = byUser.rowsBetween(Window.unboundedPreceding, -1)
    val P = lit(1000000L)
    val base = events.select(col(userCol).as("u"), col(tsCol).as("t"),
      col(seqCol).as("q"), col(typeCol).as("typ"))
      .withColumn("rn", row_number().over(byUser))
      // pack-base overflow guard: a user beyond 10⁶ events would wrap
      // pmod and silently bind a WRONG chain anchor — fail the query
      // loudly instead (one codegen'd comparison per row; rn is the
      // per-user row number, so any overflow trips it). The fix for a
      // tripped guard is widening the pack base (rn·P ≤ 10¹² leaves
      // 10⁶ headroom inside int64 before P must grow).
      .withColumn("rn", when(col("rn") < P, col("rn"))
        .otherwise(raise_error(concat(
          lit("cepPattern: user "), col("u").cast("string"),
          lit(" exceeds 1000000 events — the packed-bigint base; " +
            "widen P before trusting matches")))))
    var df = base.withColumn("v0",
      when(col("typ") === steps.head, col("rn") * P + col("rn")))
    for (k <- 1 until steps.size) {
      df = df
        .withColumn(s"p$k", max(col(s"v${k - 1}")).over(before))
        .withColumn(s"v$k",
          when(col("typ") === steps(k) && col(s"p$k").isNotNull,
            col("rn") * P + pmod(col(s"p$k"), P)))
    }
    val last = s"v${steps.size - 1}"
    val matches = df.filter(col(last).isNotNull)
      .select(col("u"), col("t").as("end_ts"), col("q").as("end_id"),
        pmod(col(last), P).as("rn0"))
    val starts = base.select(col("u"), col("rn").as("rn0"),
      col("t").as("start_ts"), col("q").as("start_id"))
    matches.join(starts, Seq("u", "rn0"))
      .withColumn("dur_us",
        unix_micros(col("end_ts")) - unix_micros(col("start_ts")))
      .filter(col("dur_us") <= withinSeconds * 1000000L)
      .select(col("u").as(userCol), col("start_id"), col("start_ts"),
        col("end_id"), col("end_ts"), col("dur_us"))
  }

  /** Ordered k-step funnel (the ClickHouse `windowFunnel` shape): per
    * user, t₁ = earliest `steps(0)` event, and each tₖ₊₁ = earliest
    * `steps(k)` event STRICTLY after tₖ and within `window` of t₁;
    * `depth` = deepest step reached. Every user who opened the funnel
    * gets a row (later steps null once the chain breaks).
    *
    * Shape: NO per-user sort and no window function — step k is one
    * selective type-filter over events (at scale, a partition-pruned
    * scan of that event type) joined to the step-(k−1) survivors and
    * reduced with `min`, so the whole funnel is k keyed
    * aggregations, each map-side combining on `user_id`. Per-step
    * state is one row per surviving user; survivors shrink
    * monotonically, so later passes join against ever-smaller (often
    * broadcast-able) frames. All aggregates are `min` — deterministic
    * under any partitioning. */
  def funnel(events: DataFrame, steps: Seq[String],
      window: String = "7 days", userCol: String = "user_id",
      tsCol: String = "ts", typeCol: String = "event_type")
      : DataFrame = {
    require(steps.size >= 2, s"funnel needs >= 2 steps, got $steps")
    val s1 = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    // stage k carries (user, t1..tk) for users who reached step k
    val stages = steps.zipWithIndex.drop(1)
      .scanLeft(s1) { case (prev, (step, i)) =>
        val carried = (1 to i).map(j => first(col(s"t$j")).as(s"t$j"))
        val aggs = carried :+ min(col(tsCol)).as(s"t${i + 1}")
        events.filter(col(typeCol) === step)
          .join(prev, Seq(userCol))
          .filter(col(tsCol) > col(s"t$i") &&
            col(tsCol) <= col("t1") + expr(s"INTERVAL $window"))
          .groupBy(col(userCol))
          .agg(aggs.head, aggs.tail: _*)
      }
    val joined = stages.zipWithIndex.tail
      .foldLeft(stages.head) { case (acc, (st, i)) =>
        acc.join(st.select(col(userCol), col(s"t${i + 1}")),
          Seq(userCol), "left")
      }
    // ascending fold so the DEEPEST step's check ends up outermost
    val depth = (2 to steps.size).foldLeft(lit(1)) { (els, k) =>
      when(col(s"t$k").isNotNull, lit(k)).otherwise(els)
    }
    joined.withColumn("depth", depth)
  }

  /** Daily retention cohorts: cohort = the date of each user's first
    * `cohortType` event; a user is retained at offset d if they were
    * active (any event) d days after their cohort date. Output is the
    * (cohort_date, day_offset) → distinct-user matrix product
    * analytics reads as a retention triangle.
    *
    * Shape: one `min` aggregate keyed on user (the cohort), one
    * distinct over (user, date) — map-side combining collapses each
    * user's intra-day events before the shuffle — then a keyed join
    * and a count-distinct re-keyed on the (cohort, offset) cell. No
    * windows, no sorts; every stage shuffles at most one row per
    * (user, active-day). */
  def retentionCohorts(events: DataFrame, cohortType: String = "signup",
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    val cohort = events.filter(col(typeCol) === cohortType)
      .groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("cohort_date"))
    val active = events
      .select(col(userCol), to_date(col(tsCol)).as("d")).distinct()
    active.join(cohort, Seq(userCol))
      .filter(col("d") >= col("cohort_date"))
      .groupBy(col("cohort_date"),
        datediff(col("d"), col("cohort_date")).as("day_offset"))
      .agg(countDistinct(col(userCol)).as("n_active"))
  }

  /** Top-k frequent session paths — clickstream path mining: each
    * user's events fold into gap-separated sessions, each session
    * renders as its ordered `a>b>c` event-type path, and the k most
    * frequent paths come back with their counts (count desc, path asc
    * tiebreak — fully deterministic).
    *
    * Shape: the session assignment is the lag/cumsum island pass (one
    * user-keyed shuffle + sort), the path build aggregates each
    * session's events into an array SORTED INSIDE the aggregate
    * (`array_sort` over (ts, event_id) structs — `collect_list` alone
    * has no ordering guarantee across partitions), and the path count
    * is a keys-sized aggregate. The top-k is a single
    * WindowGroupLimit-able rank, never a global sort of all paths. */
  def sessionPaths(events: DataFrame, gap: String = "4 hours", k: Int = 20,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    val paths = sessionPathRows(events, gap, userCol, tsCol, typeCol,
      idCol)
    val ranked = paths.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .withColumn("rk", row_number().over(Window.orderBy(
        col("n_sessions").desc, col("path"))))
      .filter(col("rk") <= k)
    ranked.select(col("path"), col("n_sessions"), col("rk"))
  }

  /** One row per (user, session) with the ordered `a>b>c` path — the
    * shared base of [[sessionPaths]] and [[pathConversion]]. */
  def sessionPathRows(events: DataFrame, gap: String,
      userCol: String, tsCol: String, typeCol: String,
      idCol: String): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol),
      col(idCol))
    val islanded = events
      .withColumn("new_s",
        when(lag(col(tsCol), 1).over(byUser).isNull ||
          col(tsCol) - lag(col(tsCol), 1).over(byUser) >=
            expr(s"INTERVAL $gap"), 1L).otherwise(0L))
      .withColumn("sess", sum(col("new_s")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    islanded
      .groupBy(col(userCol), col("sess"))
      .agg(concat_ws(">", transform(
        array_sort(collect_list(struct(col(tsCol).as("t"),
          col(idCol).as("e"), col(typeCol).as("y")))),
        s => s.getField("y"))).as("path"))
  }

  /** Per-user session conversion — the MATCH_RECOGNIZE-lite pattern
    * query over the path strings: a session CONVERTS when `fromType`
    * occurs and `toType` occurs after it in the same session
    * (position arithmetic on the rendered path — dialect-neutral, no
    * regex). Output: sessions, converting sessions, and the exact
    * IEEE ratio (small-int division — bit-identical across engines,
    * no rounding step to diverge on). */
  def pathConversion(events: DataFrame, gap: String = "4 hours",
      fromType: String = "view", toType: String = "purchase",
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    val paths = sessionPathRows(events, gap, userCol, tsCol, typeCol,
      idCol)
    val from = instr(col("path"), fromType)
    val to = instr(col("path"), toType)
    paths
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(from > 0 && to > from, 1L).otherwise(0L))
          .as("n_converting"))
      .withColumn("conv_rate",
        col("n_converting").cast("double") / col("n_sessions"))
  }

  /** Seasonal-naive forecast backtest — the baseline every real
    * forecasting pipeline must beat: tomorrow's prediction for a key
    * is the value one season (7 days) earlier. Expressed as a
    * calendar-shift equi self-join of the per-key daily aggregate
    * (join on (key, day−7); a LAG over rows would silently mis-shift
    * across gap days), LEFT so the warm-up week keeps NULL forecasts.
    * Per-row absolute error rides the output; the keys-sized daily
    * frame makes every stage cheap regardless of fact volume. */
  def seasonalNaiveBacktest(events: DataFrame, seasonDays: Int = 7,
      userCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    val daily = events
      .groupBy(col(userCol), to_date(col(tsCol)).as("day"))
      .agg(sum(col(valueCol).cast(DecimalType(18, 2))).cast("double")
        .as("actual"))
    val shifted = daily.select(col(userCol),
      date_add(col("day"), seasonDays).as("day"),
      col("actual").as("forecast"))
    daily.join(shifted, Seq(userCol, "day"), "left")
      .select(col(userCol), col("day"), col("actual"), col("forecast"),
        when(col("forecast").isNotNull,
          abs(col("actual") - col("forecast"))).as("abs_err"))
  }

  /** Split-conformal prediction intervals for the seasonal-naive
    * forecast (Vovk's conformal framework in its simplest split form;
    * see also Lei et al., "Distribution-free predictive inference for
    * regression", JASA 2018): a FINITE-SAMPLE coverage guarantee
    * (P[y ∈ interval] ≥ 1−α over exchangeable residuals) wrapped
    * around the point forecast, with zero distributional assumptions —
    * the honest error bar a monitoring dashboard should draw.
    *
    * Per key the scored days (those with a value one season earlier)
    * split chronologically: the first ⌊3n/4⌋ calibrate, the rest are
    * evaluated. The calibration conformity scores are the exact-cents
    * absolute residuals |y−ŷ|; the interval half-width is the
    * ⌈(n_cal+1)(1−α)⌉-th smallest (α = 0.1 here, index
    * ⌈9(n_cal+1)/10⌉), found by rank — no percentile interpolation,
    * no floating point anywhere: every output column is an exact long
    * or a boolean, so the oracle hashes bit-for-bit. A key too short
    * for the index (n_cal < 9 at α=0.1) yields NULL bounds — the
    * guarantee is unattainable, never faked. Both split fractions are
    * integer arithmetic (×3/4, ×9/10 with ceil via +9 div 10) so the
    * engines cannot disagree on a boundary day.
    *
    * Scale shape: one partial-combining aggregate to the keys×days
    * frame; every window after it is calendar-sized. Cents ride longs
    * (Σ|day| ≪ 2⁶³ here); the documented 100 TB swap is decimal(38,0)
    * on the daily sum — same plan, wider buffers. */
  def conformalSnaive(events: DataFrame, seasonDays: Int = 7,
      keyCol: String = "event_type", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    // the keys×days frame feeds two consumers (the base and its
    // 7-day shift) and the ranked frame two more (calibration rank
    // pick + test rows): cache both so the fact scans ONCE
    val daily = CacheRegistry.tracked(events
      .groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .agg(sum((col(valueCol).cast(DecimalType(18, 2)) * 100)
        .cast("long")).as("actual_cents")))
    val shifted = daily.select(col("key"),
      date_add(col("day"), seasonDays).as("day"),
      col("actual_cents").as("forecast_cents"))
    val scored = daily.join(shifted, Seq("key", "day"), "inner")
      .withColumn("resid",
        abs(col("actual_cents") - col("forecast_cents")))
    val wDay = Window.partitionBy(col("key")).orderBy(col("day"))
    val wKey = Window.partitionBy(col("key"))
    val ranked = CacheRegistry.tracked(scored
      .withColumn("rnk", row_number().over(wDay))
      .withColumn("n", count(lit(1)).over(wKey))
      .withColumn("n_cal",
        floor((col("n") * 3).cast("double") / lit(4.0)).cast("long")))
    val cal = ranked.filter(col("rnk") <= col("n_cal"))
      .withColumn("crnk", row_number().over(
        Window.partitionBy(col("key"))
          .orderBy(col("resid"), col("day"))))
      .withColumn("q_idx",
        floor(((col("n_cal") + 1) * 9 + 9).cast("double") / lit(10.0))
          .cast("long"))
    val qRow = cal.filter(col("crnk") === col("q_idx"))
      .select(col("key"), col("resid").as("q_cents"))
    ranked.filter(col("rnk") > col("n_cal"))
      .join(qRow, Seq("key"), "left")
      .select(col("key"), col("day"), col("actual_cents"),
        col("forecast_cents"), col("n_cal"), col("q_cents"),
        (col("forecast_cents") - col("q_cents")).as("lo_cents"),
        (col("forecast_cents") + col("q_cents")).as("hi_cents"),
        when(col("q_cents").isNotNull,
          col("actual_cents") >= col("forecast_cents") - col("q_cents")
            && col("actual_cents") <=
              col("forecast_cents") + col("q_cents")).as("covered"))
  }

  /** Forecast-model TOURNAMENT: the model-selection read-out on top of
    * the family's baselines — per key, one-step-ahead absolute errors
    * of three forecasters on the SAME scored days (only days where
    * every model has its inputs: the previous day, the 7-days-ago day,
    * and the full trailing week), then the winner by total error.
    *
    *   - naive: ŷ(d) = y(d−1) (persistence);
    *   - snaive: ŷ(d) = y(d−7) (weekly repeat — `x_forecast_snaive`);
    *   - ma7: ŷ(d) = mean of the trailing 7 days.
    *
    * Every error total is an EXACT LONG (ma7's rides ×7 so the mean
    * never enters the sum; its one display division closes 6dp), and
    * the winner compares exact rationals by cross-multiplication —
    * ties break on model name, deterministic like every argmax here.
    * Calendar-shift equi-joins (never row LAGs — gap days shift rows),
    * everything after the daily aggregate is keys×days-sized. */
  def forecastTournament(events: DataFrame,
      keyCol: String = "event_type", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    val daily = CacheRegistry.tracked(events
      .groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .agg(sum((col(valueCol).cast(DecimalType(18, 2)) * 100)
        .cast("long")).as("y")))
    def shiftBy(n: Int, as: String) = daily.select(col("key"),
      date_add(col("day"), n).as("day"), col("y").as(as))
    val wTrail = Window.partitionBy(col("key"))
      .orderBy(datediff(col("day"), to_date(lit("1970-01-01"))))
      .rangeBetween(-7, -1)
    val withMa = daily
      .withColumn("t7", when(count(lit(1)).over(wTrail) === 7,
        sum(col("y")).over(wTrail)))
    val scored = withMa
      .join(shiftBy(1, "f_naive"), Seq("key", "day"), "inner")
      .join(shiftBy(7, "f_snaive"), Seq("key", "day"), "inner")
      .filter(col("t7").isNotNull)
    // ma7's per-day error |y − t7/7| = |7y − t7|/7: the SUM stays an
    // exact long (a double sum across days would be order-dependent
    // across engines), the ÷7 closes once; the winner compares exact
    // rationals by cross-multiplication — never a float anywhere
    val out = scored.groupBy(col("key")).agg(
      count(lit(1)).as("n_days"),
      sum(abs(col("y") - col("f_naive"))).as("ae_naive_cents"),
      sum(abs(col("y") - col("f_snaive"))).as("ae_snaive_cents"),
      sum(abs(col("y") * 7 - col("t7"))).as("ae_ma7_x7"))
    out.select(col("key"), col("n_days"),
      col("ae_naive_cents"), col("ae_snaive_cents"),
      round(col("ae_ma7_x7").cast("double") / lit(7.0), 6)
        .as("ae_ma7_cents"),
      when(col("ae_ma7_x7") < col("ae_naive_cents") * 7 &&
        col("ae_ma7_x7") < col("ae_snaive_cents") * 7, lit("ma7"))
        .when(col("ae_naive_cents") <= col("ae_snaive_cents"),
          lit("naive"))
        .otherwise(lit("snaive")).as("winner"))
  }

  /** Classical additive decomposition (the STL shape, moving-average
    * form): per key and day, `y = trend + seasonal + resid` with
    * trend = the centered 7-day moving average and seasonal = the
    * day-of-week mean of the detrended series (dow as epoch-days mod
    * 7 — dialect-neutral). The anomaly-monitoring rungs (MAD, CUSUM)
    * flag residuals; this produces the residual series they should
    * run on once a weekly cycle exists.
    *
    * Exactness discipline: the trend window is carried as the exact
    * 7-day LONG sum `t7` (never an averaged double), so the seasonal
    * numerator Σ(y − t7/7) = (7·Σy − Σt7)/7 is INTEGER arithmetic up
    * to one closing division — a running double sum over window rows
    * would be order-dependent across engines. Edge days (incomplete
    * ±3 window) carry NULL trend and are excluded from the seasonal
    * means, exactly as mirrored. One keys-sized daily aggregate, one
    * key-partitioned window, one dow-sized aggregate join. */
  def stlDecompose(events: DataFrame, keyCol: String = "event_type",
      tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    val daily = events
      .groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .agg(sum((col(valueCol).cast(DecimalType(18, 2)) * 100)
        .cast("long")).as("y"))
      .withColumn("dow", pmod(datediff(col("day"),
        to_date(lit("1970-01-01"))), lit(7)))
    // exact 7-day centered sum — NULL unless all 7 calendar days exist
    // (rangeBetween on epoch days: a row-window would mis-center
    // across gap days)
    val w = Window.partitionBy(col("key"))
      .orderBy(datediff(col("day"), to_date(lit("1970-01-01"))))
      .rangeBetween(-3, 3)
    // the windowed frame feeds both the seasonal means and the final
    // projection: cache it so the fact scans once
    val witht = CacheRegistry.tracked(daily
      .withColumn("t7", when(count(lit(1)).over(w) === 7,
        sum(col("y")).over(w))))
    val seas = witht.filter(col("t7").isNotNull)
      .groupBy(col("key"), col("dow"))
      .agg(((lit(7L) * sum(col("y")) - sum(col("t7"))).cast("double") /
        (lit(7L) * count(lit(1))).cast("double")).as("seasonal"))
    witht.join(seas, Seq("key", "dow"), "left")
      .select(col("key"), col("day"), col("y").as("y_cents"),
        (col("t7").cast("double") / lit(7.0)).as("trend"),
        when(col("t7").isNotNull, col("seasonal")).as("seasonal"),
        when(col("t7").isNotNull,
          col("y").cast("double") - col("t7").cast("double") / lit(7.0)
            - col("seasonal")).as("resid"))
  }

  /** Per-key cumulative daily totals — the running-balance view every
    * ledger needs: one keys-sized daily aggregate, then a running
    * window sum OVER DECIMALS (each prefix is an exact decimal sum,
    * so the running value is order-independent bit-for-bit; a double
    * running sum would drift). The window shares the aggregate's
    * user_id partitioning. */
  def runningTotals(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    val daily = events
      .groupBy(col(userCol), to_date(col(tsCol)).as("day"))
      .agg(sum(col(valueCol).cast(DecimalType(18, 2))).as("dtot"))
    val run = Window.partitionBy(col(userCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.select(col(userCol), col("day"),
      col("dtot").cast("double").as("day_total"),
      sum(col("dtot")).over(run).cast("double").as("running_total"))
  }

  /** Time-weighted average value per key (TWAP): each observation's
    * value holds until the next one, weighted by that holding
    * duration. Exact arithmetic end-to-end: durations are integer
    * MICROSECONDS, value×duration products are exact decimals, and
    * the one floating step — weighted-sum / total-duration — is the
    * identical IEEE division on both engines. The last observation
    * has no holding interval and is excluded (standard TWAP over a
    * closed window). One user-keyed shuffle: the lead() and the
    * aggregate share the partitioning. */
  def timeWeightedAvg(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", valueCol: String = "value",
      idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol),
      col(idCol))
    events
      .withColumn("dur_us",
        unix_micros(lead(col(tsCol), 1).over(w)) -
          unix_micros(col(tsCol)))
      .filter(col("dur_us").isNotNull)
      .groupBy(col(userCol))
      .agg(sum(col("dur_us")).as("total_dur_us"),
        // the weighted sum exceeds double's 53-bit exact range, and a
        // >2^53 decimal→double conversion is single-rounded in Spark
        // but divide-after-convert (double-rounded) in value engines —
        // round the final quotient to 6dp, where both agree (no .5
        // tie can survive the division)
        round(sum((col(valueCol).cast(DecimalType(18, 2)) *
            col("dur_us")).cast(DecimalType(38, 2))).cast("double") /
          sum(col("dur_us")).cast("double"), 6).as("twap"))
  }

  /** Point-in-time (PIT) join: each fact row picks up the dimension
    * attribute in effect AT ITS TIMESTAMP from an SCD2 history —
    * half-open intervals `[valid_from, valid_to)`, NULL `valid_to` =
    * still open, LEFT join so facts before the key's first recorded
    * state keep a NULL attribute. The SCD2 intervals partition each
    * key's timeline, so every fact matches at most once — the
    * invariant that makes PIT lookups safe to fan into aggregates
    * (no row duplication).
    *
    * Shape: an EQUI-join on the key with the interval predicate as a
    * residual filter — shuffle both sides on the key, never a
    * nested-loop range join; per-key dimension history is small (one
    * row per change), so the residual scan per fact row is short.
    * `factCols` names the fact columns to carry (the fact's own
    * timestamp column included as needed). */
  def pitJoin(facts: DataFrame, dim: DataFrame, keyCol: String,
      factTsCol: String, factCols: Seq[String], dimAttrCol: String,
      asOfName: String): DataFrame = {
    val d = dim.select(col(keyCol).as("__k"),
      col(dimAttrCol).as(asOfName),
      col("valid_from"), col("valid_to"))
    facts.select(factCols.map(col): _*)
      .join(d,
        col(keyCol) === col("__k") &&
          col(factTsCol) >= col("valid_from") &&
          (col("valid_to").isNull ||
            col(factTsCol) < col("valid_to")),
        "left")
      .select(factCols.map(col) :+ col(asOfName): _*)
  }

  /** First-order Markov transition matrix over each user's event
    * stream: `P(next | current)` from adjacent-event pairs, plus a
    * per-state rank of successors — the next-event-prediction /
    * behavioral-model summary every clickstream warehouse derives.
    * One user-keyed shuffle for the lead() (state bounded per user,
    * the same shape sessionize pays), then states-sized aggregates.
    * The probability is a small-int IEEE division — bit-identical
    * across engines, no rounding step to diverge on. */
  def transitionMatrix(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", typeCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol),
      col(idCol))
    val pairs = events
      .select(col(userCol), col(tsCol), col(idCol),
        col(typeCol).as("cur"))
      .withColumn("nxt", lead(col("cur"), 1).over(byUser))
      .filter(col("nxt").isNotNull)
      .groupBy(col("cur"), col("nxt"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("cur"))
      .agg(sum(col("n")).as("total"))
    pairs.join(totals, Seq("cur"))
      .withColumn("p", col("n").cast("double") / col("total"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("cur"))
        .orderBy(col("n").desc, col("nxt"))))
      .select(col("cur"), col("nxt"), col("n"), col("p"), col("rk"))
  }

  /** CUSUM changepoint detection over per-key daily totals: the day
    * where the cumulative deviation from the key's mean peaks — the
    * classic level-shift locator (a MAD flag says "this day is odd";
    * the CUSUM argmax says "the regime changed HERE"). Division-free
    * exact form: instead of `Σ(xᵢ − x̄)` (whose mean is a quotient
    * with engine-specific decimal scale rules), the statistic is
    * scaled by n — `|n·prefixₜ − t·total|` — which has the same
    * argmax and stays an exact integer×decimal product, replayable
    * bit-for-bit. One keys-sized daily aggregate, then windows over
    * the keys-sized frame; ties on the peak break to the earliest
    * day. */
  def cusumChangepoint(events: DataFrame, keyCol: String = "event_type",
      tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(sum(col(valueCol).cast(DecimalType(18, 2))).as("dtot"))
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col("day"))
    val whole = Window.partitionBy(col(keyCol))
    val s = daily
      .withColumn("prefix", sum(col("dtot")).over(byKey.rowsBetween(
        Window.unboundedPreceding, Window.currentRow)))
      .withColumn("t", row_number().over(byKey))
      .withColumn("total", sum(col("dtot")).over(whole))
      .withColumn("n_days", count(lit(1)).over(whole))
      .withColumn("sabs",
        abs(col("n_days") * col("prefix") - col("t") * col("total")))
    s.withColumn("rk", row_number().over(Window.partitionBy(col(keyCol))
        .orderBy(col("sabs").desc, col("day"))))
      .filter(col("rk") === 1)
      .select(col(keyCol), col("day").as("cp_day"), col("n_days"),
        col("sabs").cast("double").as("cusum_scaled"))
  }

  /** Per-key least-squares trend over daily totals — the third leg of
    * the monitoring trio: MAD flags "this day is odd", CUSUM locates
    * "the regime changed here", and the OLS slope answers "which way
    * is this key heading, and how fast". Exact end-to-end until the
    * single closing division: x is the day offset from the key's
    * first day (small ints), y is the daily total in integer CENTS,
    * so all five sufficient statistics (n, Σx, Σy, Σxy, Σx²) are
    * exact BIGINT sums — shuffle order cannot move a bit — and
    * `slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)` is one IEEE division
    * of two exactly-converted longs, bit-identical across engines.
    * A single-day key has zero x-variance → NULL slope via nullif
    * (ANSI-safe; never a divide-by-zero abort). The daily frame is
    * keys-sized, so the min-day window costs nothing regardless of
    * fact volume. */
  def trendOls(events: DataFrame, keyCol: String = "event_type",
      tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(sum((col(valueCol).cast(DecimalType(18, 2)) * 100)
        .cast("long")).as("cents"))
    val xy = daily
      .withColumn("x", datediff(col("day"),
        min(col("day")).over(Window.partitionBy(col(keyCol))))
        .cast("long"))
      .withColumn("y", col("cents"))
    xy.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col(keyCol), col("n_days"),
        ((col("n_days") * col("sxy") - col("sx") * col("sy"))
          .cast("double") /
          nullif((col("n_days") * col("sxx") - col("sx") * col("sx"))
            .cast("double"), lit(0.0))).as("slope_cents_per_day"))
  }

  /** Theil–Sen robust trend per key: the MEDIAN of all pairwise
    * day-to-day slopes over the daily cent totals (Theil 1950; Sen
    * 1968) — breakdown point 29.3%, so a burst of corrupted days
    * cannot drag the estimate the way it drags [[trendOls]]'s
    * least-squares line (the robust companion, exactly as the MAD
    * anomaly screen is the robust companion to z-scores). Each pair
    * slope is the exact integer `(10⁶·Δcents) div Δdays` (ppm, and
    * `div` truncates toward zero in BOTH engines — probed, not
    * assumed); the median is the `(P+1) div 2`-th order statistic
    * (lower median — a total, engine-replayable choice). Keys with a
    * single day emit a NULL median, replayably.
    *
    * Scale shape: pairs are DAYS², not rows — the fact table reduces
    * to the per-(key, day) frame in one combining aggregate, and the
    * pair join is day-frame-sized (a decade of daily grain is ~6.7M
    * pairs per key, still nothing next to the fact scan). */
  def theilSenTrend(events: DataFrame, keyCol: String = "event_type",
      tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    val daily = CacheRegistry.tracked(events
      .groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .agg(sum((col(valueCol).cast(DecimalType(18, 2)) * 100)
        .cast("long")).as("cents"))
      .withColumn("x", datediff(col("day"),
        min(col("day")).over(Window.partitionBy(col("key"))))
        .cast("long")))
    val slopes = daily.select(col("key"), col("x").as("xi"),
        col("cents").as("yi"))
      .join(daily.select(col("key"), col("x").as("xj"),
        col("cents").as("yj")), Seq("key"))
      .filter(col("xi") < col("xj"))
      .select(col("key"),
        expr("(1000000 * (yj - yi)) div (xj - xi)").as("slope_ppm"))
    val med = slopes
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("key")).orderBy(col("slope_ppm"))))
      .withColumn("np", count(lit(1)).over(
        Window.partitionBy(col("key"))))
      .groupBy(col("key"))
      .agg(max(col("np")).as("n_pairs"),
        min(when(col("rn") === expr("(np + 1) div 2"),
          col("slope_ppm"))).as("slope_ppm_median"))
    daily.groupBy(col("key")).agg(count(lit(1)).as("n_days"))
      .join(med, Seq("key"), "left")
      .select(col("key"), col("n_days"), col("n_pairs"),
        col("slope_ppm_median"))
  }

  /** Day-of-week seasonality profile (STL-lite): per key, daily cent
    * totals on the DENSE date spine (missing days = 0 — absence IS the
    * signal a seasonality profile must see), detrended by a centered
    * 7-day moving window and averaged per weekday. Exactness trick: the
    * detrended value is kept as the EXACT long `7·cents − Σ₇` (scaling
    * by 7 instead of dividing by it), so no double ever enters a sum —
    * the per-weekday mean closes with two mirrored IEEE divisions
    * (÷n, ÷7) and a 6dp round. Trend is defined only where the full
    * 7-day window fits inside the spine (edge days drop out, the
    * standard moving-average contract). Output per (key, dow): the day
    * count and the seasonal component in cents. Shape: one key-day
    * aggregate, one spine join, one key-ordered window, one keys×7
    * aggregate — two shuffles end to end. */
  def seasonalDow(events: DataFrame, keyCol: String = "event_type",
      tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    // tracked: bounds, keys and the spine join all read this keys×days
    // frame — uncached, the events scan + aggregate would run 3×
    val daily = CacheRegistry.tracked(events
      .groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .agg(sum((col(valueCol).cast(DecimalType(18, 2)) * 100)
        .cast("long")).as("cents")))
    val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val spine = bounds.select(explode(expr(
      "sequence(d0, d1, interval 1 day)")).as("day"))
    val keys = daily.select(col("key")).distinct()
    val dense = keys.crossJoin(spine)
      .join(daily, Seq("key", "day"), "left")
      .withColumn("cents", coalesce(col("cents"), lit(0L)))
    val byKey = Window.partitionBy(col("key")).orderBy(col("day"))
    val w7 = byKey.rowsBetween(-3, 3)
    val n = Window.partitionBy(col("key"))
    val detr = dense
      .withColumn("sum7", sum(col("cents")).over(w7))
      .withColumn("rn", row_number().over(byKey))
      .withColumn("cnt", count(lit(1)).over(n))
      .filter(col("rn") > 3 && col("rn") <= col("cnt") - 3)
      .withColumn("detr7", lit(7L) * col("cents") - col("sum7"))
    detr
      .groupBy(col("key"), dayofweek(col("day")).as("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("detr7")).as("s7"))
      .select(col("key"), col("dow"), col("n_days"),
        round(col("s7").cast("double") / col("n_days").cast("double")
          / lit(7.0), 6).as("seasonal_cents"))
  }

  /** Rolling 7-day MEDIAN level per key over the dense daily spine
    * (missing days = 0, the [[seasonalDow]] convention — absence IS
    * signal for a level monitor): per day, the lower median of the
    * trailing week's integer cent totals, emitted only where the full
    * window fits. The robust windowed level beside [[ewmaLevel]]'s
    * mean-based smoothing: one corrupted day shifts the EWMA for a
    * week but can never BE the median of its windows. Exactness:
    * cents are exact longs, the window's 7 values sort inside an
    * array and the 4th element is the answer — no arithmetic at all,
    * so the oracle replays it with a list sort. Window state is 7
    * longs per (key, day); the frame is keys×days, never facts. */
  def rollingMedian(events: DataFrame, keyCol: String = "event_type",
      tsCol: String = "ts", valueCol: String = "value",
      window: Int = 7): DataFrame = {
    require(window >= 1 && window % 2 == 1, s"odd window, got $window")
    val daily = events
      .groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .agg(sum((col(valueCol).cast(DecimalType(18, 2)) * 100)
        .cast("long")).as("cents"))
    val bounds = daily.agg(min(col("day")).as("d0"),
      max(col("day")).as("d1"))
    val spine = bounds.select(explode(expr(
      "sequence(d0, d1, interval 1 day)")).as("day"))
    val keys = daily.select(col("key")).distinct()
    val dense = keys.crossJoin(spine)
      .join(daily, Seq("key", "day"), "left")
      .withColumn("cents", coalesce(col("cents"), lit(0L)))
    val byKey = Window.partitionBy(col("key")).orderBy(col("day"))
    dense
      .withColumn("win", collect_list(col("cents")).over(
        byKey.rowsBetween(-(window - 1), 0)))
      .filter(size(col("win")) === window)
      .select(col("key"), col("day"),
        element_at(array_sort(col("win")), (window + 1) / 2)
          .as("med_cents"))
  }

  /** Mann–Kendall trend test per key over the observed daily cent
    * totals (the [[theilSenTrend]] convention — trend tests read the
    * observed series; the level monitors read the dense spine): S =
    * Σ_{i<j} sign(y_j − y_i), the tie-adjusted variance (Kendall
    * 1975) kept as the exact integer `var18 = n(n−1)(2n+5) −
    * Σ_ties t(t−1)(2t+5)` (18× the variance — scaling instead of
    * dividing, the house trick), and the continuity-corrected
    * z = (S − sgn(S)) / √(var18/18). The distribution-free "is there
    * a monotone trend AT ALL" gate in front of [[theilSenTrend]]'s
    * "how steep" — the pair completes the Kendall toolkit exactly as
    * Mann–Whitney pairs with the Welch t. The closing chain (one ÷,
    * one √ — the correctly-rounded power — one ÷, 6dp round) mirrors
    * the oracle's parenthesization bit for bit; a degenerate key
    * (single day, or all days equal: var18 = 0) emits NULL z
    * replayably. Shape: S is a pair join over the keys×days frame
    * (days², never rows², same budget as Theil–Sen), ties and n are
    * one combining aggregate each. */
  def mannKendall(events: DataFrame, keyCol: String = "event_type",
      tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    val daily = CacheRegistry.tracked(events
      .groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .agg(sum((col(valueCol).cast(DecimalType(18, 2)) * 100)
        .cast("long")).as("cents")))
    val s = daily.select(col("key"), col("day").as("di"),
        col("cents").as("yi"))
      .join(daily.select(col("key"), col("day").as("dj"),
        col("cents").as("yj")), Seq("key"))
      .filter(col("di") < col("dj"))
      .groupBy(col("key"))
      .agg(sum(when(col("yj") > col("yi"), 1L)
        .when(col("yj") < col("yi"), -1L).otherwise(0L)).as("s_stat"))
    val ties = daily.groupBy(col("key"), col("cents"))
      .agg(count(lit(1)).as("tc"))
      .groupBy(col("key"))
      .agg(sum(col("tc") * (col("tc") - 1) * (lit(2L) * col("tc") + 5))
        .as("tie18"))
    daily.groupBy(col("key")).agg(count(lit(1)).as("n"))
      .join(s, Seq("key"), "left")
      .join(ties, Seq("key"))
      .withColumn("s_stat", coalesce(col("s_stat"), lit(0L)))
      .withColumn("var18",
        col("n") * (col("n") - 1) * (lit(2L) * col("n") + 5)
          - col("tie18"))
      .select(col("key"), col("n").as("n_days"), col("s_stat"),
        col("var18"),
        when(col("var18") > 0, round(
          (col("s_stat") - when(col("s_stat") > 0, 1L)
            .when(col("s_stat") < 0, -1L).otherwise(0L)).cast("double")
            / sqrt(col("var18").cast("double") / lit(18.0)), 6))
          .as("z_mk"))
  }

  /** Kendall τ-b rank correlation per key between the two things a
    * day of traffic has — how much money moved (daily cent total) and
    * how busy it was (daily event count): do busier days move more,
    * MONOTONICALLY? The robust companion to `Olap.corrMatrix`'s
    * Pearson r exactly as [[mannKendall]] is to the OLS slope — and
    * the same machinery: MK IS Kendall's τ against time. Over day
    * pairs i<j: C = concordant, D = discordant, tie corrections
    * n1 = Σ t(t−1)/2 over x-tie groups, n2 likewise for y (both-tied
    * pairs land in neither C nor D, the τ-b convention), n0 =
    * n(n−1)/2, and τ-b = (C−D)/√((n0−n1)(n0−n2)). Every count is an
    * exact long; the close (one ×, one √ — the correctly-rounded
    * power — one ÷, 6dp round) mirrors the oracle's parenthesization.
    * A key with either side fully tied (or a single day) emits NULL
    * replayably. Shape: one combining aggregate to the key-day frame,
    * the days²-bounded pair join ([[theilSenTrend]]'s budget), two
    * tie-group aggregates — facts are scanned once. */
  def kendallTau(events: DataFrame, keyCol: String = "event_type",
      tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    val daily = CacheRegistry.tracked(events
      .groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .agg(sum((col(valueCol).cast(DecimalType(18, 2)) * 100)
        .cast("long")).as("x"), count(lit(1)).as("y")))
    val cd = daily.select(col("key"), col("day").as("di"),
        col("x").as("xi"), col("y").as("yi"))
      .join(daily.select(col("key"), col("day").as("dj"),
        col("x").as("xj"), col("y").as("yj")), Seq("key"))
      .filter(col("di") < col("dj"))
      .withColumn("sx", when(col("xj") > col("xi"), 1L)
        .when(col("xj") < col("xi"), -1L).otherwise(0L))
      .withColumn("sy", when(col("yj") > col("yi"), 1L)
        .when(col("yj") < col("yi"), -1L).otherwise(0L))
      .groupBy(col("key"))
      .agg(sum(when(col("sx") * col("sy") > 0, 1L).otherwise(0L))
        .as("n_concordant"),
        sum(when(col("sx") * col("sy") < 0, 1L).otherwise(0L))
          .as("n_discordant"))
    val tiesX = daily.groupBy(col("key"), col("x"))
      .agg(count(lit(1)).as("tc")).groupBy(col("key"))
      .agg(sum(expr("(tc * (tc - 1)) div 2")).as("n1"))
    val tiesY = daily.groupBy(col("key"), col("y"))
      .agg(count(lit(1)).as("tc")).groupBy(col("key"))
      .agg(sum(expr("(tc * (tc - 1)) div 2")).as("n2"))
    daily.groupBy(col("key")).agg(count(lit(1)).as("n"))
      .join(cd, Seq("key"), "left")
      .join(tiesX, Seq("key")).join(tiesY, Seq("key"))
      .withColumn("n_concordant", coalesce(col("n_concordant"), lit(0L)))
      .withColumn("n_discordant", coalesce(col("n_discordant"), lit(0L)))
      .withColumn("n0", expr("(n * (n - 1)) div 2"))
      .select(col("key"), col("n").as("n_days"), col("n_concordant"),
        col("n_discordant"), col("n0"), col("n1"), col("n2"),
        when(col("n0") > col("n1") && col("n0") > col("n2"), round(
          (col("n_concordant") - col("n_discordant")).cast("double")
            / sqrt((col("n0") - col("n1")).cast("double")
              * (col("n0") - col("n2")).cast("double")), 6))
          .as("tau_b"))
  }

  /** Exponentially-weighted level per key (α = 1/2) over day-ordered
    * daily totals — the smoothed "where is this metric NOW" companion
    * to [[trendOls]]'s direction. The fold runs over integer-cent
    * daily totals sorted INSIDE the array (collect_list alone has no
    * cross-partition order), as the sequential left fold
    * `s ← (s + xᵢ)/2` — every step is the identical IEEE add-then-
    * halve on both engines (÷2 is exact scaling), so the result is
    * bit-deterministic without any rounding step. α = 1/2 is the
    * one smoothing constant whose weights are exact binary powers.
    * The per-key array is days-sized (bounded by the calendar), so
    * the higher-order fold is off the hot path; an unbounded-history
    * caller maintains the level INCREMENTALLY instead — one stored
    * row per key folded with each new day, the agg-store pattern. */
  def ewmaLevel(events: DataFrame, keyCol: String = "event_type",
      tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(sum((col(valueCol).cast(DecimalType(18, 2)) * 100)
        .cast("long")).as("cents"))
    val packed = daily.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"), max(col("day")).as("last_day"),
        transform(array_sort(collect_list(struct(col("day"),
          col("cents")))), p => p.getField("cents").cast("double"))
          .as("xs"))
    packed.select(col(keyCol), col("n_days"), col("last_day"),
      when(col("n_days") === 1, element_at(col("xs"), 1))
        .otherwise(aggregate(
          slice(col("xs"), lit(2), size(col("xs")) - 1),
          element_at(col("xs"), 1),
          (acc, x) => (acc + x) / lit(2.0))).as("ewma_cents"),
      element_at(col("xs"), col("n_days").cast("int"))
        .as("last_cents"))
  }

  /** Holt double exponential smoothing (level + trend) per key with
    * α = β = 1/2 — the forecasting rung above [[ewmaLevel]]: the EWMA
    * answers "where is the metric NOW", this adds "and which way is it
    * HEADED", closing with the one-step-ahead forecast `level+trend`.
    * The recursion
    * {{{
    *   l_t = (x_t + l_{t-1} + b_{t-1}) / 2
    *   b_t = ((l_t - l_{t-1}) + b_{t-1}) / 2
    * }}}
    * is [[ewmaLevel]]'s exact-binary-scaling trick extended to the
    * pair fold: every step is adds/subtracts plus a ÷2 (exact IEEE
    * scaling), evaluated in one fixed association mirrored by the
    * oracle's `list_reduce` — bit-deterministic with NO rounding.
    * α = β = 1/2 because halving is the one smoothing weight every
    * engine scales exactly. Init: l₁ = x₁, b₁ = 0 (a 1-day key has
    * zero trend, not an undefined one). Per-key arrays are
    * days-sized (calendar-bounded), so the interpreted fold is off
    * the hot path — an unbounded-history caller maintains (l, b)
    * INCREMENTALLY, one stored pair per key folded per day, the
    * agg-store pattern. */
  def holtLevelTrend(events: DataFrame, keyCol: String = "event_type",
      tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(sum((col(valueCol).cast(DecimalType(18, 2)) * 100)
        .cast("long")).as("cents"))
    val packed = daily.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"), max(col("day")).as("last_day"),
        transform(array_sort(collect_list(struct(col("day"),
          col("cents")))), p => p.getField("cents").cast("double"))
          .as("xs"))
    val init = struct(element_at(col("xs"), 1).as("l"),
      lit(0.0).as("b"))
    val folded = packed.withColumn("hb",
      when(col("n_days") === 1, init)
        .otherwise(aggregate(
          slice(col("xs"), lit(2), size(col("xs")) - 1), init,
          (acc, x) => struct(
            ((x + acc.getField("l") + acc.getField("b")) / lit(2.0))
              .as("l"),
            (((x + acc.getField("l") + acc.getField("b")) / lit(2.0)
              - acc.getField("l") + acc.getField("b")) / lit(2.0))
              .as("b")))))
    folded.select(col(keyCol), col("n_days"), col("last_day"),
      col("hb.l").as("level_cents"), col("hb.b").as("trend_cents"),
      (col("hb.l") + col("hb.b")).as("forecast_cents"))
  }

  /** Holt-Winters additive level + trend + WEEKLY seasonality per key
    * with α = β = γ = 1/2 — the top forecasting rung
    * ([[ewmaLevel]] → [[holtLevelTrend]] → this): "where is it, which
    * way is it headed, and what does this weekday usually add". The
    * seasonal state is SEVEN slots keyed by calendar day-of-week
    * (1=Sunday … 7=Saturday, Spark's `dayofweek`), not by position —
    * missing days simply don't update their slot, so the operator is
    * dense-spine-free and gap-tolerant. Recursion per observation
    * (`d` = the day's weekday slot):
    * {{{
    *   l_t = (x_t − s_d + l + b) / 2
    *   b_t = (l_t − l + b) / 2
    *   s_d' = (x_t − l_t + s_d) / 2      (other slots unchanged)
    * }}}
    * — all adds/subtracts plus exact ÷2 scaling in one fixed
    * association, mirrored step-for-step by the oracle's recursive
    * CTE: bit-deterministic, NO rounding. Init: l₁ = x₁, b₁ = 0,
    * seasonals all zero — exactly the state the recursion itself
    * produces for the first observation (x₁ − l₁ = 0), so day one is
    * not a special case; each weekday's offset burns in from zero
    * across its first appearances. Closes with the one-step forecast
    * `l + b + s_next` for the day after `last_day`. Per-key state is
    * 9 doubles; arrays are calendar-bounded — the interpreted fold is
    * off the hot path, and an unbounded-history caller maintains the
    * 9-tuple incrementally, the agg-store pattern. */
  def holtWintersWeekly(events: DataFrame,
      keyCol: String = "event_type", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(sum((col(valueCol).cast(DecimalType(18, 2)) * 100)
        .cast("long")).as("cents"))
    val packed = daily.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"), max(col("day")).as("last_day"),
        transform(array_sort(collect_list(struct(col("day"),
          col("cents")))), p => struct(
            p.getField("cents").cast("double").as("x"),
            dayofweek(p.getField("day")).as("dow"))).as("xs"))
    def slot(acc: Column, k: Int): Column = acc.getField(s"s$k")
    val zeros = (1 to 7).map(k => lit(0.0).as(s"s$k"))
    val init = struct(
      (element_at(col("xs"), 1).getField("x").as("l") +:
        lit(0.0).as("b") +: zeros): _*)
    def step(acc: Column, e: Column): Column = {
      val x = e.getField("x")
      val dow = e.getField("dow")
      val sd = (2 to 7).foldLeft(slot(acc, 1)) { (c, k) =>
        when(dow === k, slot(acc, k)).otherwise(c)
      }
      val newL = (x - sd + acc.getField("l") + acc.getField("b")) /
        lit(2.0)
      val newB = (newL - acc.getField("l") + acc.getField("b")) /
        lit(2.0)
      val slots = (1 to 7).map { k =>
        when(dow === k, (x - newL + slot(acc, k)) / lit(2.0))
          .otherwise(slot(acc, k)).as(s"s$k")
      }
      struct((newL.as("l") +: newB.as("b") +: slots): _*)
    }
    val folded = packed.withColumn("hw",
      when(col("n_days") === 1, init)
        .otherwise(aggregate(
          slice(col("xs"), lit(2), size(col("xs")) - 1), init, step)))
    val nextDow = dayofweek(date_add(col("last_day"), 1))
    val sNext = (2 to 7).foldLeft(col("hw.s1")) { (c, k) =>
      when(nextDow === k, col(s"hw.s$k")).otherwise(c)
    }
    folded.select((Seq(col(keyCol), col("n_days"), col("last_day"),
      col("hw.l").as("level_cents"), col("hw.b").as("trend_cents")) ++
      (1 to 7).map(k => col(s"hw.s$k").as(s"s$k")) :+
      (col("hw.l") + col("hw.b") + sNext).as("forecast_cents")): _*)
  }

  /** Robust anomaly flags over per-key daily totals: a day is
    * anomalous when its total deviates from the key's MEDIAN by more
    * than `k` × MAD (median absolute deviation) — the
    * outlier-resistant alternative to mean/stddev z-scores, which a
    * single spike day corrupts. Medians are NEAREST-RANK (discrete:
    * the value at rank ⌊(n+1)/2⌋, engine-exact — interpolated
    * percentiles diverge across engines), and every comparison runs
    * over exact decimals, so the flag is replayable bit-for-bit.
    * The daily frame is keys-sized, so the two rank windows are
    * cheap regardless of fact volume; at web scale the per-key sort
    * swaps for GK quantile sketches exactly as `qualityBucketsApprox`
    * does (documented trade: rank tolerance instead of exactness). */
  def madAnomalies(events: DataFrame, k: Int = 3,
      keyCol: String = "event_type", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(sum(col(valueCol).cast(DecimalType(18, 2))).as("dtot"))
    // nearest-rank median of `vCol` per key; (day) breaks value ties
    // so the picked rank is total-ordered (the VALUE at the median
    // rank is tie-invariant either way)
    def medianOf(df: DataFrame, vCol: String, out: String): DataFrame =
      df.withColumn("rn", row_number().over(
          Window.partitionBy(col(keyCol)).orderBy(col(vCol), col("day"))))
        .withColumn("cnt", count(lit(1)).over(
          Window.partitionBy(col(keyCol))))
        .groupBy(col(keyCol))
        .agg(max(when(col("rn") ===
          ((col("cnt") + 1L) / 2L).cast("long"), col(vCol))).as(out))
    val med = medianOf(daily, "dtot", "med")
    val dev = daily.join(med, Seq(keyCol))
      .withColumn("adev", abs(col("dtot") - col("med")))
    val mad = medianOf(dev, "adev", "mad")
    dev.join(mad, Seq(keyCol))
      .select(col(keyCol), col("day"),
        col("dtot").cast("double").as("total"),
        col("med").cast("double").as("med"),
        col("mad").cast("double").as("mad"),
        (col("adev") > lit(k) * col("mad")).as("is_anomaly"))
  }

  /** Autocorrelation of the global daily-total series at lags
    * 1..`maxLag` — the seasonality detector that tells a forecaster
    * WHICH lag `forecastSnaive` should repeat (a weekly cycle shows
    * up as the lag-7 peak). Exact until the single closing division,
    * by the same n-scaling trick as the CUSUM statistic: instead of
    * mean-centered products `Σ(xₜ−x̄)(xₜ₊ₖ−x̄)` (x̄ is an
    * engine-specific quotient), both numerator and denominator are
    * scaled by n² — `Σ(n·xₜ−S)(n·xₜ₊ₖ−S)` with S = Σx — which keeps
    * every term an exact decimal(38,0) product of int64 deviations
    * (operands cast decimal(19,0) so the product type stays legal on
    * both engines), and acf = num/den is ONE division of two
    * correctly-rounded decimal→double conversions. The series frame
    * is days-sized (the fact table collapses in the first aggregate),
    * so the lead() windows and the 1-row totals broadcast are free at
    * any fact volume. */
  def autocorrelation(events: DataFrame, maxLag: Int = 7,
      tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    val d19 = DecimalType(19, 0)
    val daily = events
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(sum((col(valueCol).cast(DecimalType(18, 2)) * 100)
        .cast("long")).as("cents"))
    val byDay = Window.orderBy(col("day"))
    val withLeads = daily.select(
      col("day") +: col("cents") +:
        (1 to maxLag).map(k =>
          lead(col("cents"), k).over(byDay).as(s"__l$k")): _*)
    val totals = daily.agg(sum(col("cents")).as("s"),
      count(lit(1)).as("n"))
    val base = withLeads.crossJoin(broadcast(totals))
      .withColumn("__dx", (col("n") * col("cents") - col("s")).cast(d19))
    val den = base
      .agg(sum(col("__dx") * col("__dx")).as("den"),
        max(col("n")).as("n_days"))
    val stacked = base
      .select(col("__dx"), col("n"), col("s"),
        explode(array((1 to maxLag).map(k =>
          struct(lit(k).as("lag"), col(s"__l$k").as("y"))): _*))
          .as("p"))
      .filter(col("p.y").isNotNull)
      .withColumn("__dy", (col("n") * col("p.y") - col("s")).cast(d19))
    stacked
      .groupBy(col("p.lag").as("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__dx") * col("__dy")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"), col("n_days"),
        (col("num").cast("double") /
          nullif(col("den").cast("double"), lit(0.0))).as("acf"))
  }

  /** Kaplan–Meier survival curve over user lifetimes with right
    * censoring — "how long do users stay active", answered without
    * the bias a naive average-lifetime carries (users still active at
    * the corpus edge have not finished their lifetime; dropping them
    * skews short, counting them as churned skews shorter). Lifetime =
    * last−first active day per user; a user still active within
    * `horizonDays` of the corpus end is CENSORED at their observed
    * lifetime. The life table (distinct lifetimes, churn/censor
    * counts, reverse-cumulative risk set) is exact integers; the
    * survival product Π(1−dᵢ/nᵢ) is computed as exp of the RUNNING
    * window sum of ln terms — both engines evaluate the running frame
    * in ascending-t order so the only divergence source is libm's
    * last ulp, absorbed by the 6dp round. The curve frame is
    * durations-sized (≤ calendar days); the fact table collapses in
    * the per-user aggregate. */
  def kaplanMeier(events: DataFrame, horizonDays: Int = 14,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val perUser = events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("first_day"),
        max(to_date(col(tsCol))).as("last_day"))
    val endRow = perUser.agg(max(col("last_day")).as("corpus_end"))
    val life = perUser.crossJoin(broadcast(endRow))
      .select(
        datediff(col("last_day"), col("first_day")).cast("long")
          .as("t_days"),
        (datediff(col("corpus_end"), col("last_day")) > horizonDays)
          .as("churned"))
    val table = life.groupBy(col("t_days"))
      .agg(sum(when(col("churned"), 1L).otherwise(0L)).as("n_churn"),
        sum(when(col("churned"), 0L).otherwise(1L)).as("n_censored"))
    val byT = Window.orderBy(col("t_days"))
    val running = byT.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    // d = n (everyone at risk churns) would put ln(0) in the product;
    // DuckDB REFUSES ln(0) rather than returning −∞, so the zero
    // survival is carried explicitly: once any timepoint kills the
    // whole risk set, the curve is 0 from there on.
    table
      .withColumn("n_risk",
        sum(col("n_churn") + col("n_censored")).over(byT.rowsBetween(
          Window.currentRow, Window.unboundedFollowing)))
      .withColumn("__dead",
        max((col("n_churn") === col("n_risk")).cast("int"))
          .over(running))
      .withColumn("__term",
        when(col("n_churn") < col("n_risk"),
          log(lit(1.0) - col("n_churn").cast("double") /
            col("n_risk").cast("double"))).otherwise(lit(0.0)))
      .withColumn("survival",
        when(col("__dead") === 1, lit(0.0))
          .otherwise(round(exp(sum(col("__term")).over(running)), 6)))
      .select(col("t_days"), col("n_risk"), col("n_churn"),
        col("n_censored"), col("survival"))
  }

}
