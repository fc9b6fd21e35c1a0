package graft

import org.apache.spark.sql.functions._
import graft.operators.Hypothesis

/** Crafted two-arm fixtures with hand-computed closing statistics —
  * the engine-side anchor for the four experimentation operators (the
  * DuckDB oracle is the cross-engine check; this pins the math). */
class HypothesisSpec extends SparkSpec {
  import spark.implicits._

  // variant passed as a literal fixture column — the md5 split is
  // pinned separately below
  private def fx(rows: Seq[(String, String, Double)]) =
    rows.toDF("event_type", "vv", "value")

  test("welch t: hand-computed t/df on unequal-variance arms") {
    // a cents [100,200,300,400] (mean 250, var 50000/3);
    // b cents [200,400,600]     (mean 400, var 40000)
    val df = Hypothesis.welchTTest(
      fx(Seq(("k", "a", 1.0), ("k", "a", 2.0), ("k", "a", 3.0),
        ("k", "a", 4.0), ("k", "b", 2.0), ("k", "b", 4.0),
        ("k", "b", 6.0))),
      col("vv")).collect().head
    assert(df.getAs[Long]("n_a") === 4L)
    assert(df.getAs[Long]("n_b") === 3L)
    assert(df.getAs[Long]("sum_a_cents") === 1000L)
    assert(df.getAs[Long]("sum_b_cents") === 1200L)
    assert(df.getAs[Double]("mean_a") === 250.0)
    assert(df.getAs[Double]("mean_b") === 400.0)
    assert(df.getAs[Double]("t_stat") === -1.133893)
    assert(df.getAs[Double]("df") === 3.234719)
  }

  test("welch t: an arm with n < 2 yields NULL t/df, not an error") {
    val df = Hypothesis.welchTTest(
      fx(Seq(("k", "a", 1.0), ("k", "a", 2.0), ("k", "b", 3.0))),
      col("vv")).collect().head
    assert(df.isNullAt(df.fieldIndex("t_stat")))
    assert(df.isNullAt(df.fieldIndex("df")))
    assert(df.getAs[Long]("n_b") === 1L)
  }

  test("mann-whitney: tie-corrected doubled ranks, hand-checked U and z") {
    // a cents [100,200,200,300], b [200,400]: tie group of 3 at 200
    // → u_a_x2 = 4, u_b_x2 = 12, ties = 24, z = -0.983739
    val df = Hypothesis.mannWhitneyU(
      fx(Seq(("k", "a", 1.0), ("k", "a", 2.0), ("k", "a", 2.0),
        ("k", "a", 3.0), ("k", "b", 2.0), ("k", "b", 4.0))),
      col("vv")).collect().head
    assert(df.getAs[Long]("n_a") === 4L)
    assert(df.getAs[Long]("n_b") === 2L)
    assert(df.getAs[Long]("u_a_x2") === 4L)
    assert(df.getAs[Long]("u_b_x2") === 12L)
    assert(df.getAs[Long]("ties") === 24L)
    assert(df.getAs[Double]("z") === -0.983739)
  }

  test("mann-whitney: U_a + U_b = 2·n_a·n_b (the rank-sum identity)") {
    val rows = (1 to 30).map(i =>
      ("k", if (i % 3 == 0) "a" else "b", (i % 7).toDouble))
    val df = Hypothesis.mannWhitneyU(fx(rows), col("vv"))
      .collect().head
    assert(df.getAs[Long]("u_a_x2") + df.getAs[Long]("u_b_x2") ===
      2L * df.getAs[Long]("n_a") * df.getAs[Long]("n_b"))
  }

  test("ks: sup distance and its location, hand-checked") {
    // same fixture as MW: sup |cdfA·n_b − cdfB·n_a| = 4 at cents 300
    // → d = 4 / (4·2) = 0.5
    val df = Hypothesis.ksTwoSample(
      fx(Seq(("k", "a", 1.0), ("k", "a", 2.0), ("k", "a", 2.0),
        ("k", "a", 3.0), ("k", "b", 2.0), ("k", "b", 4.0))),
      col("vv")).collect().head
    assert(df.getAs[Long]("d_num") === 4L)
    assert(df.getAs[Long]("at_cents") === 300L)
    assert(df.getAs[Double]("d") === 0.5)
  }

  test("ks: identical arms have zero distance") {
    val df = Hypothesis.ksTwoSample(
      fx(Seq(("k", "a", 1.0), ("k", "a", 2.0), ("k", "b", 1.0),
        ("k", "b", 2.0))), col("vv")).collect().head
    assert(df.getAs[Long]("d_num") === 0L)
    assert(df.getAs[Double]("d") === 0.0)
  }

  test("cuped: θ, ρ², and per-arm adjusted means, hand-checked") {
    // day0 anchors the pre/post split: pre events on day0, post events
    // 40 days later. Users (x, y): a → (100,200), (200,400);
    // b → (300,500), (400,900). θ = 2.2, ρ² = 0.930769,
    // adj_a = 300 − 2.2·(150−250) = 520, adj_b = 700 − 2.2·100 = 480.
    val pre = "2024-01-01 00:00:00"
    val post = "2024-02-10 00:00:00"
    val events = Seq(
      (1L, pre, 1.0), (1L, post, 2.0),
      (2L, pre, 2.0), (2L, post, 4.0),
      (3L, pre, 3.0), (3L, post, 5.0),
      (4L, pre, 4.0), (4L, post, 9.0))
      .toDF("user_id", "ts_s", "value")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"),
        col("value"))
    // fixture variant: users 1,2 → a; 3,4 → b
    val r = Hypothesis.cuped(events,
        when(col("user_id") <= 2, lit("a")).otherwise(lit("b")))
      .collect().map(r => r.getAs[String]("variant") -> r).toMap
    assert(r("a").getAs[Long]("n_users") === 2L)
    assert(r("a").getAs[Long]("x_cents") === 300L)
    assert(r("a").getAs[Long]("y_cents") === 600L)
    assert(r("a").getAs[Double]("theta") === 2.2)
    assert(r("a").getAs[Double]("rho2") === 0.930769)
    assert(r("a").getAs[Double]("mean_y_adj") === 520.0)
    assert(r("b").getAs[Double]("mean_y_adj") === 480.0)
    // variance reduction is real: adjusted means are closer together
    // than the raw means (700 vs 300 → 480 vs 520)
    assert(math.abs(r("a").getAs[Double]("mean_y_adj") -
      r("b").getAs[Double]("mean_y_adj")) <
      math.abs(r("a").getAs[Double]("mean_y") -
        r("b").getAs[Double]("mean_y")))
  }

  test("power/mde: hand-computed from the welch fixture's stats") {
    // same arms as the welch test: se² = 17500, so
    // mde = 2.801585·√17500 = 370.614859; relative to mean_a = 250
    val df = Hypothesis.powerMde(
      fx(Seq(("k", "a", 1.0), ("k", "a", 2.0), ("k", "a", 3.0),
        ("k", "a", 4.0), ("k", "b", 2.0), ("k", "b", 4.0),
        ("k", "b", 6.0))),
      col("vv")).collect().head
    assert(df.getAs[Double]("mean_a_cents") === 250.0)
    assert(df.getAs[Double]("mde_cents") === 370.614859)
    assert(df.getAs[Double]("mde_rel") === 1.482459)
    // design sanity: the fixture's observed lift (150 cents) is BELOW
    // the MDE — exactly the underpowered case the read-out exists for
    assert(df.getAs[Double]("mde_cents") > 150.0)
  }

  test("power/mde: tiny arm yields NULL, not an error") {
    val df = Hypothesis.powerMde(
      fx(Seq(("k", "a", 1.0), ("k", "a", 2.0), ("k", "b", 3.0))),
      col("vv")).collect().head
    assert(df.isNullAt(df.fieldIndex("mde_cents")))
    assert(df.isNullAt(df.fieldIndex("mde_rel")))
  }

  test("variantOf: deterministic, and both arms are populated") {
    val users = (1L to 200L).toDF("user_id")
    val arms = users.select(Hypothesis.variantOf(col("user_id")).as("v"))
      .groupBy("v").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(arms.keySet === Set("a", "b"))
    // md5 is uniform: a 200-user split lands nowhere near 0/200
    assert(arms("a") > 50L && arms("b") > 50L)
    // replay stability
    val again = users.select(Hypothesis.variantOf(col("user_id")).as("v"))
      .groupBy("v").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === arms)
  }

  test("prop z: hand-computed pooled z, degenerate pools go NULL") {
    // arm a: 10 users, 4 convert; arm b: 10 users, 2 convert.
    // pA=.4, pB=.2, pool=.3, se=sqrt(.3*.7*(1/10+1/10)), z=(pA-pB)/se
    def fx(convA: Int, convB: Int) = {
      val rows =
        (0 until 10).flatMap { i =>
          val t = if (i < convA) "purchase" else "view"
          Seq((i.toLong, t))
        } ++ (100 until 110).flatMap { i =>
          val t = if (i < 100 + convB) "purchase" else "view"
          Seq((i.toLong, t))
        }
      rows.toDF("user_id", "event_type")
    }
    val r = Hypothesis.propZTest(fx(4, 2),
      when(col("user_id") < 50, "a").otherwise("b")).collect().head
    assert(r.getAs[Long]("n_a") === 10L && r.getAs[Long]("conv_a") === 4L)
    assert(r.getAs[Double]("rate_a") === 0.4)
    assert(r.getAs[Double]("rate_b") === 0.2)
    val want = BigDecimal((0.4 - 0.2) /
      math.sqrt(0.3 * (1.0 - 0.3) * (1.0 / 10.0 + 1.0 / 10.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("z") === want)
    // all-or-none pools: SE is zero, z must be NULL, not Infinity
    assert(Hypothesis.propZTest(fx(0, 0),
      when(col("user_id") < 50, "a").otherwise("b"))
      .collect().head.isNullAt(6))
    assert(Hypothesis.propZTest(fx(10, 10),
      when(col("user_id") < 50, "a").otherwise("b"))
      .collect().head.isNullAt(6))
  }

  test("bootstrap ci: constant-valued arms collapse the CI to the exact diff") {
    // 40 users per arm, every a-user worth 100.00, every b-user 0 —
    // any positive-weight resample of a constant is that constant, so
    // EVERY replicate diff is exactly 10000 cents: ci_lo = ci_hi =
    // diff_obs, significant, and all 40 replicates valid (an all-zero
    // arm draw at n=40 would need probability e^-40)
    val rows = (0L until 40L).map(u => (u, "k", 100.0)) ++
      (100L until 140L).map(u => (u, "k", 0.0))
    val df = rows.toDF("user_id", "event_type", "value")
    val r = Hypothesis.bootstrapCiDiff(df,
      when(col("user_id") < 50, "a").otherwise("b"), reps = 40)
      .collect().head
    assert(r.getAs[Long]("n_a") === 40L && r.getAs[Long]("n_b") === 40L)
    assert(r.getAs[Double]("diff_obs") === 10000.0)
    assert(r.getAs[Long]("n_reps") === 40L)
    assert(r.getAs[Double]("ci_lo") === 10000.0)
    assert(r.getAs[Double]("ci_hi") === 10000.0)
    assert(r.getAs[Boolean]("significant"))
    // identical arms: diff 0 everywhere, NOT significant
    val same = ((0L until 40L) ++ (100L until 140L))
      .map(u => (u, "k", 7.0)).toDF("user_id", "event_type", "value")
    val r0 = Hypothesis.bootstrapCiDiff(same,
      when(col("user_id") < 50, "a").otherwise("b"), reps = 40)
      .collect().head
    assert(r0.getAs[Double]("ci_lo") === 0.0 &&
      r0.getAs[Double]("ci_hi") === 0.0)
    assert(!r0.getAs[Boolean]("significant"))
    // a varied fixture keeps order-statistic sanity: lo <= hi and the
    // endpoints bracket the bulk of replicate diffs
    val varied = ((0L until 40L).map(u => (u, "k", (u % 7).toDouble)) ++
      (100L until 140L).map(u => (u, "k", (u % 5).toDouble)))
      .toDF("user_id", "event_type", "value")
    val rv = Hypothesis.bootstrapCiDiff(varied,
      when(col("user_id") < 50, "a").otherwise("b"), reps = 40)
      .collect().head
    assert(rv.getAs[Double]("ci_lo") <= rv.getAs[Double]("ci_hi"))
    assert(rv.getAs[Long]("n_reps") === 40L)
  }

  // (event_type, vv, value, day-of-january) with a fixed timestamp so
  // the dow component of the FDR segment key is a known constant
  private def fxTs(rows: Seq[(String, String, Double, Int)]) =
    rows.toDF("event_type", "vv", "value", "dd")
      .withColumn("ts", to_timestamp(
        concat(lit("2024-01-"), lpad(col("dd").cast("string"), 2, "0"),
          lit(" 12:00:00"))))
      .drop("dd")

  test("fdr-bh: separated segment is the sole discovery; BH ranks and monotonicity hold") {
    // all on one date → one dow → segment key = type#dow; three
    // segments: "sep" with a massive between-arm gap, "same1/2" with
    // identical arms (z = 0), plus "tiny" with a 1-row arm (NULL p,
    // outside the family)
    def arm(t: String, v: String, base: Double, n: Int) =
      (0 until n).map(i =>
        (t, v, base + (if (i == 0) 0.01 else 0.0), 5))
    val rows = arm("sep", "a", 1.0, 20) ++ arm("sep", "b", 9.0, 20) ++
      arm("same1", "a", 3.0, 10) ++ arm("same1", "b", 3.0, 10) ++
      arm("same2", "a", 4.0, 10) ++ arm("same2", "b", 4.0, 10) ++
      Seq(("tiny", "a", 2.0, 5), ("tiny", "a", 3.0, 5),
        ("tiny", "b", 2.0, 5))
    val out = Hypothesis.fdrBh(fxTs(rows), col("vv"))
      .collect().map(r => r.getAs[String]("key") -> r).toMap
    assert(out.size === 4)
    // the family counts only defined p: tiny's b arm has n = 1
    out.values.foreach(r => assert(r.getAs[Long]("m_tests") === 3L))
    val tiny = out.keys.find(_.startsWith("tiny#")).map(out).get
    assert(tiny.isNullAt(tiny.fieldIndex("p_raw")) &&
      tiny.isNullAt(tiny.fieldIndex("p_rank")))
    val sep = out.keys.find(_.startsWith("sep#")).map(out).get
    assert(sep.getAs[Long]("p_rank") === 1L)
    assert(sep.getAs[Double]("p_adj") === 0.0)
    assert(sep.getAs[Boolean]("discovery"))
    // identical arms: z = 0, p ≈ 1 (A&S at t=1), never a discovery
    val same = out.keys.filter(_.startsWith("same")).map(out).toSeq
    same.foreach { r =>
      assert(r.getAs[Double]("z") === 0.0)
      assert(math.abs(r.getAs[Double]("p_raw") - 1.0) < 1e-4)
      assert(!r.getAs[Boolean]("discovery"))
      // BH adjustment never lowers a p below its raw value
      assert(r.getAs[Double]("p_adj") >= r.getAs[Double]("p_raw") - 1e-9)
    }
    // ranks over defined p are exactly 1..m
    assert(out.values.flatMap(r => Option(r.getAs[java.lang.Long]("p_rank")))
      .map(_.toLong).toSeq.sorted === Seq(1L, 2L, 3L))
  }

  test("msprt: hand-computed Λ on one day, monotone always-valid p across days") {
    // day 1: arm a cents {100,300} (mean 200), arm b {700,900}
    // (mean 800): pooled σ² = 20000, V = 20000, θ = −600 →
    // Λ = √(2/3)·e³, p = 1/Λ — the closed form recomputed here with
    // the same JVM math ops
    val day1 = Seq(("k", "a", 1.0, 1), ("k", "a", 3.0, 1),
      ("k", "b", 7.0, 1), ("k", "b", 9.0, 1))
    val r1 = Hypothesis.msprtSeq(fxTs(day1), col("vv"))
      .collect().head
    val expected = BigDecimal(
      1.0 / (math.sqrt(2.0 / 3.0) * math.exp(3.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r1.getAs[Double]("p_inst") === expected)
    assert(r1.getAs[Double]("p_always") === expected)
    assert(r1.getAs[Double]("theta") === -600.0)
    // undefined day (single-arm) holds p at 1; later separation only
    // ever lowers the running p (monotone by construction)
    val rows = Seq(("k", "a", 2.0, 1)) ++
      (0 until 15).flatMap(i => Seq(("k", "a", 1.0 + 0.001 * i, 2),
        ("k", "b", 9.0 + 0.001 * i, 2))) ++
      (0 until 15).flatMap(i => Seq(("k", "a", 1.0 + 0.001 * i, 3),
        ("k", "b", 9.0 + 0.001 * i, 3)))
    val seq = Hypothesis.msprtSeq(fxTs(rows), col("vv"))
      .orderBy(col("day")).collect()
    assert(seq.length === 3)
    assert(seq(0).getAs[Double]("p_always") === 1.0)
    val p2 = seq(1).getAs[Double]("p_always")
    val p3 = seq(2).getAs[Double]("p_always")
    assert(p2 <= 1.0 && p3 <= p2)
    assert(seq(2).getAs[Boolean]("reject_05"))
  }
}
