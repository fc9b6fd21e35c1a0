package graft

import graft.functions.Exprs
import graft.operators.{CorpusStats, Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants, vectorized: ScalaCheck GENERATES the
  * adversarial inputs (seeded — every run sees the same cases, so a
  * failure is reproducible, not a flake), and each property runs as ONE
  * Spark job over the whole generated column rather than a job per
  * case. The properties cover the contracts example-based specs cannot
  * enumerate: parse round-trips over arbitrary bank decorations, date
  * round-trips over arbitrary calendar days, and the rewrite operators'
  * identity/counting laws on arbitrary word material. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail("generator exhausted"))

  test("parseMoney recovers the amount under any bank decoration") {
    val decorated = for {
      cents <- Gen.chooseNum(0L, 99999999999L) // ≤ 10^9 dollars: Money(12,2)
      dollar <- Gen.oneOf("", "$")
      pre <- Gen.oneOf("", " ", "\t ")
      post <- Gen.oneOf("", " ")
      commas <- Gen.oneOf(true, false)
      quoted <- Gen.oneOf(true, false)
    } yield {
      val whole = (cents / 100).toString
      val frac = f"${cents % 100}%02d"
      val grouped =
        if (commas) whole.reverse.grouped(3).mkString(",").reverse
        else whole
      val core = s"$pre$dollar$grouped.$frac$post"
      (if (quoted) "\"" + core + "\"" else core,
        new java.math.BigDecimal(
          java.math.BigInteger.valueOf(cents), 2))
    }
    val rows = sample(decorated, 300, seed = 7L)
    val df = rows.toDF("raw", "expected")
      .select(Exprs.parseMoney($"raw").as("got"),
        $"expected".cast(Exprs.Money).as("expected"))
    assert(df.filter(not($"got" <=> $"expected")).count() === 0)
  }

  test("parseDateFlexible round-trips every calendar day, both formats") {
    val days = for {
      epochDay <- Gen.chooseNum(0L, 47481L) // 1970-01-01 .. 2099-12-31
      iso <- Gen.oneOf(true, false)
    } yield {
      val d = java.time.LocalDate.ofEpochDay(epochDay)
      val s = if (iso) d.toString
      else s"${d.getDayOfMonth}/${d.getMonthValue}/${d.getYear}"
      (s, java.sql.Date.valueOf(d))
    }
    val rows = sample(days, 300, seed = 11L)
    val df = rows.toDF("raw", "expected")
      .select(Exprs.parseDateFlexible($"raw").as("got"), $"expected")
    assert(df.filter(not($"got" <=> $"expected")).count() === 0)
  }

  test("parseDateFlexible maps non-dates to NULL, never garbage") {
    val junk = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString)
      .suchThat(s => s.forall(_.isLetter))
    val rows = sample(junk, 200, seed = 13L)
    val df = rows.toDF("raw")
      .select(Exprs.parseDateFlexible($"raw").as("got"))
    assert(df.filter($"got".isNotNull).count() === 0)
  }

  test("span scrub is the identity when nothing is hot, and counts spans") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
    val doc = Gen.chooseNum(0, 17).flatMap(n => Gen.listOfN(n, word))
    val rows = sample(doc, 150, seed = 17L).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
    val df = rows.toDF("doc_id", "text")
    // maxDf above the corpus size: nothing can be hot → pure identity
    val out = Dedup.scrubRepeatedSpans(df, width = 3, maxDf = 1000)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    rows.foreach { case (id, text) =>
      val words = text.split("\\s+").filter(_.nonEmpty)
      val r = out(id)
      assert(r.getAs[String]("clean_text") === words.mkString(" "))
      assert(r.getAs[Long]("n_spans") ===
        math.ceil(words.length / 3.0).toLong)
      assert(r.getAs[Long]("n_removed") === 0L)
    }
  }

  test("shingle count follows the word count on arbitrary material") {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val doc = Gen.chooseNum(0, 9).flatMap(n => Gen.listOfN(n, word))
    val rows = sample(doc, 200, seed = 19L).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
    val df = rows.toDF("doc_id", "text")
      .select($"doc_id",
        size(TextAnalysis.shingles($"text", 3)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { case (id, text) =>
      val w = text.split("\\s+").count(_.nonEmpty)
      val expected = math.max(0, w - 2)
      // distinct shingles: repeated words can collapse, never exceed
      assert(df(id) <= expected)
      if (expected > 0) assert(df(id) >= 1)
      else assert(df(id) === 0)
    }
  }

  test("funnel agrees with the greedy per-user reference on arbitrary event streams") {
    val minutes7d = 7L * 24 * 60
    val steps = Seq("view", "click", "purchase")
    val userEvents = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, for {
        ty <- Gen.frequency(3 -> "view", 3 -> "click", 2 -> "purchase",
          2 -> "error")
        m <- Gen.chooseNum(0L, 20000L) // ~14 days of minutes
      } yield (ty, m)))
    val perUser = sample(userEvents, 40, seed = 29L).zipWithIndex
      .map { case (evs, u) => (u.toLong, evs) }
    // greedy reference: t1 = min step-1 time; each next step = min
    // occurrence strictly after the previous and within the window
    def refDepth(evs: List[(String, Long)]): Option[Int] = {
      val t1 = evs.collect { case ("view", m) => m } match {
        case Nil => return None
        case ms => ms.min
      }
      var prev = t1
      var depth = 1
      for (st <- steps.drop(1)) {
        val nxt = evs.collect {
          case (`st`, m) if m > prev && m <= t1 + minutes7d => m
        }
        if (nxt.nonEmpty && depth == steps.indexOf(st)) {
          prev = nxt.min; depth += 1
        }
      }
      Some(depth)
    }
    val rows = perUser.flatMap { case (u, evs) =>
      evs.map { case (ty, m) => (u, ty, m) }
    }
    val df = rows.toDF("user_id", "event_type", "m")
      .select($"user_id", $"event_type",
        ($"m" * 60).cast("timestamp").as("ts"))
    val got = graft.operators.Temporal.funnel(df, steps)
      .collect().map(r =>
        r.getAs[Long]("user_id") -> r.getAs[Int]("depth")).toMap
    perUser.foreach { case (u, evs) =>
      refDepth(evs) match {
        case None => assert(!got.contains(u), s"user $u should have no row")
        case Some(d) => assert(got.get(u) === Some(d),
          s"user $u: got ${got.get(u)}, reference $d (events $evs)")
      }
    }
  }

  test("retention offset-0 cell equals the cohort's size on arbitrary streams") {
    val userEvents = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, for {
        ty <- Gen.frequency(2 -> "signup", 5 -> "view")
        day <- Gen.chooseNum(0, 20)
      } yield (ty, day)))
    val perUser = sample(userEvents, 60, seed = 31L).zipWithIndex
      .map { case (evs, u) => (u.toLong, evs) }
    val rows = perUser.flatMap { case (u, evs) =>
      evs.map { case (ty, d) => (u, ty, d) }
    }
    val df = rows.toDF("user_id", "event_type", "day")
      .select($"user_id", $"event_type",
        ($"day" * 86400L).cast("timestamp").as("ts"))
    val got = graft.operators.Temporal.retentionCohorts(df)
      .collect().map(r =>
        (r.getAs[java.sql.Date]("cohort_date").toString,
          r.getAs[Int]("day_offset")) -> r.getAs[Long]("n_active"))
      .toMap
    assert(got.keys.forall(_._2 >= 0), "negative day offset emitted")
    // each user's signup event itself makes them active at offset 0,
    // so the offset-0 cell is exactly the cohort's membership count
    val cohorts = perUser.flatMap { case (u, evs) =>
      evs.collect { case ("signup", d) => d } match {
        case Nil => None
        case ds => Some(u -> ds.min)
      }
    }
    cohorts.groupBy(_._2).foreach { case (day, members) =>
      val date = java.time.LocalDate.ofEpochDay(day.toLong).toString
      assert(got.get((date, 0)) === Some(members.size.toLong),
        s"cohort $date offset 0")
    }
  }

  test("heavy-hitter contract holds on skewed random corpora") {
    val word = Gen.frequency(
      8 -> Gen.oneOf("hot1", "hot2"),
      3 -> Gen.oneOf("warm1", "warm2", "warm3"),
      5 -> Gen.chooseNum(0, 5000).map(i => s"cold$i"))
    val doc = Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, word))
    val rows = sample(doc, 250, seed = 37L).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
    val df = rows.toDF("doc_id", "text")
    val got = CorpusStats.heavyHittersValidated(df, maxMapSize = 256,
      phi = 16).collect()
    val counts = rows.flatMap(_._2.split(" ")).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val n = counts.values.sum
    val expect = counts.filter { case (_, c) => c * 16 > n }.keySet
    assert(got.map(_.getAs[String]("item")).toSet === expect)
    got.foreach { r =>
      assert(r.getAs[Boolean]("reported"), s"$r")
      assert(r.getAs[Boolean]("bounds_hold"), s"$r")
      assert(r.getAs[Long]("exact_cnt") ===
        counts(r.getAs[String]("item")))
    }
  }

  test("bigram xent is nonnegative and finite on arbitrary word material") {
    val word = Gen.oneOf("a", "b", "c", "dd", "ee")
    val doc = Gen.chooseNum(0, 9).flatMap(n => Gen.listOfN(n, word))
    val rows = sample(doc, 200, seed = 41L).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
    val df = rows.toDF("doc_id", "text")
    val got = CorpusStats.bigramLogProb(df)
      .as[(Long, Long, Double)].collect()
    val expectRows = rows.count(_._2.split(" ").count(_.nonEmpty) >= 2)
    assert(got.length === expectRows, "one row per doc with >= 1 bigram")
    got.foreach { case (id, nBig, x) =>
      assert(nBig >= 1, s"doc $id")
      // B <= U(w1) and 0.5 <= 0.5V force P <= 1, so -ln P >= 0
      assert(!x.isNaN && !x.isInfinite && x >= 0.0, s"doc $id: $x")
    }
  }

  test("split assignment is total and in-range for arbitrary ids") {
    val ids = sample(Gen.chooseNum(Long.MinValue + 1, Long.MaxValue), 300,
      seed = 23L)
    val (bucket, split) = CorpusStats.splitAssign(col("doc_id"))
    val df = ids.toDF("doc_id")
      .select(bucket.as("b"), split.as("s")).collect()
    assert(df.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 100))
    assert(df.forall(r =>
      Set("train", "val", "test")(r.getString(1))))
  }

  test("morton interleave is monotone per coordinate on arbitrary grids") {
    // the property the whole Z-range prefilter rests on:
    // a1 <= a2 ∧ b1 <= b2 ⇒ z(a1,b1) <= z(a2,b2), so every point of a
    // rectangle sits inside [z(lo corner), z(hi corner)]
    import graft.plans.LayoutKernels.interleave
    val cells = sample(for {
      a1 <- Gen.chooseNum(0L, 255L); a2 <- Gen.chooseNum(0L, 255L)
      b1 <- Gen.chooseNum(0L, 255L); b2 <- Gen.chooseNum(0L, 255L)
    } yield (a1 min a2, a1 max a2, b1 min b2, b1 max b2), 500,
      seed = 29L)
    cells.foreach { case (aLo, aHi, bLo, bHi) =>
      assert(interleave(aLo, bLo, 8) <= interleave(aHi, bLo, 8))
      assert(interleave(aLo, bLo, 8) <= interleave(aLo, bHi, 8))
      assert(interleave(aLo, bLo, 8) <= interleave(aHi, bHi, 8))
    }
    // and the interleave is a bijection on the grid (no two cells
    // share a z-value) — spot-checked on a full 32×32 subgrid
    val zs = for (a <- 0L until 32L; b <- 0L until 32L)
      yield interleave(a, b, 8)
    assert(zs.toSet.size === zs.length)
  }

  test("weighted reservoir winners are stable under corpus growth") {
    // priorities are per-id constants, so adding rows can only DISPLACE
    // winners, never reorder them: a sampled id of the grown corpus
    // that already existed in the small corpus must also have been
    // sampled in the small corpus (the rerun-reproducibility contract)
    val ids = sample(Gen.chooseNum(1L, 1000000L), 400, seed = 31L)
      .distinct
    val (small, extra) = ids.splitAt(ids.length / 2)
    def df(xs: Seq[Long]) = xs
      .map(i => (i, 1L + i % 97, s"g${i % 3}"))
      .toDF("doc_id", "w", "source")
    def winners(xs: Seq[Long]) = CorpusStats
      .weightedSamplePerGroup(df(xs), 15, $"w", "source", "doc_id")
      .select($"doc_id").as[Long].collect().toSet
    val before = winners(small)
    val after = winners(small ++ extra)
    assert((after & small.toSet).subsetOf(before))
    assert(after.nonEmpty && before.nonEmpty)
  }

  /** Random event log: (user, ts unique per user, type). */
  private def randomEvents(n: Int, seed: Long) = {
    val rows = sample(for {
      user <- Gen.chooseNum(1L, 12L)
      off <- Gen.chooseNum(0L, 2000000L)
      typ <- Gen.oneOf("a", "b", "c")
      v <- Gen.chooseNum(1, 9999)
    } yield (user, off, typ, v / 100.0), n, seed)
      .zipWithIndex
      .map { case ((u, off, t, v), i) =>
        // distinct ts per (user): fold the index into the offset
        (i.toLong, new java.sql.Timestamp(1700000000000L + off * 1000L
          + i), u, t, v)
      }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("scd2 invariants: contiguous half-open chain, one current, PIT identity") {
    import graft.operators.{Olap, Temporal}
    val ev = randomEvents(500, seed = 41L)
    val dim = Olap.scd2History(ev).cache()
    // (a) per user the intervals chain: valid_to(i) == valid_from(i+1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"valid_from")
    val broken = dim
      .withColumn("next_from", lead($"valid_from", 1).over(w))
      .filter($"next_from".isNotNull && !($"valid_to" <=> $"next_from"))
    assert(broken.count() === 0)
    // (b) exactly one open (is_current) row per user
    val multi = dim.groupBy($"user_id")
      .agg(sum(when($"is_current", 1).otherwise(0)).as("open"))
      .filter($"open" =!= 1)
    assert(multi.count() === 0)
    // (c) PIT lookup at each event's OWN ts returns that event's type
    // (the event itself updated the dimension at ts) — the identity
    // that pins both interval boundaries at once
    val pit = Temporal.pitJoin(
      ev.select($"event_id", $"user_id", $"ts", $"event_type"), dim,
      "user_id", "ts",
      Seq("event_id", "user_id", "ts", "event_type"), "event_type",
      "attr")
    assert(pit.filter(!($"attr" <=> $"event_type")).count() === 0)
    dim.unpersist()
  }

  test("table diff reconstructs: old patched with the diff equals new") {
    import graft.operators.Olap
    val ids = sample(Gen.chooseNum(1L, 300L), 250, seed = 43L).distinct
    def tbl(xs: Seq[Long], salt: Long) = xs
      .map(i => (i, (i * 7 + salt) % 13))
      .toDF("k", "v")
    val oldT = tbl(ids.take(160), 0)
    val newT = tbl(ids.drop(40), 5) // overlap changed, head removed,
    val diff = Olap.tableDiff(oldT, newT, Seq("k"), Seq("v")) // tail added
    // patch: drop removed+changed keys from old, add new values
    val dropKeys = diff.filter($"change_kind".isin("removed", "changed"))
      .select($"k")
    val addRows = diff.filter($"change_kind".isin("added", "changed"))
      .select($"k", $"new_v".as("v"))
    val patched = oldT.join(dropKeys, Seq("k"), "left_anti")
      .unionByName(addRows)
    assert(patched.exceptAll(newT).count() === 0)
    assert(newT.exceptAll(patched).count() === 0)
  }

  test("gap fill: dense per-user runs, observed days exact, fills carry") {
    import graft.operators.Olap
    val ev = randomEvents(400, seed = 47L)
    val filled = Olap.gapFillLocf(ev).cache()
    // spine is dense: per user, count(days) == max-min+1 and distinct
    val span = filled.groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        countDistinct($"day").as("nd"),
        (datediff(max($"day"), min($"day")) + 1).as("want"))
      .filter($"n" =!= $"want" || $"nd" =!= $"want")
    assert(span.count() === 0)
    // non-gap rows reproduce the daily aggregate exactly
    val daily = ev.groupBy($"user_id", to_date($"ts").as("day"))
      .agg(sum($"value".cast("decimal(18,2)")).cast("double")
        .as("day_total"))
    val obs = filled.filter(!$"is_gap")
      .select($"user_id", $"day", $"filled_total".as("day_total"))
    assert(obs.exceptAll(daily).count() === 0)
    assert(daily.exceptAll(obs).count() === 0)
    filled.unpersist()
  }

  test("agg-store partials merge associatively over any 3-way split") {
    import graft.sources.AggStore
    val ev = randomEvents(600, seed = 53L).cache()
    val p1 = ev.filter($"event_id" % 3 === 0)
    val p2 = ev.filter($"event_id" % 3 === 1)
    val p3 = ev.filter($"event_id" % 3 === 2)
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select($"day".cast("string"), $"event_type", $"cnt",
        $"total".cast("decimal(18,2)").cast("string"))
      .as[(String, String, Long, String)].collect().toSet
    // (p1 ⊕ p2) ⊕ p3 == p1 ⊕ (p2 ⊕ p3) == full — via the store
    val root = java.nio.file.Files
      .createTempDirectory("agg-prop").toString
    AggStore.writeState(p1, s"$root/a")
    AggStore.appendDelta(spark, s"$root/a", p2)
    AggStore.appendDelta(spark, s"$root/a", p3)
    AggStore.writeState(p2, s"$root/b")
    AggStore.appendDelta(spark, s"$root/b", p3)
    AggStore.appendDelta(spark, s"$root/b", p1)
    val full = norm(AggStore.partials(ev))
    assert(norm(AggStore.readState(spark, s"$root/a")) === full)
    assert(norm(AggStore.readState(spark, s"$root/b")) === full)
    ev.unpersist()
  }

  test("scd2 store merge equals recompute over any time split") {
    import graft.sources.Scd2Store
    val ev = randomEvents(500, seed = 61L).cache()
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select($"user_id", $"event_type", $"valid_from".cast("string"),
        $"valid_to".cast("string"), $"is_current")
      .collect().map(_.toString).toSet
    val want = norm(Scd2Store.compact(ev))
    // three different cut points, including one where many keys have
    // ALL their events on one side
    for ((q, i) <- Seq(0.2, 0.5, 0.9).zipWithIndex) {
      // time split at the q-quantile event's timestamp: base = events
      // up to it (inclusive), delta = strictly after
      val cut = ev.stat.approxQuantile("event_id", Array(q), 0.0)(0)
      val cutTs = ev.filter($"event_id" <= cut).agg(max($"ts"))
        .head.getTimestamp(0)
      val b = ev.filter($"ts" <= lit(cutTs))
      val d = ev.filter($"ts" > lit(cutTs))
      val root = java.nio.file.Files
        .createTempDirectory(s"scd2-prop$i").toString
      Scd2Store.writeState(b, root)
      assert(norm(Scd2Store.mergedView(spark, root, d)) === want,
        s"split at quantile $q diverged")
    }
    ev.unpersist()
  }

  test("fuzzy pairs equal brute force on arbitrary short strings") {
    import graft.operators.FuzzyJoin
    val words = sample(for {
      len <- Gen.chooseNum(0, 6)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString, 120, seed = 59L).distinct
    val df = words.toDF("s")
    val got = FuzzyJoin.editDistancePairs(df, "s", 2)
      .select($"s_a", $"s_b").as[(String, String)].collect().toSet
    val brute = df.as("a").crossJoin(df.as("b"))
      .filter($"a.s" < $"b.s" && levenshtein($"a.s", $"b.s") <= 2)
      .select($"a.s", $"b.s").as[(String, String)].collect().toSet
    // 3-letter alphabet + short strings = dense edit space: the
    // symmetric-delete filter must reproduce brute force EXACTLY
    assert(got === brute)
    assert(brute.nonEmpty)
  }

  test("cep equals the greedy latest-predecessor reference on random streams") {
    import graft.operators.Temporal
    val rnd = new scala.util.Random(42)
    val steps = Seq("view", "click", "purchase")
    val types = Vector("view", "click", "purchase", "other")
    val within = 600L // minutes
    var id = 0L
    val rows = (1L to 30L).flatMap { u =>
      (1 to (1 + rnd.nextInt(20))).map { _ =>
        id += 1
        (id, u, types(rnd.nextInt(4)), rnd.nextInt(3000).toLong)
      }
    }
    val df = rows.toDF("event_id", "user_id", "event_type", "m")
      .select($"event_id", $"user_id", $"event_type",
        ($"m" * 60).cast("timestamp").as("ts"))
    val got = Temporal.cepPattern(df, steps, within * 60)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("start_id"), r.getAs[Long]("end_id"))).toSet
    // independent driver-side reference: per user in (minute, id)
    // order, each step slot carries the chain anchor of its latest
    // occurrence; a final step emits when its predecessor slot holds
    // an anchor within the bound
    val ref = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    rows.groupBy(_._2).foreach { case (u, evsU) =>
      val slots =
        scala.collection.mutable.Map.empty[Int, (Long, Long)]
      evsU.sortBy(e => (e._4, e._1)).foreach { case (eid, _, ty, m) =>
        steps.indexOf(ty) match {
          case 0 => slots(0) = (m, eid)
          case k if k == steps.size - 1 =>
            slots.get(k - 1).foreach { case (am, aid) =>
              if (m - am <= within) ref += ((u, aid, eid))
            }
          case k if k > 0 =>
            slots.get(k - 1).foreach(a => slots(k) = a)
          case _ => // not a step
        }
      }
    }
    assert(got === ref)
    assert(ref.nonEmpty) // the random mix must actually exercise matches
  }

  test("rank statistics equal the brute-force pair scan on random series") {
    import graft.operators.Temporal
    // small value alphabet forces tie groups on BOTH the cent totals
    // and the event counts — the tie corrections are the part a naive
    // reimplementation gets wrong, so the reference must exercise them
    val rnd = new scala.util.Random(7)
    var id = 0L
    val rows = for {
      k <- Seq("a", "b", "c", "d")
      d <- 1 to 12
      if rnd.nextDouble() < 0.7
      _ <- 1 to (1 + rnd.nextInt(3))
    } yield {
      id += 1
      (id, f"2024-03-$d%02d 0${rnd.nextInt(9) + 1}:00:00", 1L, k,
        Seq(1.0, 2.0)(rnd.nextInt(2)))
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", $"ts".cast("timestamp"))
    // driver-side reference off the same rows: per key, the day-sorted
    // (cents, count) series, then literal O(n²) pair scans
    val daily = rows.groupBy(r => (r._4, r._2.take(10))).toSeq
      .map { case ((k, day), evs) =>
        (k, day, evs.map(e => math.round(e._5 * 100)).sum, evs.size.toLong)
      }
    val series = daily.groupBy(_._1).map { case (k, ds) =>
      k -> ds.sortBy(_._2).map(d => (d._3, d._4))
    }
    def sgn(l: Long): Long = java.lang.Long.signum(l)
    val mk = Temporal.mannKendall(df).collect()
      .map(r => r.getAs[String]("key") -> r).toMap
    val kt = Temporal.kendallTau(df).collect()
      .map(r => r.getAs[String]("key") -> r).toMap
    series.foreach { case (k, xs) =>
      val n = xs.size.toLong
      val pairs = for (i <- xs.indices; j <- xs.indices if i < j)
        yield (xs(i), xs(j))
      // Mann–Kendall on the cent series
      val s = pairs.map { case ((xi, _), (xj, _)) => sgn(xj - xi) }.sum
      val tie18x = xs.groupBy(_._1).values
        .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
      val var18 = n * (n - 1) * (2 * n + 5) - tie18x
      assert(mk(k).getAs[Long]("n_days") === n)
      assert(mk(k).getAs[Long]("s_stat") === s)
      assert(mk(k).getAs[Long]("var18") === var18)
      if (var18 > 0)
        assert(math.abs(mk(k).getAs[Double]("z_mk") -
          (s - sgn(s)) / math.sqrt(var18 / 18.0)) <= 1e-6)
      else assert(mk(k).getAs[Any]("z_mk") == null)
      // Kendall τ-b on the (cents, count) pairs
      val cd = pairs.map { case ((xi, yi), (xj, yj)) =>
        sgn(xj - xi) * sgn(yj - yi) }
      val (c, dd) = (cd.count(_ > 0).toLong, cd.count(_ < 0).toLong)
      val n0 = n * (n - 1) / 2
      val n1 = xs.groupBy(_._1).values
        .map(g => { val t = g.size.toLong; t * (t - 1) / 2 }).sum
      val n2 = xs.groupBy(_._2).values
        .map(g => { val t = g.size.toLong; t * (t - 1) / 2 }).sum
      assert(kt(k).getAs[Long]("n_concordant") === c)
      assert(kt(k).getAs[Long]("n_discordant") === dd)
      assert((kt(k).getAs[Long]("n0"), kt(k).getAs[Long]("n1"),
        kt(k).getAs[Long]("n2")) === ((n0, n1, n2)))
      if (n0 > n1 && n0 > n2) {
        val tau = kt(k).getAs[Double]("tau_b")
        assert(math.abs(tau -
          (c - dd) / math.sqrt((n0 - n1).toDouble * (n0 - n2))) <= 1e-6)
        assert(tau >= -1.0 && tau <= 1.0)
      } else assert(kt(k).getAs[Any]("tau_b") == null)
      // the random mix must actually exercise the tie corrections
      assert(n1 > 0 || n2 > 0 || n <= 1)
    }
  }
}
