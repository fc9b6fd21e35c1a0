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
}
