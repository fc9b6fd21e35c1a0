package graft

import graft.functions.Exprs._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Unit tests for the scalar layer with the exact examples from the
  * reference's format spec (`ESPECIFICACIONES_FORMATOS.md:8-78`). */
class ExprsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](df: org.apache.spark.sql.DataFrame): T =
    df.collect().head.getAs[T](0)

  test("parseDateFlexible: d/M/yyyy without zero padding") {
    val got = Seq("1/11/2025", "15/11/2025", "2025-11-01", "garbage", "")
      .toDF("s").select(parseDateFlexible($"s").cast("string")).collect()
      .map(_.getString(0))
    assert(got.toSeq === Seq("2025-11-01", "2025-11-15", "2025-11-01",
      null, null))
  }

  test("parseMoney: currency strings, quotes, thousands, junk to zero") {
    val got = Seq("$550.00", "\"$1,200.00\"", "$ 850.00", "900.0", "junk", "")
      .toDF("s").select(parseMoney($"s").cast("string")).collect()
      .map(_.getString(0))
    assert(got.toSeq === Seq("550.00", "1200.00", "850.00", "900.00",
      "0.00", "0.00"))
  }

  test("cleanString: strips one outer quote pair, trims, null-safe") {
    val got = Seq("\"Platón Frías\"", "  Marío de la cruz  ",
      "\"multi\nline\"", null, "\"\"").toDF("s")
      .select(cleanString($"s")).collect().map(_.getString(0))
    assert(got.toSeq === Seq("Platón Frías", "Marío de la cruz",
      "multi\nline", "", ""))
  }

  test("classifyMethod: contains cascade, case-insensitive, OTROS default") {
    val got = Seq("TRANSFERENCIA", "transferencia bancaria",
      "tarjeta de crédito", "EFECTIVO", "cheque", "", null)
      .toDF("s").select(classifyMethod($"s")).collect().map(_.getString(0))
    assert(got.toSeq === Seq("TRANSFERENCIA", "TRANSFERENCIA", "TARJETA",
      "EFECTIVO", "OTROS", "OTROS", "OTROS"))
  }

  test("moneyEq: ±0.01 tolerance boundaries") {
    val got = Seq((100.0, 100.005), (100.0, 100.01), (100.0, 99.995),
      (100.0, 100.02)).toDF("a", "b")
      .select(moneyEq($"a", $"b")).collect().map(_.getBoolean(0))
    assert(got.toSeq === Seq(true, false, true, false))
  }

  test("dateEq: Y/M/D only, null-safe both-null equal") {
    val df = Seq(("2025-11-01", "2025-11-01"), ("2025-11-01", "2025-11-02"),
      (null, null), ("2025-11-01", null))
      .toDF("a", "b")
    val got = df.select(dateEq(to_date($"a"), to_date($"b"))).collect()
      .map(_.getBoolean(0))
    assert(got.toSeq === Seq(true, false, true, false))
  }

  test("formatFechaDMY round-trips the spec example") {
    val got: String = one(Seq("2025-11-01").toDF("s")
      .select(formatFechaDMY(to_date($"s"))))
    assert(got === "1/11/2025")
  }

  test("spanishMonth covers all 12") {
    val got = (1 to 12).map(m => f"2025-$m%02d-15").toDF("s")
      .select(spanishMonth(to_date($"s"))).collect().map(_.getString(0))
    assert(got.toSeq === Seq("Enero", "Febrero", "Marzo", "Abril", "Mayo",
      "Junio", "Julio", "Agosto", "Septiembre", "Octubre", "Noviembre",
      "Diciembre"))
  }

  test("coerceBool accepts true/'TRUE' only") {
    val got = Seq("TRUE", "true", "FALSE", "si", null).toDF("s")
      .select(coerceBool($"s")).collect().map(_.getBoolean(0))
    assert(got.toSeq === Seq(true, true, false, false, false))
    val boolGot = Seq(true, false).toDF("b").select(coerceBool($"b"))
      .collect().map(_.getBoolean(0))
    assert(boolGot.toSeq === Seq(true, false))
  }

  test("defaultFill fills blank and null with (vacío)") {
    val got = Seq("algo", "   ", "", null).toDF("s")
      .select(defaultFill($"s")).collect().map(_.getString(0))
    assert(got.toSeq === Seq("algo", "(vacío)", "(vacío)", "(vacío)"))
  }
}
