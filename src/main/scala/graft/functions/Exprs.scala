package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scalar expression layer (SURVEY.md §2.2, operators P2–P13).
  *
  * Every helper is a pure `Column` combinator over Spark built-ins so the
  * whole layer stays inside whole-stage codegen — no UDFs. Semantics follow
  * the reference's parse/clean/compare helpers:
  *
  *  - P2  classifyMethod   — reference `Code.gs:722-734`
  *  - P5  parseDateFlexible — reference `parsearFecha`, `Code.gs:124-154`
  *  - P6  parseMoney       — reference `parsearMonto`, `Code.gs:159-177`
  *  - P7  cleanString      — reference `limpiarString`, `Code.gs:182-194`
  *  - P8  moneyEq          — reference `compararMontos`, `Code.gs:199-202`
  *  - P9  dateEq           — reference `compararFechas`, `Code.gs:207-214`
  *  - P10 formatFechaDMY   — reference `formatearFecha`, `Code.gs:219-229`
  *  - P11 spanishMonth     — reference `obtenerNombrePestana`, `Code.gs:234-240`
  *  - P12 coerceBool       — reference checkbox coercion, `Code.gs:1505`
  *  - P13 defaultFill      — reference `(vacío)` fill, `Code.gs:1964`
  *
  * Spark 4 runs with ANSI mode on; all lenient paths therefore go through
  * `try_*` forms so malformed input yields NULL (then a default), never an
  * exception — matching the reference's forgiving parsers.
  */
object Exprs {

  val Money: DecimalType = DecimalType(12, 2)

  val MethodTransferencia = "TRANSFERENCIA"
  val MethodTarjeta = "TARJETA"
  val MethodEfectivo = "EFECTIVO"
  val MethodOtros = "OTROS"

  /** P2 — payment-method classifier: upper-cased `contains` cascade with
    * OTROS as the default (covers empty/null/junk). */
  def classifyMethod(metodoRaw: Column): Column = {
    val m = upper(coalesce(metodoRaw.cast("string"), lit("")))
    when(m.contains(MethodTransferencia), lit(MethodTransferencia))
      .when(m.contains(MethodTarjeta), lit(MethodTarjeta))
      .when(m.contains(MethodEfectivo), lit(MethodEfectivo))
      .otherwise(lit(MethodOtros))
  }

  /** P5 — `d/M/yyyy` (no zero-pad) first, then any ISO-ish date/timestamp;
    * unparsable → NULL. Accepts string, date, or timestamp input. */
  def parseDateFlexible(c: Column): Column =
    coalesce(
      to_date(try_to_timestamp(c.cast("string"), lit("d/M/yyyy"))),
      to_date(try_to_timestamp(c.cast("string"))))

  /** P6 variant without the forgiving default: unparsable → NULL. Used to
    * DETECT poison rows (rejected-rows containment) rather than coerce
    * them. */
  def parseMoneyOpt(c: Column): Column =
    regexp_replace(c.cast("string"), "[$\",\\s]", "").try_cast(Money)

  /** P6 — strip `$`, `"`, `,`, whitespace; cast to money; unparsable → 0.00. */
  def parseMoney(c: Column): Column =
    coalesce(parseMoneyOpt(c), lit(0).cast(Money))

  /** P7 — strip one pair of outer double quotes (dotall: cliente values may
    * embed newlines), trim; NULL → empty string. */
  def cleanString(c: Column): Column =
    coalesce(
      trim(regexp_replace(trim(c.cast("string")), "(?s)^\"(.*)\"$", "$1")),
      lit(""))

  /** P8 — tolerance equality: |a−b| < 0.01 (reference compares floats). */
  def moneyEq(a: Column, b: Column): Column =
    abs(a - b) < lit(0.01)

  /** P9 — date equality on (Y,M,D) only, null-safe (both NULL ⇒ equal). */
  def dateEq(a: Column, b: Column): Column =
    to_date(a) <=> to_date(b)

  /** P10 — date → `d/M/yyyy` string without zero padding. */
  def formatFechaDMY(c: Column): Column =
    date_format(c, "d/M/yyyy")

  private val SpanishMonths = Seq(
    "Enero", "Febrero", "Marzo", "Abril", "Mayo", "Junio",
    "Julio", "Agosto", "Septiembre", "Octubre", "Noviembre", "Diciembre")

  /** P11 — month-partition key: date → Spanish month name. */
  def spanishMonth(c: Column): Column =
    element_at(lit(SpanishMonths.toArray), month(c))

  /** P12 — permissive checkbox coercion: boolean true or the strings
    * 'TRUE'/'true'; anything else (incl. NULL) → false. */
  def coerceBool(c: Column): Column =
    coalesce(trim(c.cast("string")).isin("true", "TRUE"), lit(false))

  /** P13 — placeholder fill for blank/NULL raw payment methods. */
  def defaultFill(c: Column, placeholder: String = "(vacío)"): Column =
    coalesce(when(trim(c.cast("string")) === "", lit(placeholder))
      .otherwise(trim(c.cast("string"))), lit(placeholder))
}
