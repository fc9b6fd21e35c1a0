package graft.operators

import graft.functions.Exprs.moneyEq
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Aggregation layer (SURVEY.md §2.4): per-lot totals with cross-check and
  * the dense per-day revenue view.
  *
  * Reference counterparts: `SUMIF` per card lot + `Cuadra` flag
  * (`Code.gs:499-500`), per-day `SUMIFS` over a dense calendar spine
  * (workbook sheet `totales`). Sums are computed over `DecimalType` so
  * results are exact and order-independent (a 100 TB shuffle must not make
  * the totals nondeterministic).
  */
object Aggregates {

  private val Dec = DecimalType(18, 2)

  /** Double money → cents, engine-stably. A direct double→decimal(18,2)
    * cast diverges between engines on half-cent values: Spark rounds
    * the SHORTEST DECIMAL REPR of the double (`BigDecimal.valueOf`, so
    * a stored 123.4549999… whose repr is "123.455" rounds UP) while a
    * value-based engine rounds the true binary value (DOWN for the same
    * bits) — observed as penny drift in the sf0.1 lot totals. And
    * decimal RESCALE ties-break differently too (Spark HALF_UP, DuckDB
    * ties-down), so no decimal cast chain can fix it. Instead: exact
    * integer milli-cents (`round(m·1000)` — the accumulated double
    * error of money arithmetic is ~1e-8, five orders inside the 0.5
    * tie window, so both engines land the SAME integer), then an
    * explicit HALF_UP in integer math (`⌊(mc+5)/10⌋`, non-negative
    * money), then cents→decimal — never within an ulp of any boundary.
    * Mirrored textually by the `CentsSql` fragment in AggQueries. */
  private[operators] def cents(c: org.apache.spark.sql.Column) = {
    val mc = round(c * 1000) // exact integer-valued double
    (floor((mc + 5) / 10) / 100.0).cast(Dec)
  }

  /** A1 — per-lot amount totals over the card partition. */
  def lotTotals(tarjetas: DataFrame, lotCol: String = "lote",
      amountCol: String = "monto"): DataFrame =
    tarjetas
      .filter(col(lotCol).isNotNull)
      .groupBy(col(lotCol))
      .agg(sum(cents(col(amountCol))).as("total_folios"),
        count(lit(1)).as("n_folios"))

  /** A2/J5 — lot-closure cross-check: declared lot total vs computed sum,
    * flagged like the reference's `IF(C=D,"✅","❌")`. */
  def cuadra(cierres: DataFrame, tarjetas: DataFrame): DataFrame = {
    val totals = lotTotals(tarjetas)
    cierres.join(totals, Seq("lote"), "left")
      .select(col("lote"), col("total_cierre"), col("total_folios"),
        when(moneyEq(col("total_cierre"), col("total_folios")), "✅")
          .otherwise("❌").as("cuadra"))
  }

  /** The manual (human-owned) columns of the lot-closure table — the
    * protected zone a refresh must pass through verbatim, same property
    * as the sync engine's per-partition protected columns. */
  val CierresManualCols: Seq[String] =
    Seq("fecha", "lote", "total_cierre", "depositado", "observaciones")

  /** Full Cierres_Lotes refresh (`Code.gs:479-501`): the reference sheet
    * holds manual columns Fecha, # Lote, Total Cierre, 💰 Depositado,
    * 🔍 Observaciones and two formula columns — Total Folios (`SUMIF`
    * over the card partition's lot) and ✅ Cuadra (`IF(C=D)`). Refresh
    * recomputes ONLY the formula columns; every manual column flows
    * through untouched, so reconciliation state (was the lot deposited?
    * what did the operator note?) survives any number of refreshes. */
  def refreshCierres(cierres: DataFrame, tarjetas: DataFrame): DataFrame = {
    val totals = lotTotals(tarjetas).select(col("lote"), col("total_folios"))
    cierres.join(totals, Seq("lote"), "left")
      .select(col("fecha"), col("lote"), col("total_cierre"),
        col("total_folios"),
        when(moneyEq(col("total_cierre"), col("total_folios")), "✅")
          .otherwise("❌").as("cuadra"),
        col("depositado"), col("observaciones"))
  }

  /** A3 — dense date-spine daily revenue: one row per calendar day of the
    * window, zero on empty days. */
  def dailyTotals(transfers: DataFrame, start: String, end: String,
      fechaCol: String = "fecha", amountCol: String = "monto"): DataFrame = {
    val spark = transfers.sparkSession
    val spine = spark.range(1)
      .select(explode(sequence(
        to_date(lit(start)), to_date(lit(end)))).as(fechaCol))
    val daily = transfers
      .groupBy(col(fechaCol))
      .agg(sum(cents(col(amountCol))).as("t"))
    spine.join(daily, Seq(fechaCol), "left")
      .select(col(fechaCol),
        coalesce(col("t"), lit(0)).cast(Dec).as("transferencia"))
  }
}
