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

  /** A1 — per-lot amount totals over the card partition. */
  def lotTotals(tarjetas: DataFrame, lotCol: String = "lote",
      amountCol: String = "monto"): DataFrame =
    tarjetas
      .filter(col(lotCol).isNotNull)
      .groupBy(col(lotCol))
      .agg(sum(col(amountCol).cast(Dec)).as("total_folios"),
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
      .agg(sum(col(amountCol).cast(Dec)).as("t"))
    spine.join(daily, Seq(fechaCol), "left")
      .select(col(fechaCol),
        coalesce(col("t"), lit(0)).cast(Dec).as("transferencia"))
  }
}
