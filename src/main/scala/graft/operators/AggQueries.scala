package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver-facing queries for the aggregation layer (SURVEY.md §2.4) over
  * the [[SyncFixture]] state, with DuckDB oracles. */
object AggQueries {

  private val Dec = DecimalType(18, 2)

  private def tarjetas(s: SparkSession, d: String): DataFrame =
    SyncFixture.state(s, d).filter(col("partition") === "TARJETA")

  /** Deterministic full-shape lot-closure fixture (the reference sheet's
    * manual columns, `Code.gs:479-487`): declared total = computed sum
    * nudged +10 for every third lot so both ✅ and ❌ appear; Fecha = the
    * lot's first card date; Depositado/Observaciones seeded from the lot
    * number. */
  private def cierres(s: SparkSession, d: String): DataFrame =
    tarjetas(s, d).filter(col("lote").isNotNull)
      .groupBy(col("lote"))
      .agg(min(col("fecha")).as("fecha"),
        sum(Aggregates.cents(col("monto"))).as("tf"))
      .select(col("fecha"), col("lote"),
        (col("tf") +
          when(col("lote").cast("int") % 3 === 0, lit(10).cast(Dec))
            .otherwise(lit(0).cast(Dec)))
          .cast(Dec).as("total_cierre"),
        (col("lote").cast("int") % 2 === 0).as("depositado"),
        when(col("lote").cast("int") % 5 === 0,
          concat(lit("dep ok lote "), col("lote"))).as("observaciones"))

  // Sums stay DecimalType internally (order-independent totals); only the
  // FINAL projected money columns are cast to double — the driver hashes
  // typed values as-is and `Decimal('123.40')` != `123.4` across engines.
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_lot_totals" -> ((s, d) => Aggregates.lotTotals(tarjetas(s, d))
      .withColumn("total_folios", col("total_folios").cast("double"))),

    "a2_cuadra_check" -> ((s, d) =>
      Aggregates.refreshCierres(cierres(s, d), tarjetas(s, d))
        .withColumn("total_cierre", col("total_cierre").cast("double"))
        .withColumn("total_folios", col("total_folios").cast("double"))),

    "a3_daily_totals_spine" -> ((s, d) =>
      Aggregates.dailyTotals(
        SyncFixture.state(s, d)
          .filter(col("partition") === "TRANSFERENCIA"),
        SyncFixture.WindowStart, SyncFixture.WindowEnd)
        .withColumn("transferencia", col("transferencia").cast("double")))
  )

  private def withCtes(sql: String): String =
    s"WITH ${SyncFixture.DeltaCtes},\n$sql"

  // mirrors Aggregates.cents: exact integer milli-cents, explicit
  // HALF_UP in integer math, then cents→decimal — double→decimal casts
  // tie-break differently between engines (Spark shortest-repr HALF_UP,
  // DuckDB value-based / rescale ties-down) on the fixture's half-cent
  // money values
  private val CentsSql =
    "cast(floor((round(monto * 1000) + 5) / 10) / 100.0 AS decimal(18,2))"

  private val LotTotalsSql =
    s"""lt AS (
       |  SELECT lote,
       |    sum($CentsSql) AS total_folios,
       |    count(*) AS n_folios
       |  FROM st WHERE partition = 'TARJETA' AND lote IS NOT NULL
       |  GROUP BY lote)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "a1_lot_totals" -> withCtes(
      s"""$LotTotalsSql
         |SELECT lote, cast(total_folios AS double) AS total_folios,
         |  n_folios FROM lt""".stripMargin),

    "a2_cuadra_check" -> withCtes(
      s"""$LotTotalsSql,
         |cierres AS (
         |  SELECT min(fecha) AS fecha, lote,
         |    cast(sum($CentsSql) +
         |      CASE WHEN cast(lote AS int) % 3 = 0 THEN 10.0 ELSE 0.0 END
         |      AS decimal(18,2)) AS total_cierre,
         |    (cast(lote AS int) % 2 = 0) AS depositado,
         |    CASE WHEN cast(lote AS int) % 5 = 0
         |      THEN 'dep ok lote ' || lote END AS observaciones
         |  FROM st WHERE partition = 'TARJETA' AND lote IS NOT NULL
         |  GROUP BY lote)
         |SELECT c.fecha, c.lote,
         |  cast(c.total_cierre AS double) AS total_cierre,
         |  cast(lt.total_folios AS double) AS total_folios,
         |  CASE WHEN abs(c.total_cierre - lt.total_folios) < 0.01
         |    THEN '✅' ELSE '❌' END AS cuadra,
         |  c.depositado, c.observaciones
         |FROM cierres c LEFT JOIN lt ON c.lote = lt.lote""".stripMargin),

    "a3_daily_totals_spine" -> withCtes(
      s"""spine AS (
         |  SELECT cast(unnest(generate_series(
         |    DATE '${SyncFixture.WindowStart}',
         |    DATE '${SyncFixture.WindowEnd}', INTERVAL 1 DAY)) AS date)
         |    AS fecha),
         |daily AS (
         |  SELECT fecha,
         |    sum($CentsSql) AS t
         |  FROM st WHERE partition = 'TRANSFERENCIA' GROUP BY fecha)
         |SELECT spine.fecha,
         |  cast(cast(coalesce(daily.t, 0) AS decimal(18,2)) AS double)
         |    AS transferencia
         |FROM spine LEFT JOIN daily ON spine.fecha = daily.fecha"""
        .stripMargin)
  )
}
