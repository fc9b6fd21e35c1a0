package graft.operators

import graft.functions.Exprs._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sync scenario derived from the TPC-H-ish `orders` table
  * (FIXTURES.md §5): a source window and a prior destination state whose
  * differences exercise every delta class of FIXTURES.md §4 —
  *
  *   - okey % 11 == 0  → absent from state            → NUEVO
  *   - okey % 19 == 0  → absent from source           → ELIMINACIÓN (if in window)
  *   - okey % 13 == 0  → state partition rotated      → CAMBIO MÉTODO / CONFLICTO
  *   - okey %  7 == 0  → state monto +5.00            → ACTUALIZACIÓN (monto)
  *   - okey % 29 == 0  → state monto +0.005           → SIN_CAMBIOS (within tolerance)
  *   - okey % 17 == 0  → state banco differs          → ACTUALIZACIÓN (TRANSFERENCIA only)
  *   - okey % 23 == 0  → state cliente differs        → ACTUALIZACIÓN
  *   - okey % 31 == 0  → state fecha +1 day           → ACTUALIZACIÓN
  *   - okey % 101 == 0 → duplicated in source         → DUPLICADO EN ORIGEN
  *   - protected cols seeded from okey % 3 / 5 / 9 / 2 → conflict-vs-move split
  *
  * The same derivation exists as SQL fragments so every sync query has a
  * DuckDB oracle over identical inputs.
  */
object SyncFixture {

  val WindowStart = "2001-06-01"
  val WindowEnd = "2001-08-01"
  val StateStart = "2001-04-01"

  private val Servicios =
    Seq("tapete chico", "Sala 3 piezas", "Aveo", "sillon 3 plazas")

  private def servicioOf(okey: Column): Column =
    element_at(lit(Servicios.toArray), (okey % 4 + 1).cast("int"))

  private def clienteOf(okey: Column): Column =
    concat(lit("cliente-"), (okey % 500).cast("string"))

  private def baseSales(s: SparkSession, d: String): DataFrame =
    ScalarQueries.sales(s, d)
      .withColumn("metodo", classifyMethod(col("metodo_raw")))

  /** Prepared source window, including the injected duplicate keys. */
  def source(s: SparkSession, d: String): DataFrame = {
    val inWin = baseSales(s, d)
      .filter(col("fecha").between(lit(WindowStart), lit(WindowEnd)))
      .filter(col("okey") % 19 =!= 0)
      .select(
        (col("okey") * 2).as("ord"), col("folio"), col("fecha"),
        clienteOf(col("okey")).as("cliente"),
        servicioOf(col("okey")).as("servicio"),
        col("banco"), col("monto"), col("metodo"), col("okey"))
    val dups = inWin.filter(col("okey") % 101 === 0)
      .withColumn("ord", col("okey") * 2 + 1)
      .withColumn("monto", col("monto") + lit(50.0))
    inWin.unionByName(dups)
  }

  /** Prior destination state (wide 4-partition schema + protected zone). */
  def state(s: SparkSession, d: String): DataFrame = {
    val rot = (m: Column) =>
      when(m === MethodTransferencia, MethodTarjeta)
        .when(m === MethodTarjeta, MethodEfectivo)
        .when(m === MethodEfectivo, MethodOtros)
        .otherwise(MethodTransferencia)
    val base = baseSales(s, d)
      .filter(col("fecha") >= lit(StateStart))
      .filter(col("okey") % 11 =!= 0)
      .withColumn("partition",
        when(col("okey") % 13 === 0, rot(col("metodo")))
          .otherwise(col("metodo")))
    base.select(
      col("partition"), col("folio"),
      when(col("okey") % 31 === 0, date_add(col("fecha"), 1))
        .otherwise(col("fecha")).as("fecha"),
      when(col("okey") % 23 === 0, lit("otro cliente"))
        .otherwise(clienteOf(col("okey"))).as("cliente"),
      servicioOf(col("okey")).as("servicio"),
      when(col("okey") % 17 === 0, lit("HSBC")).otherwise(col("banco"))
        .as("banco"),
      (col("monto") + when(col("okey") % 7 === 0, 5.0)
        .when(col("okey") % 29 === 0, 0.005).otherwise(0.0)).as("monto"),
      when(col("partition") === MethodTransferencia && col("okey") % 3 === 0,
        true).as("conciliado"),
      when(col("partition") === MethodTransferencia && col("okey") % 9 === 0,
        "SPEI RECIBIDO").as("concepto_banco"),
      when(col("okey") % 5 === 0, "revisado").as("observaciones"),
      when(col("partition") === MethodTarjeta && col("okey") % 3 === 0, true)
        .as("recibo"),
      when(col("partition") === MethodTarjeta && col("okey") % 9 === 0,
        "4771419").as("afiliacion"),
      when(col("partition") === MethodTarjeta && col("okey") % 2 === 0,
        (col("okey") % 50).cast("string")).as("lote"),
      when(col("partition").isin(MethodEfectivo, MethodOtros) &&
        col("okey") % 3 === 0, true).as("verificado"),
      col("okey"))
  }

  /** In-window TRANSFERENCIA sales — the J6 reconciliation target side. */
  def transfersInWindow(s: SparkSession, d: String): DataFrame =
    baseSales(s, d)
      .filter(col("fecha").between(lit(WindowStart), lit(WindowEnd)))
      .filter(col("metodo") === MethodTransferencia)
      .select(col("folio"), col("fecha"), col("monto"), col("okey"))

  /** Synthetic bank statement: in-window transfers with jittered dates and
    * amounts (a ±0.005 in-tolerance wobble, a +50 no-match outlier). */
  def bankStatement(s: SparkSession, d: String): DataFrame =
    transfersInWindow(s, d).select(
      col("okey").as("bank_row_id"),
      date_add(col("fecha"), (col("okey") % 5 - 2).cast("int")).as("dia"),
      (col("monto") + when(col("okey") % 41 === 0, 0.005)
        .when(col("okey") % 43 === 0, 50.0).otherwise(0.0)).as("abono"))

  // ------------------------------------------------------------ SQL mirror

  private val ServicioSql =
    """CASE cast(okey % 4 AS int) WHEN 0 THEN 'tapete chico'
      |  WHEN 1 THEN 'Sala 3 piezas' WHEN 2 THEN 'Aveo'
      |  ELSE 'sillon 3 plazas' END""".stripMargin
  private val ClienteSql = "'cliente-' || cast(okey % 500 AS varchar)"

  /** WITH-clause body shared by every sync oracle: source, state, dedup,
    * full-outer join, change bitmap, action routing — the SQL mirror of
    * [[SyncEngine.run]] over this fixture. */
  val DeltaCtes: String =
    s"""classified AS (
       |  SELECT *,
       |    ${ScalarQueries.ClassifySql.replace("\n", " ")} AS metodo
       |  FROM (${ScalarQueries.SalesSql.replace("\n", " ")})),
       |src_base AS (
       |  SELECT okey*2 AS ord, folio, fecha,
       |         $ClienteSql AS cliente, $ServicioSql AS servicio,
       |         banco, monto, metodo, okey
       |  FROM classified
       |  WHERE fecha BETWEEN DATE '$WindowStart' AND DATE '$WindowEnd'
       |    AND okey % 19 <> 0),
       |src AS (
       |  SELECT * FROM src_base
       |  UNION ALL
       |  SELECT okey*2+1 AS ord, folio, fecha, cliente, servicio, banco,
       |         monto + 50.0 AS monto, metodo, okey
       |  FROM src_base WHERE okey % 101 = 0),
       |st_base AS (
       |  SELECT *,
       |    CASE WHEN okey % 13 = 0 THEN
       |      (CASE metodo WHEN 'TRANSFERENCIA' THEN 'TARJETA'
       |        WHEN 'TARJETA' THEN 'EFECTIVO' WHEN 'EFECTIVO' THEN 'OTROS'
       |        ELSE 'TRANSFERENCIA' END)
       |    ELSE metodo END AS part
       |  FROM classified
       |  WHERE fecha >= DATE '$StateStart' AND okey % 11 <> 0),
       |st AS (
       |  SELECT part AS partition, folio,
       |    CASE WHEN okey % 31 = 0 THEN fecha + 1 ELSE fecha END AS fecha,
       |    CASE WHEN okey % 23 = 0 THEN 'otro cliente'
       |         ELSE $ClienteSql END AS cliente,
       |    $ServicioSql AS servicio,
       |    CASE WHEN okey % 17 = 0 THEN 'HSBC' ELSE banco END AS banco,
       |    monto + CASE WHEN okey % 7 = 0 THEN 5.0
       |                 WHEN okey % 29 = 0 THEN 0.005 ELSE 0.0 END AS monto,
       |    CASE WHEN part = 'TRANSFERENCIA' AND okey % 3 = 0 THEN true END
       |      AS conciliado,
       |    CASE WHEN part = 'TRANSFERENCIA' AND okey % 9 = 0
       |      THEN 'SPEI RECIBIDO' END AS concepto_banco,
       |    CASE WHEN okey % 5 = 0 THEN 'revisado' END AS observaciones,
       |    CASE WHEN part = 'TARJETA' AND okey % 3 = 0 THEN true END AS recibo,
       |    CASE WHEN part = 'TARJETA' AND okey % 9 = 0 THEN '4771419' END
       |      AS afiliacion,
       |    CASE WHEN part = 'TARJETA' AND okey % 2 = 0
       |      THEN cast(okey % 50 AS varchar) END AS lote,
       |    CASE WHEN part IN ('EFECTIVO', 'OTROS') AND okey % 3 = 0
       |      THEN true END AS verificado,
       |    okey
       |  FROM st_base),
       |sd AS (
       |  SELECT *, row_number() OVER (PARTITION BY folio ORDER BY ord) AS rn
       |  FROM src),
       |s AS (
       |  SELECT folio AS s_folio, fecha AS s_fecha, cliente AS s_cliente,
       |         servicio AS s_servicio, banco AS s_banco, monto AS s_monto,
       |         metodo AS s_metodo
       |  FROM sd WHERE rn = 1),
       |e AS (
       |  SELECT partition AS e_partition, folio AS e_folio, fecha AS e_fecha,
       |         cliente AS e_cliente, servicio AS e_servicio,
       |         banco AS e_banco, monto AS e_monto,
       |         conciliado AS e_conciliado,
       |         concepto_banco AS e_concepto_banco,
       |         observaciones AS e_observaciones, recibo AS e_recibo,
       |         afiliacion AS e_afiliacion, lote AS e_lote,
       |         verificado AS e_verificado
       |  FROM st),
       |j AS (SELECT * FROM s FULL OUTER JOIN e ON s_folio = e_folio),
       |delta AS (
       |  SELECT *,
       |    CASE WHEN e_folio IS NULL THEN 'NUEVO'
       |         WHEN s_folio IS NULL THEN
       |           CASE WHEN e_fecha BETWEEN DATE '$WindowStart'
       |                  AND DATE '$WindowEnd'
       |                THEN 'ELIMINACIÓN DETECTADA' ELSE 'FUERA_VENTANA' END
       |         WHEN s_metodo <> e_partition THEN
       |           CASE WHEN $ManualWorkSql
       |                THEN 'CONFLICTO → REVISIÓN'
       |                ELSE 'CAMBIO MÉTODO PAGO' END
       |         WHEN chg_fecha OR chg_cliente OR chg_servicio OR chg_monto
       |              OR chg_banco THEN 'ACTUALIZACIÓN'
       |         ELSE 'SIN_CAMBIOS' END AS action
       |  FROM (
       |    SELECT *,
       |      NOT (s_fecha IS NOT DISTINCT FROM e_fecha) AS chg_fecha,
       |      NOT (s_cliente IS NOT DISTINCT FROM e_cliente) AS chg_cliente,
       |      NOT (s_servicio IS NOT DISTINCT FROM e_servicio) AS chg_servicio,
       |      coalesce(abs(s_monto - e_monto) >= 0.01, false) AS chg_monto,
       |      coalesce(e_partition = 'TRANSFERENCIA'
       |        AND NOT (s_banco IS NOT DISTINCT FROM e_banco), false)
       |        AS chg_banco
       |    FROM j))""".stripMargin

  /** C3 predicate over the `e_*` columns (mirror of SyncEngine.manualWork). */
  lazy val ManualWorkSql: String =
    """(CASE WHEN e_partition = 'TRANSFERENCIA' THEN
      |   coalesce(e_conciliado, false)
      |   OR coalesce(trim(e_concepto_banco) <> '', false)
      |   OR coalesce(trim(e_observaciones) <> '', false)
      | WHEN e_partition = 'TARJETA' THEN
      |   coalesce(e_recibo, false)
      |   OR coalesce(trim(e_afiliacion) <> '', false)
      |   OR coalesce(trim(e_lote) <> '', false)
      |   OR coalesce(trim(e_observaciones) <> '', false)
      | ELSE
      |   coalesce(e_verificado, false)
      |   OR coalesce(trim(e_observaciones) <> '', false) END)"""
      .stripMargin.replace("\n", " ")
}
