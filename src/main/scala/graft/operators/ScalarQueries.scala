package graft.operators

import graft.Tables
import graft.functions.Exprs._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-facing queries for the scalar layer (SURVEY.md §2.2) plus the
  * simple scan/enrichment operators S1/S10-ish, each with a DuckDB oracle.
  *
  * The TPC-H-ish `orders` table stands in for the reference's `operaciones`
  * sales fact (FIXTURES.md §5): o_orderkey ↔ folio, o_orderdate ↔ fecha,
  * o_totalprice ↔ monto, a deterministic o_orderpriority mapping ↔ the free-
  * text metodo_pago, o_orderstatus ↔ banco. The derivation is part of each
  * query on BOTH sides (Spark and SQL) so results stay hash-comparable.
  */
object ScalarQueries {

  /** Spark side of the shared sales-fact derivation. */
  def sales(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.select(
      o("o_orderkey").cast("string").as("folio"),
      to_date(o("o_orderdate")).as("fecha"),
      o("o_totalprice").as("monto"),
      rawMethod(o("o_orderpriority")).as("metodo_raw"),
      rawBank(o("o_orderstatus")).as("banco"),
      o("o_orderkey").as("okey"))
  }

  /** Free-text payment method synthesized from o_orderpriority — exercises
    * the classifier's contains/case-insensitivity/empty-default paths. */
  def rawMethod(pri: Column): Column =
    when(pri === "1-URGENT", lit("Transferencia SPEI"))
      .when(pri === "2-HIGH", lit("tarjeta de credito"))
      .when(pri === "3-MEDIUM", lit("EFECTIVO"))
      .when(pri === "4-NOT SPECIFIED", lit(""))
      .otherwise(lit("cheque"))

  def rawBank(st: Column): Column =
    when(st === "O", lit("BANCOMER"))
      .when(st === "F", lit("SANTANDER"))
      .otherwise(lit("BANAMEX"))

  /** SQL fragment mirroring [[rawMethod]]/[[rawBank]] for the oracle. */
  val SalesSql: String =
    """SELECT cast(o_orderkey AS varchar) AS folio,
      |       cast(o_orderdate AS date) AS fecha,
      |       o_totalprice AS monto,
      |       CASE o_orderpriority
      |         WHEN '1-URGENT' THEN 'Transferencia SPEI'
      |         WHEN '2-HIGH' THEN 'tarjeta de credito'
      |         WHEN '3-MEDIUM' THEN 'EFECTIVO'
      |         WHEN '4-NOT SPECIFIED' THEN ''
      |         ELSE 'cheque' END AS metodo_raw,
      |       CASE o_orderstatus WHEN 'O' THEN 'BANCOMER'
      |         WHEN 'F' THEN 'SANTANDER' ELSE 'BANAMEX' END AS banco,
      |       o_orderkey AS okey
      |FROM orders""".stripMargin

  val ClassifySql: String =
    """CASE WHEN upper(metodo_raw) LIKE '%TRANSFERENCIA%' THEN 'TRANSFERENCIA'
      |     WHEN upper(metodo_raw) LIKE '%TARJETA%' THEN 'TARJETA'
      |     WHEN upper(metodo_raw) LIKE '%EFECTIVO%' THEN 'EFECTIVO'
      |     ELSE 'OTROS' END""".stripMargin

  // ---------------------------------------------------------------- queries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p2_classify_method" -> ((s, d) =>
      sales(s, d)
        .groupBy(classifyMethod(col("metodo_raw")).as("metodo"))
        .agg(count(lit(1)).as("n"))),

    "p3_date_window" -> ((s, d) =>
      sales(s, d)
        .filter(col("fecha").between(lit("2001-06-01"), lit("2001-08-01")))
        .select(col("folio"), col("fecha"))),

    "p4_null_key_filter" -> ((s, d) =>
      sales(s, d)
        .withColumn("folio2",
          when(col("okey") % 97 === 0, lit("  "))
            .when(col("okey") % 89 === 0, lit(""))
            .otherwise(col("folio")))
        .filter(length(trim(col("folio2"))) > 0)
        .select(col("folio2").as("folio"))),

    "p5_parse_date_flexible" -> ((s, d) =>
      sales(s, d)
        .withColumn("raw",
          when(col("okey") % 7 === 0, lit("not-a-date"))
            .when(col("okey") % 2 === 0, date_format(col("fecha"), "d/M/yyyy"))
            .otherwise(date_format(col("fecha"), "yyyy-MM-dd")))
        .select(col("folio"), parseDateFlexible(col("raw")).as("fecha"))),

    "p6_parse_money" -> ((s, d) =>
      sales(s, d)
        .withColumn("raw",
          when(col("okey") % 11 === 0, lit("N/A"))
            .when(col("okey") % 3 === 0,
              concat(lit("\"$"), format_number(col("monto"), 2), lit("\"")))
            .when(col("okey") % 3 === 1,
              concat(lit("$"), format_number(col("monto"), 2)))
            .otherwise(col("monto").cast("string")))
        // decimal internally, double in the final projection: the driver
        // hashes typed values as-is and Decimal('1.40') != 1.4 cross-engine
        .select(col("folio"), parseMoney(col("raw")).cast("double").as("monto"))),

    "p7_clean_string" -> ((s, d) => {
      val c = Tables.customer(s, d)
      c.select(
        c("c_custkey"),
        cleanString(
          when(c("c_custkey") % 5 === 0, concat(lit("\""), c("c_name"), lit("\"")))
            .when(c("c_custkey") % 7 === 0, lit(null).cast("string"))
            .when(c("c_custkey") % 3 === 0, concat(lit("  \""), c("c_name"), lit("\nsegunda linea\"  ")))
            .otherwise(c("c_name"))).as("cliente"))
    }),

    "p8_money_tolerance" -> ((s, d) =>
      sales(s, d)
        .withColumn("monto_b",
          col("monto") + when(col("okey") % 4 === 0, lit(0.005))
            .when(col("okey") % 4 === 1, lit(0.02))
            .when(col("okey") % 4 === 2, lit(-0.005))
            .otherwise(lit(0.0)))
        .select(col("folio"), moneyEq(col("monto"), col("monto_b")).as("igual"))),

    "p9_date_eq_nullsafe" -> ((s, d) =>
      sales(s, d)
        .withColumn("fecha_b",
          when(col("okey") % 3 === 0, lit(null).cast("date"))
            .when(col("okey") % 3 === 1, col("fecha"))
            .otherwise(date_add(col("fecha"), 1)))
        .withColumn("fecha_a",
          when(col("okey") % 5 === 0, lit(null).cast("date")).otherwise(col("fecha")))
        .select(col("folio"), dateEq(col("fecha_a"), col("fecha_b")).as("igual"))),

    "p10_format_fecha" -> ((s, d) =>
      sales(s, d).select(col("folio"), formatFechaDMY(col("fecha")).as("fecha_str"))),

    "p11_spanish_month" -> ((s, d) =>
      sales(s, d)
        .groupBy(year(col("fecha")).as("anio"), spanishMonth(col("fecha")).as("mes"))
        .agg(count(lit(1)).as("n"))),

    "p12_bool_coerce" -> ((s, d) =>
      sales(s, d)
        .withColumn("raw",
          when(col("okey") % 4 === 0, lit("TRUE"))
            .when(col("okey") % 4 === 1, lit("true"))
            .when(col("okey") % 4 === 2, lit("FALSE"))
            .otherwise(lit(null).cast("string")))
        .select(col("folio"), coerceBool(col("raw")).as("marcado"))),

    "p13_default_fill" -> ((s, d) =>
      sales(s, d)
        .withColumn("raw",
          when(col("okey") % 3 === 0, lit(null).cast("string"))
            .when(col("okey") % 3 === 1, lit("   "))
            .otherwise(col("metodo_raw")))
        .select(col("folio"), defaultFill(col("raw")).as("metodo_pago"))),

    // S1 — month-partition scan: derive the month partition key and keep only
    // two partitions (partition pruning happens on the month key at scale).
    "s1_month_scan" -> ((s, d) =>
      sales(s, d)
        .withColumn("mes", spanishMonth(col("fecha")))
        .filter(year(col("fecha")) === 2001 && col("mes").isin("Junio", "Julio"))
        .groupBy(col("mes"))
        .agg(count(lit(1)).as("n"),
          sum(col("monto").cast(Money)).cast("double").as("total"))),

    // S4 containment — rejected-rows quarantine from prepareSource: rows
    // whose fecha AND monto are both unparseable never reach the sink.
    "s4_rejected_rows" -> ((s, d) => {
      val raw = sales(s, d).select(
        col("folio"),
        when(col("okey") % 13 === 0, lit("sin fecha"))
          .when(col("okey") % 7 === 0, lit("fecha pendiente"))
          .otherwise(date_format(col("fecha"), "d/M/yyyy")).as("fecha_raw"),
        when(col("okey") % 13 === 0, lit("N/A"))
          .when(col("okey") % 11 === 0, lit("--"))
          .otherwise(col("monto").cast("string")).as("monto_raw"))
      SyncEngine.prepareSource(raw)._2
    }),

    // S10/J4 — catalog enrichment: broadcast join against the customer dim to
    // derive a folder-URL column (reference: Drive folder lookup).
    "s10_catalog_enrich" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
        .select(
          o("o_orderkey").cast("string").as("folio"),
          concat_ws("/", lit("https://folders.example"),
            c("c_name")).as("folio_url"))
    })
  )

  // ----------------------------------------------------------------- oracles

  val oracleSql: Map[String, String] = Map(
    "p2_classify_method" ->
      s"""SELECT $ClassifySql AS metodo, count(*) AS n
         |FROM ($SalesSql) GROUP BY 1""".stripMargin,

    "p3_date_window" ->
      s"""SELECT folio, fecha FROM ($SalesSql)
         |WHERE fecha BETWEEN DATE '2001-06-01' AND DATE '2001-08-01'""".stripMargin,

    "p4_null_key_filter" ->
      s"""SELECT folio FROM (
         |  SELECT CASE WHEN okey % 97 = 0 THEN '  '
         |              WHEN okey % 89 = 0 THEN ''
         |              ELSE folio END AS folio
         |  FROM ($SalesSql))
         |WHERE length(trim(folio)) > 0""".stripMargin,

    "p5_parse_date_flexible" ->
      s"""SELECT folio,
         |  coalesce(cast(try_strptime(raw, '%-d/%-m/%Y') AS date),
         |           try_cast(raw AS date)) AS fecha
         |FROM (
         |  SELECT folio,
         |    CASE WHEN okey % 7 = 0 THEN 'not-a-date'
         |         WHEN okey % 2 = 0 THEN strftime(fecha, '%-d/%-m/%Y')
         |         ELSE strftime(fecha, '%Y-%m-%d') END AS raw
         |  FROM ($SalesSql))""".stripMargin,

    "p6_parse_money" ->
      s"""SELECT folio,
         |  cast(coalesce(try_cast(regexp_replace(raw, '[$$",\\s]', '', 'g') AS decimal(12,2)),
         |           cast(0 AS decimal(12,2))) AS double) AS monto
         |FROM (
         |  SELECT folio,
         |    CASE WHEN okey % 11 = 0 THEN 'N/A'
         |         WHEN okey % 3 = 0 THEN '"$$' || fmt || '"'
         |         WHEN okey % 3 = 1 THEN '$$' || fmt
         |         ELSE cast(monto AS varchar) END AS raw
         |  FROM (
         |    SELECT folio, okey, monto,
         |      format('{:,}', cents // 100) || '.' ||
         |        lpad(cast(cents % 100 AS varchar), 2, '0') AS fmt
         |    FROM (SELECT folio, okey, monto,
         |            cast(round(monto * 100) AS bigint) AS cents
         |          FROM ($SalesSql))))""".stripMargin,

    "p7_clean_string" ->
      """SELECT c_custkey,
        |  coalesce(trim(regexp_replace(trim(raw), '^"(.*)"$', '\1', 's')), '') AS cliente
        |FROM (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 5 = 0 THEN '"' || c_name || '"'
        |         WHEN c_custkey % 7 = 0 THEN NULL
        |         WHEN c_custkey % 3 = 0 THEN '  "' || c_name || chr(10) || 'segunda linea"  '
        |         ELSE c_name END AS raw
        |  FROM customer)""".stripMargin,

    "p8_money_tolerance" ->
      s"""SELECT folio, abs(monto - monto_b) < 0.01 AS igual
         |FROM (
         |  SELECT folio, monto,
         |    monto + CASE WHEN okey % 4 = 0 THEN 0.005
         |                 WHEN okey % 4 = 1 THEN 0.02
         |                 WHEN okey % 4 = 2 THEN -0.005
         |                 ELSE 0.0 END AS monto_b
         |  FROM ($SalesSql))""".stripMargin,

    "p9_date_eq_nullsafe" ->
      s"""SELECT folio, fecha_a IS NOT DISTINCT FROM fecha_b AS igual
         |FROM (
         |  SELECT folio,
         |    CASE WHEN okey % 5 = 0 THEN NULL ELSE fecha END AS fecha_a,
         |    CASE WHEN okey % 3 = 0 THEN NULL
         |         WHEN okey % 3 = 1 THEN fecha
         |         ELSE fecha + INTERVAL 1 DAY END AS fecha_b
         |  FROM ($SalesSql))""".stripMargin,

    "p10_format_fecha" ->
      s"""SELECT folio, strftime(fecha, '%-d/%-m/%Y') AS fecha_str
         |FROM ($SalesSql)""".stripMargin,

    "p11_spanish_month" ->
      s"""SELECT extract(year FROM fecha) AS anio,
         |  CASE extract(month FROM fecha)
         |    WHEN 1 THEN 'Enero' WHEN 2 THEN 'Febrero' WHEN 3 THEN 'Marzo'
         |    WHEN 4 THEN 'Abril' WHEN 5 THEN 'Mayo' WHEN 6 THEN 'Junio'
         |    WHEN 7 THEN 'Julio' WHEN 8 THEN 'Agosto' WHEN 9 THEN 'Septiembre'
         |    WHEN 10 THEN 'Octubre' WHEN 11 THEN 'Noviembre'
         |    ELSE 'Diciembre' END AS mes,
         |  count(*) AS n
         |FROM ($SalesSql) GROUP BY 1, 2""".stripMargin,

    "p12_bool_coerce" ->
      s"""SELECT folio,
         |  coalesce(trim(raw) IN ('true', 'TRUE'), false) AS marcado
         |FROM (
         |  SELECT folio,
         |    CASE WHEN okey % 4 = 0 THEN 'TRUE'
         |         WHEN okey % 4 = 1 THEN 'true'
         |         WHEN okey % 4 = 2 THEN 'FALSE'
         |         ELSE NULL END AS raw
         |  FROM ($SalesSql))""".stripMargin,

    "p13_default_fill" ->
      s"""SELECT folio,
         |  CASE WHEN raw IS NULL OR trim(raw) = '' THEN '(vacío)'
         |       ELSE trim(raw) END AS metodo_pago
         |FROM (
         |  SELECT folio,
         |    CASE WHEN okey % 3 = 0 THEN NULL
         |         WHEN okey % 3 = 1 THEN '   '
         |         ELSE metodo_raw END AS raw
         |  FROM ($SalesSql))""".stripMargin,

    "s1_month_scan" ->
      s"""SELECT mes, count(*) AS n,
         |  cast(sum(cast(monto AS decimal(12,2))) AS double) AS total
         |FROM (
         |  SELECT CASE extract(month FROM fecha)
         |      WHEN 6 THEN 'Junio' WHEN 7 THEN 'Julio' END AS mes, monto
         |  FROM ($SalesSql)
         |  WHERE extract(year FROM fecha) = 2001
         |    AND extract(month FROM fecha) IN (6, 7))
         |GROUP BY mes""".stripMargin,

    "s4_rejected_rows" ->
      s"""SELECT folio, fecha_raw, monto_raw,
         |  'fecha y monto ilegibles' AS motivo_rechazo
         |FROM (
         |  SELECT folio,
         |    CASE WHEN okey % 13 = 0 THEN 'sin fecha'
         |         WHEN okey % 7 = 0 THEN 'fecha pendiente'
         |         ELSE strftime(fecha, '%-d/%-m/%Y') END AS fecha_raw,
         |    CASE WHEN okey % 13 = 0 THEN 'N/A'
         |         WHEN okey % 11 = 0 THEN '--'
         |         ELSE cast(monto AS varchar) END AS monto_raw
         |  FROM ($SalesSql))
         |WHERE coalesce(cast(try_strptime(fecha_raw, '%-d/%-m/%Y') AS date),
         |        try_cast(fecha_raw AS date)) IS NULL
         |  AND try_cast(regexp_replace(monto_raw, '[$$",\\s]', '', 'g')
         |        AS decimal(12,2)) IS NULL""".stripMargin,

    "s10_catalog_enrich" ->
      """SELECT cast(o_orderkey AS varchar) AS folio,
        |  concat_ws('/', 'https://folders.example', c_name) AS folio_url
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey""".stripMargin
  )
}
