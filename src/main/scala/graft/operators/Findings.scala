package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The workbook-only human-review tables (SURVEY.md §1.2 end): `cat`, the
  * incidence-type catalog (xlsx sheet 3), and `📢 Bitácora_Hallazgos`, the
  * findings log (xlsx sheet 6: Fecha Reporte, Tipo de Hallazgo, Folio,
  * Urgencia, Descripción, Estado, Resolución).
  *
  * Spark-first shape: the catalog is a tiny broadcast dimension; the
  * findings log is an append-only sink (same discipline as the audit log),
  * and the one finding class the data itself can derive — "Discrepancia
  * entre reporte y deposito", a reported sale with no bank deposit — falls
  * out of the J6 reconciliation as an anti-join against the matched folios.
  */
object Findings {

  /** The `cat` sheet's incidence types, id'd in sheet order + catch-all. */
  val IncidenceTypes: Seq[(Int, String)] = Seq(
    1 -> "Falta evidencia (nota de venta)",
    2 -> "Nota de venta ilegible",
    3 -> "Falta comprobante de pago",
    4 -> "Comprobante incorrecto",
    5 -> "Método de pago incorrecto",
    6 -> "Discrepancia entre reporte y deposito",
    7 -> "Falta de carga de evidencia",
    8 -> "Otro")

  /** The `cat` sheet's workflow states (L column). */
  val Estados: Seq[String] =
    Seq("Pendiente", "En progreso", "Revisar nuevamente", "Resuelto")

  /** The catalog as a broadcastable dimension table. */
  def catalog(spark: SparkSession): DataFrame = {
    import spark.implicits._
    IncidenceTypes.toDF("tipo_id", "tipo")
  }

  /** Bitácora findings for reported sales the bank never deposited: every
    * reconciliation row whose folio won no statement match becomes one
    * Pendiente finding. `matched` is [[Reconcile.matchStatements]] output;
    * `recon` the reconciliation side it matched against. The catalog join
    * broadcasts (8 rows); urgency is a deterministic amount rule. */
  def unmatchedDeposits(matched: DataFrame, recon: DataFrame): DataFrame = {
    val spark = recon.sparkSession
    val matchedFolios =
      matched.filter(col("folio").isNotNull).select(col("folio")).distinct()
    recon.join(matchedFolios, Seq("folio"), "left_anti")
      .withColumn("tipo", lit("Discrepancia entre reporte y deposito"))
      .join(broadcast(catalog(spark)), Seq("tipo"), "left")
      .select(
        col("fecha").as("fecha_reporte"),
        col("tipo_id"), col("tipo"), col("folio"),
        when(col("monto") >= 1000, lit("🔥 ALTA")).otherwise(lit("MEDIA"))
          .as("urgencia"),
        lit("El pago no está en el banco").as("descripcion"),
        lit(Estados.head).as("estado"),
        lit(null).cast("string").as("resolucion"))
  }
}
