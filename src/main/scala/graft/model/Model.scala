package graft.model

import java.sql.Date

/** Typed core of the data model (SURVEY.md §1.2).
  *
  * One wide state schema covers the four destination partitions
  * (reference: four sheets, `Code.gs:25-28`); `partition` holds the payment
  * method the row currently lives under, and the protected human-owned
  * columns (`requerimientos.md:113-120`) are nullable — each partition type
  * uses its own subset (`Code.gs:302-312`, `368-378`, `408-416`, `443-452`).
  */
final case class SaleRecord(
    ord: Long, // explicit scan order — first-wins dedup is order-defined
    folio: String,
    fecha: Date,
    cliente: String,
    servicio: String,
    banco: String,
    monto: java.math.BigDecimal,
    metodoRaw: String)

final case class StateRow(
    partition: String, // TRANSFERENCIA | TARJETA | EFECTIVO | OTROS
    folio: String,
    fecha: Date,
    cliente: String,
    servicio: String,
    banco: String,
    monto: java.math.BigDecimal,
    // protected zone — script must pass these through verbatim
    conciliado: Option[Boolean],
    conceptoBanco: Option[String],
    observaciones: Option[String],
    recibo: Option[Boolean],
    afiliacion: Option[String],
    lote: Option[String],
    verificado: Option[Boolean])

object Actions {
  val Nuevo = "NUEVO"
  val Actualizacion = "ACTUALIZACIÓN"
  val SinCambios = "SIN_CAMBIOS"
  val CambioMetodo = "CAMBIO MÉTODO PAGO"
  val Conflicto = "CONFLICTO → REVISIÓN"
  val Eliminacion = "ELIMINACIÓN DETECTADA"
  val Duplicado = "DUPLICADO EN ORIGEN"
  val FueraVentana = "FUERA_VENTANA" // state untouched, outside scan window
}
