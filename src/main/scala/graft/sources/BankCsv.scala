package graft.sources

import graft.functions.Exprs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bank-statement CSV source — the `Banco` sheet (xlsx sheet 2: Día,
  * Concepto / Referencia, cargo, Abono, Saldo, Folio) as the bank-export
  * file it really is. Everything arrives as text (banks format money with
  * `$`/commas and dates every which way), so the read composes the scalar
  * parse layer with rejected-rows containment: a row whose Día AND Abono
  * are both unparseable lands in the quarantine frame with a reason, and
  * what comes out clean is directly the [[graft.operators.Reconcile]]
  * statement side (bank_row_id, dia, abono) plus the pass-through text
  * columns. */
object BankCsv {

  /** Everything-as-text landing schema: parse decisions belong to the
    * typed layer, not the CSV reader. */
  val RawSchema: StructType = StructType(Seq(
    StructField("dia_raw", StringType),
    StructField("concepto", StringType),
    StructField("cargo_raw", StringType),
    StructField("abono_raw", StringType),
    StructField("saldo_raw", StringType),
    StructField("folio", StringType)))

  /** Read a statement CSV → (clean, rejected). Clean rows carry a
    * deterministic `bank_row_id`: row number over (día, saldo asc,
    * concepto), with NULL-día salvage rows (bad date, parseable abono)
    * ranked last. For a deposits-only statement the running Saldo grows
    * within a day, so this tracks export order; with cargos mixed in the
    * balance is non-monotonic and the id is just an arbitrary-but-stable
    * key — downstream joins ([[graft.operators.Reconcile]]) only need
    * determinism, never the bank's physical row order. */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val raw = spark.read
      .option("header", "true")
      .schema(RawSchema)
      .csv(path)
    val parsed = raw
      .withColumn("dia", parseDateFlexible(col("dia_raw")))
      .withColumn("abono_opt", parseMoneyOpt(col("abono_raw")))
    val rejected = parsed
      .filter(col("dia").isNull && col("abono_opt").isNull)
      .select(col("dia_raw"), col("concepto"), col("abono_raw"),
        col("folio"),
        lit("día y abono ilegibles").as("motivo_rechazo"))
    val clean = parsed
      .filter(col("dia").isNotNull || col("abono_opt").isNotNull)
      .withColumn("abono", coalesce(col("abono_opt"), lit(0).cast(Money)))
      .withColumn("cargo", parseMoney(col("cargo_raw")))
      .withColumn("saldo", parseMoney(col("saldo_raw")))
      .withColumn("bank_row_id", row_number().over(
        Window.orderBy(col("dia").asc_nulls_last, col("saldo"),
          col("concepto")))
        .cast("long"))
      .select(col("bank_row_id"), col("dia"), col("concepto"),
        col("cargo"), col("abono"), col("saldo"), col("folio"))
    (clean, rejected)
  }
}
