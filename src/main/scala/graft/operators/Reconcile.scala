package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J6 — bank-statement reconciliation match (SURVEY.md §2.3): the one join
  * the reference leaves to a human (`GUIA_REVISION_PENDIENTE.md`; xlsx
  * sheet `Banco` col F holds the manually matched folio). Expressed as a
  * tolerance range join: a statement row matches a reconciliation row when
  * the amount agrees within ±tolerance and the dates are within ±maxDays;
  * the best candidate (smallest date distance, then lowest folio) wins.
  *
  * Scale shape: an equi-join on the banded amount key (cents bucket) plus
  * residual range predicates — NOT a cross join. Banding turns the theta
  * join into a shuffle join on `amount_bucket`, each side exploding to at
  * most 3 buckets, so 100 TB of statements still co-partitions with the
  * reconciliation table instead of broadcasting everything.
  */
object Reconcile {

  /** Match statement rows to reconciliation rows. `bank` needs
    * (bank_row_id, dia, abono); `recon` needs (folio, fecha, monto).
    * Returns one best match per bank row + unmatched rows with null folio. */
  def matchStatements(bank: DataFrame, recon: DataFrame,
      tolerance: Double = 0.01, maxDays: Int = 3): DataFrame = {
    // band amounts to cents buckets; a ±tolerance window can only span two
    // adjacent buckets, so probing bucket-1/bucket/bucket+1 is exhaustive
    val bucket = (c: Column) => round(c * 100).cast("long")
    val b = bank.select(col("bank_row_id"), col("dia"), col("abono"),
      bucket(col("abono")).as("bk"))
    val r = recon.select(col("folio"), col("fecha"), col("monto"))
      .withColumn("bk0", bucket(col("monto")))
      .select(col("folio"), col("fecha"), col("monto"),
        explode(array(col("bk0") - 1, col("bk0"), col("bk0") + 1)).as("bk"))

    val cand = b.join(r, Seq("bk"))
      .filter(abs(col("abono") - col("monto")) <= tolerance &&
        abs(datediff(col("dia"), col("fecha"))) <= maxDays)
      .withColumn("ddiff", abs(datediff(col("dia"), col("fecha"))))
    val w = Window.partitionBy(col("bank_row_id"))
      .orderBy(col("ddiff"), col("folio"))
    val best = cand.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("bank_row_id"), col("folio"), col("fecha"),
        col("monto"), col("ddiff"))

    bank.select(col("bank_row_id"), col("dia"), col("abono"))
      .join(best, Seq("bank_row_id"), "left")
  }
}
