package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Schema-on-read over semi-structured payload columns: the JSON `props`
  * string carried by every event. `from_json` with an explicit schema is
  * the idiomatic Spark shape — one parse per row at scan speed, typed
  * columns out, malformed rows become NULLs instead of exceptions
  * (PERMISSIVE mode), so a poison payload can never kill a 100 TB job.
  * Schema evolution = widen the `StructType`; absent keys read as NULL.
  */
object SemiStructured {

  /** The events payload: `{"k": <int>}`. */
  val PropsSchema: StructType = StructType(Seq(StructField("k", IntegerType)))

  /** Typed extraction of `props.k` (NULL on malformed/missing). */
  def propsK(props: Column): Column =
    from_json(props, PropsSchema).getField("k")

  /** Per-event-type stats over the extracted payload field: parse rows,
    * pull `k`, aggregate — count, parsed count, mean/max of `k`. One
    * map-side-combining shuffle on the (tiny) type key. */
  def propsStats(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), propsK(col("props")).as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("k")).as("n_parsed"),
        // basis points: avg of integers can half-tie at 4 decimals
        (round(avg(col("k")) * 10000) / 10000.0).as("mean_k"),
        max(col("k")).as("max_k"))
}
