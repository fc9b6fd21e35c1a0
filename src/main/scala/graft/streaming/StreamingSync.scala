package graft.streaming

import graft.operators.SyncEngine
import graft.sources.StateStore
import org.apache.spark.sql.{DataFrame, Encoder, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming face of the engine (SURVEY.md §2.7): the
  * reference's nightly trigger + 10-day lookback is a micro-batch
  * incremental sync in disguise, so the streaming variant is `readStream` →
  * `foreachBatch(sync)`, with the lookback window re-derived per batch from
  * the batch's own event dates.
  *
  * State lives in the [[StateStore]] parquet table (read → merge →
  * overwrite per micro-batch), which is exactly the reference's
  * read-the-sheets-each-run model; watermarked windowed aggregation covers
  * the `totales`-style continuous views.
  */
object StreamingSync {

  /** Windowed aggregation over an event stream with late-data tolerance:
    * the continuous version of the per-day SUMIFS view. */
  def windowedTotals(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours", tsCol: String = "ts",
      valueCol: String = "value", keyCol: String = "event_type"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast(DecimalType(18, 2))).as("total"))

  /** D1/D2 as CUSTOM streaming state: first-wins key dedup across
    * micro-batches. Within a batch the lowest `ord` wins (the reference's
    * scan order, `Code.gs:752-765`); across batches the first batch to
    * see a key wins, so a re-delivered or duplicated row in any later
    * batch is dropped. This is the `KeyValueGroupedDataset.
    * flatMapGroupsWithState` path — per-key state (the winning ord) that
    * no built-in streaming operator expresses; state is one long per key,
    * sharded by the groupBy hash, no driver-side anything. */
  def dedupFirstWinsStream(source: DataFrame, keyCol: String = "folio",
      ordCol: String = "ord"): DataFrame = {
    val spark = source.sparkSession
    import spark.implicits._
    implicit val rowEnc: Encoder[Row] = ExpressionEncoder(source.schema)
    val ki = source.schema.fieldIndex(keyCol)
    val oi = source.schema.fieldIndex(ordCol)
    source.groupByKey(_.getString(ki))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[Row], st: GroupState[Long]) =>
          if (st.exists) Iterator.empty // key won in an earlier batch
          else {
            val winner = rows.minBy(_.getLong(oi))
            st.update(winner.getLong(oi))
            Iterator.single(winner)
          })
      .toDF(source.columns: _*)
  }

  /** Bounded-state streaming dedup: duplicate keys are dropped while
    * they are within the watermark, and the per-key state is EVICTED
    * once the watermark passes — the infinite-stream answer to
    * [[dedupFirstWinsStream]]'s grows-forever seen-set. Exact within
    * `delay`; a duplicate arriving after its key's state was evicted
    * re-emits, which is the standard at-least-once contract — every
    * sink downstream here tolerates it because the sync upsert is
    * idempotent (SyncEngineSpec's fixpoint property). Eviction runs on
    * the micro-batch AFTER the watermark passes a key's expiry (the
    * spec pins the timing). At 100 TB of events the difference is
    * state ∝ keys-per-delay-window instead of state ∝ all keys ever
    * seen. */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
      tsCol: String = "ts", delay: String = "2 hours"): DataFrame =
    events.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Incremental sync as a streaming sink: every micro-batch of source rows
    * is synced against the persistent state with a `lookbackDays` window
    * ending at the batch's max event date (the reference's
    * `DIAS_LOOKBACK` re-scan, continuously). */
  def syncSink(source: DataFrame, statePath: String, auditPath: String,
      conflictPath: String, lookbackDays: Int = 10,
      checkpoint: String): StreamingQuery =
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        runBatch(batch, statePath, auditPath, conflictPath, lookbackDays)
      }
      .start()

  /** One micro-batch: window from the batch's own dates, sync, persist. */
  def runBatch(batch: DataFrame, statePath: String, auditPath: String,
      conflictPath: String, lookbackDays: Int): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val end = batch.agg(max(col("fecha"))).collect().head.getDate(0)
    val start = java.sql.Date.valueOf(end.toLocalDate.minusDays(lookbackDays))
    val state = StateStore.readOrCreate(spark, statePath)
    val r = SyncEngine.run(batch, state, start.toString, end.toString)
    // no lineage break: overwrite stages the full frame under a tmp path
    // while the live state still exists, then swaps (see SyncApp.sync)
    val next = r.newState
      .select(StateStore.StateSchema.fieldNames.map(col): _*)
    StateStore.append(r.audit, auditPath)
    StateStore.append(r.conflicts, conflictPath)
    StateStore.overwrite(next, statePath)
  }
}
