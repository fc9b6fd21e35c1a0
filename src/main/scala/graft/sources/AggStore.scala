package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.StoreFiles.{readText, writeText}

/** Incremental view maintenance for a keyed rollup: the materialized
  * aggregate persists as MERGEABLE partial-aggregate rows
  * `(day, event_type, cnt, total)` under the [[SnapshotDir]] commit
  * protocol, and a new batch of facts folds in by aggregating ONLY
  * the batch and summing it into the stored partials by key.
  *
  * This is the fourth persisted-state family (ANN index, fingerprint
  * store, tokenizer/LM model, now the rollup) and the one every
  * warehouse needs first: at 100 TB the history is never rescanned —
  * maintaining the view costs O(|batch|) + a keys-sized merge, and
  * the stored state is bounded by the key cardinality (days × types),
  * not the fact count. COUNT and SUM are algebraic, so partials merge
  * exactly; the sum rides a decimal so the merge is order-independent
  * (a double sum would drift by merge order and break replay
  * equality). Non-algebraic measures (e.g. distinct users) would
  * store a sketch state row instead — the same shape the frequency
  * sketches in `CorpusStats` already persist.
  *
  * The reference recomputes its `Cierres` closing totals from the
  * full sheet on every sync (`Code.gs:1545-1620`, `borrarDatos` +
  * re-append); this store is that view maintained incrementally.
  */
object AggStore {

  private val Prefix = "agg-"
  val FormatVersion = 3 // v3: total stored uniformly as decimal(28,2)

  /** The build-recipe marker content — public so observability
    * consumers ([[StoreCatalog]] oracles) can derive the expected
    * string from the same constants the builder stamps. */
  def recipe(baseTag: String): String =
    s"""{"v":$FormatVersion,"view":"daily_by_type","base":"$baseTag"}"""

  /** The stored sum type. Wide enough that overflow means ~10^26 in
    * summed value units; kept uniform across bootstrap and merge so
    * every version ships the identical schema. */
  private val StoredSum = DecimalType(28, 2)

  /** Cast a widened sum back to the stored scale, FAILING LOUDLY on
    * overflow: under non-ANSI semantics the cast silently yields
    * NULL, which would persist a corrupted total forever (the
    * maintained view has no recompute to heal it). The range check is
    * arithmetic, not a cast-NULL probe, so the store's contract and
    * message are the same whichever way `spark.sql.ansi.enabled`
    * points (ANSI would otherwise abort inside the cast itself). */
  private[graft] def toStored(c: Column): Column =
    when(c.isNull ||
        abs(c) < lit(new java.math.BigDecimal(
          java.math.BigInteger.TEN.pow(26))),
      c.cast(StoredSum))
      .otherwise(raise_error(
        lit("AggStore: total overflows decimal(28,2); widen StoredSum"))
        .cast(StoredSum))

  /** [[toStored]] with the non-ANSI silent-overflow hole closed: a
    * decimal SUM that overflows its own result scale returns NULL
    * under `spark.sql.ansi.enabled=false` BEFORE [[toStored]] ever
    * sees a value, and the isNull branch would persist it. A null sum
    * over a group that had `nonNull > 0` inputs can only mean that
    * overflow — abort. (Under ANSI the sum aborts on its own; this
    * keeps the contract mode-invariant.) */
  private[graft] def toStoredChecked(s: Column, nonNull: Column): Column =
    when(s.isNull && nonNull > 0L,
      raise_error(lit(
        "AggStore: decimal sum overflowed to NULL (non-ANSI); " +
          "widen the sum type")).cast(StoredSum))
      .otherwise(toStored(s))

  private def currentDir(spark: SparkSession, path: String): String =
    SnapshotDir.current(spark, path, Prefix).getOrElse(
      throw new IllegalStateException(
        s"no committed aggregate state under $path"))

  /** The partial-aggregate rows for a slice of facts: one row per
    * (day, event_type) with exactly-mergeable COUNT/SUM state. The
    * sum lands on the uniform [[StoredSum]] scale so every version
    * (bootstrap or append) persists the identical schema — schema
    * drift across versions is exactly what a state store must not
    * do — and the down-cast in [[toStored]] aborts on overflow
    * instead of persisting NULL. */
  def partials(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        toStoredChecked(sum(col("value").cast(DecimalType(18, 2))),
          count(col("value"))).as("total"))

  /** Merge two partial relations by key (sum of counts, sum of decimal
    * totals). Associative and commutative, so any fold order over any
    * batch split reproduces the full recompute exactly. */
  private def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("cnt")).as("cnt"),
        toStoredChecked(sum(col("total")), count(col("total")))
          .as("total"))

  /** Aggregate `events` and publish the partials as version 1. */
  def writeState(events: DataFrame, path: String,
      batchTag: Option[String] = None): Unit = {
    val spark = events.sparkSession
    SnapshotDir.withWriterLock(spark, path) {
      writeLocked(spark, path, partials(events), batchTag)
    }
    SnapshotDir.gc(spark, path, Prefix)
  }

  /** Claim→write→commit the next version. Caller holds the writer
    * lock (the lock is not reentrant, so every public entry takes it
    * exactly once around this body). */
  private def writeLocked(spark: SparkSession, path: String,
      state: DataFrame, batchTag: Option[String]): Unit = {
    val next = SnapshotDir.next(spark, path, Prefix)
    val vdir = s"$path/${SnapshotDir.name(Prefix, next)}"
    state.write.mode(SaveMode.Overwrite).parquet(vdir)
    batchTag.foreach(t => writeText(spark, s"$vdir/_batch_tag", t))
    SnapshotDir.commit(spark, path, Prefix, next)
  }

  /** [[writeState]] gated by a recipe marker. `baseTag` names the
    * slice of facts the base state was built from (e.g. the caller's
    * holdout predicate) so changing the slice REBUILDS instead of
    * silently merging a new delta into stale partials — the same
    * reason TokenizerStore's recipe carries its merge count. Returns
    * build seconds, or None when the committed state is warm. */
  def ensureState(events: DataFrame, path: String,
      baseTag: String = ""): Option[Double] = {
    val spark = events.sparkSession
    val marker = s"$path/_built.json"
    val recipe = AggStore.recipe(baseTag)
    if (readText(spark, marker).contains(recipe) &&
        SnapshotDir.current(spark, path, Prefix).isDefined) None
    else {
      val t0 = System.nanoTime()
      // recipe change = new state: old-recipe partials are meaningless
      // under the new one, so rebuild from a clean root (deterministic
      // version numbering, no cross-format debris)
      val (fsys, hp) = StoreFiles.fsOf(spark, path)
      if (fsys.exists(hp)) fsys.delete(hp, true)
      writeState(events, path)
      writeText(spark, marker, recipe)
      Some((System.nanoTime() - t0) / 1e9)
    }
  }

  /** Stored partials of the current committed version. */
  def readState(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(currentDir(spark, path))

  /** Directory of the current committed version, if any — stable
    * cache identity for consumers that memoize per-version metadata
    * (committed versions are immutable;
    * [[graft.plans.AggStoreRewrite]]'s row-count tie-break keys on
    * it). */
  def currentVersionDir(spark: SparkSession, path: String)
      : Option[String] =
    SnapshotDir.current(spark, path, Prefix)

  /** The maintained view with `delta` folded in AT READ TIME — the
    * stored state is untouched (idempotent; safe to re-run with the
    * same delta). Plan shape: aggregate the delta (O(|delta|)), union
    * with the keys-sized stored partials, one keys-sized merge
    * aggregate. The fact history is never scanned. */
  def mergedView(spark: SparkSession, path: String,
      delta: DataFrame): DataFrame =
    merge(readState(spark, path), partials(delta))

  /** First batch founds the store, later batches fold in — the
    * streaming sink's per-trigger body
    * ([[graft.streaming.StreamingSync.aggMaintSink]]). `batchTag`
    * makes redelivery idempotent: foreachBatch is AT-LEAST-ONCE (a
    * crash between the store commit and the streaming commit log
    * re-runs the trigger), so the tag of the last applied batch rides
    * the version commit atomically and an arriving batch whose tag
    * matches the CURRENT version is a replay — skipped. Structured
    * Streaming only ever redelivers the most recent uncommitted
    * trigger, so one tag of history is exactly enough. */
  def bootstrapOrAppend(spark: SparkSession, path: String,
      batch: DataFrame, batchTag: Option[String] = None): Unit = {
    // the bootstrap-vs-append decision resolves INSIDE the writer
    // lock: a check-then-act outside it let two racing first-writers
    // both see an empty store, serialize through the lock, and the
    // second commit silently drop the first batch
    SnapshotDir.withWriterLock(spark, path) {
      SnapshotDir.current(spark, path, Prefix) match {
        case None => writeLocked(spark, path, partials(batch), batchTag)
        case Some(cur) =>
          val applied = readText(spark, s"$cur/_batch_tag")
          if (batchTag.isDefined && applied == batchTag)
            () // redelivery of the already-committed trigger
          else appendLocked(spark, path, batch, batchTag)
      }
    }
    SnapshotDir.gc(spark, path, Prefix)
  }

  /** The batch tag committed with the current version, if any. */
  def lastBatchTag(spark: SparkSession, path: String): Option[String] =
    readText(spark, s"${currentDir(spark, path)}/_batch_tag")

  /** Fold `delta` into the store as the next committed version — the
    * write-side twin of [[mergedView]] (same merge, then commit).
    * Applying the same delta twice double-counts: callers either pass
    * a `batchTag` through [[bootstrapOrAppend]] (replay-safe) or own
    * the exactly-once contract themselves (batch dedup keys). */
  def appendDelta(spark: SparkSession, path: String,
      delta: DataFrame, batchTag: Option[String] = None): Unit = {
    SnapshotDir.withWriterLock(spark, path) {
      appendLocked(spark, path, delta, batchTag)
    }
    SnapshotDir.gc(spark, path, Prefix)
  }

  /** Merge-and-commit body of [[appendDelta]]; caller holds the lock
    * (so the current version resolved here cannot be GC'd or raced). */
  private def appendLocked(spark: SparkSession, path: String,
      delta: DataFrame, batchTag: Option[String]): Unit = {
    val cur = currentDir(spark, path)
    val merged = merge(spark.read.parquet(cur), partials(delta))
    writeLocked(spark, path, merged, batchTag)
  }

  /** TAKEDOWN on the maintained view: SUBTRACT the removed facts'
    * contributions — the algebraic COUNT/SUM states make retraction
    * exact (negated partials merge through the same fold; decimal
    * sums can't drift), and a key whose count reaches zero DROPS, so
    * the retracted state is row-identical to a rebuild over the
    * filtered facts (spec-pinned). Retraction is NOT naturally
    * idempotent (subtracting twice double-removes), so `batchTag`
    * carries the takedown id through the version commit and a re-run
    * whose tag matches the current version is a replay — skipped,
    * the same discipline as [[bootstrapOrAppend]]. */
  def retractDelta(spark: SparkSession, path: String,
      removed: DataFrame, batchTag: Option[String] = None): Unit = {
    SnapshotDir.withWriterLock(spark, path) {
      val cur = currentDir(spark, path)
      if (batchTag.isDefined &&
          readText(spark, s"$cur/_batch_tag") == batchTag) ()
      else {
        val neg = partials(removed).select(col("day"),
          col("event_type"), (-col("cnt")).as("cnt"),
          (-col("total")).cast(StoredSum).as("total"))
        val merged = merge(spark.read.parquet(cur), neg)
          .filter(col("cnt") =!= 0L)
        writeLocked(spark, path, merged, batchTag)
      }
    }
    SnapshotDir.gc(spark, path, Prefix)
  }
}
