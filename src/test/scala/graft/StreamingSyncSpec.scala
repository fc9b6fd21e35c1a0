package graft

import graft.operators.{ScalarQueries, SyncFixture}
import graft.sources.StateStore
import graft.streaming.StreamingSync
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming face: watermarked windowed aggregation equals its
  * batch twin, and the foreachBatch sync sink reaches the same state as the
  * batch engine. */
class StreamingSyncSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-stream").toString

  test("streaming windowed totals equal the batch aggregation") {
    val dir = tmp()
    Tables.events(spark, sf0001).write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema

    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = StreamingSync.windowedTotals(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("totals")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("totals")
      .select($"window.start".as("hora"), $"event_type", $"n", $"total")
    val batch = Tables.events(spark, sf0001)
      .groupBy(date_trunc("hour", $"ts").as("hora"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(DecimalType(18, 2))).as("total"))
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
  }

  test("streaming sessionize equals the batch session_window aggregation") {
    val dir = tmp()
    Tables.events(spark, sf0001).write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema

    // the SAME operator body runs on the stream — session_window is
    // Spark's native streaming session operator
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
      .withWatermark("ts", "1 hour")
    val q = graft.operators.Temporal.sessionize(stream, "4 hours")
      .writeStream.outputMode("complete")
      .format("memory").queryName("sessions")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("sessions")
    val batch = graft.operators.Temporal.sessionize(
      Tables.events(spark, sf0001), "4 hours")
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
  }

  test("stateful first-wins dedup drops duplicates across micro-batches") {
    val dir = tmp()
    val in = s"$dir/in"
    // batch 1: F1 twice (ord 1 wins in-batch), F2 once; batch 2: F1
    // re-delivered (must be dropped by state), F3 new. Processing
    // order pinned by explicit monotone mtimes, not wall-clock sleeps
    // (the writeOrderedBatches discipline).
    val inDir = new java.io.File(in)
    var seen = Set.empty[String]
    Seq(Seq((1L, "F1", 10.0), (2L, "F1", 20.0), (3L, "F2", 30.0)),
      Seq((4L, "F1", 40.0), (5L, "F3", 50.0)))
      .zipWithIndex.foreach { case (rows, i) =>
        rows.toDF("ord", "folio", "monto").coalesce(1)
          .write.mode("append").parquet(in)
        val now = inDir.listFiles()
          .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
        (now -- seen).foreach(n => new java.io.File(inDir, n)
          .setLastModified(1700000000000L + i * 60000L))
        seen = now
      }

    val stream = spark.readStream
      .schema(spark.read.parquet(in).schema)
      .option("maxFilesPerTrigger", 1) // one file per micro-batch
      .parquet(in)
    val q = StreamingSync.dedupFirstWinsStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("first_wins")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("first_wins")
      .select($"folio", $"ord").as[(String, Long)].collect().toMap
    assert(got === Map("F1" -> 1L, "F2" -> 3L, "F3" -> 5L))
  }

  test("streaming sliding windows equal the batch aggregation") {
    val dir = tmp()
    Tables.events(spark, sf0001).write.parquet(s"$dir/in")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/in").schema).parquet(s"$dir/in")
      .withWatermark("ts", "1 hour")
    val q = graft.operators.Temporal.slidingCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("sliding")
      .start()
    try q.processAllAvailable() finally q.stop()

    val batch = graft.operators.Temporal.slidingCounts(
      Tables.events(spark, sf0001))
    val streamed = spark.table("sliding")
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
  }

  test("streaming interval join equals the batch interval join") {
    val dir = tmp()
    val ev = Tables.events(spark, sf0001)
    ev.filter($"event_type" === "click").write.parquet(s"$dir/clicks")
    ev.filter($"event_type" === "purchase").write.parquet(s"$dir/buys")
    def side(p: String) = spark.readStream
      .schema(spark.read.parquet(p).schema).parquet(p)
      .withWatermark("ts", "2 hours") // bounds both sides' join state
    val q = graft.operators.Temporal.intervalJoin(
        side(s"$dir/clicks"), side(s"$dir/buys"),
        "1 hour", "user_id", "ts", "event_id", "event_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("ij")
      .start()
    try q.processAllAvailable() finally q.stop()

    val batch = graft.operators.Temporal.intervalJoin(
      ev.filter($"event_type" === "click"),
      ev.filter($"event_type" === "purchase"),
      "1 hour", "user_id", "ts", "event_id", "event_id")
    val streamed = spark.table("ij")
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
  }

  test("stream-stream attribution join equals its batch form") {
    val dir = tmp()
    val ev = Tables.events(spark, sf0001)
    ev.filter($"event_type" === "view").write.parquet(s"$dir/views")
    ev.filter($"event_type" === "click").write.parquet(s"$dir/clicks")
    def side(p: String) = spark.readStream
      .schema(spark.read.parquet(p).schema).parquet(p)
    // the operator carries its own watermarks (both sides) — the
    // bidirectional time bound is what lets streaming evict join state
    val q = graft.streaming.StreamingSync.attributionJoin(
        side(s"$dir/views"), side(s"$dir/clicks"))
      .writeStream.outputMode("append")
      .format("memory").queryName("attr")
      .start()
    val prog =
      try { q.processAllAvailable(); q.lastProgress } finally q.stop()

    val batch = graft.streaming.StreamingSync.attributionJoin(
      ev.filter($"event_type" === "view"),
      ev.filter($"event_type" === "click"))
    val streamed = spark.table("attr")
    assert(batch.count() > 0)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
    // the streaming plan runs the state-bounded symmetric hash join
    // (both sides watermarked), not an unbounded buffer
    assert(prog.stateOperators.exists(
      _.operatorName.contains("symmetricHashJoin")))
  }

  test("left-outer attribution emits unmatched views past the watermark") {
    val dir = tmp()
    val ev = Tables.events(spark, sf0001)
    val views = ev.filter($"event_type" === "view")
      .select($"user_id", $"event_id", $"ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts")
    // a far-future sentinel view pushes the final watermark past every
    // real view's (ts + horizon) expiry, so streaming can PROVE every
    // unconverted real view unconverted and emit its NULL row; the
    // sentinel itself stays buffered (its own expiry is past the
    // watermark) and never appears
    // ...on BOTH sides: the global watermark is the MIN of the two
    // sides' watermarks, so a lagging clicks side would hold back
    // every real view's emission
    val maxTs = ev.agg(max($"ts")).head().getTimestamp(0)
    def sentinel(user: Long) = Seq((user, user,
      new java.sql.Timestamp(maxTs.getTime + 10L * 3600 * 1000)))
      .toDF("user_id", "event_id", "ts")
    views.unionByName(sentinel(999999L)).write.parquet(s"$dir/views")
    clicks.unionByName(sentinel(999998L)).write.parquet(s"$dir/clicks")
    def side(p: String) = spark.readStream
      .schema(spark.read.parquet(p).schema).parquet(p)
    val q = graft.streaming.StreamingSync.attributionJoin(
        side(s"$dir/views"), side(s"$dir/clicks"),
        joinType = "left_outer")
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_outer")
      .start()
    try q.processAllAvailable() finally q.stop()

    val batch = graft.streaming.StreamingSync.attributionJoin(
      views, clicks, joinType = "left_outer")
    val streamed = spark.table("attr_outer")
    assert(streamed.filter($"user_id" === 999999L).isEmpty)
    // outer rows exist (some views convert to nothing) and the
    // streamed result equals the batch left join exactly
    assert(batch.filter($"click_id".isNull).count() > 0)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
  }

  test("foreachBatch sync sink converges to the batch engine's state") {
    val base = tmp()
    val source = SyncFixture.source(spark, sf0001)
      .select("ord", "folio", "fecha", "cliente", "servicio", "banco",
        "monto", "metodo")
    source.write.parquet(s"$base/in")

    val q = StreamingSync.syncSink(
      spark.readStream.schema(spark.read.parquet(s"$base/in").schema)
        .parquet(s"$base/in"),
      statePath = s"$base/state", auditPath = s"$base/audit",
      conflictPath = s"$base/conflicts", lookbackDays = 90,
      checkpoint = s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()

    val state = StateStore.readOrCreate(spark, s"$base/state")
    assert(state.count() === source.select("folio").distinct().count())
    // the batch run against empty state lands on the same folio set
    val batchState = graft.operators.SyncEngine.run(
      source,
      StateStore.readOrCreate(spark, s"$base/never"),
      SyncFixture.WindowStart, SyncFixture.WindowEnd).newState
    assert(state.select("folio").exceptAll(batchState.select("folio"))
      .count() === 0)
  }

  /** Write each batch as one parquet file and pin the file-source
    * processing order with explicit monotone mtimes — the source sorts
    * files by modification time, and relying on wall-clock write order
    * (sleeps) is fragile on coarse-mtime filesystems. */
  private def writeOrderedBatches(in: String,
      batches: Seq[Seq[(String, java.sql.Timestamp, Long)]]): Unit = {
    val dir = new java.io.File(in)
    var seen = Set.empty[String]
    batches.zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("k", "ts", "seq").coalesce(1)
        .write.mode("append").parquet(in)
      val now = dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(_.getName).toSet
      (now -- seen).foreach(n =>
        new java.io.File(dir, n).setLastModified(
          1700000000000L + i * 60000L))
      seen = now
    }
  }

  private def runWmDedup(dir: String, name: String,
      delay: String = "1 hour"): Set[Long] = {
    val in = s"$dir/in"
    val stream = spark.readStream
      .schema(spark.read.parquet(in).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(in)
    val q = StreamingSync
      .dedupWithinWatermark(stream, Seq("k"), delay = delay)
      .writeStream.outputMode("append")
      .format("memory").queryName(name)
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).select($"seq").as[Long].collect().toSet
  }

  test("watermarked dedup drops in-window duplicates and evicts state") {
    val dir = tmp()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(
      f"2025-01-01 $h%02d:$m%02d:00")
    writeOrderedBatches(s"$dir/in", Seq(
      // batch 1: A and B
      Seq(("A", ts(10, 0), 1L), ("B", ts(10, 10), 2L)),
      // batch 2: duplicate A INSIDE the watermark (dropped) + C far
      // ahead (advances the watermark past A's state)
      Seq(("A", ts(10, 5), 3L), ("C", ts(15, 0), 4L)),
      // batch 3: unrelated key — state eviction runs on the batch AFTER
      // the watermark advanced, so this batch is where A's entry
      // (expiry 11:00 < wm 14:00) actually leaves the store
      Seq(("D", ts(15, 10), 5L)),
      // batch 4: A again — state evicted, so it re-emits: bounded state
      // trades exactness past the delay for state ∝ keys-per-window,
      // and the idempotent sync sink absorbs the re-emit
      Seq(("A", ts(15, 30), 6L))))

    assert(runWmDedup(dir, "wm_dedup") ===
      Set(1L, 2L, 4L, 5L, 6L)) // the in-window dup (3) dropped
    val got = spark.table("wm_dedup")
      .groupBy($"k").count().as[(String, Long)].collect().toMap
    assert(got ===
      Map("A" -> 2L, "B" -> 1L, "C" -> 1L, "D" -> 1L))
  }

  test("watermark dedup state semantics: no dup extension, inclusive eviction, one-batch lag") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s"2025-01-01 $s:00")
    // These three fixtures pin the exact state machine the
    // x_stream_wm_dedup oracle replays. (1) NO EXTENSION: the dropped
    // dup A@10:30 does not move A's expiry past 11:00, so the eviction
    // in batch 4 (wm = 12:25 - 1h = 11:25, from batches 1-3) clears it
    // and A@13:10 re-emits. Were dups extending state, expiry would be
    // 11:30 > 11:25 and seq 5 would be absent.
    val d1 = tmp()
    writeOrderedBatches(s"$d1/in", Seq(
      Seq(("A", ts("10:00"), 1L)),
      Seq(("A", ts("10:30"), 2L)),
      Seq(("Z", ts("12:25"), 3L)),
      Seq(("Y", ts("13:00"), 4L)),
      Seq(("A", ts("13:10"), 5L))))
    assert(runWmDedup(d1, "wm_sem_ext") === Set(1L, 3L, 4L, 5L))

    // (2) INCLUSIVE EVICTION: A's expiry 11:00 meets the batch-3
    // eviction watermark EXACTLY (12:00 - 1h); the state is evicted at
    // equality, so A@13:30 re-emits. A strict comparison would keep
    // the state and drop seq 4.
    val d2 = tmp()
    writeOrderedBatches(s"$d2/in", Seq(
      Seq(("A", ts("10:00"), 1L)),
      Seq(("Z", ts("12:00"), 2L)),
      Seq(("Y", ts("13:00"), 3L)),
      Seq(("A", ts("13:30"), 4L))))
    assert(runWmDedup(d2, "wm_sem_tie") === Set(1L, 2L, 3L, 4L))

    // (3) ONE-BATCH LAG + EMITTER'S CLOCK: state carries the EMITTING
    // row's time (10:00), not the in-batch dup's (10:40): batch-3
    // eviction wm = 12:35 - 1h = 11:35 > 11:00 clears A, and A@13:30
    // re-emits. The dup 10:40 extending state would keep 11:40 > 11:35.
    val d3 = tmp()
    writeOrderedBatches(s"$d3/in", Seq(
      Seq(("A", ts("10:00"), 1L), ("A", ts("10:40"), 2L)),
      Seq(("Z", ts("12:35"), 3L)),
      Seq(("Y", ts("13:10"), 4L)),
      Seq(("A", ts("13:30"), 5L))))
    assert(runWmDedup(d3, "wm_sem_lag") === Set(1L, 3L, 4L, 5L))
  }

  test("watermark dedup replay harness: eras bounded and both paths exercised") {
    val work = tmp()
    val events = Tables.events(spark, sf0001)
    val out = StreamingSync.dedupWithinWatermarkReplay(
      spark, events, Seq("user_id", "event_type"),
      tsCol = "ts", delay = "2 hours", nBatches = 4,
      workDir = s"$work/replay")
    val perKeyBatches = events
      .select($"user_id", $"event_type",
        ntile(4).over(org.apache.spark.sql.expressions.Window
          .orderBy($"ts", $"event_id")).as("b"))
      .distinct().groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n_batches"))
    val joined = out.join(perKeyBatches, Seq("user_id", "event_type"))
      .select($"n_emissions", $"n_batches")
      .as[(Long, Long)].collect()
    assert(joined.nonEmpty)
    // every key emits at least once and at most once per batch it's in
    assert(joined.forall { case (e, b) => e >= 1 && e <= b })
    // the fixture exercises BOTH paths: some arrival was deduped and
    // some key re-emitted after eviction (multi-era)
    assert(joined.exists { case (e, b) => e < b })
    assert(joined.exists { case (e, _) => e > 1 })
    // idempotent: a second replay over the same input is identical
    val again = StreamingSync.dedupWithinWatermarkReplay(
      spark, events, Seq("user_id", "event_type"),
      tsCol = "ts", delay = "2 hours", nBatches = 4,
      workDir = s"$work/replay2")
    assert(out.exceptAll(again).count() === 0)
    assert(again.exceptAll(out).count() === 0)
  }

  test("streaming cep equals batch cep; chains straddle batch boundaries") {
    import graft.operators.Temporal
    // 6 events split into 6 single-event micro-batches: the chain's
    // steps NEVER share a batch, so every binding crosses a boundary
    // through the per-user state
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")
    val fx = Seq(
      (1L, t("08:00:00"), 1L, "view"),
      (2L, t("08:00:10"), 1L, "click"),
      (3L, t("08:00:20"), 1L, "purchase"),
      (4L, t("08:01:00"), 2L, "view"),
      (5L, t("08:01:10"), 2L, "purchase"), // no click → never matches
      (6L, t("08:02:00"), 1L, "purchase")) // second match, same chain
      .toDF("event_id", "ts", "user_id", "event_type")
    val steps = Seq("view", "click", "purchase")
    val streamed = StreamingSync.cepStreamReplay(spark, fx, steps,
        withinSeconds = 3600L, nBatches = 6, workDir = s"${tmp()}/cep")
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("start_id"), r.getAs[Long]("end_id"),
        r.getAs[Long]("dur_us"))).toSet
    assert(streamed === Set((1L, 1L, 3L, 20000000L),
      (1L, 1L, 6L, 120000000L)))
    // parity with the batch operator on the real fixture
    val events = Tables.events(spark, sf0001)
    val batch = Temporal.cepPattern(events, steps, 86400L)
      .collect().map(_.toString).sorted.toSeq
    val stream = StreamingSync.cepStreamReplay(spark, events, steps,
        86400L, nBatches = 4, workDir = s"${tmp()}/cep2")
      .select("user_id", "start_id", "start_ts", "end_id", "end_ts",
        "dur_us")
      .collect().map(_.toString).sorted.toSeq
    assert(batch.nonEmpty && batch === stream)
  }

  test("cep event-time eviction: state shrinks, matches unchanged") {
    import graft.operators.Temporal
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")
    // users 1 and 2 act early then go idle; user 3 acts two hours
    // later. With within=60s and eviction on, the watermark from user
    // 3's events passes users 1/2's `max(anchor)+within` expiry and
    // their slots are REMOVED — while every match is still found.
    val fx = Seq(
      (1L, t("08:00:00"), 1L, "view", 1),
      (2L, t("08:00:10"), 1L, "click", 1),
      (3L, t("08:00:20"), 1L, "purchase", 2), // match (20s)
      (4L, t("08:00:30"), 2L, "view", 2),     // slot, never completed
      (5L, t("10:00:00"), 3L, "view", 3),
      (6L, t("10:00:05"), 3L, "click", 4),
      (7L, t("10:00:10"), 3L, "purchase", 4)) // match (10s)
      .toDF("event_id", "ts", "user_id", "event_type", "b")
    val steps = Seq("view", "click", "purchase")
    val dir = s"${tmp()}/cepevict"
    val in = StreamingSync.stageBatchFiles(fx, 4, dir)
    val stream = spark.readStream
      .schema(spark.read.parquet(in.toString).schema)
      .option("maxFilesPerTrigger", 1).parquet(in.toString)
    val q = StreamingSync.cepStream(stream, steps, withinSeconds = 60L,
        evictIdle = true)
      .writeStream.outputMode("append").format("memory")
      .queryName("cep_evict")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try q.processAllAvailable() finally q.stop()
    val stateRows = q.recentProgress.toSeq
      .flatMap(_.stateOperators.headOption).map(_.numRowsTotal)
    val got = spark.table("cep_evict").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_id"),
        r.getAs[Long]("end_id"), r.getAs[Long]("dur_us"))).toSet
    spark.catalog.dropTempView("cep_evict")
    // matches equal the batch operator over the same events
    val batch = Temporal.cepPattern(fx.drop("b"), steps, 60L).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_id"),
        r.getAs[Long]("end_id"), r.getAs[Long]("dur_us"))).toSet
    assert(got === batch)
    assert(got === Set((1L, 1L, 3L, 20000000L), (3L, 5L, 7L, 10000000L)))
    // bounded state: users 1 and 2 held rows at the peak, then expired
    // — only user 3's fresh slots survive at the end
    assert(stateRows.max >= 2, s"peak state rows: $stateRows")
    assert(stateRows.last === 1, s"state not evicted: $stateRows")
    // the eviction-free form keeps every user forever (the documented
    // trade): same fixture, NoTimeout, final state = all 3 users
    val q2 = StreamingSync.cepStream(
        spark.readStream.schema(spark.read.parquet(in.toString).schema)
          .option("maxFilesPerTrigger", 1).parquet(in.toString),
        steps, withinSeconds = 60L)
      .writeStream.outputMode("append").format("memory")
      .queryName("cep_keep")
      .option("checkpointLocation", s"$dir/ckpt2").start()
    try q2.processAllAvailable() finally q2.stop()
    val keepRows = q2.recentProgress.toSeq
      .flatMap(_.stateOperators.headOption).map(_.numRowsTotal)
    spark.catalog.dropTempView("cep_keep")
    assert(keepRows.last === 3, s"NoTimeout must keep all: $keepRows")
  }

  test("edge append sink: streamed batches equal the rebuild; idempotent") {
    import graft.operators.{ExtQueries, Similarity}
    val dir = tmp()
    val store = s"$dir/edges"
    val e = Tables.embeddings(spark, sf0001)
    val base = e.filter(pmod($"vec_id", lit(10)) =!= 9)
    val holdout = e.filter(pmod($"vec_id", lit(10)) === 9)
    graft.sources.EdgeStore.ensureNearDupPairs(base, store,
      ExtQueries.CosineThreshold, bands = ExtQueries.NearDupBands,
      rowsPerBand = ExtQueries.NearDupRows, dim = ExtQueries.EmbeddingDim)
    // labels built BEFORE streaming: every sink trigger must also
    // maintain them incrementally (touched components only)
    graft.sources.ClusterStore.ensureLabels(spark, store)
    // two micro-batches of held-out vectors through the sink (one
    // parquet file each, AvailableNow)
    val in = s"$dir/in"
    holdout.filter($"vec_id" % 20 === 9).coalesce(1)
      .write.mode("append").parquet(in)
    holdout.filter($"vec_id" % 20 === 19).coalesce(1)
      .write.mode("append").parquet(in)
    def runSink(ckpt: String): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(in).schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
      val q = StreamingSync.edgeAppendSink(stream, e, store,
        s"$dir/$ckpt", ExtQueries.CosineThreshold,
        bands = ExtQueries.NearDupBands,
        rowsPerBand = ExtQueries.NearDupRows,
        dim = ExtQueries.EmbeddingDim)
      try q.awaitTermination() finally q.stop()
    }
    runSink("ckpt1")
    def pairSet() = graft.sources.EdgeStore.read(spark, store)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("cos"))).toSet
    val got = pairSet()
    val full = Similarity.nearDupPairsLsh(e, ExtQueries.CosineThreshold,
        bands = ExtQueries.NearDupBands,
        rowsPerBand = ExtQueries.NearDupRows,
        dim = ExtQueries.EmbeddingDim)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("cos"))).toSet
    assert(got === full)
    // the streamed admissions maintained the labels too: the served
    // assignment equals a from-scratch relabel over the full corpus
    def labelSet() = graft.sources.ClusterStore
      .assignments(e, store, "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullLabels = graft.operators.Dedup.clusterAssignments(
        e, graft.sources.EdgeStore.read(spark, store), idCol = "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(labelSet() === fullLabels)
    // redelivery: the same files through a FRESH checkpoint admit
    // nothing (already-indexed ids drop at the store)
    runSink("ckpt2")
    assert(pairSet() === full)
    assert(labelSet() === fullLabels)
  }

  test("admission batches: store rejections, within-batch dedup, growth") {
    val dir = tmp()
    val store = s"$dir/fp"
    val admitted = s"$dir/admitted"
    def admit(rows: Seq[(Long, String)]): Unit =
      StreamingSync.admitBatch(rows.toDF("doc_id", "text"), store,
        admitted, 0.1)
    def admittedIds(): Set[Long] =
      spark.read.parquet(admitted).select($"doc_id").as[Long]
        .collect().toSet

    // batch 1: cold start — store bootstraps empty, everything admits
    admit(Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely different words about spark shuffles and joins")))
    assert(admittedIds() === Set(1L, 2L))

    // batch 2: a copy of an admitted doc (rejected by the store), a
    // within-batch duplicate pair (min id wins), and a novel doc
    admit(Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"),
      (11L, "astronomy tables chart the motion of wandering stars"),
      (12L, "astronomy tables chart the motion of wandering stars"),
      (13L, "unrelated corpus of maritime navigation records here")))
    assert(admittedIds() === Set(1L, 2L, 11L, 13L))

    // batch 3: full redelivery of batch 2 — nothing new admits
    admit(Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"),
      (11L, "astronomy tables chart the motion of wandering stars"),
      (12L, "astronomy tables chart the motion of wandering stars"),
      (13L, "unrelated corpus of maritime navigation records here")))
    assert(admittedIds() === Set(1L, 2L, 11L, 13L))
  }

  test("admission sink wires the same semantics through a file stream") {
    val dir = tmp()
    val in = new java.io.File(dir, "in"); in.mkdirs()
    def stage(name: String, mtime: Long, rows: Seq[(Long, String)]): Unit = {
      val tmpd = s"$dir/stage-$name"
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(tmpd)
      val part = new java.io.File(tmpd).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val tgt = new java.io.File(in, s"$name.parquet")
      assert(part.renameTo(tgt))
      tgt.setLastModified(mtime)
    }
    stage("batch-01", 1700000000000L, Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely different words about spark shuffles and joins")))
    stage("batch-02", 1700000060000L, Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"),
      (11L, "astronomy tables chart the motion of wandering stars")))
    val stream = spark.readStream
      .schema(spark.read.parquet(in.toString).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(in.toString)
    val q = StreamingSync.dedupAdmissionSink(stream, s"$dir/fp",
      s"$dir/admitted", 0.1, checkpoint = s"$dir/ckpt")
    try q.processAllAvailable() finally q.stop()
    val ids = spark.read.parquet(s"$dir/admitted")
      .select($"doc_id").as[Long].collect().toSet
    assert(ids === Set(1L, 2L, 11L))
  }

  test("vector append sink: streamed micro-batches equal the batch append") {
    import graft.sources.{StoreClone, VectorIndexStore}
    val dir = tmp()
    val e = Tables.embeddings(spark, sf0001)
    val base = e.filter($"vec_id" % 10 =!= 9)
    val holdout = e.filter($"vec_id" % 10 === 9)
    val basePath = s"$dir/base"
    VectorIndexStore.writeIvfPq(base, basePath)
    // batch path: one append of the whole holdout
    val batchPath = s"$dir/batch"
    StoreClone.cloneStore(spark, basePath, batchPath)
    VectorIndexStore.appendIvfPq(spark, batchPath, holdout)
    // streamed path: the SAME holdout arrives as two ordered files
    // through the sink — each trigger encodes against the same frozen
    // metadata, so arrival chunking must not change the index
    val streamPath = s"$dir/stream"
    StoreClone.cloneStore(spark, basePath, streamPath)
    val in = new java.io.File(dir, "in"); in.mkdirs()
    def stage(name: String, mtime: Long,
        df: org.apache.spark.sql.DataFrame): Unit = {
      val tmpd = s"$dir/stage-$name"
      df.coalesce(1).write.parquet(tmpd)
      val part = new java.io.File(tmpd).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val tgt = new java.io.File(in, s"$name.parquet")
      assert(part.renameTo(tgt))
      tgt.setLastModified(mtime)
    }
    stage("batch-01", 1700000000000L, holdout.filter($"vec_id" % 20 === 9))
    stage("batch-02", 1700000060000L, holdout.filter($"vec_id" % 20 =!= 9))
    val stream = spark.readStream
      .schema(spark.read.parquet(in.toString).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(in.toString)
    val q = StreamingSync.vectorAppendSink(stream, streamPath,
      checkpoint = s"$dir/ckpt")
    try q.processAllAvailable() finally q.stop()
    // served results are identical: the frozen-metadata encode is
    // deterministic per vector, append order is irrelevant
    val queries = e.filter($"vec_id" % 50 === 0)
    val batchTop = VectorIndexStore
      .ivfPqTopKFromIndex(spark, batchPath, queries, e, 10)
      .collect().map(_.toString).sorted
    val streamTop = VectorIndexStore
      .ivfPqTopKFromIndex(spark, streamPath, queries, e, 10)
      .collect().map(_.toString).sorted
    assert(batchTop.nonEmpty)
    assert(batchTop.length === streamTop.length &&
      batchTop.sameElements(streamTop))
    // and a compaction folds the per-trigger files without changing them
    VectorIndexStore.compactIvfPq(spark, streamPath)
    val compacted = VectorIndexStore
      .ivfPqTopKFromIndex(spark, streamPath, queries, e, 10)
      .collect().map(_.toString).sorted
    assert(compacted.sameElements(streamTop))
  }

  test("session replay: cross-batch merge equals one-shot sessions") {
    val events = Tables.events(spark, sf0001)
    val replayed = StreamingSync.sessionWindowReplay(spark, events,
      gap = "12 hours", delay = "1 hour", nBatches = 4,
      workDir = tmp())
    // batch twin: same ms-floor, same native session_window — but fed
    // ALL rows at once. The replay's sessions were merged across four
    // micro-batch boundaries by the state store; results must agree.
    val batch = events
      .select($"user_id",
        date_trunc("millisecond", $"ts").as("ts"), $"value")
      .groupBy(session_window($"ts", "12 hours"), $"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast(DecimalType(18, 2))).cast("double")
          .as("total"))
      .select($"user_id", $"session_window.start".as("session_start"),
        $"session_window.end".as("session_end"), $"n_events", $"total")
    assert(replayed.count() === batch.count())
    assert(replayed.exceptAll(batch).count() === 0)
    // the replay genuinely exercised cross-batch state: at least one
    // session must span more than one of the four time-quartile
    // batches (i.e. contain both an early and a late event)
    assert(replayed.filter($"n_events" > 1).count() > 0)
    // and every real session was flushed (the sentinel device): no
    // user lost their final open session
    assert(replayed.select($"user_id").distinct().count() ===
      events.select($"user_id").distinct().count())
  }

  test("agg maintenance sink: streamed chunks equal the recompute") {
    import graft.sources.AggStore
    val dir = tmp()
    val events = Tables.events(spark, sf0001)
    val in = new java.io.File(dir, "in"); in.mkdirs()
    def stage(name: String, mtime: Long,
        df: org.apache.spark.sql.DataFrame): Unit = {
      val tmpd = s"$dir/stage-$name"
      df.coalesce(1).write.parquet(tmpd)
      val part = new java.io.File(tmpd).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val tgt = new java.io.File(in, s"$name.parquet")
      assert(part.renameTo(tgt))
      tgt.setLastModified(mtime)
    }
    stage("batch-01", 1700000000000L, events.filter($"event_id" % 3 === 0))
    stage("batch-02", 1700000060000L, events.filter($"event_id" % 3 === 1))
    stage("batch-03", 1700000120000L, events.filter($"event_id" % 3 === 2))
    val stream = spark.readStream
      .schema(spark.read.parquet(in.toString).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(in.toString)
    val store = s"$dir/aggstore"
    val q = StreamingSync.aggMaintSink(stream, store, s"$dir/ckpt")
    try q.processAllAvailable() finally q.stop()
    // three triggers → bootstrap + two committed merges; the final
    // state equals the one-shot partials over everything
    val got = AggStore.readState(spark, store)
      .select($"day".cast("string"), $"event_type", $"cnt",
        $"total".cast("string"))
    val want = AggStore.partials(events)
      .select($"day".cast("string"), $"event_type", $"cnt",
        $"total".cast("string"))
    assert(got.count() === want.count())
    assert(got.exceptAll(want).count() === 0)
    // versions advanced per merge trigger (bootstrap = v1, +2 appends)
    assert(new java.io.File(store).listFiles()
      .count(_.getName.startsWith("agg-")) >= 1)
  }

  test("freq maintenance: one sketch row per trigger, redelivery no-ops, merged contract holds") {
    import graft.operators.CorpusStats
    val dir = tmp()
    // 120 docs × 3 tokens: alpha/beta hold 120/360 each (heavy at
    // phi=4: 120·4 > 360), tails 3 each (well under the error line)
    val docs = (0 until 120)
      .map(i => (i.toLong, s"alpha beta tail${i % 40}"))
      .toDF("doc_id", "text")
    val states = StreamingSync.freqMaintReplay(spark, docs,
      nBatches = 3, workDir = s"$dir/rep", maxMapSize = 64)
    // one state row per trigger, each tagged with its own batchId
    assert(states.count() === 3)
    assert(states.select($"batch_id").distinct().count() === 3)
    assert(states.agg(sum($"n_tokens")).as[Long].head() === 360L)
    // the merged stream-built store honors the batch audit contract
    val audit = CorpusStats.freqStatesValidated(docs, states,
      maxMapSize = 64, phi = 4).collect()
    assert(audit.map(_.getAs[String]("item")).toSet ===
      Set("alpha", "beta"))
    assert(audit.forall(r => r.getAs[Boolean]("reported") &&
      r.getAs[Boolean]("bounds_hold")))
    // redelivery of an already-tagged trigger must append NOTHING —
    // a replayed batch would otherwise double-count every token.
    // (Stored ids are checkpoint-namespaced; probe with one the sink
    // actually wrote.)
    val store = s"$dir/rep/freq-store"
    val storedId = states.agg(min($"batch_id")).as[Long].head()
    StreamingSync.appendFreqBatch(docs, store, storedId,
      maxMapSize = 64)
    assert(spark.read.parquet(store).count() === 3)
  }

  test("hilbert maintenance sink: streamed tail serves the full " +
      "rectangle; tags are checkpoint-scoped (redelivery no-ops, a " +
      "NEW checkpoint's batches land); optimize prunes the tag set") {
    import graft.sources.HilbertStore
    val dir = tmp()
    val g = Tables.events(spark, sf0001)
      .select($"event_id", ($"user_id" % 256).as("za"),
        ($"event_id" % 256).as("zb"))
    val base = g.filter($"event_id" % 20 =!= 7 && $"event_id" % 20 =!= 17)
    val batch1 = g.filter($"event_id" % 20 === 7)
    val batch2 = g.filter($"event_id" % 20 === 17)
    val store = s"$dir/hilb"
    HilbertStore.ensureHilbert(base, store, "za", "zb", 8, 16)
    StreamingSync.hilbertMaintReplay(spark, batch1, store,
      "za", "zb", 8, orderCol = "event_id", nBatches = 2,
      workDir = s"$dir/rep1")
    def rows() = HilbertStore.rectScan(spark, store,
        "za", "zb", 2, 191, 32, 159, 8)
      .select("event_id", "hval").as[(Long, Long)].collect().toSet
    def expectOf(src: org.apache.spark.sql.DataFrame) =
      src.filter($"za".between(2, 191) && $"zb".between(32, 159))
        .select($"event_id",
          graft.plans.LayoutExpressions.hilbertValue(
            $"za".cast("long"), $"zb".cast("long"), 8).as("h"))
        .as[(Long, Long)].collect().toSet
    val expect1 = expectOf(base.unionByName(batch1))
    assert(rows() === expect1, "streamed tail must serve the full grid")
    def tailState(): (Seq[String], Set[String]) = {
      val cur = graft.sources.SnapshotDir
        .current(spark, store, "hilb-").get
      val m = graft.sources.ManifestDir.read(spark, cur)
      (m.segments("tail"),
        m.meta.get("tail_tags").map(_.split(",").toSet)
          .getOrElse(Set.empty))
    }
    val (segs1, tags1) = tailState()
    assert(segs1.size === 2, "one tail segment per trigger")
    // tags are NAMESPACED by checkpoint: two triggers, one namespace
    assert(tags1.map(_.takeRight(10)) ===
      Set("-b00000000", "-b00000001"))
    assert(tags1.map(_.dropRight(10)).size === 1,
      "one checkpoint lineage → one tag namespace")
    // REDELIVERY (same lineage): a crashed trigger whose commit-log
    // write was lost re-runs with the SAME namespaced tag — already in
    // the durable set, skipped whole, manifest and scan unchanged
    HilbertStore.appendTail(batch1, store, "za", "zb", 8,
      batchTag = Some(tags1.max))
    assert(tailState() === ((segs1, tags1)))
    assert(rows() === expect1, "redelivery must not duplicate rows")
    // a NEW checkpoint restarts batchIds at 0 but carries a NEW
    // namespace, so its genuinely new batches must LAND — the unscoped
    // b00000000 tag would have silently skipped them as redeliveries
    StreamingSync.hilbertMaintReplay(spark, batch2, store,
      "za", "zb", 8, orderCol = "event_id", nBatches = 2,
      workDir = s"$dir/rep2")
    val expectAll = expectOf(g)
    assert(rows() === expectAll,
      "a fresh checkpoint's new batches must append, not be skipped")
    val (segs2, tags2) = tailState()
    assert(segs2.size === 4)
    assert(tags2.map(_.dropRight(10)).size === 2,
      "two checkpoint lineages → two tag namespaces")
    // lifecycle closes: optimize folds the streamed tail in AND prunes
    // the durable tag set to each namespace's highest batch (only the
    // latest trigger per lineage can still be redelivered; lower tags
    // would re-serialize into every later manifest forever)
    HilbertStore.optimize(spark, store, 16)
    assert(rows() === expectAll, "parity must survive optimize")
    val (segs3, tags3) = tailState()
    assert(segs3.isEmpty, "optimize absorbs the tail")
    assert(tags3.map(_.takeRight(10)) === Set("-b00000001") &&
      tags3.size === 2,
      "optimize keeps exactly the per-namespace max tag")
    // and a post-optimize redelivery of a pruned-set survivor no-ops
    HilbertStore.appendTail(batch2, store, "za", "zb", 8,
      batchTag = Some(tags3.max))
    assert(rows() === expectAll)
  }

  test("msprt maintenance: stream-served p equals the batch sequence; " +
      "redelivery never double-counts") {
    import graft.operators.Hypothesis
    import org.apache.spark.sql.functions.col
    val ev = Tables.events(spark, sf0001)
    val dir = tmp()
    val served = StreamingSync.msprtMaintReplay(spark, ev,
      nBatches = 4, workDir = s"$dir/rep")
    val batch = Hypothesis.msprtSeq(ev,
      Hypothesis.variantOf(col("user_id")))
    assert(served.count() === batch.count())
    assert(served.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(served).count() === 0)
    // redelivery: re-appending an already-stored batchId is a no-op —
    // the partial table is unchanged, so the served p cannot move.
    // (Stored ids are checkpoint-namespaced, so the probe reuses one
    // the sink actually wrote rather than a bare 0.)
    val store = s"$dir/rep/msprt-store"
    val stored = spark.read.parquet(store)
    val before = stored.count()
    val storedId = stored.agg(org.apache.spark.sql.functions
      .min($"batch_id")).as[Long].head()
    StreamingSync.appendMsprtBatch(ev.limit(50), store, storedId)
    assert(spark.read.parquet(store).count() === before,
      "redelivered trigger must not re-append partials")
  }
}
