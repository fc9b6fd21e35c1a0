package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** Physical-plan regression guards: the properties that make these queries
  * survive a 100× scale-up — filter pushdown to parquet, column pruning,
  * broadcast for the dimension join, codegen coverage of the hot loop. */
class PlanSpec extends SparkSpec {

  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf0001)

  private def scans(df: DataFrame): Seq[FileSourceScanExec] =
    df.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }

  test("window filter reaches the parquet scan as a timestamp range") {
    val scan = scans(run("p3_date_window")).head
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(o_orderdate"))
    assert(pushed.contains("LessThan(o_orderdate"))
  }

  test("scans read only the referenced columns (pruning)") {
    val scan = scans(run("p3_date_window")).head
    assert(scan.requiredSchema.fieldNames.toSet ===
      Set("o_orderkey", "o_orderdate"))
  }

  /** Run `body` with AQE off so the static physical plan is inspectable
    * (AdaptiveSparkPlanExec hides its inner plan from collect/toString). */
  private def withStaticPlan[T](body: => T): T = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("catalog enrichment is a broadcast hash join with pruned sides") {
    withStaticPlan {
      val df = run("s10_catalog_enrich")
      val plan = df.queryExecution.executedPlan
      assert(plan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty)
      val custScan = scans(df)
        .find(_.requiredSchema.fieldNames.contains("c_name")).get
      assert(custScan.requiredSchema.fieldNames.toSet ===
        Set("c_custkey", "c_name"))
    }
  }

  test("similarity hot loop stays inside whole-stage codegen") {
    withStaticPlan {
      val plan = run("x_ann_cosine_topk").queryExecution.executedPlan.toString
      // "*(n)" marks whole-stage-codegen'd operators; the custom expression
      // must appear inside one of them, not in an interpreted Project
      assert(plan.contains("*("))
      assert(plan.toLowerCase.contains("dotproduct"))
    }
  }

  test("minhash verifies candidates from arrays, not an index re-join") {
    withStaticPlan {
      val plan = run("x_dedup_minhash_lsh").queryExecution.executedPlan
        .toString
      assert(plan.contains("array_intersect")) // per-pair set verify...
      assert(plan.contains("collect_list"))    // ...from per-doc arrays
      // the old shape counted intersections by re-joining the exploded
      // index against the candidate list — no pair-grouped count remains
      assert(!plan.contains("count(1) AS inter"))
    }
  }

  test("near-dup candidates come from an equi-join, never a nested loop") {
    withStaticPlan {
      val plan = run("x_embed_near_dup").queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"))
      assert(!plan.contains("CartesianProduct"))
    }
  }

  test("interval join keys on user, never a nested loop over the band") {
    withStaticPlan {
      val plan = run("x_interval_join").queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"))
      assert(!plan.contains("CartesianProduct"))
    }
  }

  test("per-row curation ops plan without any exchange") {
    withStaticPlan {
      // chunking and truncation are scan-speed per-row transforms — a
      // shuffle anywhere in these plans would be a scale bug
      for (q <- Seq("x_chunk_windows", "x_truncate")) {
        val plan = run(q).queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), q)
      }
    }
  }

  test("per-group rank limits push down as WindowGroupLimit") {
    withStaticPlan {
      // rank <= k must prune BEFORE the shuffle (partial WindowGroupLimit)
      // so no task ever sorts a whole group's rows — the property that
      // keeps tfidf/top-k-per-group alive when one group is huge
      for (q <- Seq("x_tfidf_top", "x_best_per_source",
          "x_sample_weighted")) {
        val plan = run(q).queryExecution.executedPlan.toString
        assert("WindowGroupLimit".r.findAllIn(plan).length >= 2, q)
      }
    }
  }

  test("pmi's only cross joins are the two 1-row totals broadcasts") {
    withStaticPlan {
      val plan = run("x_pmi_colloc").queryExecution.executedPlan
      val loops = plan.collect {
        case j: org.apache.spark.sql.execution.joins
          .BroadcastNestedLoopJoinExec => j
      }
      // the totals (nb, nu) are single-row aggregates broadcast as
      // literals; every unigram join must be a real equi-join
      assert(loops.length === 2)
      assert(loops.forall(j => Seq(j.left, j.right).exists(side =>
        side.collectFirst {
          case b: org.apache.spark.sql.execution.exchange
            .BroadcastExchangeExec => b
        }.exists(_.collectFirst {
          case a: org.apache.spark.sql.execution.aggregate
            .HashAggregateExec => a
        }.nonEmpty))))
    }
  }

  test("decontamination fallback runs without any broadcast build") {
    withStaticPlan {
      // with auto-broadcast off (the stand-in for "benchmark side too big
      // to broadcast"), the fallback must plan a shuffle equi-join — and
      // the default path must still force its broadcast hint
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        import org.apache.spark.sql.functions.col
        val docs = Tables.documents(spark, sf0001)
        val corpus = docs.filter(col("doc_id") % 50 =!= 0)
        val bench = docs.filter(col("doc_id") % 50 === 0)
        val fallback = graft.operators.Contamination
          .ngramOverlap(corpus, bench, n = 5, broadcastIndex = false)
          .queryExecution.executedPlan.toString
        assert(!fallback.contains("BroadcastHashJoin"))
        assert(!fallback.contains("BroadcastNestedLoopJoin"))
        val hinted = graft.operators.Contamination
          .ngramOverlap(corpus, bench, n = 5)
          .queryExecution.executedPlan.toString
        assert(hinted.contains("BroadcastHashJoin"))
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }
  }

  test("the sync delta is a single join of source against state") {
    val plan = run("c4_sync_router").queryExecution.executedPlan.toString
    val joins = "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(plan).length
    assert(joins === 1) // the reference's probe loop is exactly one join
  }

  test("bucketed fact-to-fact join and keyed aggregation are exchange-free") {
    withStaticPlan {
      val df = run("x_bucketed_join")
      val plan = df.queryExecution.executedPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed join must not shuffle at query time:\n$plan")
      assert(plan.toString.contains("SortMergeJoin"))
      // both scans carry the bucket spec — the clustering comes from
      // the layout, not from an exchange
      assert(scans(df).count(_.relation.bucketSpec.nonEmpty) === 2)
    }
  }

  test("persisted IVFPQ probe prunes the codes scan to the probed lists") {
    import org.apache.spark.sql.functions.col
    withStaticPlan {
      val e = Tables.embeddings(spark, sf0001)
      val path = java.nio.file.Files
        .createTempDirectory("graft-ivfpq-plan").toString
      graft.sources.VectorIndexStore.writeIvfPq(e, path)
      // one query, nprobe=2 → at most 2 of the C list partitions read
      val df = graft.sources.VectorIndexStore.ivfPqTopKFromIndex(
        spark, path, e.filter(col("vec_id") === 0), e, 5)
      val codeScan = scans(df)
        .find(_.relation.partitionSchema.fieldNames.contains("cent_id"))
        .get
      assert(codeScan.partitionFilters.nonEmpty,
        "codes scan must carry static partition filters on cent_id")
      val lists = e.filter(col("vec_id") % 37 === 0).count()
      val selected = codeScan.selectedPartitions.partitionCount
      assert(selected <= 2, s"probe read $selected lists, nprobe is 2")
      assert(selected < lists,
        s"no pruning: read $selected of $lists list partitions")
    }
  }

  /** Set runtime confs for `body`, restoring previous values after. */
  private def withConfs[T](kvs: (String, String)*)(body: => T): T = {
    val saved = kvs.map { case (k, _) => // get can yield null for unset keys
      k -> scala.util.Try(Option(spark.conf.get(k))).toOption.flatten }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition instead of stalling on it") {
    import org.apache.spark.sql.functions.{col, when}
    import spark.implicits._
    // one key carries ~200k padded rows, the rest are singletons: the
    // classic hot-key shape the dedup/near-dup plans delegate to AQE
    val left = spark.range(0, 210000)
      .select(when(col("id") < 200000, 0L).otherwise(col("id")).as("k"),
        org.apache.spark.sql.functions.md5(col("id").cast("string"))
          .as("v"))
    val right = spark.range(0, 64).select(col("id").as("k"))
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "128KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      // consume with a GLOBAL aggregate: a keyed aggregate after the
      // join would require hash clustering on k, which forbids the
      // split (AQE only splits when no parent needs the partitioning).
      // max(v) keeps the incompressible payload in the shuffle — skew
      // stats are COMPRESSED map-output bytes, and 200k identical longs
      // alone compress below any realistic threshold
      val j = left.join(right, Seq("k"))
        .agg(org.apache.spark.sql.functions.max(col("v")))
      j.collect() // AQE finalizes the plan only after execution
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split join in the adaptive plan:\n$plan")
    }
  }

  test("runtime bloom filter prunes the probe side of a selective join") {
    import org.apache.spark.sql.functions.col
    // a selective dim-side filter should inject a bloom filter on the
    // fact scan once the size thresholds allow it — the runtime
    // semi-join reduction that matters when the fact side is 100 TB
    val o = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT")
    val l = Tables.lineitem(spark, sf0001)
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val j = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(o("o_orderpriority")).count()
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") &&
        plan.contains("bloom_filter_agg"),
        s"expected a runtime bloom filter on the probe side:\n$plan")
    }
  }

  test("bloom decontamination probe is a pure scan: no join, no exchange") {
    import org.apache.spark.sql.functions.col
    withStaticPlan {
      val docs = Tables.documents(spark, sf0001)
      val bloom = graft.operators.Contamination.benchmarkNgramBloom(
        docs.filter(col("doc_id") % 50 === 0), n = 5)
      val probe = docs.select(col("doc_id"),
        graft.operators.Contamination
          .bloomContaminated(bloom, col("text"), 5).as("hit"))
      val plan = probe.queryExecution.executedPlan
      assert(plan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }.isEmpty, "the benchmark vocabulary must not be joined")
      assert(!plan.toString.contains("Exchange"),
        "the corpus side must not shuffle")
    }
  }

  test("incremental dedup streams the store through a broadcast batch join") {
    import org.apache.spark.sql.functions.col
    withStaticPlan {
      val docs = Tables.documents(spark, sf0001)
      val path = java.nio.file.Files
        .createTempDirectory("graft-fpplan").toString
      graft.sources.FingerprintStore.writeFingerprints(
        docs.filter(col("doc_id") % 10 =!= 0), path)
      val df = graft.sources.FingerprintStore.dedupBatchAgainst(
        spark, path, docs.filter(col("doc_id") % 10 === 0), 0.1)
      val plan = df.queryExecution.executedPlan
      // the corpus-sized bucket relation must sit on the STREAMED side
      // of a broadcast hash join — the store is scanned once, map-side,
      // and never shuffles; only the batch-sized side is built
      def storeScan(p: org.apache.spark.sql.execution.SparkPlan) =
        p.collect {
          case s: FileSourceScanExec if s.metadata.get("Location")
            .exists(l => l.contains("/buckets") && !l.contains("arrays"))
            => s
        }.nonEmpty
      val bhj = plan.collect { case b: BroadcastHashJoinExec => b }
      assert(bhj.exists { b =>
        b.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft =>
            storeScan(b.right)
          case org.apache.spark.sql.catalyst.optimizer.BuildRight =>
            storeScan(b.left)
        }
      }, s"expected the store scan streamed through a broadcast join:\n" +
        plan.toString)
    }
  }

  test("stored-vocab encode is a broadcast join, no training stages") {
    withStaticPlan {
    val docs = Tables.documents(spark, sf0001)
    val path = java.nio.file.Files
      .createTempDirectory("graft-bpeplan").toString + "/vocab"
    graft.sources.TokenizerStore.ensureVocab(docs, path, 3)
    val df = graft.sources.TokenizerStore.encodeFromStore(
      spark, path, docs)
    val plan = df.queryExecution.executedPlan
    // the vocab rides ONE broadcast hash join — the 100 TB encode is
    // scan + map-side join + one doc_id shuffle, nothing else
    assert(plan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
      s"vocab join must broadcast:\n$plan")
    // exactly two file scans: corpus + stored vocab — zero training
    // aggregates re-deriving merges (the store's whole point)
    val sc = scans(df)
    assert(sc.length === 2, s"expected corpus+vocab scans, got:\n$plan")
    assert(sc.exists(_.metadata.get("Location")
      .exists(_.contains("/seg/"))), "one scan reads the store")
    // one exchange total (the per-doc aggregate); training would add
    // its word-frequency shuffle and per-merge aggregates
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.length <= 1,
      s"stored encode must shuffle once (doc aggregate), got " +
        s"${exchanges.length}:\n$plan")
    }
  }

  private def shuffles(df: DataFrame) =
    df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }

  test("grouping sets are one Expand-backed aggregate, one shuffle") {
    withStaticPlan {
      for (q <- Seq("x_rollup_stats", "x_cube_stats")) {
        val df = run(q)
        val plan = df.queryExecution.executedPlan
        assert(plan.collect {
          case e: org.apache.spark.sql.execution.ExpandExec => e
        }.length === 1, s"$q must plan via Expand:\n$plan")
        // one scan, one exchange: never one job per grouping level
        assert(scans(df).length === 1, s"$q: single scan:\n$plan")
        assert(shuffles(df).length === 1, s"$q: single shuffle:\n$plan")
      }
    }
  }

  test("pivot is ONE conditional aggregate; unpivot adds no shuffle") {
    withStaticPlan {
      val p = run("x_pivot_daily")
      assert(shuffles(p).length === 1,
        "declared-domain pivot must be a single aggregate (the " +
          s"built-in pivot's two-exchange lowering regressed in):\n" +
          p.queryExecution.executedPlan)
      assert(scans(p).head.requiredSchema.fieldNames.toSet ===
        Set("ts", "event_type"))
      val u = run("x_unpivot_daily")
      assert(shuffles(u).length === 1,
        "unpivot is a projection over the pivot — zero extra shuffles")
    }
  }

  test("scd2 compaction: both window passes share one shuffle+sort") {
    withStaticPlan {
      val df = run("x_scd2_history")
      val plan = df.queryExecution.executedPlan
      assert(plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.length === 2, s"lag + lead passes:\n$plan")
      assert(shuffles(df).length === 1,
        s"one user_id partitioning serves both windows:\n$plan")
      assert(plan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }.length === 1,
        s"the (ts, event_id) sort must be reused by the lead:\n$plan")
    }
  }

  test("gap fill scans the fact table once and never self-joins") {
    withStaticPlan {
      val df = run("x_gap_fill_locf")
      val plan = df.queryExecution.executedPlan
      assert(scans(df).length === 1,
        s"the spine⋈daily shape would scan events twice:\n$plan")
      assert(plan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }.isEmpty, s"LOCF is a window + generate, not a join:\n$plan")
    }
  }

  test("expectations: fused row-level scan + broadcast anti-join RI") {
    withStaticPlan {
      val df = run("x_expectations")
      val plan = df.queryExecution.executedPlan
      val anti = plan.collect { case b: BroadcastHashJoinExec => b }
      assert(anti.exists(_.joinType.sql == "LEFT ANTI"),
        s"referential integrity must probe a broadcast:\n$plan")
      // row-level checks + key uniqueness fuse into ONE lineitem scan;
      // the anti-join is the second; orders' key column is the third
      assert(scans(df).length === 3, s"3 scans total:\n$plan")
    }
  }

  test("fuzzy join: variant equi-join, never a nested loop") {
    withStaticPlan {
      val plan = run("x_fuzzy_join").queryExecution.executedPlan
      assert(plan.collect {
        case j: org.apache.spark.sql.execution.joins
          .BroadcastNestedLoopJoinExec => j
        case c: org.apache.spark.sql.execution.joins
          .CartesianProductExec => c
      }.isEmpty, s"symmetric-delete candidates must meet by " +
        s"EQUI-join on the shared variant:\n$plan")
      val equi = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }
      assert(equi.nonEmpty && equi.forall(_.leftKeys.nonEmpty),
        s"every join carries equi keys:\n$plan")
    }
  }

  test("pit join: equi key + interval residual, never a range scan") {
    withStaticPlan {
      val plan = run("x_pit_join").queryExecution.executedPlan
      assert(plan.collect {
        case j: org.apache.spark.sql.execution.joins
          .BroadcastNestedLoopJoinExec => j
        case c: org.apache.spark.sql.execution.joins
          .CartesianProductExec => c
      }.isEmpty, s"the interval predicate must ride an equi join " +
        s"as a residual, not a nested loop:\n$plan")
      val joins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }
      assert(joins.exists(j => j.leftKeys.nonEmpty &&
        j.condition.isDefined),
        s"expected key + residual condition:\n$plan")
    }
  }

  test("scd2 store merge reads stored history + delta, nothing else") {
    withStaticPlan {
      val df = run("x_scd2_store")
      val plan = df.queryExecution.executedPlan
      val sc = scans(df)
      // the merge touches only the keys-sized stored dimension and
      // the ts-filtered delta (each re-derived per branch — small
      // relations); what must NEVER appear is an UNFILTERED fact
      // scan, which would mean history is being recompacted
      assert(sc.exists(_.metadata.get("Location")
        .exists(_.contains("scd2-000"))), "reads the stored dimension")
      val eventsScans = sc.filter(_.metadata.get("Location")
        .exists(_.contains("events.parquet")))
      assert(eventsScans.nonEmpty)
      eventsScans.foreach { s =>
        assert(s.metadata("PushedFilters")
          .contains("GreaterThanOrEqual(ts"),
          s"every fact scan must carry the delta cutoff:\n$plan")
      }
    }
  }

  test("sparse cosine: postings meet by term equi-join off the cache") {
    withStaticPlan {
      val plan = run("x_sparse_topk").queryExecution.executedPlan
      assert(plan.collect {
        case j: org.apache.spark.sql.execution.joins
          .BroadcastNestedLoopJoinExec => j
        case c: org.apache.spark.sql.execution.joins
          .CartesianProductExec => c
      }.isEmpty, s"candidates only via shared postings:\n$plan")
      // the pruned posting relation is cached and read from multiple
      // branches (norms, query side, corpus side) — without the cache
      // every branch re-runs the corpus shingle explode
      assert(plan.collect {
        case m: org.apache.spark.sql.execution.columnar
          .InMemoryTableScanExec => m
      }.nonEmpty, s"postings must serve from the tracked cache:\n$plan")
    }
  }

  test("cdc apply: no window; the one exchange carries combined rows") {
    withStaticPlan {
      val df = run("x_cdc_apply")
      val plan = df.queryExecution.executedPlan
      assert(plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty,
        s"the row_number shape would shuffle the raw log:\n$plan")
      val ex = shuffles(df)
      assert(ex.length === 1,
        s"one keys-sized exchange:\n$plan")
      // partial aggregation runs BEFORE the exchange: the shuffle
      // moves one combined row per (partition, key), never raw ops
      assert(ex.head.child.collectFirst {
        case a: org.apache.spark.sql.execution.aggregate
          .BaseAggregateExec if a.aggregateExpressions
          .exists(_.mode == org.apache.spark.sql.catalyst.expressions
            .aggregate.Partial) => a
      }.nonEmpty, s"map-side combine below the exchange:\n$plan")
    }
  }

  test("triangle census joins by key orientation, never all-pairs") {
    withStaticPlan {
      val plan = run("x_triangle_count").queryExecution.executedPlan
      assert(plan.collect {
        case j: org.apache.spark.sql.execution.joins
          .BroadcastNestedLoopJoinExec if j.joinType.sql != "CROSS" => j
        case c: org.apache.spark.sql.execution.joins
          .CartesianProductExec => c
      }.isEmpty, s"wedges must meet by equi-join (the only cross " +
        s"joins are the 1-row count stitches):\n$plan")
    }
  }

  /** Collect file scans and explode stages through InMemoryRelation
    * boundaries (the tracked caches hide their build plans there). */
  private def deepNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    p.collect {
      case s: FileSourceScanExec => Seq(s)
      case g: org.apache.spark.sql.execution.GenerateExec => Seq(g)
      case m: org.apache.spark.sql.execution.columnar
          .InMemoryTableScanExec => deepNodes(m.relation.cachedPlan)
    }.flatten

  test("graph consumers read the committed pair store, not the LSH chain") {
    withStaticPlan {
      // the census (and every other graph consumer) must serve off the
      // EdgeStore parquet: pair-list cost is paid once at build, so the
      // serve plan scans the store and carries NO banding stages (no
      // embeddings scan, no posexplode of band keys)
      val nodes = deepNodes(
        run("x_triangle_count").queryExecution.executedPlan)
      val ss = nodes.collect { case s: FileSourceScanExec => s }
      assert(ss.nonEmpty &&
        ss.forall(_.relation.location.rootPaths.head.toString
          .contains("graft-ndpairs")),
        s"census must scan only the pair store:\n${ss.map(_.relation)}")
      assert(nodes.collect {
        case g: org.apache.spark.sql.execution.GenerateExec => g
      }.isEmpty, "no explode stages: the LSH chain must not be inline")
    }
  }

  test("cluster consumers read the committed label table, not the pairs") {
    withStaticPlan {
      // dedup-group assignment serves off the ClusterStore: one left
      // join of the corpus against the resolved labels — the plan
      // scans ONLY the `_labels` parquet and the embeddings table; no
      // pair-file scan, no label propagation, no banding stages
      val nodes = deepNodes(
        run("x_embed_dedup_cluster").queryExecution.executedPlan)
      val ss = nodes.collect { case s: FileSourceScanExec => s }
      val roots = ss.map(_.relation.location.rootPaths.head.toString)
      assert(roots.exists(_.contains("/labels")),
        s"must scan the committed label table:\n$roots")
      assert(roots.forall(r => r.contains("/labels") ||
        r.contains("testdata")),
        s"only labels + the vertex table may be scanned:\n$roots")
      assert(nodes.collect {
        case g: org.apache.spark.sql.execution.GenerateExec => g
      }.isEmpty, "no explode stages: neither LSH nor the pair " +
        "endpoint expansion may be inline")
    }
  }

  test("community sweep: one 1-row 2m broadcast, degree joins are keyed") {
    withStaticPlan {
      val plan = run("x_community_l1").queryExecution.executedPlan
      // the only non-equi join is the single-row total-weight (2m)
      // broadcast; both weighted-degree lookups must be real equi-joins
      val loops = plan.collect {
        case j: org.apache.spark.sql.execution.joins
          .BroadcastNestedLoopJoinExec => j
      }
      assert(loops.length === 1, s"expected exactly the 2m broadcast:\n$plan")
      assert(loops.forall(j => Seq(j.left, j.right).exists(side =>
        side.collectFirst {
          case b: org.apache.spark.sql.execution.exchange
            .BroadcastExchangeExec => b
        }.exists(_.collectFirst {
          case a: org.apache.spark.sql.execution.aggregate
            .HashAggregateExec => a
        }.nonEmpty))))
      assert(plan.collect {
        case c: org.apache.spark.sql.execution.joins
          .CartesianProductExec => c
      }.isEmpty, "no cartesian products in the sweep")
    }
  }

  test("cep: the chain is windows over ONE user exchange, no self-joins") {
    withStaticPlan {
      val plan = run("x_cep_pattern").queryExecution.executedPlan
      // no nested loop / cartesian anywhere: steps thread through
      // window maxima, not per-step joins
      assert(plan.collect {
        case j: org.apache.spark.sql.execution.joins
          .BroadcastNestedLoopJoinExec => j
        case c: org.apache.spark.sql.execution.joins
          .CartesianProductExec => c
      }.isEmpty, s"CEP must never self-join per step:\n$plan")
      // all step windows collapse into user-keyed Window operators —
      // and exactly ONE sort-merge-free anchor join closes the match
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.nonEmpty &&
        windows.forall(_.partitionSpec.nonEmpty),
        s"every window must be user-keyed (no global window):\n$plan")
    }
  }

  test("containment candidates come from shared shingles, never all-pairs") {
    withStaticPlan {
      val plan = run("x_containment").queryExecution.executedPlan
      assert(plan.collect {
        case j: org.apache.spark.sql.execution.joins
          .BroadcastNestedLoopJoinExec => j
        case c: org.apache.spark.sql.execution.joins
          .CartesianProductExec => c
      }.isEmpty, s"containment must pair-expand from postings:\n$plan")
    }
  }

  test("bm25 cuts top-k by TakeOrdered, never a global sort of docs") {
    withStaticPlan {
      val df = run("x_bm25_topk")
      val plan = df.queryExecution.executedPlan
      assert(plan.collect {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec
          => t
      }.nonEmpty, s"the k-cut must be TakeOrderedAndProject:\n$plan")
      assert(plan.collect {
        case b: BroadcastHashJoinExec => b
      }.length >= 2, s"df and avgdl ride broadcasts:\n$plan")
    }
  }

  test("theta overlap aggregates sketch bytes, never distinct keys") {
    withStaticPlan {
      // the overlap query combines its sketches at build time, so the
      // pin inspects the sketch fold itself: the per-audience
      // aggregate the operator runs before the driver-side algebra
      val df = Tables.events(spark, sf0001)
        .groupBy(org.apache.spark.sql.functions.col("event_type"))
        .agg(graft.plans.ThetaFunctions.thetaSketchAgg(
          org.apache.spark.sql.functions.col("user_id"), 256).as("sk"))
      val plan = df.queryExecution.executedPlan
      assert(plan.collect {
        case o: org.apache.spark.sql.execution.aggregate
          .ObjectHashAggregateExec => o
      }.length === 2, // partial + final: bytes through the exchange
        s"the sketch fold must plan as ObjectHashAggregate:\n$plan")
    }
  }

  test("mv rewrite routes the driver-shaped rollup off the fact scan") {
    import org.apache.spark.sql.functions._
    import graft.plans.AggStoreRewrite
    // the exact x_mv_rewrite shape THROUGH the Tables.events loader —
    // pins that the registered view reroutes on the real driver path,
    // not just on a hand-built fixture
    val store = java.nio.file.Files
      .createTempDirectory("graft-mvplan").toString
    graft.sources.AggStore.ensureState(Tables.events(spark, sf0001),
      store, baseTag = "plan-pin")
    spark.conf.set(AggStoreRewrite.PathKey, store)
    spark.conf.set(AggStoreRewrite.SourceKey, s"$sf0001/events.parquet")
    try {
      val q = Tables.events(spark, sf0001)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast(org.apache.spark.sql.types
            .DecimalType(18, 2))).as("total"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("/seg/"), s"not routed:\n$plan")
      assert(!plan.contains("events.parquet"),
        s"fact scan survived:\n$plan")
    } finally {
      spark.conf.unset(AggStoreRewrite.PathKey)
      spark.conf.unset(AggStoreRewrite.SourceKey)
    }
  }

  test("mv rewrite routes COARSE rollups and tie-breaks ambiguous " +
      "views by partial-row count") {
    import org.apache.spark.sql.functions._
    import graft.plans.AggStoreRewrite
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mvplan-c").toString
    graft.sources.AggStore.ensureState(Tables.events(spark, sf0001),
      s"$dir/store", baseTag = "plan-pin-c")
    def monthly(base: org.apache.spark.sql.DataFrame) = base
      .groupBy(trunc(to_date(col("ts")), "month").as("month"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(org.apache.spark.sql.types
          .DecimalType(18, 2))).as("total"))
    val expected = monthly(Tables.events(spark, sf0001))
      .collect().map(_.toString).sorted.toSeq
    spark.conf.set(AggStoreRewrite.PathKey, s"$dir/store")
    spark.conf.set(AggStoreRewrite.SourceKey, s"$sf0001/events.parquet")
    try {
      // aggregate-on-aggregate: the monthly view routes onto the
      // DAILY partials (regrouped by trunc(day)); the fact scan is gone
      val q = monthly(Tables.events(spark, sf0001))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("/seg/"), s"coarse view not routed:\n$plan")
      assert(!plan.contains("events.parquet"),
        s"fact scan survived the coarse rewrite:\n$plan")
      assert(q.collect().map(_.toString).sorted.toSeq === expected)
      // a key that mixes in a NON-key column must block
      val mixed = Tables.events(spark, sf0001)
        .groupBy(trunc(to_date(col("ts")), "month").as("month"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast(org.apache.spark.sql.types
            .DecimalType(18, 2))).as("total"))
        .filter(col("cnt") >= 0) // post-agg filter is fine either way
      assert(mixed.collect().length === expected.length)
      // AMBIGUOUS registration: a second (bogus, larger) store also
      // matches the scan via an overlapping suffix — the tie-break
      // must pick the FEWER-partial-rows store, here the correct one
      graft.sources.AggStore.ensureState(
        Tables.events(spark, sf0001).unionByName(
          Tables.events(spark, sf0001)
            .withColumn("event_type", concat(col("event_type"),
              lit("_dup")))),
        s"$dir/big", baseTag = "plan-pin-c-big")
      spark.conf.set(AggStoreRewrite.ViewsKey,
        s"$sf0001/events.parquet=$dir/big")
      val tie = monthly(Tables.events(spark, sf0001))
      val tPlan = tie.queryExecution.executedPlan.toString
      assert(!tPlan.contains("events.parquet"))
      assert(tie.collect().map(_.toString).sorted.toSeq === expected,
        "tie-break must choose the smaller (correct) store")
    } finally {
      spark.conf.unset(AggStoreRewrite.PathKey)
      spark.conf.unset(AggStoreRewrite.SourceKey)
      spark.conf.unset(AggStoreRewrite.ViewsKey)
    }
  }

  test("mv rewrite: key filters compensate, non-key filters block, " +
      "sibling paths never match") {
    import org.apache.spark.sql.functions._
    import graft.plans.AggStoreRewrite
    val store = java.nio.file.Files
      .createTempDirectory("graft-mvplan-f").toString
    graft.sources.AggStore.ensureState(Tables.events(spark, sf0001),
      store, baseTag = "plan-pin-f")
    spark.conf.set(AggStoreRewrite.PathKey, store)
    spark.conf.set(AggStoreRewrite.SourceKey, s"$sf0001/events.parquet")
    def rollup(base: org.apache.spark.sql.DataFrame) = base
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(org.apache.spark.sql.types
          .DecimalType(18, 2))).as("total"))
    try {
      // a group-key filter (day range + type IN) compensates: the
      // predicate lands on the store partials and the fact scan is gone
      val keyFiltered = rollup(Tables.events(spark, sf0001)
        .filter(to_date(col("ts"))
          .between(lit("2024-01-10"), lit("2024-01-20")) &&
          col("event_type").isin("view", "click")))
      val kPlan = keyFiltered.queryExecution.executedPlan.toString
      assert(kPlan.contains("/seg/"), s"key filter not routed:\n$kPlan")
      assert(!kPlan.contains("events.parquet"),
        s"fact scan survived the compensated rewrite:\n$kPlan")
      // ... and the rows equal the direct (un-routed) computation
      val expected = {
        spark.conf.unset(AggStoreRewrite.PathKey)
        try keyFiltered.collect().map(_.toString).sorted.toSeq
        finally spark.conf.set(AggStoreRewrite.PathKey, store)
      }
      assert(keyFiltered.collect().map(_.toString).sorted.toSeq
        === expected)
      // a non-key filter (value bound — not derivable from partials)
      // blocks: the fact scan must survive
      val nonKey = rollup(Tables.events(spark, sf0001)
        .filter(col("value") > 5.0))
      assert(nonKey.queryExecution.executedPlan.toString
        .contains("events.parquet"),
        "a non-key filter must fall through to the fact scan")
      // a non-deterministic key filter blocks too (the rand() bound
      // stays in [0,1) so Catalyst's rand-range folding can't erase it)
      val nonDet = rollup(Tables.events(spark, sf0001)
        .filter(col("event_type") === "view" || rand() < 0.5))
      assert(nonDet.queryExecution.executedPlan.toString
        .contains("events.parquet"),
        "a non-deterministic filter must fall through")
      // a SIBLING dataset whose path merely ends with the registered
      // suffix must not be routed (path-separator anchoring)
      val sibling = java.nio.file.Files
        .createTempDirectory("graft-mvplan-sib").toString
      val sibDir = s"$sibling/archive-${
        java.nio.file.Paths.get(sf0001).getFileName}"
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(sibDir))
      Tables.events(spark, sf0001).limit(7).write
        .parquet(s"$sibDir/events.parquet")
      spark.conf.set(AggStoreRewrite.SourceKey,
        s"${java.nio.file.Paths.get(sf0001).getFileName}/events.parquet")
      val sib = rollup(Tables.events(spark, sibDir))
      // (the FileScan's Location string truncates long paths, so pin
      // on the store path's absence rather than the fact path's text)
      assert(!sib.queryExecution.executedPlan.toString.contains("/seg/"),
        "a sibling suffix path must never route to the store")
      // while the REGISTERED relative suffix still routes
      val reg = rollup(Tables.events(spark, sf0001))
      assert(!reg.queryExecution.executedPlan.toString
        .contains("events.parquet"),
        "the registered suffix must still route")
    } finally {
      spark.conf.unset(AggStoreRewrite.PathKey)
      spark.conf.unset(AggStoreRewrite.SourceKey)
    }
  }

  test("cms fold ships counter bytes; the estimate stays in codegen") {
    withStaticPlan {
      // the sketch build: partial + final ObjectHashAggregate, the
      // exchange carries one 24 KB matrix per partition — never a
      // token-level row
      val df = graft.operators.CountMin.cmsState(
        Tables.documents(spark, sf0001),
        org.apache.spark.sql.functions.lit(0), 3, 1024)
      assert(df.queryExecution.executedPlan.collect {
        case o: org.apache.spark.sql.execution.aggregate
          .ObjectHashAggregateExec => o
      }.length === 2,
        s"the cms fold must plan as ObjectHashAggregate:\n" +
          s"${df.queryExecution.executedPlan}")
      // the distributed point lookup against the driver-held sketch
      // is a plain projection INSIDE a WholeStageCodegen span: no
      // join, no exchange, no interpreted eval per row
      val sketch = new graft.plans.CmsBuffer(3, 64)
      val est = Tables.documents(spark, sf0001)
        .select(graft.plans.CmsFunctions.cmsEstimate(
          org.apache.spark.sql.functions.col("source"), sketch).as("e"))
      val plan = est.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"estimate must not shuffle:\n$plan")
      // "*(n)" marks whole-stage-codegen'd operators; the lookup must
      // sit inside one, not in an interpreted Project
      assert(plan.contains("*(") &&
        plan.toLowerCase.contains("cms_estimate"),
        s"estimate must stay in codegen:\n$plan")
    }
  }

  test("ivm merge never rescans history: stored partials + delta agg") {
    withStaticPlan {
      val df = run("x_ivm_daily")
      val plan = df.queryExecution.executedPlan
      val sc = scans(df)
      // one scan of the keys-sized stored state, one of the delta
      assert(sc.length === 2, s"store + delta scans only:\n$plan")
      assert(sc.exists(_.metadata.get("Location")
        .exists(_.contains("/seg/"))), "one scan reads the store")
      // delta aggregate + the keys-sized merge aggregate
      assert(shuffles(df).length <= 2, s"merge is keys-sized:\n$plan")
    }
  }

  test("skyline sweeps the distinct-x frame, never the O(n²) join") {
    withStaticPlan {
      val df = run("x_skyline")
      val plan = df.queryExecution.executedPlan
      assert(plan.collect {
        case j: org.apache.spark.sql.execution.joins
          .BroadcastNestedLoopJoinExec => j
        case c: org.apache.spark.sql.execution.joins
          .CartesianProductExec => c
      }.isEmpty, s"the dominance anti-join shape crept in:\n$plan")
      // one sweep window over the grouped-by-x frame
      assert(plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.length === 1, s"one descending sweep only:\n$plan")
    }
  }

  test("assoc rules fan out from ONE cached baskets frame") {
    withStaticPlan {
      val df = run("x_assoc_rules")
      val plan = df.queryExecution.executedPlan
      // basket count / per-type / pairs all read the cache, and the
      // small-side joins broadcast — the corpus is never self-joined
      assert(plan.collect {
        case c: org.apache.spark.sql.execution.columnar
          .InMemoryTableScanExec => c
      }.length >= 3, s"three readers off the baskets cache:\n$plan")
      assert(plan.collect {
        case j: org.apache.spark.sql.execution.joins
          .SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins
          .ShuffledHashJoinExec => j
      }.isEmpty, s"alphabet-sized sides must broadcast:\n$plan")
    }
  }

  test("gini: the rank window and the final agg share one shuffle") {
    withStaticPlan {
      val df = run("x_gini_segment")
      val plan = df.queryExecution.executedPlan
      // customer broadcasts; the only hash exchange is the segment
      // partitioning, which the window AND the group-by both reuse
      assert(plan.collect {
        case b: BroadcastHashJoinExec => b
      }.nonEmpty, s"dimension join must broadcast:\n$plan")
      assert(shuffles(df).length === 1,
        s"rank + agg share the segment exchange:\n$plan")
    }
  }

  test("chi-square: cells-sized marginals broadcast onto the cells") {
    withStaticPlan {
      val df = run("x_chisq_indep")
      val plan = df.queryExecution.executedPlan
      // the fact table is touched ONCE (the observed-counts
      // aggregate feeding the cache); row/col/total marginals join
      // back by broadcast — a shuffled join on a 15-cell frame would
      // be the wrong shape at any scale
      assert(plan.collect {
        case j: org.apache.spark.sql.execution.joins
          .SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins
          .ShuffledHashJoinExec => j
      }.isEmpty, s"marginals must broadcast:\n$plan")
      assert(plan.collect {
        case c: org.apache.spark.sql.execution.columnar
          .InMemoryTableScanExec => c
      }.length >= 3, s"marginals read the cells cache, not the fact:\n$plan")
    }
  }

  test("winsorize: rank, bounds and the final agg share one shuffle") {
    withStaticPlan {
      val df = run("x_winsorized")
      val plan = df.queryExecution.executedPlan
      // row_number window, the two conditional bound windows, and
      // the closing group-by all partition on the group key — one
      // exchange end to end
      assert(shuffles(df).length === 1,
        s"rank + bounds + agg share the group exchange:\n$plan")
    }
  }

  test("acf: the fact collapses before any window or self-product") {
    withStaticPlan {
      val df = run("x_acf_daily")
      val plan = df.queryExecution.executedPlan
      // totals and the denominator ride 1-row broadcasts; the lead()
      // windows run over the days-sized frame — no shuffled join, no
      // fact-sized window
      assert(plan.collect {
        case j: org.apache.spark.sql.execution.joins
          .SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins
          .ShuffledHashJoinExec => j
      }.isEmpty, s"totals must broadcast:\n$plan")
    }
  }

  test("rank statistics: one fact scan feeds all consumers; the pair " +
    "join is keyed") {
    withStaticPlan {
      // mann_kendall and kendall_tau share the shape: the fact
      // collapses to the cached key-day frame ONCE, then the pair
      // join (days²-bounded), the tie aggregates and the n-days frame
      // all read the cache — never a second parquet pass, never an
      // unkeyed pair product
      for (q <- Seq("x_mann_kendall", "x_kendall_tau")) {
        val df = run(q)
        val plan = df.queryExecution.executedPlan
        val s = plan.toString
        assert(!s.contains("CartesianProduct") &&
          !s.contains("BroadcastNestedLoopJoin"),
          s"$q pair join must be keyed:\n$s")
        assert(scans(df).size <= 1,
          s"$q must scan the fact table at most once (cached key-day " +
            s"frame feeds every consumer):\n$s")
      }
    }
  }

  test("unigram encode: codegen'd kernels, broadcast word→toks join") {
    withStaticPlan {
      val df = run("x_unigram_tok_encode")
      val plan = df.queryExecution.executedPlan
      val s = plan.toString
      // the Viterbi DP is the codegen'd kernel expression (it sits in
      // the word-frame aggregate's result expressions, so it prints in
      // the optimized plan; the vocab-seeding job with char_grams is a
      // separate bounded-metadata execution at plan-build time)
      assert(df.queryExecution.optimizedPlan.toString
        .contains("unigram_viterbi"), s)
      assert(s.contains("*("), s)
      // the corpus meets the segmented word frame through a broadcast
      // join — the corpus-sized side never shuffles on the word key
      assert(plan.collect { case b: BroadcastHashJoinExec => b }
        .nonEmpty, s)
      assert(!s.contains("CartesianProduct") &&
        !s.contains("BroadcastNestedLoopJoin"), s)
    }
  }

  test("inference operators reduce the fact in one pass; windows run " +
      "on bounded frames") {
    withStaticPlan {
      // fdr/msprt: ONE combining aggregate to the segments/day frame;
      // every window below is hypothesis-/calendar-sized. The physical
      // proof: at most one distinct parquet scan of the fact table
      // (identical aggregate subtrees collapse into ReusedExchange).
      for (q <- Seq("x_fdr_bh", "x_msprt_seq")) {
        val df = run(q)
        assert(scans(df).size <= 1,
          s"$q must reduce events in one scan:\n" +
            df.queryExecution.executedPlan)
      }
      // conformal/stl self-join their keys-sized daily frame: the
      // repeated aggregate subtree must reuse the first exchange, not
      // replay the fact scan per consumer
      for (q <- Seq("x_conformal_interval", "x_stl_decompose")) {
        val df = run(q)
        val s = df.queryExecution.executedPlan.toString
        assert(scans(df).size <= 1 || s.contains("ReusedExchange"),
          s"$q must not re-scan the fact per daily-frame consumer:\n$s")
      }
    }
  }
}
