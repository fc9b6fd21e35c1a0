package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphStats

/** Hand-checked fixtures for the iterative graph operators: BFS runs
  * real multi-round frontier expansion (the self-join shape the plan
  * must survive), PageRank is cross-checked against an independent
  * driver-side simulation of the same integer recurrence. */
class GraphStatsSpec extends SparkSpec {
  import spark.implicits._

  // 1—2—3—4 path plus branch 2—5: seed = min vertex = 1
  private val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 5L))

  test("bfs: multi-round frontier distances on a hand-checked graph") {
    val hops = GraphStats.bfsHops(path.toDF("id_a", "id_b"), maxHops = 4)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Int]("hops")).toMap
    assert(hops === Map(1L -> 0, 2L -> 1, 3L -> 2, 5L -> 2, 4L -> 3))
  }

  test("bfs: the hop budget truncates the reach") {
    val hops = GraphStats.bfsHops(path.toDF("id_a", "id_b"), maxHops = 2)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Int]("hops")).toMap
    assert(hops === Map(1L -> 0, 2L -> 1, 3L -> 2, 5L -> 2))
  }

  test("bfs: disconnected component stays unreached; first hop is a wave") {
    // component {10,11} is unreachable from seed 1
    val hops = GraphStats.bfsHops(
      (path ++ Seq((10L, 11L))).toDF("id_a", "id_b"), maxHops = 4)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(hops === Set(1L, 2L, 3L, 4L, 5L))
  }

  test("bfs/pagerank: empty and self-loop-only edge sets yield empty") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val loops = Seq((7L, 7L)).toDF("id_a", "id_b")
    assert(GraphStats.bfsHops(empty).count() === 0L)
    assert(GraphStats.bfsHops(loops).count() === 0L)
    assert(GraphStats.pageRankIntScaled(empty).count() === 0L)
    assert(GraphStats.pageRankIntScaled(loops).count() === 0L)
    assert(GraphStats.pageRankWeighted(
      Seq((7L, 7L, 0.9)).toDF("id_a", "id_b", "cos")).count() === 0L)
  }

  /** Driver-side re-implementation of the integer recurrence —
    * independent of the Spark execution (plain maps and loops). */
  private def simulate(edges: Seq[(Long, Long, Long)], iters: Int,
      scale: Long, seeds: Option[Set[Long]] = None): Map[Long, Long] = {
    val adj = edges.flatMap { case (a, b, w) =>
      Seq((a, b, w), (b, a, w)) }
    val wdeg = adj.groupBy(_._1).map { case (v, es) =>
      v -> es.map(_._3).sum }
    val seedSet = seeds.getOrElse(wdeg.keySet.toSet)
      .filter(wdeg.contains)
    val nS = seedSet.size
    val base = 3L * scale / (20L * nS)
    var scores = wdeg.keys.map(v =>
      v -> (if (seedSet(v)) scale / nS else 0L)).toMap
    for (_ <- 1 to iters) {
      val in = adj.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _, w) =>
          (BigInt(scores(src)) * w / wdeg(src)).toLong }.sum }
      scores = wdeg.keys.map(v =>
        v -> ((if (seedSet(v)) base else 0L) + 17L * in(v) / 20L)).toMap
    }
    scores
  }

  test("pagerank: matches the independent integer simulation") {
    // star 1—{2,3,4} plus edge 2—3: asymmetric degrees
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L))
    val got = GraphStats.pageRankIntScaled(edges.toDF("id_a", "id_b"),
        iters = 5, scale = 1000000000000L)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("score_micro")).toMap
    assert(got === simulate(edges.map(e => (e._1, e._2, 1L)), 5,
      1000000000000L))
    // hub outranks leaves; symmetric 2/3 tie; leaf 4 is lowest
    assert(got(1L) > got(2L) && got(2L) === got(3L) && got(3L) > got(4L))
  }

  test("pagerank: two-vertex graph is the scale/2 fixpoint") {
    val got = GraphStats.pageRankIntScaled(
        Seq((1L, 2L)).toDF("id_a", "id_b"), iters = 3)
      .collect().map(_.getAs[Long]("score_micro")).toSet
    assert(got === Set(500000000000L))
  }

  test("weighted pagerank: matches the simulation; strong ties dominate") {
    // path 1—2—3 with 2—3 carrying 3× the weight of 1—2: vertex 3
    // receives more of 2's mass than vertex 1 does
    val edges = Seq((1L, 2L, 0.2), (2L, 3L, 0.6))
    val got = GraphStats.pageRankWeighted(
        edges.toDF("id_a", "id_b", "cos"), iters = 5)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("score_micro")).toMap
    assert(got === simulate(
      edges.map(e => (e._1, e._2, (e._3 * 1e6).round)), 5, 1000000000L))
    assert(got(3L) > got(1L))
    assert(got(2L) > got(3L)) // the middle vertex receives from both
  }

  test("edge store: stored pairs equal the inline recompute; warm skip") {
    import graft.operators.{ExtQueries, Similarity}
    val e = Tables.embeddings(spark, sf0001)
    val path = java.nio.file.Files
      .createTempDirectory("graft-edges-spec").toString
    val built = graft.sources.EdgeStore.ensureNearDupPairs(e, path,
      ExtQueries.CosineThreshold, bands = ExtQueries.NearDupBands,
      rowsPerBand = ExtQueries.NearDupRows, dim = ExtQueries.EmbeddingDim)
    assert(built.isDefined)
    val stored = graft.sources.EdgeStore.read(spark, path)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("cos"))).toSet
    val inline = Similarity.nearDupPairsLsh(e, ExtQueries.CosineThreshold,
        bands = ExtQueries.NearDupBands,
        rowsPerBand = ExtQueries.NearDupRows,
        dim = ExtQueries.EmbeddingDim)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("cos"))).toSet
    assert(stored === inline && stored.nonEmpty)
    // second ensure with the same recipe reuses the warm store
    assert(graft.sources.EdgeStore.ensureNearDupPairs(e, path,
      ExtQueries.CosineThreshold, bands = ExtQueries.NearDupBands,
      rowsPerBand = ExtQueries.NearDupRows,
      dim = ExtQueries.EmbeddingDim).isEmpty)
    // a recipe change (different threshold) rebuilds
    assert(graft.sources.EdgeStore.ensureNearDupPairs(e, path,
      0.9, bands = ExtQueries.NearDupBands,
      rowsPerBand = ExtQueries.NearDupRows,
      dim = ExtQueries.EmbeddingDim).isDefined)
  }

  test("kcore: peels pendant tails, keeps the dense core; converges") {
    // K4 on {1..4} + pendant path 4—5—6: the 2-core is exactly K4
    // (round 1 peels 6, round 2 peels the now-degree-1 vertex 5)
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("id_a", "id_b")
    val core2 = GraphStats.kCore(g, k = 2, rounds = 8)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("core_degree")).toMap
    assert(core2 === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // the peel needs 2 rounds + 1 stable: rounds=3 already equals 8
    val core3r = GraphStats.kCore(g, k = 2, rounds = 3)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("core_degree")).toMap
    assert(core3r === core2)
    // k=3 keeps K4; k=4 empties the graph
    assert(GraphStats.kCore(g, k = 3, rounds = 8).count() === 4L)
    assert(GraphStats.kCore(g, k = 4, rounds = 8).count() === 0L)
  }

  test("kcore: the round budget converges on the real near-dup graph") {
    import graft.operators.{ExtQueries, Similarity}
    val pairs = Similarity.nearDupPairsLsh(
      Tables.embeddings(spark, sf0001), ExtQueries.CosineThreshold,
      bands = ExtQueries.NearDupBands,
      rowsPerBand = ExtQueries.NearDupRows, dim = ExtQueries.EmbeddingDim)
    val at8 = GraphStats.kCore(pairs, k = ExtQueries.KCoreK,
        rounds = ExtQueries.KCoreRounds)
      .collect().map(_.toString).sorted.toSeq
    val at9 = GraphStats.kCore(pairs, k = ExtQueries.KCoreK,
        rounds = ExtQueries.KCoreRounds + 1)
      .collect().map(_.toString).sorted.toSeq
    assert(at8 === at9) // fixed-round output IS the true 2-core here
  }

  test("personalized pagerank: matches the simulation; proximity wins") {
    // path 1—2—3—4—5 with seed {1}: scores must DECAY with distance
    // from the seed, unlike global PageRank (where middle vertices win)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val seeds = Seq(1L).toDF("v")
    val got = GraphStats.pageRankPersonalized(
        edges.toDF("id_a", "id_b"), seeds, iters = 5,
        scale = 1000000000000L)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("score_micro")).toMap
    assert(got === simulate(edges.map(e => (e._1, e._2, 1L)), 5,
      1000000000000L, Some(Set(1L))))
    // finite-iteration mass travels in parity waves down a path (the
    // seed pushes ALL its mass to its neighbor each round), so compare
    // within a parity class — distance 1 ≻ 3, 0 ≻ 2 ≻ 4 — and pin
    // that the seed's 1-hop neighborhood dominates the far end
    assert(got(2L) > got(4L))
    assert(got(1L) > got(3L) && got(3L) > got(5L))
    assert(got(2L) === got.values.max && got(5L) === got.values.min)
  }

  test("personalized pagerank: seeds outside the graph are no-ops") {
    val edges = Seq((1L, 2L)).toDF("id_a", "id_b")
    // seed 99 is not a graph vertex: teleport mass lands only on 1
    val got = GraphStats.pageRankPersonalized(edges,
        Seq(1L, 99L).toDF("v"), iters = 3)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("score_micro")).toMap
    assert(got === simulate(Seq((1L, 2L, 1L)), 3, 1000000000000L,
      Some(Set(1L))))
    assert(!got.contains(99L))
    // no graph seeds at all → empty result, not a division by zero
    assert(GraphStats.pageRankPersonalized(edges,
      Seq(99L).toDF("v"), iters = 3).count() === 0L)
  }

  test("personalized pagerank: all-vertex seeds equal global pagerank") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L))
    val all = Seq(1L, 2L, 3L, 4L).toDF("v")
    val p = GraphStats.pageRankPersonalized(edges.toDF("id_a", "id_b"),
        all, iters = 5)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("score_micro")).toMap
    val g = GraphStats.pageRankIntScaled(edges.toDF("id_a", "id_b"),
        iters = 5)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("score_micro")).toMap
    assert(p === g)
  }

  test("edge store admission: batch fold equals the from-scratch rebuild") {
    import graft.operators.{ExtQueries, Similarity}
    val e = Tables.embeddings(spark, sf0001)
    val base = e.filter(pmod(col("vec_id"), lit(10)) =!= 9)
    val batch = e.filter(pmod(col("vec_id"), lit(10)) === 9)
    val path = java.nio.file.Files
      .createTempDirectory("graft-edges-admit").toString
    graft.sources.EdgeStore.ensureNearDupPairs(base, path,
      ExtQueries.CosineThreshold, bands = ExtQueries.NearDupBands,
      rowsPerBand = ExtQueries.NearDupRows, dim = ExtQueries.EmbeddingDim)
    // snapshot the committed base version's file inventory: the append
    // must be batch-sized — new files only, every base file (parquet
    // parts, band index, commit marker) byte-untouched afterwards
    def fileInventory(root: String): Map[String, (Long, Long)] = {
      val base = java.nio.file.Paths.get(root)
      val s = java.nio.file.Files.walk(base)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          // _SUCCESS (and its local-FS .crc shadow) is the Hadoop job
          // committer's marker — each append JOB re-touches it; it
          // carries no data and is not a rewrite
          .filter(p => !p.getFileName.toString.contains("_SUCCESS"))
          .map(p => base.relativize(p).toString ->
            (java.nio.file.Files.size(p),
              java.nio.file.Files.getLastModifiedTime(p).toMillis))
          .toMap
      } finally s.close()
    }
    val baseInv = fileInventory(path)
    // feed the batch with duplicated rows: within-batch id dedup must
    // keep the committed store free of duplicate pairs and band rows
    val appended = graft.sources.EdgeStore.appendBatch(
      batch.unionByName(batch.limit(3)), e, path,
      ExtQueries.CosineThreshold, bands = ExtQueries.NearDupBands,
      rowsPerBand = ExtQueries.NearDupRows, dim = ExtQueries.EmbeddingDim)
    val afterInv = fileInventory(path)
    // batch-sized commit: every pre-append file is byte-untouched
    // (segments are immutable; version dirs are tiny manifests the
    // commit never rewrites) and the append only ADDED files — the
    // batch's segment dirs plus exactly ONE new committed manifest
    // version (the transaction's atomic publish point)
    baseInv.foreach { case (f, sig) => assert(afterInv.get(f) ===
      Some(sig), s"append rewrote base file $f") }
    assert(afterInv.size > baseInv.size)
    assert(afterInv.keySet.count(_.endsWith("_committed")) ===
      baseInv.keySet.count(_.endsWith("_committed")) + 1)
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("cos"))).toSet
    val got = pairSet(graft.sources.EdgeStore.read(spark, path))
    val full = pairSet(Similarity.nearDupPairsLsh(e,
      ExtQueries.CosineThreshold, bands = ExtQueries.NearDupBands,
      rowsPerBand = ExtQueries.NearDupRows,
      dim = ExtQueries.EmbeddingDim))
    assert(got === full) // incremental ≡ rebuild, bit for bit
    // the appended count is exactly the batch-touching pair set
    val batchIds = batch.select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(appended ===
      full.count(p => batchIds(p._1) || batchIds(p._2)).toLong)
    assert(appended > 0L) // the holdout actually exercises admission
    // no duplicate rows landed: pairs and band rows are exactly unique
    val pairsDf = graft.sources.EdgeStore.read(spark, path)
    assert(pairsDf.count() === got.size.toLong)
    val bandsDf = graft.sources.EdgeStore.readBands(spark, path)
    assert(bandsDf.count() === bandsDf.distinct().count())
    // the admission index now covers the whole corpus
    assert(bandsDf.select("id").distinct().count() === e.count())
    // compact: rows identical, landed in a NEW committed version whose
    // manifest references fewer segment dirs than the
    // append-accumulated layout (one per relation)
    def referencedSegs(): Set[String] = {
      val m = graft.sources.ManifestDir.current(spark, path, "edges-").get
      m.relations.values.flatten.toSet
    }
    val curBefore = graft.sources.SnapshotDir
      .current(spark, path, "edges-").get
    val segsBefore = referencedSegs()
    graft.sources.EdgeStore.compact(spark, path)
    val curAfter = graft.sources.SnapshotDir
      .current(spark, path, "edges-").get
    assert(curAfter !== curBefore)
    assert(pairSet(graft.sources.EdgeStore.read(spark, path)) === full)
    val bandsAfter = graft.sources.EdgeStore.readBands(spark, path)
    assert(bandsAfter.count() === bandsDf.count())
    // a second append after compact still admits nothing (full
    // redelivery of the same batch — idempotency survives compaction)
    assert(graft.sources.EdgeStore.appendBatch(batch, e, path,
      ExtQueries.CosineThreshold, bands = ExtQueries.NearDupBands,
      rowsPerBand = ExtQueries.NearDupRows,
      dim = ExtQueries.EmbeddingDim) === 0L)
    assert(referencedSegs().size < segsBefore.size)
  }

  test("edge store branches: zero-copy create, isolated append, " +
      "ref-aware vacuum, drop") {
    import graft.operators.{ExtQueries, Similarity}
    import graft.sources.EdgeStore
    val e = Tables.embeddings(spark, sf0001)
    val base = e.filter(pmod(col("vec_id"), lit(10)) =!= 9)
    val batch = e.filter(pmod(col("vec_id"), lit(10)) === 9)
    val path = java.nio.file.Files
      .createTempDirectory("graft-edges-branch").toString
    EdgeStore.ensureNearDupPairs(base, path,
      ExtQueries.CosineThreshold, bands = ExtQueries.NearDupBands,
      rowsPerBand = ExtQueries.NearDupRows, dim = ExtQueries.EmbeddingDim)
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("cos"))).toSet
    def segFiles(): Long = {
      val seg = java.nio.file.Paths.get(path, "seg")
      val s = java.nio.file.Files.walk(seg)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .count(java.nio.file.Files.isRegularFile(_)).toLong
      } finally s.close()
    }
    val basePairs = pairSet(EdgeStore.read(spark, path))
    // creation is ZERO-COPY: one manifest commit, no segment files
    val segBefore = segFiles()
    EdgeStore.createBranch(spark, path, "exp")
    assert(segFiles() === segBefore, "branch create must copy no data")
    assert(EdgeStore.branches(spark, path) === Seq("exp"))
    assert(pairSet(EdgeStore.read(spark, path, Some("exp")))
      === basePairs)
    intercept[IllegalArgumentException](
      EdgeStore.createBranch(spark, path, "exp"))
    intercept[IllegalArgumentException](
      EdgeStore.createBranch(spark, path, "Bad-Name"))
    // the batch admits into the branch lineage ONLY
    val n = EdgeStore.appendBatch(batch, e, path,
      ExtQueries.CosineThreshold, bands = ExtQueries.NearDupBands,
      rowsPerBand = ExtQueries.NearDupRows,
      dim = ExtQueries.EmbeddingDim, branch = Some("exp"))
    assert(n > 0L)
    val full = pairSet(Similarity.nearDupPairsLsh(e,
      ExtQueries.CosineThreshold, bands = ExtQueries.NearDupBands,
      rowsPerBand = ExtQueries.NearDupRows,
      dim = ExtQueries.EmbeddingDim))
    assert(pairSet(EdgeStore.read(spark, path, Some("exp"))) === full)
    assert(pairSet(EdgeStore.read(spark, path)) === basePairs,
      "main must not see branch appends")
    // vacuum is ref-aware: segments referenced by EITHER lineage live
    assert(EdgeStore.vacuum(spark, path) === 0L)
    assert(pairSet(EdgeStore.read(spark, path, Some("exp"))) === full)
    // drop: the branch lineage disappears, its private segments are
    // swept, shared segments (and main) survive untouched
    val segWithBranch = segFiles()
    EdgeStore.dropBranch(spark, path, "exp")
    assert(segFiles() < segWithBranch,
      "drop must sweep branch-only segments")
    assert(EdgeStore.branches(spark, path).isEmpty)
    assert(pairSet(EdgeStore.read(spark, path)) === basePairs)
    intercept[IllegalStateException](
      EdgeStore.read(spark, path, Some("exp")))
  }

  test("edge store optimistic appends: concurrent main- and " +
      "branch-admission both land isolated") {
    import graft.operators.{ExtQueries, Similarity}
    import graft.sources.EdgeStore
    val e = Tables.embeddings(spark, sf0001)
    // base, main batch, branch batch: pairwise disjoint id sets
    val base = e.filter(pmod(col("vec_id"), lit(10)) =!= 9 &&
      pmod(col("vec_id"), lit(10)) =!= 3)
    val mainBatch = e.filter(pmod(col("vec_id"), lit(10)) === 3)
    val branchBatch = e.filter(pmod(col("vec_id"), lit(10)) === 9)
    val path = java.nio.file.Files
      .createTempDirectory("graft-edges-optim").toString
    EdgeStore.ensureNearDupPairs(base, path, ExtQueries.CosineThreshold,
      bands = ExtQueries.NearDupBands,
      rowsPerBand = ExtQueries.NearDupRows,
      dim = ExtQueries.EmbeddingDim)
    EdgeStore.createBranch(spark, path, "exp")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val gate = new java.util.concurrent.CountDownLatch(1)
    def writer(body: => Unit) = new Thread(() => {
      gate.await()
      try body catch { case t: Throwable => errs.add(t) }
    })
    // the full banding/verify work of both admissions overlaps; only
    // the two manifest publishes serialize on the (polled) root lock
    val t1 = writer(EdgeStore.appendBatchOptimistic(mainBatch, e, path,
      ExtQueries.CosineThreshold, bands = ExtQueries.NearDupBands,
      rowsPerBand = ExtQueries.NearDupRows,
      dim = ExtQueries.EmbeddingDim))
    val t2 = writer(EdgeStore.appendBatchOptimistic(branchBatch, e,
      path, ExtQueries.CosineThreshold,
      bands = ExtQueries.NearDupBands,
      rowsPerBand = ExtQueries.NearDupRows,
      dim = ExtQueries.EmbeddingDim, branch = Some("exp")))
    t1.start(); t2.start(); gate.countDown()
    t1.join(300000); t2.join(300000)
    assert(errs.isEmpty, s"both cross-lineage admits must land, got: " +
      s"${Option(errs.peek()).map(_.toString)}")
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("cos"))).toSet
    def expect(corpus: org.apache.spark.sql.DataFrame) =
      pairSet(Similarity.nearDupPairsLsh(corpus,
        ExtQueries.CosineThreshold, bands = ExtQueries.NearDupBands,
        rowsPerBand = ExtQueries.NearDupRows,
        dim = ExtQueries.EmbeddingDim))
    // each lineage equals the from-scratch rebuild over ITS corpus
    assert(pairSet(EdgeStore.read(spark, path))
      === expect(base.unionByName(mainBatch)))
    assert(pairSet(EdgeStore.read(spark, path, Some("exp")))
      === expect(base.unionByName(branchBatch)))
  }

  test("edge store promote: fast-forward publishes the branch as main; " +
      "a diverged main refuses") {
    import graft.operators.{ExtQueries, Similarity}
    import graft.sources.EdgeStore
    val e = Tables.embeddings(spark, sf0001)
    val base = e.filter(pmod(col("vec_id"), lit(10)) =!= 9)
    val batch = e.filter(pmod(col("vec_id"), lit(10)) === 9)
    def build(tag: String): String = {
      val p = java.nio.file.Files
        .createTempDirectory(s"graft-edges-$tag").toString
      EdgeStore.ensureNearDupPairs(base, p,
        ExtQueries.CosineThreshold, bands = ExtQueries.NearDupBands,
        rowsPerBand = ExtQueries.NearDupRows,
        dim = ExtQueries.EmbeddingDim)
      p
    }
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("cos"))).toSet
    // happy path: admit on the branch, promote, main serves the union
    val p1 = build("promote")
    EdgeStore.createBranch(spark, p1, "exp")
    EdgeStore.appendBatch(batch, e, p1,
      ExtQueries.CosineThreshold, bands = ExtQueries.NearDupBands,
      rowsPerBand = ExtQueries.NearDupRows,
      dim = ExtQueries.EmbeddingDim, branch = Some("exp"))
    val full = pairSet(Similarity.nearDupPairsLsh(e,
      ExtQueries.CosineThreshold, bands = ExtQueries.NearDupBands,
      rowsPerBand = ExtQueries.NearDupRows,
      dim = ExtQueries.EmbeddingDim))
    EdgeStore.promoteBranch(spark, p1, "exp")
    assert(pairSet(EdgeStore.read(spark, p1)) === full)
    assert(EdgeStore.branches(spark, p1).isEmpty)
    // every segment is now referenced through main: nothing to sweep
    assert(EdgeStore.vacuum(spark, p1) === 0L)
    // guard: main advanced after the cut → fast-forward must refuse
    val p2 = build("promote-guard")
    EdgeStore.createBranch(spark, p2, "exp")
    EdgeStore.appendBatch(batch, e, p2,
      ExtQueries.CosineThreshold, bands = ExtQueries.NearDupBands,
      rowsPerBand = ExtQueries.NearDupRows,
      dim = ExtQueries.EmbeddingDim) // lands on MAIN
    val ex = intercept[IllegalArgumentException](
      EdgeStore.promoteBranch(spark, p2, "exp"))
    assert(ex.getMessage.contains("fast-forward"))
    // main keeps its own post-branch state after the refusal
    assert(pairSet(EdgeStore.read(spark, p2)) === full)
  }

  test("edge store admission is atomic: a crashed admit is invisible " +
      "and a retry lands the whole batch") {
    import graft.operators.ExtQueries
    val e = Tables.embeddings(spark, sf0001)
    val base = e.filter(pmod(col("vec_id"), lit(10)) =!= 9)
    val batch = e.filter(pmod(col("vec_id"), lit(10)) === 9)
    val path = java.nio.file.Files
      .createTempDirectory("graft-edges-crash").toString
    graft.sources.EdgeStore.ensureNearDupPairs(base, path,
      ExtQueries.CosineThreshold, bands = ExtQueries.NearDupBands,
      rowsPerBand = ExtQueries.NearDupRows, dim = ExtQueries.EmbeddingDim)
    def pairSet() = graft.sources.EdgeStore.read(spark, path).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    def bandIds() = graft.sources.EdgeStore.readBands(spark, path)
      .select("id").distinct().count()
    val basePairs = pairSet()
    val baseBandIds = bandIds()
    // THE CRASH DRILL: a writer dies after its segment writes but
    // BEFORE the manifest commit — simulated by writing band and pair
    // segments exactly where appendBatch would, then never committing.
    // Under the v2 layout this was the under-admit window (bands
    // visible, pairs missing, repair = full rebuild); under manifests
    // the orphan segments are invisible to every reader.
    val segId = graft.sources.ManifestDir.newSegmentId()
    import spark.implicits._
    graft.operators.Similarity.bandRelation(batch,
        ExtQueries.NearDupBands, ExtQueries.NearDupRows,
        ExtQueries.EmbeddingDim)
      .write.parquet(s"$path/seg/$segId/bands")
    Seq((1L, 2L, 0.99)).toDF("id_a", "id_b", "cos")
      .write.parquet(s"$path/seg/$segId/pairs")
    // the next reader serves the PRIOR version intact: no phantom
    // bands (the batch still reads as unadmitted), no phantom pairs
    assert(pairSet() === basePairs)
    assert(bandIds() === baseBandIds)
    // vacuum sweeps exactly the orphan (no committed manifest
    // references it); committed segments survive
    assert(graft.sources.EdgeStore.vacuum(spark, path) === 1L)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(path, "seg", segId)))
    assert(pairSet() === basePairs)
    // the RETRY admits the whole batch — nothing was half-admitted, so
    // the redelivery probe sees genuinely fresh ids and the committed
    // result equals the from-scratch rebuild
    assert(graft.sources.EdgeStore.appendBatch(batch, e, path,
      ExtQueries.CosineThreshold, bands = ExtQueries.NearDupBands,
      rowsPerBand = ExtQueries.NearDupRows,
      dim = ExtQueries.EmbeddingDim) > 0L)
    val full = graft.operators.Similarity.nearDupPairsLsh(e,
        ExtQueries.CosineThreshold, bands = ExtQueries.NearDupBands,
        rowsPerBand = ExtQueries.NearDupRows,
        dim = ExtQueries.EmbeddingDim).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairSet() === full)
    // TIME TRAVEL rides the manifests for free: version 1 still
    // serves the pre-admission pair set (its manifest pins the exact
    // segment list; the admission only ADDED segments), while the
    // current read serves the union; a GC'd/never-committed version
    // fails loudly instead of falling back
    val v1 = graft.sources.EdgeStore.readAt(spark, path, 1L).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(v1 === basePairs)
    assert(v1 !== full)
    assertThrows[IllegalStateException](
      graft.sources.EdgeStore.readAt(spark, path, 99L))
  }

  test("community one-level: triangles bind, the weak bridge never merges") {
    // two unit-weight triangles {1,2,3} / {4,5,6} joined by a 0.2
    // bridge 3-4. ppm: w=1e6 inside, 2e5 on the bridge; 2m = 1.24e7.
    // Hand-computed gains (2m·w − k_i·k_j):
    //  1→2: 1.24e13 − 4e12 = 8.4e12 (beats 1→3's 8.0e12)
    //  3→1: 8.0e12 (tie with 3→2 → lowest id); 3→4: 2.48e12 − 4.84e12
    //  = NEGATIVE — the bridge never merges the triangles.
    val edges = Seq(
      (1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0),
      (4L, 5L, 1.0), (4L, 6L, 1.0), (5L, 6L, 1.0),
      (3L, 4L, 0.2)).toDF("id_a", "id_b", "cos")
    val got = GraphStats.communityOneLevel(edges).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("community_id"), r.getAs[Long]("gain_num")))
      .toMap
    assert(got === Map(
      1L -> (2L, 8400000000000L), 2L -> (1L, 8400000000000L),
      3L -> (1L, 8000000000000L), 4L -> (5L, 8000000000000L),
      5L -> (6L, 8400000000000L), 6L -> (5L, 8400000000000L)))
    // an isolated strong pair stays mutual; a no-positive-gain vertex
    // keeps its own singleton (complete graph K3 with equal weights:
    // every gain is 2m·w − k² = 6e6·1e6 − 4e12 = 2e12 > 0 — all move)
    val pair = Seq((7L, 8L, 1.0)).toDF("id_a", "id_b", "cos")
    val gotPair = GraphStats.communityOneLevel(pair).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("community_id")).toMap
    assert(gotPair === Map(7L -> 8L, 8L -> 7L))
    // closure: the raw sweep's mutual swaps (1↔2, 5↔6) and chained
    // adoptions merge each triangle into ONE community (min id); the
    // negative-gain bridge keeps the triangles apart
    val merged = GraphStats.communityMerge(edges).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("community_id")).toMap
    assert(merged === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L))
    // a vertex with no positive move stays a singleton: star center 10
    // with three unit leaves — leaves adopt the center (2m·w = 6e12 >
    // k_leaf·k_center = 3e12) so all four close into one community,
    // while two isolated-pair vertices with a weak tie stay apart
    val weak = Seq((20L, 21L, 0.2), (20L, 22L, 1.0), (21L, 23L, 1.0))
      .toDF("id_a", "id_b", "cos")
    val weakMerged = GraphStats.communityMerge(weak).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("community_id")).toMap
    // strong spokes 20-22 and 21-23 merge; the weak 20-21 tie has
    // gain 2m·w − k20·k21 = 4.4e6·2e5 − 1.2e6·1.2e6 < 0 on both
    // sides, so the two strong pairs stay separate communities
    assert(weakMerged === Map(20L -> 20L, 22L -> 20L,
      21L -> 21L, 23L -> 21L))
  }

  test("community level 2 merges the bridged pair level 1 cannot") {
    // Pairs {1,2} and {3,4} (internal w=1.0) joined by a 0.5 bridge
    // 2-3, plus four distant unit pairs that only inflate 2m.
    // ppm: Σw = 6.5e6 → 2m = 13e6.
    // LEVEL 1 (per vertex): v2's options are 1 (gain 13e6·1e6 −
    // 1.5e6·1e6 = 11.5e12) and 3 (13e6·0.5e6 − 1.5e6·1.5e6 =
    // 4.25e12) → adopts 1; symmetric for v3 → {1,2} and {3,4} stay
    // SEPARATE communities — the vertex sweep can only bind to a
    // neighbor, and both bridge endpoints prefer their partners.
    // LEVEL 2 (quotient): A={1,2}, B={3,4} with W_self = 1e6 each,
    // W_AB = 0.5e6, k_A = k_B = 0.5e6 + 2·1e6 = 2.5e6. Merge gain =
    // 2m·W_AB − k_A·k_B = 13e6·0.5e6 − 6.25e12 = +0.25e12 > 0 →
    // mutual adopt, one community min(1,3) = 1. The blob pairs have
    // no quotient neighbors and keep their level-1 ids.
    val edges = Seq(
      (1L, 2L, 1.0), (3L, 4L, 1.0), (2L, 3L, 0.5),
      (10L, 11L, 1.0), (12L, 13L, 1.0), (14L, 15L, 1.0),
      (16L, 17L, 1.0)).toDF("id_a", "id_b", "cos")
    val l1 = GraphStats.communityMerge(edges).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("community_id")).toMap
    assert(l1(1L) === 1L && l1(2L) === 1L &&
      l1(3L) === 3L && l1(4L) === 3L,
      "level 1 must NOT merge across the bridge")
    val l2 = GraphStats.communityTwoLevel(edges).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("l1_community"), r.getAs[Long]("community_id")))
      .toMap
    assert(l2 === Map(
      1L -> (1L, 1L), 2L -> (1L, 1L), 3L -> (3L, 1L), 4L -> (3L, 1L),
      10L -> (10L, 10L), 11L -> (10L, 10L),
      12L -> (12L, 12L), 13L -> (12L, 12L),
      14L -> (14L, 14L), 15L -> (14L, 14L),
      16L -> (16L, 16L), 17L -> (16L, 16L)))
    // and where level 1 already merged everything (one triangle),
    // level 2 is a fixpoint: the single quotient node has no move
    val tri = Seq((1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0))
      .toDF("id_a", "id_b", "cos")
    val triL2 = GraphStats.communityTwoLevel(tri).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("community_id")).toMap
    assert(triL2 === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("stored L1 labels serve the two-level sweep bit-identically") {
    import graft.operators.ExtQueries
    import graft.sources.{ClusterStore, EdgeStore}
    val e = Tables.embeddings(spark, sf0001)
    val path = java.nio.file.Files
      .createTempDirectory("graft-edges-l1").toString
    EdgeStore.ensureNearDupPairs(e, path, ExtQueries.CosineThreshold,
      bands = ExtQueries.NearDupBands,
      rowsPerBand = ExtQueries.NearDupRows,
      dim = ExtQueries.EmbeddingDim)
    val pairs = EdgeStore.read(spark, path)
    // first touch builds; second is warm (one manifest read)
    assert(ClusterStore.ensureL1Labels(spark, path).isDefined)
    assert(ClusterStore.ensureL1Labels(spark, path).isEmpty)
    def toMap(df: org.apache.spark.sql.DataFrame, k: String, v: String) =
      df.collect().map(r => r.getAs[Long](k) -> r.getAs[Long](v)).toMap
    // stored l1 ≡ the in-query sweep (pure function of the pair state)
    assert(toMap(ClusterStore.readL1Labels(spark, path), "id", "label")
      === toMap(GraphStats.communityMerge(pairs), "vec_id",
        "community_id"))
    // ... and the SERVED two-level routing ≡ the inline cold path
    val served = GraphStats.communityTwoLevelFrom(pairs,
      ClusterStore.readL1Labels(spark, path)
        .select($"id".as("vec_id"), $"label".as("c1"))).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("l1_community"),
        r.getAs[Long]("community_id"))).toSet
    val inline = GraphStats.communityTwoLevel(pairs).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("l1_community"),
        r.getAs[Long]("community_id"))).toSet
    assert(served === inline)
  }

  test("L1 labels go stale on admission and repair on next read") {
    import graft.operators.ExtQueries
    import graft.sources.{ClusterStore, EdgeStore}
    val e = Tables.embeddings(spark, sf0001)
    val base = e.filter(pmod(col("vec_id"), lit(10)) =!= 9)
    val batch = e.filter(pmod(col("vec_id"), lit(10)) === 9)
    val path = java.nio.file.Files
      .createTempDirectory("graft-edges-l1-stale").toString
    EdgeStore.ensureNearDupPairs(base, path, ExtQueries.CosineThreshold,
      bands = ExtQueries.NearDupBands,
      rowsPerBand = ExtQueries.NearDupRows,
      dim = ExtQueries.EmbeddingDim)
    assert(ClusterStore.ensureL1Labels(spark, path).isDefined)
    // the admission rewrites the pair segment list → the committed L1
    // signature stops matching; serving the pre-append sweep would be
    // silently wrong, so the next ensure REBUILDS
    assert(EdgeStore.appendBatch(batch, e, path,
      ExtQueries.CosineThreshold, bands = ExtQueries.NearDupBands,
      rowsPerBand = ExtQueries.NearDupRows,
      dim = ExtQueries.EmbeddingDim) > 0L)
    assert(ClusterStore.ensureL1Labels(spark, path).isDefined,
      "post-admission read must repair, not serve stale labels")
    val stored = ClusterStore.readL1Labels(spark, path).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
    val fresh = GraphStats.communityMerge(EdgeStore.read(spark, path))
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("community_id")).toMap
    assert(stored === fresh)
  }

  test("weighted pagerank: uniform weights equal the unweighted ranking") {
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L))
    val w = GraphStats.pageRankWeighted(
        e.map(p => (p._1, p._2, 0.5)).toDF("id_a", "id_b", "cos"),
        iters = 5, scale = 1000000000L)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("score_micro")).toMap
    val u = GraphStats.pageRankIntScaled(e.toDF("id_a", "id_b"),
        iters = 5, scale = 1000000000L)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("score_micro")).toMap
    assert(w === u) // w/wdeg = 1/deg exactly when weights are uniform
  }

  test("link predict: square diagonals score exactly; hub pivots capped") {
    // square 1-2-3-4-1: the two diagonals each share both off-corner
    // neighbors (deg 2 everywhere) — cn=2, RA = 2·(10⁶/2) = 10⁶,
    // jaccard = 2/(2+2-2) = 1 → 10⁶ ppm; adjacent pairs never appear
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("id_a", "id_b")
    val got = GraphStats.linkPredict(square, minCommon = 2, maxDeg = 64)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        (r.getAs[Long]("cn"), r.getAs[Long]("ra_ppm"),
          r.getAs[Long]("jacc_ppm"))).toMap
    assert(got === Map(
      (1L, 3L) -> ((2L, 1000000L, 1000000L)),
      (2L, 4L) -> ((2L, 1000000L, 1000000L))))
    // star: 10 leaves share only the hub (deg 10). With the hub
    // admitted as pivot, every leaf pair scores cn=1, RA = 10⁶/10;
    // with the cap below the hub's degree the expansion is EMPTY —
    // the contract that bounds the wedge fan-out at scale
    val star = (11L to 20L).map(l => (10L, l)).toDF("id_a", "id_b")
    val open = GraphStats.linkPredict(star, minCommon = 1, maxDeg = 64)
      .collect()
    assert(open.length === 45) // C(10,2) leaf pairs
    assert(open.forall(r => r.getAs[Long]("cn") === 1L &&
      r.getAs[Long]("ra_ppm") === 100000L &&
      r.getAs[Long]("jacc_ppm") === 1000000L)) // 1/(1+1-1)
    assert(GraphStats.linkPredict(star, minCommon = 1, maxDeg = 4)
      .count() === 0L)
  }
}
