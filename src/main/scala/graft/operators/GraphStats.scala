package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-shape statistics over an undirected edge list (canonical
  * `a < b` pairs — exactly what the near-dup machinery emits):
  * triangle count and global clustering coefficient, the structural
  * health probe of a similarity graph (a dedup pair list whose
  * transitivity collapses is mostly LSH noise; one that triangulates
  * densely is genuine duplicate clusters).
  *
  * The triangle join is DEGREE-ORIENTED (each edge directed from its
  * lower-(degree, id) endpoint), the standard distributed-triangle
  * trick: the wedge fan-out from any vertex is bounded by its
  * out-degree, and orienting by degree caps Σ outdeg² at O(m^1.5)
  * even on power-law graphs — a hub with degree d contributes d
  * wedges as the CHEAP endpoint of its edges, never d², where the
  * naive low-id orientation explodes on hubs that happen to have
  * small ids. Every stage is an equi-join or keyed aggregate; nothing
  * is ever all-pairs.
  */
object GraphStats {

  /** One row of global stats for the `(aCol, bCol)` edge list:
    * vertex/edge/wedge/triangle counts plus the global clustering
    * coefficient 3·triangles / wedges (a small-int IEEE division —
    * bit-identical across engines; NULL when the graph has no
    * wedges). Input edges are deduped and self-loops dropped, so a
    * sloppy pair list cannot inflate the counts. */
  def triangleStats(edges: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    val e = CacheRegistry.tracked(edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct())
    val deg = CacheRegistry.tracked(e.select(col("a").as("v"))
      .unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d")))
    // orient each edge from its lower-(degree, id) endpoint
    val dir = CacheRegistry.tracked(e
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("u"), col("b").as("w"), col("db").as("dw")))
          .otherwise(struct(col("b").as("u"), col("a").as("w"),
            col("da").as("dw"))).as("o"))
      .select(col("o.u"), col("o.w"), col("o.dw")))
    // wedges at each source u: out-neighbor pairs in orientation
    // order, closed into triangles by the (v, w) directed edge —
    // which, both being out-neighbors of u, can only run v→w
    val x = dir.select(col("u"), col("w").as("v1"), col("dw").as("d1"))
    val y = dir.select(col("u"), col("w").as("v2"), col("dw").as("d2"))
    val tri = x.join(y, Seq("u"))
      .filter(struct(col("d1"), col("v1")) < struct(col("d2"), col("v2")))
      .join(dir.select(col("u").as("v1"), col("w").as("v2")),
        Seq("v1", "v2"))
      .agg(count(lit(1)).as("n_triangles"))
    val counts = e.agg(count(lit(1)).as("n_edges"))
    val vw = deg.agg(count(lit(1)).as("n_vertices"),
      coalesce(sum((col("d") * (col("d") - 1L) / lit(2L)).cast("long")),
        lit(0L)).as("n_wedges")) // empty graph: 0 wedges, not NULL
    vw.crossJoin(broadcast(counts)).crossJoin(broadcast(tri))
      .select(col("n_vertices"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") > 0L,
          lit(3L) * col("n_triangles").cast("double") / col("n_wedges"))
          .as("transitivity"))
  }

  /** Canonical undirected adjacency (both directions) + per-vertex
    * degree from an `(aCol, bCol)` pair list — deduped, self-loops
    * dropped. Both frames are cache-tracked: every iterative consumer
    * (BFS, PageRank) re-reads them per round. */
  private def adjacency(edges: DataFrame, aCol: String, bCol: String)
      : (DataFrame, DataFrame) = {
    val e = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val adj = CacheRegistry.tracked(
      e.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(e.select(col("b").as("src"), col("a").as("dst"))))
    val deg = CacheRegistry.tracked(adj.groupBy(col("src").as("v"))
      .agg(count(lit(1)).as("d")))
    (adj, deg)
  }

  /** Single-source BFS hop distances from the graph's minimum vertex
    * id (a deterministic, replayable seed), capped at `maxHops`.
    * Classic frontier expansion: each round joins the CURRENT frontier
    * (not the whole visited set) to the adjacency list, anti-joins the
    * visited set, and unions the survivors in — so per-round work is
    * frontier-sized, and every step is an equi-join or distinct on the
    * vertex key (at cluster scale this is Pregel's shape: rounds =
    * supersteps, the visited set the only growing state, with a
    * `localCheckpoint` every ~10 rounds to cut lineage — at `maxHops`
    * ≤ 4 the lineage is shallow enough to skip). Exact integers end to
    * end. Output: `(vec_id, hops)` for every reached vertex. */
  def bfsHops(edges: DataFrame, maxHops: Int = 4,
      aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val (adj, _) = adjacency(edges, aCol, bCol)
    // 1-row metadata probe (the replayable seed), same license as
    // bm25TopK's corpus-size count; NULL min ⇔ no edges ⇒ empty result
    // (nothing is reachable from a seed that does not exist)
    val seedRow = adj.agg(min(col("src"))).head()
    if (seedRow.isNullAt(0))
      return Seq.empty[(Long, Int)].toDF("vec_id", "hops")
    var visited = Seq((seedRow.getLong(0), 0)).toDF("v", "hops")
    var frontier = visited
    var k = 1
    while (k <= maxHops) {
      // rename-then-Seq-join: the frontier descends from adj, so a
      // direct adj("src") reference would be an ambiguous self-join
      val next = frontier.select(col("v").as("src"))
        .join(adj, Seq("src"))
        .select(col("dst").as("v")).distinct()
        .join(visited, Seq("v"), "left_anti")
        .withColumn("hops", lit(k))
      visited = visited.unionAll(next)
      frontier = next
      k += 1
    }
    visited.select(col("v").as("vec_id"), col("hops"))
  }

  /** PageRank in EXACT integer micro-units — zero floating point, so
    * the scores are bit-identical on any engine and any partitioning:
    * score₀ = `scale // N`; each of `iters` rounds sends
    * `score // deg` to every neighbor and settles
    * `(3·scale) // (20·N) + (17·Σ_in) // 20` — the damping factor
    * 0.85 as the exact rational 17/20, teleport 0.15 as 3/20, floor
    * division everywhere (both engines floor on non-negative ints).
    * The floor bleeds ≤ 1 micro-unit per op — deterministic, and at
    * `scale` = 10¹² six orders below anything a ranking could feel.
    * Per round: one keys-sized equi-join with the adjacency, one
    * partially-combined sum — the Pregel shape; int64 headroom caps
    * Σ_in at N·scale (~10¹⁵ at sf0.1), ×17 still 10²-fold inside
    * int64. Output: `(vec_id, score_micro, score)` — the one closing
    * double division is score_micro/scale. */
  def pageRankIntScaled(edges: DataFrame, iters: Int = 5,
      scale: Long = 1000000000000L, aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    val (adj, deg) = adjacency(edges, aCol, bCol)
    // 1-row metadata probe: the vertex count both the init and the
    // teleport term need as an exact literal; empty graph ⇒ empty
    // result (no vertices to rank, and `scale / 0` must never run)
    val n = deg.count()
    val spark = edges.sparkSession
    import spark.implicits._
    if (n == 0L)
      return Seq.empty[(Long, Long, Double)]
        .toDF("vec_id", "score_micro", "score")
    val adjd = CacheRegistry.tracked(adj.join(
      deg.select(col("v").as("src"), col("d").as("deg")), Seq("src")))
    var scores = deg.select(col("v"), lit(scale / n).as("score"))
    val base = 3L * scale / (20L * n)
    var i = 0
    while (i < iters) {
      // rename-then-Seq-join (scores descends from adj via deg — a
      // direct adjd("src") === scores("v") is an ambiguous self-join)
      scores = adjd.join(
          scores.select(col("v").as("src"), col("score")), Seq("src"))
        .select(col("dst").as("v"),
          expr("score div deg").as("c"))
        .groupBy(col("v"))
        .agg(sum(col("c")).as("insum"))
        .select(col("v"),
          (lit(base) + expr("(17 * insum) div 20")).as("score"))
      i += 1
    }
    scores.select(col("v").as("vec_id"),
      col("score").as("score_micro"),
      (col("score").cast("double") / lit(scale.toDouble)).as("score"))
  }

  /** k-core membership by iterative peeling: each round drops every
    * vertex whose degree among SURVIVORS is < k, for a FIXED `rounds`
    * budget — identical on every engine (the oracle unrolls the same
    * rounds), and equal to the true k-core whenever the peel converges
    * within the budget (the spec asserts convergence on every test
    * corpus; the cluster-scale form loops the same per-round plan under
    * a driver-side `count`-stable check). The graph-curation filter:
    * 2-core strips pendant tails off the similarity graph, leaving the
    * densely-connected duplicate mass. Per round: two vertex-keyed
    * semi-joins + one degree aggregate — keys-sized exchanges, never
    * all-pairs; each round localCheckpoints (one materialization, so no
    * round re-executes its predecessors) and the loop EXITS EARLY once
    * the edge count is stable — peeling only removes, so a stable count
    * means a stable set and every remaining budgeted round is a no-op
    * (output identical to running the full budget, which is what the
    * oracle unrolls).
    *
    * DURABILITY TRADE: `localCheckpoint` stores each round's blocks on
    * executors only — losing an executor mid-peel loses its blocks
    * with NO lineage to recompute from, failing the job (not
    * corrupting it). That is the right default for a minutes-long peel
    * on a healthy cluster; on a long peel over preemptible executors,
    * swap in reliable `checkpoint` to cluster storage
    * (`sc.setCheckpointDir` + `df.checkpoint()`) — same plan, each
    * round's barrier survives executor death at the cost of a
    * distributed-FS write per round. Output: surviving
    * `(vec_id, core_degree)` (degree within the surviving subgraph). */
  def kCore(edges: DataFrame, k: Int, rounds: Int = 8,
      aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    require(k >= 1 && rounds >= 1, s"k=$k rounds=$rounds")
    val e0 = CacheRegistry.tracked(edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct())
    var e = e0
    var cur = e0.count()
    var prev = -1L
    var i = 0
    while (i < rounds && cur != prev) {
      prev = cur
      val deg = e.select(col("a").as("v"))
        .unionAll(e.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("d"))
      val alive = deg.filter(col("d") >= k).select(col("v"))
      e = e0
        .join(alive.select(col("v").as("a")), Seq("a"), "left_semi")
        .join(alive.select(col("v").as("b")), Seq("b"), "left_semi")
        .localCheckpoint()
      cur = e.count() // checkpointed: counts the materialized blocks
      i += 1
    }
    val degF = e.select(col("a").as("v"))
      .unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    degF.filter(col("d") >= k)
      .select(col("v").as("vec_id"), col("d").as("core_degree"))
  }

  /** PERSONALIZED PageRank in the same exact-integer discipline:
    * teleport mass lands only on the `seeds` vertex set (intersected
    * with the graph — teleporting to an absent vertex is a no-op), so
    * scores measure proximity TO THE SEEDS rather than global
    * authority — "given these known-good documents, rank the corpus by
    * similarity-graph closeness", the canonical seeded-curation query.
    * score₀ = `scale // |S|` on seeds, 0 elsewhere; each round settles
    * `(3·scale) // (20·|S|)·[v ∈ S] + (17·Σ_in) // 20`. Same Pregel
    * shape and int64 headroom as [[pageRankIntScaled]]; the seed flag
    * rides the cached vertex frame, adding no per-round shuffle. */
  def pageRankPersonalized(edges: DataFrame, seeds: DataFrame,
      iters: Int = 5, scale: Long = 1000000000000L,
      aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val (adj, deg) = adjacency(edges, aCol, bCol)
    val flagged = CacheRegistry.tracked(deg.select(col("v"))
      .join(seeds.select(col("v"), lit(true).as("is_seed")).distinct(),
        Seq("v"), "left")
      .select(col("v"),
        coalesce(col("is_seed"), lit(false)).as("is_seed")))
    val nS = flagged.filter(col("is_seed")).count()
    if (nS == 0L)
      return Seq.empty[(Long, Long, Double)]
        .toDF("vec_id", "score_micro", "score")
    val adjd = CacheRegistry.tracked(adj.join(
      deg.select(col("v").as("src"), col("d").as("deg")), Seq("src")))
    val base = 3L * scale / (20L * nS)
    var scores = flagged.select(col("v"),
      when(col("is_seed"), lit(scale / nS)).otherwise(lit(0L))
        .as("score"))
    var i = 0
    while (i < iters) {
      scores = adjd.join(
          scores.select(col("v").as("src"), col("score")), Seq("src"))
        .select(col("dst").as("v"),
          expr("score div deg").as("c"))
        .groupBy(col("v"))
        .agg(sum(col("c")).as("insum"))
        .join(flagged, Seq("v"))
        .select(col("v"),
          (when(col("is_seed"), lit(base)).otherwise(lit(0L)) +
            expr("(17 * insum) div 20")).as("score"))
      i += 1
    }
    scores.select(col("v").as("vec_id"),
      col("score").as("score_micro"),
      (col("score").cast("double") / lit(scale.toDouble)).as("score"))
  }

  /** Weighted PageRank in the same exact-integer discipline: edge
    * weights arrive as a double `wCol` (cosine scores), are fixed-point
    * quantized to ppm once (`decimal(18,6) · 10⁶` — the trendOls cents
    * trick, never a double round), and each round sends
    * `(score · w) div wdeg` along every directed edge — floor division
    * of exact int128 (decimal) intermediates, settled with the same
    * 17/20 damping. This is the dedup-cluster authority score: a
    * vertex tied to its cluster by STRONG cosines outranks one with
    * the same degree of marginal matches. Int64 headroom: `score·w`
    * caps at `scale · 10⁶` — kept exact by a decimal(38,0) product
    * before the floor division brings it back under `scale`.
    * Output: `(vec_id, score_micro, score)` as in the unweighted form. */
  def pageRankWeighted(edges: DataFrame, iters: Int = 5,
      scale: Long = 1000000000L, aCol: String = "id_a",
      bCol: String = "id_b", wCol: String = "cos"): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val ppm = (col(wCol).cast(org.apache.spark.sql.types.DecimalType(18, 6))
      * 1000000).cast("long")
    val e = CacheRegistry.tracked(edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"), ppm.as("w"))
      .filter(col("a") =!= col("b") && col("w") > 0L)
      .groupBy(col("a"), col("b")).agg(max(col("w")).as("w")))
    val adj = CacheRegistry.tracked(
      e.select(col("a").as("src"), col("b").as("dst"), col("w"))
        .unionAll(e.select(col("b").as("src"), col("a").as("dst"),
          col("w"))))
    val wdeg = CacheRegistry.tracked(adj.groupBy(col("src").as("v"))
      .agg(sum(col("w")).as("wd")))
    val n = wdeg.count()
    if (n == 0L)
      return Seq.empty[(Long, Long, Double)]
        .toDF("vec_id", "score_micro", "score")
    val adjd = CacheRegistry.tracked(adj.join(
      wdeg.select(col("v").as("src"), col("wd")), Seq("src")))
    var scores = wdeg.select(col("v"), lit(scale / n).as("score"))
    val base = 3L * scale / (20L * n)
    var i = 0
    while (i < iters) {
      scores = adjd.join(
          scores.select(col("v").as("src"), col("score")), Seq("src"))
        .select(col("dst").as("v"),
          // exact int128 product, floored back under `scale`
          expr("cast((cast(score as decimal(38,0)) * w) div wd as long)")
            .as("c"))
        .groupBy(col("v"))
        .agg(sum(col("c")).as("insum"))
        .select(col("v"),
          (lit(base) + expr("(17 * insum) div 20")).as("score"))
      i += 1
    }
    scores.select(col("v").as("vec_id"),
      col("score").as("score_micro"),
      (col("score").cast("double") / lit(scale.toDouble)).as("score"))
  }

  /** One SYNCHRONOUS Louvain sweep over the weighted pair graph — the
    * community rung above connected components: CC says "reachable",
    * this says "densely tied". From the singleton partition, every
    * vertex simultaneously evaluates moving into each neighbor's
    * community; the modularity gain of moving isolated `i` beside
    * singleton `j` reduces to the EXACT integer
    * `gain_num = 2m·w_ij − k_i·k_j` (ΔQ · 2m², same sign and order),
    * with ppm-quantized weights (`decimal(18,6)·10⁶`, the
    * [[pageRankWeighted]] quantization), weighted degrees `k`, and
    * `2m` = the directed-adjacency weight total. Each vertex adopts
    * argmax-gain neighbor's id as its community (ties → lowest
    * neighbor id; no positive gain → stays its own singleton) — a
    * deterministic, engine-exact sweep, where classic Louvain's
    * sequential vertex order is irreproducible across engines.
    * Synchronous moves can pairwise SWAP two mutual argmaxes
    * (i adopts j while j adopts i) — that is the defined output, the
    * seed a full Louvain would iterate on; the structural signal
    * (weak bridges get negative gain and never merge) is already
    * decisive after one sweep.
    *
    * Shape: two vertex-keyed joins against the weighted-degree table +
    * one 1-row broadcast (2m) + one per-vertex rank window — the
    * weighted-triangle-census cost class. Exactness: products stay in
    * decimal(38,0) (int128) and the emitted `gain_num` casts to long
    * LOUDLY under ANSI, which bounds validity at
    * `max(2m·w, k·k) < 2⁶³` — ppm weight mass of ~3·10⁹ per vertex,
    * far past any near-dup graph whose banding works. */
  def communityOneLevel(edges: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", wCol: String = "cos"): DataFrame =
    sweepArgmax(edges, aCol, bCol, wCol)
      .select(col("src").as("vec_id"),
        when(col("gain") > 0, col("dst")).otherwise(col("src"))
          .as("community_id"),
        when(col("gain") > 0, col("gain")).otherwise(lit(0))
          .cast("long").as("gain_num"))

  /** Per-vertex argmax of the synchronous sweep: one row per edge
    * endpoint `(src, dst, gain)` where `dst` is the best-gain
    * neighbor (ties → lowest id) and `gain` the exact decimal(38,0)
    * numerator — shared by [[communityOneLevel]] (reports the raw
    * moves) and [[communityMerge]] (closes them into communities). */
  private def sweepArgmax(edges: DataFrame, aCol: String,
      bCol: String, wCol: String): DataFrame = {
    val ppm = (col(wCol).cast(org.apache.spark.sql.types.DecimalType(18, 6))
      * 1000000).cast("long")
    val e = CacheRegistry.tracked(edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"), ppm.as("w"))
      .filter(col("a") =!= col("b") && col("w") > 0L)
      .groupBy(col("a"), col("b")).agg(max(col("w")).as("w")))
    val adj = CacheRegistry.tracked(
      e.select(col("a").as("src"), col("b").as("dst"), col("w"))
        .unionAll(e.select(col("b").as("src"), col("a").as("dst"),
          col("w"))))
    val wdeg = CacheRegistry.tracked(adj.groupBy(col("src").as("v"))
      .agg(sum(col("w")).as("wd")))
    val m2 = adj.agg(sum(col("w")).cast(
      org.apache.spark.sql.types.DecimalType(38, 0)).as("m2"))
    val scored = adj
      .join(wdeg.select(col("v").as("src"), col("wd").as("ks")),
        Seq("src"))
      .join(wdeg.select(col("v").as("dst"), col("wd").as("kd")),
        Seq("dst"))
      .crossJoin(broadcast(m2))
      .select(col("src"), col("dst"),
        expr("m2 * w - cast(ks as decimal(38,0)) * kd").as("gain"))
    val byGain = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("gain").desc, col("dst"))
    scored.withColumn("rn", row_number().over(byGain))
      .filter(col("rn") === 1)
      .select(col("src"), col("dst"), col("gain"))
  }

  /** Communities from the sweep: close the ACCEPTED moves (positive
    * argmax gain) into connected components — the standard parallel-
    * Louvain composition. A synchronous sweep's raw output can
    * pairwise SWAP mutual argmaxes (i adopts j while j adopts i, so
    * no single community id emerges); taking components of the
    * adoption graph `{(i, argmax_i) : gain_i > 0}` merges every such
    * group into one community (min member id), while vertices whose
    * every move had non-positive gain — weak-bridge endpoints included
    * — stay singletons. Exactness carries through: the adoption edges
    * come from the integer-exact sweep, and the closure is the same
    * label propagation the dedup clusters use (adaptive union-find /
    * distributed path-halving). Adoption edges are vertex-count
    * bounded (one argmax per vertex), so the closure is strictly
    * cheaper than the pair-graph CC. Output:
    * `(vec_id, community_id)` for every edge endpoint. */
  def communityMerge(edges: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", wCol: String = "cos"): DataFrame = {
    val arg = CacheRegistry.tracked(
      sweepArgmax(edges, aCol, bCol, wCol))
    val adopt = arg.filter(col("gain") > 0)
      .select(col("src").as("id_a"), col("dst").as("id_b"))
    val vertices = arg.select(col("src").as("vec_id"))
    Dedup.clusterAssignments(vertices, adopt, idCol = "vec_id")
      .select(col("vec_id"), col("cluster_id").as("community_id"))
  }

  /** TWO-LEVEL Louvain: coarsen the level-1 communities into the
    * quotient graph and re-sweep once — the standard multi-level
    * composition (Blondel et al. 2008) over the same exact ppm gain
    * machinery. Level 1 ([[communityMerge]]) can only bind a vertex to
    * a NEIGHBOR, so two internally-settled communities joined by a
    * bridge stay separate even when modularity favors their union;
    * coarsening makes each community one node (cross weights summed,
    * internal mass kept as self-weight) and the sweep re-evaluates the
    * merge at community granularity — GraphStatsSpec holds a fixture
    * level 1 provably cannot merge and level 2 does.
    *
    * Exactness carries through unchanged: coarsened degrees are
    * `k_A = Σ cross W + 2·W_self` (exactly Σ k_i over members), `2m`
    * is invariant under coarsening, and the move gain keeps the
    * integer form `2m·W_AB − k_A·k_B` in decimal(38,0). Accepted
    * moves close into components exactly as in level 1; communities
    * with no cross edge keep their level-1 id.
    *
    * Scale shape: the quotient graph is COMMUNITY-sized (strictly
    * smaller than the pair graph), built by two label joins + one
    * keyed aggregate; everything after runs on quotient rows. Output:
    * `(vec_id, l1_community, community_id)` per edge endpoint. */
  def communityTwoLevel(edges: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", wCol: String = "cos"): DataFrame =
    communityTwoLevelFrom(edges,
      communityMerge(edges, aCol, bCol, wCol)
        .select(col("vec_id"), col("community_id").as("c1")),
      aCol, bCol, wCol)

  /** [[communityTwoLevel]] against an EXPLICIT level-1 assignment
    * `(vec_id, c1)` — the serving split: level 1 is a pure function of
    * one pair-table state, so a committed store
    * ([[graft.sources.ClusterStore.ensureL1Labels]]) pays its sweep +
    * closure once per admission instead of inside every two-level
    * query, and this body prices only the quotient-graph re-sweep
    * (communities-sized). Bit-identical to the inline form by
    * construction (spec-pinned): the stored labels ARE
    * [[communityMerge]]'s output round-tripped through parquet longs. */
  def communityTwoLevelFrom(edges: DataFrame, l1In: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b",
      wCol: String = "cos"): DataFrame = {
    val l1 = CacheRegistry.tracked(l1In)
    // the SAME canonical ppm pair prep as the level-1 sweep
    val ppm = (col(wCol).cast(org.apache.spark.sql.types.DecimalType(18, 6))
      * 1000000).cast("long")
    val e = CacheRegistry.tracked(edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"), ppm.as("w"))
      .filter(col("a") =!= col("b") && col("w") > 0L)
      .groupBy(col("a"), col("b")).agg(max(col("w")).as("w")))
    val ceAgg = CacheRegistry.tracked(e
      .join(l1.select(col("vec_id").as("a"), col("c1").as("ca")),
        Seq("a"))
      .join(l1.select(col("vec_id").as("b"), col("c1").as("cb")),
        Seq("b"))
      .select(least(col("ca"), col("cb")).as("qa"),
        greatest(col("ca"), col("cb")).as("qb"), col("w"))
      .groupBy(col("qa"), col("qb")).agg(sum(col("w")).as("w")))
    val cross = ceAgg.filter(col("qa") =!= col("qb"))
    val selfW = ceAgg.filter(col("qa") === col("qb"))
      .select(col("qa").as("v"), col("w").as("sw"))
    val adj2 = cross
      .select(col("qa").as("src"), col("qb").as("dst"), col("w"))
      .unionAll(cross.select(col("qb").as("src"), col("qa").as("dst"),
        col("w")))
    // coarsened degree = Σ incident cross + 2·internal = Σ member k_i
    val wdeg2 = CacheRegistry.tracked(adj2
      .groupBy(col("src").as("v")).agg(sum(col("w")).as("cw"))
      .join(selfW, Seq("v"), "full")
      .select(col("v"), (coalesce(col("cw"), lit(0L)) +
        lit(2L) * coalesce(col("sw"), lit(0L))).as("wd")))
    // 2m is coarsening-invariant: the level-1 directed-adjacency total
    val m2 = e.agg((sum(col("w")) * 2).cast(
      org.apache.spark.sql.types.DecimalType(38, 0)).as("m2"))
    val scored = adj2
      .join(wdeg2.select(col("v").as("src"), col("wd").as("ks")),
        Seq("src"))
      .join(wdeg2.select(col("v").as("dst"), col("wd").as("kd")),
        Seq("dst"))
      .crossJoin(broadcast(m2))
      .select(col("src"), col("dst"),
        expr("m2 * w - cast(ks as decimal(38,0)) * kd").as("gain"))
    val byGain = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("gain").desc, col("dst"))
    val adopt = scored.withColumn("rn", row_number().over(byGain))
      .filter(col("rn") === 1 && col("gain") > 0)
      .select(col("src").as("id_a"), col("dst").as("id_b"))
    val cverts = l1.select(col("c1").as("vec_id")).distinct()
    val l2 = Dedup.clusterAssignments(cverts, adopt, idCol = "vec_id")
      .select(col("vec_id").as("c1"), col("cluster_id").as("c2"))
    l1.join(l2, Seq("c1"))
      .select(col("vec_id"), col("c1").as("l1_community"),
        col("c2").as("community_id"))
  }

  /** Link prediction over the undirected pair graph: for every
    * NON-adjacent canonical pair `(id_a < id_b)` sharing at least
    * `minCommon` neighbors, three classic structural scores — the
    * common-neighbor count, the Resource Allocation index
    * Σ_z 1/deg(z) over shared neighbors z (Zhou, Lü & Zhang, EPJ B
    * 2009 — the top-performing local index in their benchmark; kept
    * EXACT as Σ `10⁶ div deg(z)` ppm integers, replayable in any
    * engine's integer division), and the neighborhood Jaccard
    * `cn / (deg_a + deg_b − cn)` in the same ppm discipline. On the
    * near-dup graph this ranks pairs the LSH bands MISSED: two
    * documents tied to the same duplicate neighborhood but never
    * banded together are the candidates a second verification pass
    * should probe first.
    *
    * Scale shape: wedge expansion fans out deg(z)² per pivot vertex,
    * so `maxDeg` EXCLUDES super-hub pivots from the expansion — the
    * standard degree-capped form: a hub's per-pair evidence is
    * 1/deg → ~0 for RA anyway, while its quadratic fan-out would
    * dominate the job (the same hub economics the triangle census
    * handles by degree-orientation; a capped pivot set bounds the
    * whole expansion at |V|·maxDeg² — linear in vertices). The cap is
    * part of the operator's CONTRACT (scores count only sub-hub
    * pivots), so the oracle replays it exactly. Every stage is an
    * equi-join or keyed aggregate off the shared cached adjacency;
    * the anti-join that drops already-linked pairs is edge-keyed. */
  def linkPredict(edges: DataFrame, minCommon: Long = 2,
      maxDeg: Long = 64, aCol: String = "id_a", bCol: String = "id_b")
      : DataFrame = {
    val (adj, deg) = adjacency(edges, aCol, bCol)
    val nb = adj
      .join(deg.filter(col("d") <= maxDeg)
        .select(col("v").as("src"), col("d").as("dz")), Seq("src"))
      .select(col("src").as("z"), col("dst").as("n"), col("dz"))
    val wedges = nb.select(col("z"), col("dz"), col("n").as("x"))
      .join(nb.select(col("z"), col("n").as("y")), Seq("z"))
      .filter(col("x") < col("y"))
    // the canonical edge set is exactly the cached adjacency's src<dst
    // half — no second scan+distinct of the pair store
    val e = adj.filter(col("src") < col("dst"))
      .select(col("src").as("x"), col("dst").as("y"))
    wedges.groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("cn"),
        sum(expr("1000000 div dz")).as("ra_ppm"))
      .filter(col("cn") >= minCommon)
      .join(e, Seq("x", "y"), "left_anti")
      .join(deg.select(col("v").as("x"), col("d").as("dx")), Seq("x"))
      .join(deg.select(col("v").as("y"), col("d").as("dy")), Seq("y"))
      .select(col("x").as("id_a"), col("y").as("id_b"), col("cn"),
        col("ra_ppm"),
        expr("(1000000 * cn) div (dx + dy - cn)").as("jacc_ppm"))
  }
}
