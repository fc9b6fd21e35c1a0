package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, a random-hyperplane
  * LSH-bucketed variant as the scale path, and threshold near-dup pairs.
  *
  * Scale design: vectors are L2-normalized once per row at scan time, so
  * the per-pair work is a single dot product (the naive cosine recomputes
  * both norms per pair — 3× the flops on the O(n²) stage). The brute-force
  * path broadcasts the (small) query set against a partitioned corpus scan
  * — the corpus itself never shuffles; top-k is a per-query window. The LSH
  * path buckets both sides by hyperplane sign bits so the join only
  * materializes same-bucket pairs. All arithmetic in double; scores are
  * rounded to 6 decimals so results are engine-reproducible.
  */
object Similarity {

  /** Cosine similarity of two `array<double>` columns — built from
    * `zip_with` + `aggregate`, stays inside codegen (no UDF). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0),
      (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0),
      (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0),
      (acc, x) => acc + x))
    dot / (na * nb)
  }

  /** Hot-loop dot product: custom codegen'd expression (see
    * [[graft.plans.DotProduct]]) — the higher-order-function route is
    * interpreted per element and dominates O(n²) pair stages. */
  private def dot(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.dotProduct(a, b)

  /** Cosine over RAW (un-normalized) vectors through the codegen'd dot
    * kernel — sequential sums, structurally the formula `list_cosine_
    * similarity` replays, so round-6 values agree across engines. */
  private def cosRaw(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** A small parquet corpus arrives as one partition; the pair stages that
    * follow are compute-bound (millions of dot products), so fan the rows
    * out to the session's shuffle width first. GUARDED on the input's
    * actual partition count (r14, guide §2.4): at real scale the scan is
    * already wide and the repartition would be a full payload shuffle for
    * nothing — the guard makes it a no-op there. Callers pass scan-shaped
    * frames (no upstream exchange), so reading the partition count plans
    * the scan without running a job. */
  private def fanOut(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= want) df else df.repartition(want)
  }

  /** Select (idAs, unit-normalized vector) — norm computed once per row. */
  private def unitVecs(df: DataFrame, idCol: String, vecCol: String,
      idAs: String, vecAs: String): DataFrame =
    fanOut(df)
      .select(col(idCol).as(idAs), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm",
        sqrt(graft.plans.VectorExpressions.dotProduct(col("v"), col("v"))))
      .select(col(idAs),
        transform(col("v"), x => x / col("nrm")).as(vecAs))

  /** Collect a centroid table to driver arrays for the per-row argmax
    * kernels ([[graft.plans.CentroidKernels]]) — broadcast-sized by the
    * same contract that let the crossJoin form broadcast it, sorted by
    * id so equivalent tables canonicalize to equal kernel expressions.
    * Runs inside the query-construction path, so every bench attempt
    * re-pays the evaluation (caches are cleared between attempts). */
  private def collectCents(cents: DataFrame, idField: String,
      vecField: String): (Array[Long], Array[Array[Double]]) = {
    val rows = cents.select(col(idField).cast("long"),
      col(vecField).cast("array<double>")).collect()
    val sorted = rows.map(r =>
      (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    (sorted.map(_._1), sorted.map(_._2))
  }

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("match_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("match_id"), col("cos"), col("rank"))
  }

  /** Exact brute-force cosine top-k: every query vector against the whole
    * corpus. Queries are expected to be a small, broadcastable set. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = unitVecs(queries, idCol, vecCol, "query_id", "qv")
    val c = unitVecs(corpus, idCol, vecCol, "match_id", "cv")
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("match_id"))
      .select(col("query_id"), col("match_id"),
        round(dot(col("qv"), col("cv")), 6).as("cos"))
    topK(scored, k)
  }

  /** Matryoshka truncation read-out: recall@k of the FIRST `truncDim`
    * dimensions against the full-dimension exact top-k — the
    * evaluation that decides how many dimensions a serving index
    * actually needs (Kusupati et al., "Matryoshka Representation
    * Learning", NeurIPS 2022: prefixes of an MRL-trained embedding
    * carry most of the signal; a 4× narrower index is 4× the vectors
    * per byte of cache). Both rankings are exact brute force — this
    * is an EVALUATION harness over the query sample, so its cost is
    * eval-set-sized; the decision it informs (store `truncDim` floats
    * instead of the full vector) is what pays at 100 TB. Overlap is
    * counted on (query, match) keys; recall is the exact ppm integer
    * `10⁶·hits div k`, replayable anywhere. */
  def dimTruncateRecall(embeddings: DataFrame, k: Int, queryMod: Int,
      truncDim: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    def truncated(df: DataFrame) = df.select(col(idCol),
      slice(col(vecCol), 1, truncDim).as(vecCol))
    val queries = embeddings.filter(col(idCol) % queryMod === 0)
    val full = bruteForceTopK(queries, embeddings, k, idCol, vecCol)
    val trunc = bruteForceTopK(truncated(queries),
      truncated(embeddings), k, idCol, vecCol)
    full.select(col("query_id"), col("match_id"))
      .join(trunc.select(col("query_id"), col("match_id"),
        lit(1L).as("hit")), Seq("query_id", "match_id"), "left")
      .groupBy(col("query_id"))
      .agg(coalesce(sum(col("hit")), lit(0L)).as("n_hits"))
      .select(col("query_id"), col("n_hits"),
        expr(s"(1000000 * n_hits) div $k").as("recall_ppm"))
  }

  /** Hard-negative mining for contrastive training: per anchor, the
    * `k` HIGHEST-cosine documents that are NOT near-duplicates
    * (cos < `threshold`) and not the anchor itself — the "close but
    * wrong" examples a contrastive objective needs: random negatives
    * are too easy to carry gradient, while near-dups above the
    * threshold are FALSE negatives that poison the loss (the standard
    * curation step between the dedup pass and the training run). Same
    * exact brute-force shape as [[bruteForceTopK]] with the near-dup
    * band excluded before the rank cut; at scale the brute pass swaps
    * for any of the suite's ANN ladders with the identical filter. */
  def hardNegatives(embeddings: DataFrame, k: Int, queryMod: Int,
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = unitVecs(embeddings.filter(col(idCol) % queryMod === 0),
      idCol, vecCol, "query_id", "qv")
    val c = unitVecs(embeddings, idCol, vecCol, "match_id", "cv")
    topK(c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("match_id"))
      .select(col("query_id"), col("match_id"),
        round(dot(col("qv"), col("cv")), 6).as("cos"))
      .filter(col("cos") < threshold), k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * the low bit of a 60-bit md5-derived integer of "p{plane}#{dim}" —
    * the same construction a SQL engine computes as
    * `('0x' || substr(md5('p' || p || '#' || i), 1, 15))::bigint & 1`,
    * so the DuckDB oracle reproduces the buckets exactly. The signs depend
    * only on (plane, dim), so they fold to a ±1 literal array at plan time
    * and the per-row cost is one codegen'd dot product per plane. */
  private[operators] def planeSign(plane: Int, dim: Int): Double =
    mdSign(s"p$plane#$dim")

  /** Shared low-bit-of-md5 ±1 derivation behind every sign family
    * (hyperplanes "p…", random projection "r…") — one construction,
    * one thing the SQL oracles have to mirror. */
  private def mdSign(tag: String): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(tag.getBytes("UTF-8"))
    val hex = digest.map("%02x".format(_)).mkString.substring(0, 15)
    if ((java.lang.Long.parseLong(hex, 16) & 1L) == 1L) 1.0 else -1.0
  }

  /** The hyperplanes are constant ±1 vectors of length `dim`, and the dot
    * product runs over the shorter operand — a vector of any other length
    * would silently land in a truncated-projection bucket. Fail loudly
    * instead: evaluate to the vector when the length matches, raise
    * otherwise. Constant-folds to nothing for the all-match case only at
    * runtime, but `size()` is O(1) on array columns. */
  private def dimChecked(v: Column, dim: Int): Column =
    when(size(v) === dim, v).otherwise(raise_error(concat(
      lit("LSH dim mismatch: embedding has "), size(v).cast("string"),
      lit(s" components, hyperplanes have $dim"))))

  /** Random-hyperplane LSH signature: `planes` sign bits packed in a long.
    * Same-bucket vectors are the ANN candidates. `dim` must match the
    * embedding dimensionality (the plane is a constant ±1 vector);
    * mismatched rows raise rather than bucket on a truncated projection. */
  def lshSignature(vec: Column, planes: Int = 12, dim: Int = 64): Column = {
    val v = dimChecked(vec.cast("array<double>"), dim)
    // one compact expression node (plane matrix as a reference object)
    // instead of planes·dim literal nodes — bit-identical packing; see
    // graft.plans.BandKeys for the planning-cost measurement
    val mat = Array.tabulate(planes)(p =>
      Array.tabulate(dim)(i => planeSign(p, i)))
    graft.plans.VectorExpressions.bandKeys(v, mat, planes).getItem(0)
  }

  /** Deterministic ±1 sign for the random-projection matrix — an
    * independent md5 family ("r…", vs the hyperplanes' "p…"), same
    * SQL-replayable [[mdSign]] construction as [[planeSign]]. */
  private[operators] def rpSign(j: Int, i: Int): Double =
    mdSign(s"r$j#$i")

  /** Johnson–Lindenstrauss reduction of a raw vector to `rDim` signed
    * sums: component j = dot(v, signs_j), signs a constant ±1 matrix.
    * Each component is one codegen'd dot product against a literal
    * array — per row, rDim sequential passes, no shuffle, no UDF. */
  private[operators] def rpReduce(vec: Column, rDim: Int,
      dim: Int): Column = {
    val v = dimChecked(vec.cast("array<double>"), dim)
    // compact matrix-projection node instead of rDim·dim literal nodes
    // (same arithmetic order per component — see graft.plans.MatVec)
    graft.plans.VectorExpressions.matVec(v,
      Array.tabulate(rDim)(j => Array.tabulate(dim)(i => rpSign(j, i))))
  }

  /** ANN via RANDOM-PROJECTION candidate generation + exact refine —
    * the dimensionality rung of the approximation ladder (SQ8 shrinks
    * precision, PQ shrinks to codes; this shrinks DIMENSION, the
    * faiss-style PCA/OPQ pre-transform with a JL sign matrix instead of
    * a trained rotation, so an external engine replays it exactly).
    *
    * Candidates: brute top-`shortlist` by dot product in the reduced
    * space — dim/rDim (here 2×) less memory bandwidth per comparison,
    * the term that dominates brute scans at corpus scale; JL keeps
    * relative dots approximately, so the true neighbors land in the
    * shortlist with high probability (recall vs exact is spec-gated).
    * Refine: the shortlist re-ranks by exact cosine over the raw
    * vectors, so final ranks among surfaced candidates are exact (the
    * SQ8-refine discipline). The reduced corpus is also the natural
    * input for the OTHER rungs — bucket or cluster the 16-dim vectors
    * instead of brute-scanning them — which is how this composes at
    * 100 TB; the brute reduced scan here isolates the rung itself. */
  def rpRefineTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      rDim: Int = 32, shortlist: Int = 150, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    val q = fanOut(queries)
      .select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qr", rpReduce(col("qv"), rDim, dim))
    val c = CacheRegistry.tracked(fanOut(corpus)
      .select(col(idCol).as("match_id"),
        col(vecCol).cast("array<double>").as("cv"))
      .withColumn("cr", rpReduce(col("cv"), rDim, dim)))
    // cached: the reduced scan feeds the shortlist, the raw vectors the
    // refine join — uncached the projection runs twice over the corpus
    val cand = c.select(col("match_id"), col("cr"))
      .crossJoin(broadcast(q.select(col("query_id"), col("qr"))))
      .filter(col("query_id") =!= col("match_id"))
      .select(col("query_id"), col("match_id"),
        round(dot(col("cr"), col("qr")), 6).as("rp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("rp").desc, col("match_id"))
    val short = cand.withColumn("rrank", row_number().over(w))
      .filter(col("rrank") <= shortlist)
      .select(col("query_id"), col("match_id"))
    val scored = short
      .join(c.select(col("match_id"), col("cv")), Seq("match_id"))
      .join(broadcast(q.select(col("query_id"), col("qv"))),
        Seq("query_id"))
      .select(col("query_id"), col("match_id"),
        round(cosRaw(col("qv"), col("cv")), 6).as("cos"))
    topK(scored, k)
  }

  /** ANN top-k via LSH buckets (exact-bucket probe): rank within the
    * query's bucket. Trades recall for touching only the bucket's corpus
    * slice — the 100 TB path. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      planes: Int = 12, dim: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // buckets are computed on the unit vectors; the projection's SIGN is
    // invariant under positive scaling, so an oracle may use raw vectors
    val q = unitVecs(queries, idCol, vecCol, "query_id", "qv")
      .withColumn("bucket", lshSignature(col("qv"), planes, dim))
    val c = unitVecs(corpus, idCol, vecCol, "match_id", "cv")
      .withColumn("bucket", lshSignature(col("cv"), planes, dim))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("match_id"))
      .select(col("query_id"), col("match_id"),
        round(dot(col("qv"), col("cv")), 6).as("cos"))
    topK(scored, k)
  }

  /** ANN top-k via an IVF (inverted-file) index: a coarse centroid set
    * partitions the corpus into lists by nearest centroid; a query probes
    * only its `nprobe` nearest lists and ranks exactly within them.
    *
    * Scale design: the centroid set is tiny (~√n in production) and
    * broadcast, so BUILD is one map-side argmax pass over the corpus (no
    * shuffle of the vectors beyond the list equi-join) and SEARCH touches
    * `nprobe/C` of the corpus per query. Here centroids are a
    * deterministic corpus sample (`vec_id % centroidMod`) so an external
    * SQL oracle reproduces the index bit-for-bit; production would train
    * them with k-means (spark.ml) — the IVF plumbing is identical, only
    * the centroid quality changes (recall per probe, never correctness of
    * the within-list ranking). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      centroidMod: Int = 37, nprobe: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    ivfTopKWith(queries, corpus, k,
      unitVecs(corpus.filter(col(idCol) % centroidMod === 0), idCol, vecCol,
        "cent_id", "centv"),
      nprobe, idCol, vecCol)

  /** K-means coarse centroids for [[ivfTopKWith]] — the production
    * trainer (spark.ml, seeded for reproducibility within one Spark
    * version; an external oracle cannot replay the training, which is why
    * the driver-checked query uses the sampled-centroid variant).
    * Returns (cent_id, centv) with unit-normalized centers. */
  def kmeansCentroids(corpus: DataFrame, numCentroids: Int, seed: Long = 7,
      vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val feats = corpus.select(
      org.apache.spark.ml.functions.array_to_vector(
        col(vecCol).cast("array<double>")).as("features"))
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(numCentroids).setSeed(seed).setMaxIter(10).fit(feats)
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (v, i) =>
        val a = v.toArray
        val n = math.sqrt(a.map(x => x * x).sum)
        (i.toLong, a.map(_ / n).toSeq)
      }.toDF("cent_id", "centv")
  }

  /** Deterministic spherical Lloyd refinement of the sampled seed
    * centroids — the ORACLE-REPLAYABLE production trainer (the spark.ml
    * path above cannot be replayed by an external engine; this one can,
    * so the trained-centroid IVF serves as a driver-checked query).
    * Each iteration: assign every vector to its max-cosine centroid
    * (broadcast centroids, map-side-combining argmax — one scan, no
    * vector shuffle), then recompute each centroid as the normalized
    * mean of its RAW members. Determinism engineering: per-dim means
    * use decimal(38,18) sums (order-independent, engine-exact — the
    * [[embedDimStats]] construction), every derived double is rounded
    * to 6 before it feeds the next stage, and the normalizer is a
    * decimal sum of the rounded means' squares — so both engines feed
    * bit-identical centroids into every round. Clusters that lose all
    * members drop out (fewer lists, same both sides). Lloyd
    * monotonically improves assignment cosine, so 2-3 rounds buy most
    * of the recall-per-probe gain (ExtSpec pins the improvement); at
    * 100 TB each round costs one corpus scan against C broadcast
    * centroids — the same shape as the IVF build itself. */
  def lloydRefineCentroids(corpus: DataFrame, centroidMod: Int = 37,
      iters: Int = 2, dim: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    val raw = CacheRegistry.tracked( // re-scanned every iteration
      fanOut(corpus).select(col(idCol).as("match_id"),
        dimChecked(col(vecCol).cast("array<double>"), dim).as("v")))
    var cents = unitVecs(
      corpus.filter(col(idCol) % centroidMod === 0), idCol, vecCol,
      "cent_id", "centv")
    (1 to iters).foreach { _ =>
      // per-row argmax kernel instead of crossJoin+max_by: no n·C
      // candidate rows, no broadcast build, no aggregate exchange per
      // round — and each round's plan no longer nests the previous
      // round's whole lineage (the centroids ride along as a collected
      // reference object), so planning cost stays flat across rounds
      // (guide §7.3). Empty centroid sets keep the legacy shape (the
      // crossJoin form's inner-join-with-empty ⇒ empty result).
      val (cids, cvs) = collectCents(cents, "cent_id", "centv")
      val asg =
        if (cids.isEmpty)
          raw.crossJoin(broadcast(cents))
            .withColumn("cdot", round(cosRaw(col("v"), col("centv")), 6))
            .groupBy(col("match_id"))
            .agg(max_by(col("cent_id"),
              struct(col("cdot"), -col("cent_id"))).as("cent_id"),
              first(col("v")).as("v"))
        else
          raw.select(col("match_id"),
            graft.plans.CentroidKernels.nearestCentroid(col("v"), cids,
              cvs, graft.plans.CentroidKernels.NormFull)
              .getField("cent_id").as("cent_id"),
            col("v"))
      val dims = asg
        .select(col("cent_id"), posexplode(col("v")).as(Seq("i", "x")))
        .groupBy(col("cent_id"), col("i"))
        .agg(count(lit(1)).as("n"), sum(col("x").cast(dec)).as("s"))
        .withColumn("mean", round(col("s").cast("double") / col("n"), 6))
      val norms = dims.groupBy(col("cent_id"))
        .agg(sqrt(sum((col("mean") * col("mean")).cast(dec))
          .cast("double")).as("nrm"))
      cents = CacheRegistry.tracked( // next round joins it twice
        dims.join(norms, Seq("cent_id"))
          .withColumn("c", round(col("mean") / col("nrm"), 6))
          .groupBy(col("cent_id"))
          .agg(transform(
              sort_array(collect_list(struct(col("i"), col("c")))),
              x => x.getField("c")).as("centv")))
    }
    cents
  }

  /** Nearest-centroid assignment of every vector: broadcast-centroid
    * argmax (map-side-combining max_by, round-6 cosine, ties to the
    * lowest cent_id) → (id, cent_id). The shared front half of IVF list
    * building, Lloyd iteration, and cluster-balanced sampling. */
  def assignToCentroids(vectors: DataFrame, cents: DataFrame,
      dim: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val base = fanOut(vectors)
      .select(col(idCol).as("id"),
        dimChecked(col(vecCol).cast("array<double>"), dim).as("v"))
    val (cids, cvs) = collectCents(cents, "cent_id", "centv")
    if (cids.isEmpty) // legacy shape: empty cents ⇒ empty assignment
      base.crossJoin(broadcast(cents))
        .withColumn("cdot", round(cosRaw(col("v"), col("centv")), 6))
        .groupBy(col("id"))
        .agg(max_by(col("cent_id"), struct(col("cdot"), -col("cent_id")))
          .as("cent_id"))
    else // per-row argmax kernel: scan-shaped, no n·C rows, no exchange
      base.select(col("id"),
        graft.plans.CentroidKernels.nearestCentroid(col("v"), cids, cvs,
          graft.plans.CentroidKernels.NormFull)
          .getField("cent_id").as("cent_id"))
  }

  /** Cluster-balanced ("diversity") sampling — the curation step that
    * keeps coverage of the embedding space instead of letting one dense
    * mode dominate the quality cut: assign every document's embedding
    * to its nearest trained centroid, then keep the `perCluster` best
    * documents per cluster by quality score (ties → lowest id). One
    * broadcast-argmax scan + one join + one per-cluster rank
    * ([[CorpusStats.topKPerGroup]] — partial `WindowGroupLimit`, no
    * global sort); every stage is oracle-replayable, including the
    * trained centroids when [[lloydRefineCentroids]] provides them. */
  def diversitySample(docs: DataFrame, embeddings: DataFrame,
      cents: DataFrame, perCluster: Int, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding",
      docIdCol: String = "doc_id"): DataFrame = {
    val asg = assignToCentroids(embeddings, cents, dim, idCol, vecCol)
      .withColumnRenamed("id", docIdCol)
    CorpusStats.topKPerGroup(
      docs.select(col(docIdCol), col("text")).join(asg, Seq(docIdCol)),
      perCluster, "cent_id",
      TextAnalysis.qualityScore(col("text")), docIdCol)
  }

  /** IVF search against an explicit centroid table (`cent_id`,
    * unit-normalized `centv` array<double>) — shared by the deterministic
    * sampled-centroid path and the k-means path. */
  def ivfTopKWith(queries: DataFrame, corpus: DataFrame, k: Int,
      cents: DataFrame, nprobe: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // corpus assignment: argmax over the broadcast centroids as a map-side
    // combinable max_by — n rows reach the shuffle, not n × C candidate
    // rows (ties broken toward the lowest cent_id, same as the probe rank)
    // centroid scores divide by the centroid norm (full cosine, not a
    // bare dot): sampled centroids are unit to double precision, but
    // TRAINED (Lloyd) centroids carry round-6 components whose norm is
    // off 1 by up to ~4e-6 — a bare dot would scale each centroid's
    // score differently from the oracle's list_cosine_similarity and
    // could flip an assignment whose top-two cosines are closer than
    // that (data-dependent, so it must be structurally impossible)
    def centCos(v: Column): Column = round(dot(v, col("centv")) /
      sqrt(dot(col("centv"), col("centv"))), 6)
    val (cids, cvs) = collectCents(cents, "cent_id", "centv")
    val lists =
      if (cids.isEmpty) // legacy shape: empty cents ⇒ empty lists
        unitVecs(corpus, idCol, vecCol, "match_id", "cv")
          .crossJoin(broadcast(cents))
          .withColumn("cdot", centCos(col("cv")))
          .groupBy(col("match_id"))
          .agg(
            max_by(col("cent_id"), struct(col("cdot"), -col("cent_id")))
              .as("cent_id"),
            first(col("cv")).as("cv"))
      else // per-row argmax kernel (÷ centroid norm): scan-shaped
        unitVecs(corpus, idCol, vecCol, "match_id", "cv")
          .select(col("match_id"),
            graft.plans.CentroidKernels.nearestCentroid(col("cv"), cids,
              cvs, graft.plans.CentroidKernels.NormCent)
              .getField("cent_id").as("cent_id"),
            col("cv"))
    // query probes: the query set is small; rank nprobe lists per query
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cdot").desc, col("cent_id"))
    val probes = unitVecs(queries, idCol, vecCol, "query_id", "qv")
      .crossJoin(broadcast(cents))
      .withColumn("cdot", centCos(col("qv")))
      .withColumn("crnk", row_number().over(w))
      .filter(col("crnk") <= nprobe)
      .drop("centv", "cdot", "crnk")
    val scored = lists.join(broadcast(probes), Seq("cent_id"))
      .filter(col("query_id") =!= col("match_id"))
      .select(col("query_id"), col("match_id"),
        round(dot(col("qv"), col("cv")), 6).as("cos"))
    topK(scored, k)
  }

  /** Per-vector int8 scalar quantization: codes = round((x − min) ·
    * 255 / (max − min)) with the vector's own [min, max] range stored
    * alongside (the faiss `SQ8` layout). 4× smaller than float32 — at
    * 100 TB the difference between an in-memory ANN corpus and one that
    * spills. Pure per-row expressions (scan speed, no shuffle); returns
    * (id, qmin, qmax, codes array<int>, max_abs_err) where the error is
    * the reconstruction `qmin + code·(qmax−qmin)/255` vs the original —
    * bounded by half a quantization step. Degenerate constant vectors
    * (max = min) encode as all-zero codes with zero error. */
  /** Append the SQ8 grid columns (`v`, `qmin`, `qmax`, `scale`,
    * `codes`) for `vecCol` — the ONE place the quantization expressions
    * live, shared by [[quantizeInt8]] and [[sq8RefineTopK]] (and
    * mirrored by both SQL oracles), so the "same construction" siblings
    * can never drift.
    *
    * The grid is bound as ATTRIBUTES through a projection chain on
    * purpose: higher-order functions run interpreted, and a
    * non-attribute subexpression inside a lambda re-evaluates PER
    * ELEMENT — `array_min(v)` inside the codes `transform` is O(d²) per
    * row. CollapseProject keeps the binding (it refuses to inline
    * non-cheap expressions referenced more than once). */
  private def withSq8Grid(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("v", col(vecCol).cast("array<double>"))
      .withColumn("qmin", array_min(col("v")))
      .withColumn("qmax", array_max(col("v")))
      .withColumn("scale", (col("qmax") - col("qmin")) / lit(255.0))
      .withColumn("codes", when(col("qmax") > col("qmin"),
        transform(col("v"),
          x => round((x - col("qmin")) / col("scale")).cast("int")))
        .otherwise(transform(col("v"), _ => lit(0))))

  /** Per-dimension corpus statistics (mean, std) over the embedding
    * column — the whitening / PCA-prep pass every embedding pipeline
    * runs before normalization or dimensionality reduction. Sums go
    * through decimal(38,18) so they are order-independent — a
    * 1000-executor shuffle cannot change a statistic — and an external
    * engine replays them bit-for-bit; only the final mean/std division
    * happens in double.
    *
    * Shape: posexplode → one map-side-combining aggregate on the
    * dimension index (`dim` output rows total). At 100 TB this is the
    * cheapest possible full-corpus pass: no join, no window, a
    * 64-group aggregate. */
  def embedDimStats(vectors: DataFrame, dim: Int = 64,
      vecCol: String = "embedding"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    val v = dimChecked(col(vecCol).cast("array<double>"), dim)
    fanOut(vectors)
      .select(posexplode(v).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("s"),
        sum((col("x") * col("x")).cast(dec)).as("s2"))
      .withColumn("mean_d", col("s").cast("double") / col("n"))
      .select(col("i").as("dim"), col("n"),
        round(col("mean_d"), 6).as("mean"),
        round(sqrt(greatest(
          col("s2").cast("double") / col("n") - pow(col("mean_d"), 2),
          lit(0.0))), 6).as("std"))
  }

  def quantizeInt8(vectors: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val g = withSq8Grid(vectors, vecCol)
    val recon = zip_with(col("v"), col("codes"),
      (x, c) => abs(x - (col("qmin") + c.cast("double") * col("scale"))))
    // raw_err is computed BEFORE the projection that re-aliases "qmin"/
    // "qmax" to their rounded forms: Spark's lateral column alias
    // resolution would otherwise bind the col("qmin") inside recon to
    // the earlier `round(qmin, 6) AS qmin` item of the SAME select list
    // — a silent 4e-7 shift in the reconstruction error (caught by the
    // oracle gate, round 4).
    g.withColumn("raw_err",
        array_max(when(col("qmax") > col("qmin"), recon)
          .otherwise(transform(col("v"), _ => lit(0.0)))))
      .select(col(idCol),
        round(col("qmin"), 6).as("qmin"), round(col("qmax"), 6).as("qmax"),
        col("codes"),
        round(col("raw_err"), 6).as("max_abs_err"))
  }

  /** Two-stage ANN over the SQ8 codes (asymmetric distance computation):
    * stage 1 scores every corpus row from its RECONSTRUCTED vector —
    * i.e. from the 4×-smaller (qmin, scale, codes) representation
    * [[quantizeInt8]] produces, which is all a 100 TB scan has to read —
    * and shortlists `shortlistFactor · k` candidates per query; stage 2
    * re-ranks only the shortlist against the exact float vectors. The
    * faiss SQ8+refine pattern: full-precision I/O drops to the
    * shortlist join, recall loss is bounded by the quantization error
    * (≤ half a step per component). */
  def sq8RefineTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      shortlistFactor: Int = 3, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = unitVecs(queries, idCol, vecCol, "query_id", "qv")
    // quantize the raw corpus vectors (the shared withSq8Grid columns)
    val sq = withSq8Grid(fanOut(corpus), vecCol)
      .select(col(idCol).as("match_id"),
        col("qmin"), col("scale"), col("codes"))
    // stage 1: reconstruct from the codes, unit-normalize, approx score
    val rv = transform(col("codes"),
      cd => col("qmin") + cd.cast("double") * col("scale"))
    val approx = sq
      .withColumn("rv", rv)
      .withColumn("nrm", sqrt(dot(col("rv"), col("rv"))))
      .select(col("match_id"),
        transform(col("rv"), x => x / col("nrm")).as("rvu"))
      .crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("match_id"))
      .select(col("query_id"), col("match_id"), col("qv"),
        round(dot(col("rvu"), col("qv")), 6).as("approx"))
    val sw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("match_id"))
    val shortlist = approx
      .withColumn("srnk", row_number().over(sw))
      .filter(col("srnk") <= k * shortlistFactor)
      .select(col("query_id"), col("match_id"), col("qv"))
    // stage 2: exact re-rank of the shortlist only
    val c = unitVecs(corpus, idCol, vecCol, "match_id", "cvu")
    val exact = shortlist.join(c, Seq("match_id"))
      .select(col("query_id"), col("match_id"),
        round(dot(col("cvu"), col("qv")), 6).as("cos"))
    topK(exact, k)
  }

  /** Product-quantization codebooks: the corpus sample (`idCol %
    * centroidMod == 0`) sliced into `m` subspaces of `dim/m` dims — one
    * row per (subspace j, centroid, sub-vector, |sub-vector|²).
    * Deterministic sampling (the same device [[ivfTopK]] uses) lets an
    * external SQL oracle rebuild the codebooks bit-for-bit; production
    * would train per-subspace k-means — the encode/search plumbing is
    * identical, only codebook quality changes. */
  def pqCodebooks(corpus: DataFrame, centroidMod: Int = 41, m: Int = 8,
      dim: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val sub = dim / m
    corpus.filter(col(idCol) % centroidMod === 0)
      .select(col(idCol).as("cent_id"),
        dimChecked(col(vecCol).cast("array<double>"), dim).as("v"))
      .select(col("cent_id"), posexplode(array((0 until m).map(j =>
        slice(col("v"), j * sub + 1, sub)): _*)).as(Seq("j", "subc")))
      .withColumn("cn2",
        graft.plans.VectorExpressions.dotProduct(col("subc"), col("subc")))
  }

  /** ANN top-k over product-quantized codes with asymmetric distance
    * computation — the faiss IVFPQ pattern minus the IVF lists (compose
    * with [[ivfTopKWith]] for both). Each corpus vector stores `m`
    * small ints (its nearest sub-centroid per subspace, L2, ties to the
    * lowest id): `m` bytes instead of `dim` floats — at 100 TB the
    * difference between an in-memory code table and re-reading raw
    * vectors. SEARCH never touches the vectors: a per-query lookup
    * table (query-subvector · sub-centroid, |Q|·m·C rows — broadcast)
    * joins the code table on (subspace, code) and the ADC score is the
    * fixed-order sum of the m looked-up dots over the reconstruction
    * norm; an exact re-rank of the `shortlistFactor · k` shortlist
    * restores exact cosines (full-precision reads drop to the
    * shortlist join). The m partial sums pivot into fixed-order
    * additions — a plain double `sum` over the join rows would be
    * shuffle-order-dependent and not engine-reproducible. */
  private def pqSlices(v: Column, m: Int, sub: Int) =
    posexplode(array((0 until m).map(j =>
      slice(v, j * sub + 1, sub)): _*))

  /** PQ ENCODE over a prepared (match_id, v) frame: one argmin per
    * (doc, subspace) over the broadcast codebook — map-side combinable
    * max_by, so n·m rows reach the shuffle, not n·m·C candidates. d2
    * rounds to 6 so near-equal centroids tie and the cent_id tie-break
    * decides identically in every engine. Returns
    * (match_id, j, code, cn2). */
  private def pqEncodeVecs(vecs: DataFrame, cb: DataFrame, m: Int,
      dim: Int): DataFrame = {
    val sub = dim / m
    def dp(a: Column, b: Column) =
      graft.plans.VectorExpressions.dotProduct(a, b)
    // collect the frozen codebook once (index metadata — the same rows
    // the legacy form broadcast): [j][k] sub-centroids with their
    // STORED cn2 norms, code ids ascending within every subspace
    val rows = cb.select(col("j").cast("int"),
      col("cent_id").cast("long"), col("subc").cast("array<double>"),
      col("cn2").cast("double")).collect()
    if (rows.isEmpty) // legacy shape: empty codebook ⇒ empty codes
      vecs
        .select(col("match_id"), pqSlices(col("v"), m, sub)
          .as(Seq("j", "subv")))
        .join(broadcast(cb), Seq("j"))
        .withColumn("d2", round(dp(col("subv"), col("subv"))
          - lit(2.0) * dp(col("subv"), col("subc")) + col("cn2"), 6))
        .groupBy(col("match_id"), col("j"))
        .agg(max_by(struct(col("cent_id").as("code"), col("cn2")),
          struct(-col("d2"), -col("cent_id"))).as("c"))
        .select(col("match_id"), col("j"),
          col("c.code").as("code"), col("c.cn2").as("cn2"))
    else { // per-row PQ-encode kernel: no n·m explode-join-argmin, the
      // m (j, code, cn2) structs come out of one scan-shaped projection
      val byJ = rows.groupBy(_.getInt(0))
      require(byJ.keySet == (0 until m).toSet,
        s"codebook subspaces ${byJ.keySet.toSeq.sorted} != 0..${m - 1}")
      val perJ = (0 until m).map { j =>
        byJ(j).map(r => (r.getLong(1), r.getSeq[Double](2).toArray,
          r.getDouble(3))).sortBy(_._1)
      }
      val codeIds = perJ.head.map(_._1).toArray
      require(perJ.forall(_.map(_._1).sameElements(codeIds)),
        "codebook code-id sets differ across subspaces")
      vecs.select(col("match_id"),
          explode(graft.plans.CentroidKernels.pqEncodeCodes(col("v"),
            codeIds, perJ.map(_.map(_._2).toArray).toArray,
            perJ.map(_.map(_._3).toArray).toArray, sub)).as("e"))
        .select(col("match_id"), col("e.j").as("j"),
          col("e.code").as("code"), col("e.cn2").as("cn2"))
    }
  }

  private def pqEncode(corpus: DataFrame, cb: DataFrame, m: Int,
      dim: Int, idCol: String, vecCol: String): DataFrame =
    pqEncodeVecs(
      fanOut(corpus).select(col(idCol).as("match_id"),
        dimChecked(col(vecCol).cast("array<double>"), dim).as("v")),
      cb, m, dim)

  /** PQ query lookup table: dot of each query subvector with every
    * sub-centroid — (query_id, qn, j, code, qdot), |Q|·m·C rows. */
  private def pqLut(queries: DataFrame, cb: DataFrame, m: Int, dim: Int,
      idCol: String, vecCol: String): DataFrame = {
    val sub = dim / m
    def dp(a: Column, b: Column) =
      graft.plans.VectorExpressions.dotProduct(a, b)
    queries
      .select(col(idCol).as("query_id"),
        dimChecked(col(vecCol).cast("array<double>"), dim).as("qv"))
      .withColumn("qn", sqrt(dp(col("qv"), col("qv"))))
      .select(col("query_id"), col("qn"), pqSlices(col("qv"), m, sub)
        .as(Seq("j", "subq")))
      .join(broadcast(cb), Seq("j"))
      .select(col("query_id"), col("qn"), col("j"),
        col("cent_id").as("code"), dp(col("subq"), col("subc")).as("qdot"))
  }

  /** ADC aggregation over (query_id, match_id, j, code, qdot, cn2, qn)
    * rows: the m subspace terms pivot into fixed-order additions — a
    * bare double `sum` over shuffle rows would be order-dependent and
    * not engine-reproducible. Returns (query_id, match_id, approx). */
  private def adcScores(joined: DataFrame, m: Int): DataFrame = {
    val pivots =
      (0 until m).map(j =>
        sum(when(col("j") === j, col("qdot"))).as(s"q$j")) ++
      (0 until m).map(j =>
        sum(when(col("j") === j, col("cn2"))).as(s"c$j")) :+
      max(col("qn")).as("qn")
    val adc = joined
      .groupBy(col("query_id"), col("match_id"))
      .agg(pivots.head, pivots.tail: _*)
    val num = (1 until m).foldLeft(col("q0"))((a, j) => a + col(s"q$j"))
    val rn2 = (1 until m).foldLeft(col("c0"))((a, j) => a + col(s"c$j"))
    adc.select(col("query_id"), col("match_id"),
      round(num / (col("qn") * sqrt(rn2)), 6).as("approx"))
  }

  /** Exact cosine re-rank of a (query_id, match_id) shortlist. */
  private def exactRerank(shortlist: DataFrame, queries: DataFrame,
      corpus: DataFrame, k: Int, idCol: String, vecCol: String)
      : DataFrame = {
    val qUnit = unitVecs(queries, idCol, vecCol, "query_id", "qvu")
    val cUnit = unitVecs(corpus, idCol, vecCol, "match_id", "cvu")
    topK(shortlist.join(cUnit, Seq("match_id"))
      .join(broadcast(qUnit), Seq("query_id"))
      .select(col("query_id"), col("match_id"),
        round(dot(col("cvu"), col("qvu")), 6).as("cos")), k)
  }

  private def pqShortlist(scored: DataFrame, n: Int): DataFrame = {
    val sw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("match_id"))
    scored.withColumn("srnk", row_number().over(sw))
      .filter(col("srnk") <= n)
      .select(col("query_id"), col("match_id"))
  }

  def pqAdcTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      centroidMod: Int = 41, m: Int = 8, dim: Int = 64,
      shortlistFactor: Int = 3, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cb = pqCodebooks(corpus, centroidMod, m, dim, idCol, vecCol)
    val codes = pqEncode(corpus, cb, m, dim, idCol, vecCol)
    val lut = pqLut(queries, cb, m, dim, idCol, vecCol)
    val scored = adcScores(
      codes.join(broadcast(lut), Seq("j", "code"))
        .filter(col("query_id") =!= col("match_id")), m)
    exactRerank(pqShortlist(scored, k * shortlistFactor),
      queries, corpus, k, idCol, vecCol)
  }

  /** The four relations of a residual-IVFPQ index (see [[ivfPqTopK]]).
    * `codes` is the ONLY corpus-sized one — (match_id, cent_id, j,
    * code, cn2): m small codes + a list id per vector, no raw floats.
    * `cents`, `codebooks` and `crossTable` are index-metadata-sized
    * (C, m·C' and C·m·C' rows) and broadcast at search time. Persisted
    * form: [[graft.sources.VectorIndexStore]] writes `codes`
    * PARTITIONED BY `cent_id` so a probe reads only its nprobe lists. */
  private[graft] final case class IvfPqIndex(cents: DataFrame,
      codes: () => DataFrame, codebooks: DataFrame,
      crossTable: DataFrame)

  /** Build the residual-IVFPQ index relations over a corpus. Both
    * centroid sets are deterministic corpus samples so an external SQL
    * oracle rebuilds the whole index; production swaps in k-means on
    * both levels without changing the plumbing. */
  private[graft] def buildIvfPqIndex(corpus: DataFrame,
      ivfCentroidMod: Int = 37, pqCentroidMod: Int = 41, m: Int = 8,
      dim: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding"): IvfPqIndex = {
    val sub = dim / m
    def dp(a: Column, b: Column) =
      graft.plans.VectorExpressions.dotProduct(a, b)
    val cents = CacheRegistry.tracked(
      unitVecs(corpus.filter(col(idCol) % ivfCentroidMod === 0),
        idCol, vecCol, "cent_id", "centv"))
    // coarse assignment + residual in ONE pass over the unit corpus
    // (cached: read again for the sampled residual codebook and the
    // code→list join)
    val withAsg = CacheRegistry.tracked(
      assignResiduals(corpus, cents, idCol, vecCol))
    // residual codebooks from the deterministic sample's residuals
    val cb = withAsg.filter(col("match_id") % pqCentroidMod === 0)
      .select(col("match_id").as("cent_id"),
        pqSlices(col("v"), m, sub).as(Seq("j", "subc")))
      .withColumn("cn2", dp(col("subc"), col("subc")))
    val codes = pqEncodeVecs(withAsg.select(col("match_id"), col("v")),
        cb, m, dim)
      .join(withAsg.select(col("match_id"), col("cent_id")),
        Seq("match_id"))
    // centvⱼ · rcⱼ — (list, subspace, code) sized, index-side
    val crossT = cents
      .select(col("cent_id"), pqSlices(col("centv"), m, sub)
        .as(Seq("j", "subcent")))
      .join(broadcast(cb.select(col("j"), col("cent_id").as("code"),
        col("subc"))), Seq("j"))
      .select(col("cent_id"), col("j"), col("code"),
        dp(col("subcent"), col("subc")).as("crossv"))
    IvfPqIndex(cents, () => codes, cb, crossT)
  }

  /** Coarse-assign each vector to its nearest centroid and keep the
    * residual: (match_id, cent_id, v). One pass over the unit corpus —
    * a map-side-combinable `max_by` against the broadcast centroid
    * table, so n rows reach the shuffle, never n·C candidates. */
  private def assignResiduals(corpus: DataFrame, cents: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val (cids, cvs) = collectCents(cents, "cent_id", "centv")
    if (cids.isEmpty) // legacy shape: empty cents ⇒ empty assignment
      unitVecs(corpus, idCol, vecCol, "match_id", "cv")
        .crossJoin(broadcast(cents))
        .withColumn("cdot", round(dot(col("cv"), col("centv")), 6))
        .groupBy(col("match_id"))
        .agg(max_by(struct(col("cent_id").as("cid"),
            col("centv").as("cv0")),
            struct(col("cdot"), -col("cent_id"))).as("a"),
          first(col("cv")).as("cv"))
        .select(col("match_id"), col("a.cid").as("cent_id"),
          zip_with(col("cv"), col("a.cv0"), (x, c) => x - c).as("v"))
    else // fused argmax+residual kernel: scan-shaped, no n·C rows,
      // no aggregate exchange, no interpreted zip_with per element
      unitVecs(corpus, idCol, vecCol, "match_id", "cv")
        .select(col("match_id"),
          graft.plans.CentroidKernels.nearestResidual(col("cv"), cids,
            cvs).as("a"))
        .select(col("match_id"), col("a.cent_id").as("cent_id"),
          col("a.v").as("v"))
  }

  /** Encode a vector batch against FROZEN index metadata (stored
    * centroids + codebooks): assignment, residual, PQ codes — the
    * incremental-maintenance path ([[graft.sources.VectorIndexStore
    * .appendIvfPq]]). Returns (match_id, j, code, cn2, cent_id), the
    * codes-table schema of [[buildIvfPqIndex]]. */
  private[graft] def encodeForIndex(batch: DataFrame, cents: DataFrame,
      codebooks: DataFrame, m: Int, dim: Int, idCol: String,
      vecCol: String): DataFrame = {
    val asg = CacheRegistry.tracked(
      assignResiduals(batch, cents, idCol, vecCol))
    pqEncodeVecs(asg.select(col("match_id"), col("v")),
        codebooks, m, dim)
      .join(asg.select(col("match_id"), col("cent_id")),
        Seq("match_id"))
  }

  /** Search over built or loaded index relations: probe ranking,
    * residual ADC over only the probed lists, exact shortlist re-rank.
    * When `prunedCodes` is given, the distinct probed list ids (index
    * metadata — bounded by the centroid count, the same order as a
    * broadcast threshold, NOT data rows) are collected and handed to
    * it, so a list-partitioned codes table is read under static
    * partition pruning; `None` scans `ix.codes` and relies on the
    * broadcast probes join to drop unprobed lists. */
  private[graft] def ivfPqSearch(ix: IvfPqIndex, queries: DataFrame,
      corpus: DataFrame, k: Int, nprobe: Int, m: Int, dim: Int,
      shortlistFactor: Int, idCol: String, vecCol: String,
      prunedCodes: Option[Seq[Long] => DataFrame] = None): DataFrame = {
    val sub = dim / m
    def dp(a: Column, b: Column) =
      graft.plans.VectorExpressions.dotProduct(a, b)
    // query side: q·centv for every list (probe rank + the ADC
    // numerator term), residual LUT per (subspace, code)
    val q = CacheRegistry.tracked(
      unitVecs(queries, idCol, vecCol, "query_id", "qv"))
    val qcAll = q.crossJoin(broadcast(ix.cents))
      .select(col("query_id"), col("cent_id"),
        dp(col("qv"), col("centv")).as("qcdot"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(round(col("qcdot"), 6).desc, col("cent_id"))
    val probes = qcAll.withColumn("crnk", row_number().over(w))
      .filter(col("crnk") <= nprobe)
      .select(col("query_id"), col("cent_id"), col("qcdot"))
    val lut = q
      .select(col("query_id"), pqSlices(col("qv"), m, sub)
        .as(Seq("j", "subq")))
      .join(broadcast(ix.codebooks), Seq("j"))
      .select(col("query_id"), col("j"), col("cent_id").as("code"),
        dp(col("subq"), col("subc")).as("qdot"))
    val codes = prunedCodes match {
      case None => ix.codes()
      case Some(read) =>
        read(probes.select(col("cent_id")).distinct().collect()
          .map(_.getLong(0)).toSeq.sorted)
    }
    val joined = codes
      .join(broadcast(probes), Seq("cent_id"))
      .join(broadcast(ix.crossTable), Seq("cent_id", "j", "code"))
      .join(broadcast(lut), Seq("query_id", "j", "code"))
      .filter(col("query_id") =!= col("match_id"))
    val pivots =
      (0 until m).map(j =>
        sum(when(col("j") === j, col("qdot"))).as(s"q$j")) ++
      (0 until m).map(j =>
        sum(when(col("j") === j, col("cn2"))).as(s"c$j")) ++
      (0 until m).map(j =>
        sum(when(col("j") === j, col("crossv"))).as(s"x$j")) :+
      max(col("qcdot")).as("qcdot")
    val adc = joined.groupBy(col("query_id"), col("match_id"))
      .agg(pivots.head, pivots.tail: _*)
    val num = (1 until m).foldLeft(col("q0"))((a, j) => a + col(s"q$j"))
    val xs = (1 until m).foldLeft(col("x0"))((a, j) => a + col(s"x$j"))
    val cs = (1 until m).foldLeft(col("c0"))((a, j) => a + col(s"c$j"))
    // |centv|² ≡ 1.0 BY DEFINITION on both engines (the unit-normalized
    // float value is 1 ± ulp; pinning the literal keeps parity)
    val scored = adc.select(col("query_id"), col("match_id"),
      round((col("qcdot") + num) /
        sqrt(lit(1.0) + lit(2.0) * xs + cs), 6).as("approx"))
    exactRerank(pqShortlist(scored, k * shortlistFactor),
      queries, corpus, k, idCol, vecCol)
  }

  /** IVF × PQ with RESIDUAL encoding — the full classic faiss IVFPQ: a
    * coarse centroid set partitions the corpus into lists, each vector
    * stores its list id plus m PQ codes of its RESIDUAL (unit vector −
    * assigned centroid; residuals are small and concentrated, which is
    * why the classic design quantizes them instead of raw vectors), and
    * a query ADC-scores only the codes in its `nprobe` nearest lists
    * before the exact shortlist re-rank.
    *
    * ADC with residuals: recon = centv + r̂, so
    * score = (q·centv + Σⱼ qⱼ·rcⱼ) / √(1 + 2·Σⱼ centvⱼ·rcⱼ + Σⱼ|rcⱼ|²).
    * q·centv comes from the probe table, centvⱼ·rcⱼ from a precomputed
    * (list, subspace, code) cross table — both broadcast, both
    * index-side at 100 TB. The search joins ship (list id, code) only;
    * raw vectors reappear just for the shortlist. All subspace sums
    * pivot into fixed-order additions (engine-reproducible). Index
    * construction and search are split ([[buildIvfPqIndex]] /
    * [[ivfPqSearch]]) so the index can also be persisted list-
    * partitioned and probed under partition pruning
    * ([[graft.sources.VectorIndexStore]]). */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      ivfCentroidMod: Int = 37, nprobe: Int = 2, pqCentroidMod: Int = 41,
      m: Int = 8, dim: Int = 64, shortlistFactor: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfPqSearch(
      buildIvfPqIndex(corpus, ivfCentroidMod, pqCentroidMod, m, dim,
        idCol, vecCol),
      queries, corpus, k, nprobe, m, dim, shortlistFactor, idCol, vecCol)

  /** kNN label prediction + neighborhood consistency over a labeled
    * embedding corpus — the weak-supervision / embedding-quality op a
    * training pipeline runs on a labeled subset: each query's predicted
    * label is the majority vote of its k nearest neighbors (ties →
    * lowest label), and `n_agree` counts neighbors sharing the query's
    * OWN label (k-NN purity — low purity flags mislabeled rows or a
    * poor embedding space).
    *
    * Composes with any top-k provider; this convenience form uses the
    * exact [[bruteForceTopK]] so an external oracle can replay it —
    * swap in [[lshTopK]] / [[ivfPqTopK]] output via [[knnClassifyFrom]]
    * at scale. The neighbor-label join BROADCASTS the |Q|·k top-k frame
    * against the corpus label projection, so the corpus never
    * shuffles. */
  def knnClassify(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame =
    knnClassifyFrom(bruteForceTopK(queries, corpus, k, idCol, vecCol),
      queries, corpus, idCol, labelCol)

  /** [[knnClassify]] over a precomputed (query_id, match_id, …) top-k
    * frame from any of the ANN providers. */
  def knnClassifyFrom(topk: DataFrame, queries: DataFrame,
      corpus: DataFrame, idCol: String = "vec_id",
      labelCol: String = "label"): DataFrame = {
    val nbr = corpus
      .select(col(idCol).as("match_id"), col(labelCol).as("nbr_label"))
      .join(broadcast(topk.select(col("query_id"), col("match_id"))),
        Seq("match_id"))
    // votes feeds TWO branches (pred + agree); uncached, each branch
    // would re-evaluate the whole neighbor chain — including an
    // expensive ANN provider under knnClassifyFrom (observed 5x on the
    // ivfpq composition). |Q| x |labels| rows: cache is free.
    val votes = CacheRegistry.tracked(
      nbr.groupBy(col("query_id"), col("nbr_label"))
        .agg(count(lit(1)).as("votes")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("nbr_label"))
    val pred = votes.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("query_id"), col("nbr_label").as("pred_label"),
        col("votes"))
    val own = queries
      .select(col(idCol).as("query_id"), col(labelCol).as("label"))
    val agree = votes.join(own,
        votes("query_id") === own("query_id") &&
          votes("nbr_label") === own("label"))
      .select(own("query_id"), col("votes").as("n_agree"))
    pred.join(own, Seq("query_id"))
      .join(agree, Seq("query_id"), "left")
      .select(col("query_id"), col("label"), col("pred_label"),
        col("votes"), coalesce(col("n_agree"), lit(0L)).as("n_agree"))
  }

  /** Per-label mean of the unit-normalized vectors — (label, centv).
    * The element-wise sums go through decimal(38,18) so they are
    * order-independent (a plain double sum would differ run-to-run and
    * engine-to-engine); the exact decimal sum casts back to double
    * before the division. Shape: one explode → (label, component)
    * aggregate with map-side combining, then an ordered re-assembly per
    * label — output is |labels| rows, index-sized. */
  def labelCentroids(corpus: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", labelCol: String = "label",
      dim: Int = 64): DataFrame = {
    def dp(a: Column, b: Column) =
      graft.plans.VectorExpressions.dotProduct(a, b)
    val v = dimChecked(col(vecCol).cast("array<double>"), dim)
    val unit = fanOut(corpus)
      .select(col(labelCol).as("label"), v.as("v"))
      .withColumn("nrm", sqrt(dp(col("v"), col("v"))))
      .select(col("label"),
        transform(col("v"), x => x / col("nrm")).as("uv"))
    unit
      .select(col("label"), posexplode(col("uv")).as(Seq("i", "x")))
      .groupBy(col("label"), col("i"))
      .agg((sum(col("x").cast(
        org.apache.spark.sql.types.DecimalType(38, 18))).cast("double") /
        count(lit(1))).as("m"))
      .groupBy(col("label"))
      .agg(transform(
        array_sort(collect_list(struct(col("i"), col("m")))),
        s => s.getField("m")).as("mv"))
      // unit-normalize the mean (the spherical convention) so a dot
      // against it IS the cosine to the label's mean direction
      .withColumn("cnrm", sqrt(dp(col("mv"), col("mv"))))
      .select(col("label"),
        transform(col("mv"), x => x / col("cnrm")).as("centv"))
  }

  /** Nearest-centroid label prediction: classify each query by its
    * highest-cosine label centroid (ties → lowest label). THE cheapest
    * classifier at scale — |labels| centroids broadcast, one map-side
    * argmax pass over the queries, no per-query candidate scan at all
    * (contrast [[knnClassify]], which pays a top-k search). Returns
    * (query_id, label, pred_label, cos). */
  def centroidClassify(queries: DataFrame, corpus: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label", dim: Int = 64): DataFrame = {
    def dp(a: Column, b: Column) =
      graft.plans.VectorExpressions.dotProduct(a, b)
    val cents = labelCentroids(corpus, idCol, vecCol, labelCol, dim)
      .select(col("label").as("clabel"), col("centv"))
    val v = dimChecked(col(vecCol).cast("array<double>"), dim)
    val q = fanOut(queries)
      .select(col(idCol).as("query_id"), col(labelCol).as("label"),
        v.as("v"))
      .withColumn("nrm", sqrt(dp(col("v"), col("v"))))
      .select(col("query_id"), col("label"),
        transform(col("v"), x => x / col("nrm")).as("qv"))
    val (cids, cvs) = collectCents(cents, "clabel", "centv")
    if (cids.isEmpty) // legacy shape: empty corpus ⇒ empty prediction
      q.crossJoin(broadcast(cents))
        .withColumn("cos", round(dp(col("qv"), col("centv")), 6))
        .groupBy(col("query_id"))
        .agg(first(col("label")).as("label"),
          max_by(struct(col("clabel").as("pl"), col("cos").as("pc")),
            struct(col("cos"), -col("clabel"))).as("p"))
        .select(col("query_id"), col("label"),
          col("p.pl").as("pred_label"), col("p.pc").as("cos"))
    else { // per-row argmax kernel: the struct carries both the winning
      // label and its round-6 score, so no re-attach join is needed
      val labelType = cents.schema("clabel").dataType
      q.select(col("query_id"), col("label"),
          graft.plans.CentroidKernels.nearestCentroid(col("qv"), cids,
            cvs, graft.plans.CentroidKernels.NormNone).as("p"))
        .select(col("query_id"), col("label"),
          col("p.cent_id").cast(labelType).as("pred_label"),
          col("p.cos").as("cos"))
    }
  }

  /** Embedding near-duplicate pairs above a cosine threshold — exact
    * all-pairs variant. O(n²): a test baseline for
    * [[nearDupPairsLsh]]'s recall, NOT the scale path. */
  def nearDupPairsExact(vectors: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = unitVecs(vectors, idCol, vecCol, "id_a", "va")
    val b = unitVecs(vectors, idCol, vecCol, "id_b", "vb")
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("va"), col("vb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** One LSH band key per band: `rowsPerBand` hyperplane sign bits packed
    * in a long. Plane index is `band * rowsPerBand + row`, so every band
    * draws distinct hyperplanes from the same md5 family as
    * [[lshSignature]]. */
  private def bandKeys(vec: Column, bands: Int, rowsPerBand: Int,
      dim: Int): Column = {
    val v = dimChecked(vec, dim)
    // ONE compact expression node: the column-DSL form embedded
    // bands·rowsPerBand·dim literal doubles (~12k tree nodes at the
    // default geometry) and r14 profiling measured ≥ 1.2 s of pure
    // driver planning per admission walking them. Plane order is
    // band·rowsPerBand + row, exactly as before — keys bit-identical
    // (graft.plans.BandKeys keeps the [[DotProduct]] arithmetic order,
    // the strict > 0 sign test, and the 1L << r packing).
    val planes = Array.tabulate(bands * rowsPerBand)(p =>
      Array.tabulate(dim)(i => planeSign(p, i)))
    graft.plans.VectorExpressions.bandKeys(v, planes, rowsPerBand)
  }

  /** Banded signature relation `(id, band, bkey)` — the admission index
    * [[graft.sources.EdgeStore]] persists so an arriving batch never
    * re-bands the stored corpus. Identical keys to the inline
    * [[nearDupPairsLsh]] path (same unit-vector construction, and the
    * key is a sign pattern — invariant under the normalization).
    * CONTRACT: must stay bit-identical to the inline path's banding —
    * the EdgeStore admit-equals-rebuild invariant (pinned by
    * GraphStatsSpec and the x_neardup_append oracle) depends on it. */
  private[graft] def bandRelation(vectors: DataFrame, bands: Int,
      rowsPerBand: Int, dim: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    unitVecs(vectors, idCol, vecCol, "id", "v")
      .withColumn("keys", bandKeys(col("v"), bands, rowsPerBand, dim))
      .select(col("id"), posexplode(col("keys")).as(Seq("band", "bkey")))

  /** Exact-cosine verification of `(id_a, id_b)` candidates against the
    * raw vector table: joins only the CANDIDATE ids (bounded by the
    * banding, never corpus²), normalizes with the same expression as
    * the inline path, keeps `cos ≥ threshold` — so verified pairs are
    * bit-identical to [[nearDupPairsLsh]]'s. CONTRACT: any change to
    * the normalization/rounding here or in the inline verify must land
    * in BOTH places — the admit-equals-rebuild pins fail otherwise. */
  private[graft] def verifyCosinePairs(cands: DataFrame,
      vectors: DataFrame, threshold: Double, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    val u = unitVecs(vectors, idCol, vecCol, "id", "v")
    cands
      .join(u.select(col("id").as("id_a"), col("v").as("va")), "id_a")
      .join(u.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(dot(col("va"), col("vb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Target rows per (band, key) bucket for the DERIVED geometry: the
    * per-band key space `2^r` grows with the corpus so mean occupancy
    * stays ≤ this. 32 reproduces the measured-good 6-bit geometry at
    * the 2k-vector test scale (2000/2^6 ≈ 31). */
  val LshTargetOccupancy = 32

  /** Design recall for [[derivedBands]]: `1-(1-p^r)^b ≥ 0.875`, the
    * recall the original fixed (32, 6) geometry delivers at threshold
    * 0.4. */
  val LshDesignRecall = 0.875

  /** Smallest `rowsPerBand` in [6, 16] whose per-band key space keeps
    * mean bucket occupancy ≤ [[LshTargetOccupancy]] — i.e. the
    * Scaladoc's "rowsPerBand grows with ln n" made the default.
    * INTEGER-EXACT (shift compare, no float `ceil(log2 n)` whose ulp
    * could flip the result between engines — the DuckDB oracle mirrors
    * the same shift compare). */
  def derivedRowsPerBand(n: Long): Int = {
    var r = 6
    while (r < 16 && (LshTargetOccupancy.toLong << r) < n) r += 1
    r
  }

  /** The band count holding [[LshDesignRecall]] at `threshold` for a
    * given `rowsPerBand`: `b = ceil(ln(1/(1-R)) / -ln(1-p^r))` with
    * `p = 1 - acos(t)/π` (sign-LSH collision probability). At
    * (t=0.4, r=6) this is exactly 32 — the original fixed default IS
    * this formula's output at test scale.
    *
    * This is an EXPLICIT tuning helper, not the default: holding the
    * design recall at a MID threshold while r grows costs
    * `b ∝ (1/p_t)^r ∝ n^ρ` extra bands, putting candidate volume back
    * on the n^(1+ρ) curve — the honest price of full recall at a thin
    * sign-LSH gap. The default keeps `bands` fixed, so candidates
    * stay ~LINEAR in n and recall at the decision threshold decays
    * (quantified by the geometry spec); deployments that need the
    * recall back pass `bands = derivedBands(t, derivedRowsPerBand(n))`
    * and pay the growth knowingly. */
  def derivedBands(threshold: Double, rowsPerBand: Int): Int = {
    val p = 1.0 - math.acos(threshold) / math.Pi
    val pr = math.pow(p, rowsPerBand)
    math.ceil(math.log(1.0 / (1.0 - LshDesignRecall)) /
      -math.log(1.0 - pr) - 1e-9).toInt
  }

  /** Embedding near-duplicate pairs via banded LSH: bucket each vector
    * into `bands` keys of `rowsPerBand` hyperplane bits, equi-join on
    * (band, key) — candidates are pairs agreeing on ALL bits of at least
    * one band — then verify with the exact codegen'd dot product and keep
    * `cos >= threshold`.
    *
    * Scale design: the join is a shuffle hash/sort-merge equi-join on the
    * band key (never a nested loop), so cost follows bucket occupancy, not
    * n². More `rowsPerBand` → fewer random collisions (halves per bit);
    * more `bands` → higher recall (any-band OR). Candidate volume scales
    * as n^(1+ρ) with ρ = ln(p_t)/ln(p_rand) once rowsPerBand grows
    * with ln n — and the DEFAULT geometry now does exactly that:
    * `rowsPerBand = 0` (auto) derives it from the corpus count
    * ([[derivedRowsPerBand]] — the per-band key space tracks n, so a
    * FIXED geometry's bucket saturation and its quadratic candidate
    * blow-up cannot happen; with fixed bands, expected random
    * candidates are ≤ occupancy·bands·n/2, LINEAR in n by
    * construction). `bands` stays a fixed default: recall at the
    * decision threshold then DECAYS as r grows — the documented
    * trade, quantified by the geometry spec; [[derivedBands]] is the
    * explicit buy-it-back knob and its n^ρ cost note. Explicit values
    * remain overrides (the persisted [[graft.sources.EdgeStore]]
    * passes its recipe's fixed geometry — a store's banding must not
    * drift with corpus growth between builds). At a high threshold
    * (cos ≥ 0.9, p_t ≈ 0.86) the prune is 100-1000×; at a mid
    * threshold (0.4, p_t ≈ 0.63) the sign-LSH gap over random is
    * thin. Dense embedding clusters make hot buckets — AQE skew-join
    * handles those at scale. Recall is by design below 1 near the
    * threshold; the DuckDB oracle mirrors the exact same banding
    * (including the derivation) so results stay engine-reproducible. */
  def nearDupPairsLsh(vectors: DataFrame, threshold: Double,
      bands: Int = 32, rowsPerBand: Int = 0, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val r =
      if (rowsPerBand > 0) rowsPerBand
      else derivedRowsPerBand(vectors.count())
    val b = bands
    val sigs = CacheRegistry.tracked( // read from 3 plan branches below
      unitVecs(vectors, idCol, vecCol, "id", "v") // keys cost bands*rows
        .withColumn("keys", bandKeys(col("v"), b, r, dim)))
    // the bucket self-join carries ONLY ids — vectors through an n·bands
    // shuffle would dominate its size; candidates dedup BEFORE the
    // verify so a pair agreeing on several bands pays one dot product
    val buckets = sigs.select(col("id"),
      posexplode(col("keys")).as(Seq("band", "bkey")))
    val cands = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    cands
      .join(sigs.select(col("id").as("id_a"), col("v").as("va")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(dot(col("va"), col("vb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** PAIR-level recall of an approximate near-dup pair list against
    * the exact one, per similarity bucket — the LSH family's
    * evaluation harness (the ANN family has [[recallEval]]; this is
    * its counterpart for the dedup graph). Buckets are tenths of
    * cosine derived by INTEGER arithmetic on the 6dp-rounded score
    * (ppm / 100000), so both engines bucket identically — a float
    * `floor(cos*10)` could flip on the binary representation of .6.
    * One row per occupied bucket: exact pair count, approximate hits,
    * recall — exactly the telemetry the scale-aware geometry's
    * documented recall-decay trade needs: decay concentrates in the
    * low buckets near the threshold while high-similarity pairs (the
    * ones dedup acts on) stay found.
    *
    * Scale shape: the exact side is corpus² and runs on SAMPLES in
    * production (this is an offline gate, not a serve path); the join
    * and aggregate are pairs-keyed, nothing larger. */
  def pairRecallByBand(exact: DataFrame, approx: DataFrame): DataFrame =
    exact.select(col("id_a"), col("id_b"),
        (((col("cos").cast(
            org.apache.spark.sql.types.DecimalType(18, 6)) * 1000000)
          .cast("long")) / 100000L).cast("int").as("cos_bucket"))
      .join(approx.select(col("id_a"), col("id_b"),
        lit(1L).as("hit")), Seq("id_a", "id_b"), "left")
      .groupBy(col("cos_bucket"))
      .agg(count(lit(1)).as("n_exact"),
        count(col("hit")).as("n_hit"))
      .withColumn("recall",
        round(col("n_hit") / col("n_exact"), 6))

  /** Recall@k of an approximate top-k result against the exact one —
    * the offline evaluation harness every ANN deployment runs after an
    * index (re)build and before raising traffic: per query, the
    * fraction of exact neighbors the approximate rung returned, plus a
    * pass/fail flag against `floor` (flagged queries are the recall
    * tail a nprobe/planes bump would chase). Denominator is each
    * query's ACTUAL exact-neighbor count (= k whenever the corpus has
    * k candidates), so tiny corpora score honestly.
    *
    * Scale shape: one left join on (query, match) + one keyed
    * aggregate over ≤ |queries|·k rows — negligible next to producing
    * the two inputs. The exact side is the expensive half, which is
    * why recall runs on a query SAMPLE (the standard harness shape);
    * the approximate side is the serving path being graded. */
  def recallEval(approx: DataFrame, exact: DataFrame, floor: Double,
      queryCol: String = "query_id",
      matchCol: String = "match_id"): DataFrame =
    exact.select(col(queryCol), col(matchCol))
      .join(approx.select(col(queryCol), col(matchCol),
        lit(1L).as("hit")), Seq(queryCol, matchCol), "left")
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col(queryCol), col("n_exact"), col("n_hit"),
        round(col("n_hit") / col("n_exact"), 6).as("recall_at_k"),
        (col("n_hit") >= ceil(lit(floor) * col("n_exact")))
          .as("recall_ok"))

  /** 2520 = lcm(1..10): reciprocal ranks `2520/r` stay EXACT integers
    * for any rank ≤ 10, so the MRR numerator never touches a float.
    * Shared with the oracle. */
  val MrrScale = 2520L

  /** DCG discount table `⌊10⁶/log₂(i+1)⌉` for ranks 1..k — computed
    * ONCE here (driver-side, one libm call per rank) and shared with
    * the oracle as integer literals, so neither engine evaluates a
    * transcendental at query time and the DCG sums are exact longs. */
  def dcgPpmTable(k: Int): Seq[Long] =
    (1 to k).map(i => math.round(1e6 / (math.log(i + 1.0) /
      math.log(2.0))))

  /** Ideal-DCG prefix sums: `idcg(n)` for n relevant items, n ≤ k. */
  def idcgPpmTable(k: Int): Seq[Long] =
    dcgPpmTable(k).scanLeft(0L)(_ + _).drop(1)

  /** Rank-AWARE retrieval quality beside [[recallEval]]'s set overlap:
    * recall@k treats rank 1 and rank k the same, but a serving stack
    * cares WHERE the true neighbors landed. Per query, against the
    * exact top-k ground truth (binary relevance):
    *
    *  - reciprocal rank of the FIRST true neighbor in the approx
    *    ranking, carried as the exact integer `2520/r` ([[MrrScale]];
    *    0 when nothing relevant surfaced) plus its 6dp display form;
    *  - NDCG@k from the shared integer discount table: dcg = Σ
    *    table(rank of each hit), idcg = prefix(n_exact) — both exact
    *    longs, one closing division.
    *
    * Both inputs carry (query_id, match_id, rank). Everything after
    * the (query, match) equi-join is query-set-sized. */
  def rankMetrics(approx: DataFrame, exact: DataFrame, k: Int,
      queryCol: String = "query_id", matchCol: String = "match_id",
      rankCol: String = "rank"): DataFrame = {
    require(k <= 10, s"MrrScale covers ranks 1..10, got k=$k")
    val dcgT = typedLit(dcgPpmTable(k))
    val idcgT = typedLit(idcgPpmTable(k))
    val rrT = typedLit((1 to k).map(MrrScale / _))
    // element_at must be NULL-GUARDED explicitly: with a literal array
    // and a NULL index Spark returns the LAST element, not NULL (found
    // by this operator's own fixture — an unguarded miss row scored as
    // a rank-k hit)
    def at(table: Column, idx: Column): Column =
      when(idx.isNotNull, element_at(table, idx.cast("int")))
    val rr = coalesce(at(rrT, col("first_rel_rank")), lit(0L))
    exact.select(col(queryCol), col(matchCol))
      .join(approx.select(col(queryCol), col(matchCol),
        col(rankCol).as("arank")), Seq(queryCol, matchCol), "left")
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_exact"),
        count(col("arank")).as("n_hit"),
        min(col("arank")).as("first_rel_rank"),
        coalesce(sum(at(dcgT, col("arank"))), lit(0L)).as("dcg_ppm"))
      .select(col(queryCol), col("n_exact"), col("n_hit"),
        col("first_rel_rank").cast("long").as("first_rel_rank"),
        rr.as("rr_x2520"),
        col("dcg_ppm"),
        at(idcgT, col("n_exact")).as("idcg_ppm"),
        round(rr.cast("double") / lit(MrrScale.toDouble), 6).as("rr"),
        round(col("dcg_ppm").cast("double") /
          at(idcgT, col("n_exact")).cast("double"), 6).as("ndcg_at_k"))
  }
}
