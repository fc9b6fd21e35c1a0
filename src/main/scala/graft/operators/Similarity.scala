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

  /** A small parquet corpus arrives as one partition; the pair stages that
    * follow are compute-bound (millions of dot products), so fan the rows
    * out to the session's shuffle width first. At real scale the input is
    * already many partitions and this is a cheap no-op-sized shuffle. */
  private def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)

  /** Select (idAs, unit-normalized vector) — norm computed once per row. */
  private def unitVecs(df: DataFrame, idCol: String, vecCol: String,
      idAs: String, vecAs: String): DataFrame =
    fanOut(df)
      .select(col(idCol).as(idAs), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm",
        sqrt(graft.plans.VectorExpressions.dotProduct(col("v"), col("v"))))
      .select(col(idAs),
        transform(col("v"), x => x / col("nrm")).as(vecAs))

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

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * the low bit of a 60-bit md5-derived integer of "p{plane}#{dim}" —
    * the same construction a SQL engine computes as
    * `('0x' || substr(md5('p' || p || '#' || i), 1, 15))::bigint & 1`,
    * so the DuckDB oracle reproduces the buckets exactly. The signs depend
    * only on (plane, dim), so they fold to a ±1 literal array at plan time
    * and the per-row cost is one codegen'd dot product per plane. */
  private[operators] def planeSign(plane: Int, dim: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"p$plane#$dim".getBytes("UTF-8"))
    val hex = digest.map("%02x".format(_)).mkString.substring(0, 15)
    if ((java.lang.Long.parseLong(hex, 16) & 1L) == 1L) 1.0 else -1.0
  }

  /** Random-hyperplane LSH signature: `planes` sign bits packed in a long.
    * Same-bucket vectors are the ANN candidates. `dim` must match the
    * embedding dimensionality (the plane is a constant ±1 vector). */
  def lshSignature(vec: Column, planes: Int = 12, dim: Int = 64): Column = {
    val v = vec.cast("array<double>")
    (0 until planes).map { p =>
      val signs = lit((0 until dim).map(i => planeSign(p, i)).toArray)
      val proj = graft.plans.VectorExpressions.dotProduct(v, signs)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
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

  /** Embedding near-duplicate pairs above a cosine threshold (brute-force
    * exact variant; LSH-bucket before this at scale). */
  def nearDupPairs(vectors: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = unitVecs(vectors, idCol, vecCol, "id_a", "va")
    val b = unitVecs(vectors, idCol, vecCol, "id_b", "vb")
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("va"), col("vb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
