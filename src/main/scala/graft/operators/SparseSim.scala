package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse cosine similarity search — the inverted-index complement to
  * the dense ANN ladder (`Similarity`): documents as sparse
  * term-frequency vectors over word-bigram terms, candidate pairs
  * generated ONLY through shared postings (an equi-join on the term),
  * dot products accumulated per pair, cosine from exact integer
  * norms. Candidate volume is Σ_t df_q(t)·df_c(t) — on a Zipf
  * vocabulary far below n² once stop terms are pruned, which is what
  * the df cap does (`dfCapRatio`: terms in more than that fraction of
  * the corpus carry no discrimination and most of the join cost; on
  * this synthetic corpus no bigram crosses the default cap, so the
  * knob is exercised structurally, not numerically).
  *
  * Determinism contract: weights are integer term frequencies, so
  * dots and squared norms are EXACT bigints, and the only floating
  * math is `dot / (sqrt(na2) * sqrt(nb2))` — sqrt/mult/div are
  * IEEE-correctly-rounded, so both engines produce bit-identical
  * cosines from identical integers (an idf factor would put a
  * transcendental `ln` into the weights, whose last-ulp behavior is
  * libm-specific — production adds idf and drops the oracle
  * bit-equality to a tolerance). */
object SparseSim {

  /** Per-(doc, term) integer term frequencies over word bigrams. */
  def postings(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(graft.plans.TextExpressions
          .wordShingleOccurrences(col(textCol), 2)).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Top-`k` cosine neighbors for every query doc (`doc_id % queryMod
    * == 0`) against the whole corpus, through the pruned inverted
    * index. */
  def sparseCosineTopK(docs: DataFrame, k: Int, queryMod: Int,
      dfCapRatio: Int = 10, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val n = docs.count() // 1-row metadata probe (corpus size)
    val post = CacheRegistry.tracked {
      val p = postings(docs, idCol, textCol)
      val df = p.groupBy(col("term"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") * dfCapRatio <= n)
        .select(col("term"))
      p.join(df, Seq("term")) // stop-bigrams pruned
    }
    val norms = post.groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("tf")).as("n2"))
    val q = post.filter(col("doc_id") % queryMod === 0)
      .select(col("term"), col("doc_id").as("qid"), col("tf").as("qtf"))
    val pairs = q.join(post, Seq("term"))
      .filter(col("doc_id") =!= col("qid"))
      .groupBy(col("qid"), col("doc_id").as("nid"))
      .agg(sum(col("qtf") * col("tf")).as("dot"))
    val scored = pairs
      .join(norms.select(col("doc_id").as("qid"), col("n2").as("qn2")),
        Seq("qid"))
      .join(norms.select(col("doc_id").as("nid"), col("n2").as("nn2")),
        Seq("nid"))
      .withColumn("cosine",
        col("dot").cast("double") /
          (sqrt(col("qn2").cast("double")) *
            sqrt(col("nn2").cast("double"))))
    scored
      .withColumn("rk", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("cosine").desc, col("nid"))))
      .filter(col("rk") <= k)
      .select(col("qid"), col("nid"), col("rk"), col("dot"),
        col("cosine"))
  }

  /** BM25 top-`k` documents for a fixed query term set — the standard
    * lexical retrieval scorer (Robertson/Lucene form:
    * `idf = ln(1 + (N − df + 0.5)/(df + 0.5))`, tf saturation `k1`,
    * length normalization `b`). Shape at scale: the corpus collapses
    * to a (matching-doc, term) tf frame at scan time, df and avgdl
    * are dimension/1-row broadcasts, and the final cut is a
    * TakeOrdered total order — no global sort, no shuffle wider than
    * the matching set.
    *
    * Determinism contract: per-(doc, term) contributions are computed
    * with an explicit IEEE op order mirrored by the oracle, summed in
    * FIXED term order (never a shuffle-ordered float sum), and the
    * score rounds to 6dp before ranking so the rank tiebreak
    * (score, doc_id) sits on engine-identical values — ln is the one
    * non-correctly-rounded step, and 6dp absorbs its last-ulp wiggle
    * (the [[sparseCosineTopK]] scaladoc's "idf variant" trade-off,
    * made concrete). */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.words(col(textCol)).as("ws"))
    val dl = CacheRegistry.tracked(
      words.select(col("doc_id"), size(col("ws")).cast("long").as("dl")))
    val n = docs.count() // 1-row metadata probe (corpus size)
    val avg = dl.agg((sum(col("dl")).cast("double") /
      count(lit(1)).cast("double")).as("avgdl"))
    val tf = words.select(col("doc_id"), explode(col("ws")).as("t"))
      .filter(col("t").isin(terms: _*))
      .groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val contrib = tf.join(broadcast(df), Seq("t"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(avg))
      .withColumn("c",
        log(lit(1.0) + ((lit(n) - col("df")).cast("double") + lit(0.5))
            / (col("df").cast("double") + lit(0.5))) *
          ((col("tf").cast("double") * lit(k1 + 1.0)) /
            (col("tf").cast("double") + lit(k1) *
              (lit(1.0 - b) + lit(b) *
                (col("dl").cast("double") / col("avgdl"))))))
    val scored = contrib.groupBy(col("doc_id"))
      .agg(round(terms.map(t =>
          coalesce(max(when(col("t") === t, col("c"))), lit(0.0)))
        .reduce(_ + _), 6).as("score"))
    scored.orderBy(col("score").desc, col("doc_id")).limit(k)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))))
      .select(col("doc_id"), col("score"), col("rk"))
  }

  /** Reciprocal-Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009)
    * of a LEXICAL and a DENSE per-query ranking — the standard
    * hybrid-retrieval combiner in RAG stacks, where sparse matching
    * catches exact terminology and embeddings catch paraphrase, and
    * RRF beats either alone without score calibration because it
    * fuses RANKS, not incomparable scores: fused(d) = Σ_systems
    * 1/(k0 + rank_s(d)), k0 = 60 (the paper's constant). Kept EXACT
    * as `10⁶ div (k0 + rank)` ppm integers, so the fused ordering
    * replays bit-for-bit in any engine.
    *
    * Inputs are the suite's two rankings for the SAME query set:
    * `lexical` = [[sparseCosineTopK]] rows `(qid, nid, rk, …)`,
    * `dense` = [[Similarity.bruteForceTopK]] rows `(query_id,
    * match_id, rank, …)`. FULL OUTER on (query, doc): a doc surfaced
    * by only one system keeps its one term (absence contributes
    * nothing — rank-∞ needs no sentinel). Re-cut to `k` by the
    * (fused desc, doc id) total order.
    *
    * Shape at scale: both inputs are already top-k-sized (queries·k
    * rows), so the fusion is a keys-sized join plus a per-query
    * WindowGroupLimit — nothing corpus-sized touches this operator. */
  def rrfFuse(lexical: DataFrame, dense: DataFrame, k: Int,
      k0: Int = 60): DataFrame = {
    val lex = lexical.select(col("qid").as("query_id"),
      col("nid").as("match_id"), col("rk").as("lex_rk"))
    val den = dense.select(col("query_id"), col("match_id"),
      col("rank").as("dense_rk"))
    lex.join(den, Seq("query_id", "match_id"), "full_outer")
      .withColumn("rrf_ppm",
        coalesce(expr(s"1000000 div ($k0 + lex_rk)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($k0 + dense_rk)"), lit(0L)))
      .withColumn("fused_rk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf_ppm").desc, col("match_id"))))
      .filter(col("fused_rk") <= k)
      .select(col("query_id"), col("match_id"), col("lex_rk"),
        col("dense_rk"), col("rrf_ppm"), col("fused_rk"))
  }
}
