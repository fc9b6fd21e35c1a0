package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus profiling + curation operators a large-scale training-data
  * pipeline runs beside dedup/similarity: repetition-based quality
  * signals (the Gopher-style "repetitive doc" filters), deterministic
  * train/val/test splitting, vocabulary document-frequency statistics,
  * and per-source corpus health aggregates.
  *
  * Scale design: the per-doc signals are either pure per-row expressions
  * (scan speed, no shuffle) or explode → partial-agg pipelines whose
  * map-side combine keeps shuffled bytes proportional to DISTINCT
  * (doc, gram) pairs, never raw token counts. The split assignment is a
  * pure hash of the stable document id — rerunning on a grown corpus
  * never reshuffles old docs across splits, which is what makes the
  * split usable for deduplicated incremental training runs.
  */
object CorpusStats {

  /** Per-doc repetition signals over word bigrams: the fraction of all
    * bigram occurrences taken by the single most frequent bigram (high →
    * boilerplate/listicle), plus the duplicate-word fraction. Docs with
    * fewer than two words report 0.0 for the bigram signal.
    *
    * The mode-of-bigrams needs a per-(doc, bigram) count, so it is an
    * explode → two-level aggregate rather than a per-row expression: both
    * aggregations combine map-side, so the shuffle carries one row per
    * distinct (doc, bigram) — bounded by document length, not corpus
    * size. */
  def repetitionSignals(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sig = graft.plans.TextExpressions.repSignals(col(textCol))
    docs.select(col(idCol),
      element_at(sig, 1).as("top_bigram_frac"),
      element_at(sig, 2).as("dup_word_frac"))
  }

  /** The aggregate formulation of [[repetitionSignals]] — explode →
    * per-(doc, bigram) count → per-doc max/sum → join back. The
    * executable spec for the per-row kernel (ExtSpec asserts parity);
    * also the shape to reach for if a signal ever needs cross-document
    * state (the kernel is strictly per-row). */
  private[graft] def repetitionSignalsAgg(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // Bind the tokenization to a column FIRST: a lambda body re-evaluates
    // any non-attribute subexpression per element (interpreted, no CSE),
    // so `element_at(split(...), i)` inside transform() would re-split
    // the document per bigram — O(tokens²) per doc. Against an attribute
    // it is one split per row, O(1) per element.
    val tokenized = docs.select(col(idCol).as("id"),
      TextAnalysis.words(col(textCol)).as("ws"))
    val ws = col("ws")
    val bigrams = when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
      .otherwise(array().cast("array<string>"))
    val perDoc = tokenized
      .select(col("id"), explode(bigrams).as("bg"))
      .groupBy(col("id"), col("bg")).agg(count(lit(1)).as("n"))
      .groupBy(col("id"))
      .agg(max(col("n")).as("top_n"), sum(col("n")).as("total_n"))
      .select(col("id"),
        (round(col("top_n").cast("double") / col("total_n") * 10000)
          / 10000.0).as("top_bigram_frac"))
    tokenized
      .select(col("id"),
        (round((lit(1.0) - size(array_distinct(ws)).cast("double") /
          greatest(size(ws), lit(1)).cast("double")) * 10000) / 10000.0)
          .as("dup_word_frac"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("top_bigram_frac"), lit(0.0)).as("top_bigram_frac"),
        col("dup_word_frac"))
  }

  /** Deterministic train/val/test assignment from the md5-seeded hash of
    * the document id ([[Dedup.seededHash]] — reproducible in any engine
    * with md5): bucket ∈ [0,100), < `trainPct` → train, < `trainPct` +
    * `valPct` → val, else test. A pure per-row expression; the split of a
    * document never changes as the corpus grows. */
  def splitAssign(idCol: Column, trainPct: Int = 80, valPct: Int = 10)
      : (Column, Column) = {
    val bucket = pmod(Dedup.seededHash(idCol.cast("string"), 0), lit(100))
    val split = when(bucket < trainPct, lit("train"))
      .when(bucket < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
    (bucket, split)
  }

  /** Deterministic training-shard assignment AND within-shard order —
    * the "global shuffle" a training export needs: shard =
    * md5-seeded hash mod `nShards` (seed 2, independent of
    * [[splitAssign]]'s seed-0 bucket), position = rank of the hash
    * within the shard (doc id breaks the astronomically-unlikely hash
    * tie, so the order is total and reproducible in any engine with
    * md5). The physical form IS the writer shape: one shuffle to
    * partition by shard, one in-partition sort — at 100 TB this is
    * `repartition(shard).sortWithinPartitions(h)` feeding a
    * partitioned write, with no global sort anywhere (the window is
    * per-shard, so no single-reducer ordering bottleneck). Size
    * `nShards` so one shard fits one task's (disk-backed) sort — at
    * corpus scale shards are file-sized (GBs), so `nShards` is tens of
    * thousands, not this test default. */
  def shardOrder(docs: DataFrame, nShards: Int,
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = Dedup.seededHash(col(idCol).cast("string"), 2)
    docs
      .select(col(idCol), pmod(h, lit(nShards)).cast("int").as("shard"),
        h.as("h"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("h"), col(idCol))))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Temperature-rebalanced source sampling at α = 1/2 — the
    * multilingual-corpus mixing rule (sampled mass ∝ n_s^α flattens
    * head sources without drowning the tail): each doc of source s
    * keeps with probability q_s = √(n_min)/√(n_s) (ppm-floored), so
    * the rarest source keeps EVERYTHING (q = 1) and a source 100× its
    * size keeps 10%. α is fixed at 1/2 because √ is the one power with
    * an IEEE correctly-rounded primitive on every engine — a general
    * `pow(x, α)` is libm-specific and would break the cross-engine
    * hash contract. Selection is the seed-0 md5 hash against the exact
    * integer ppm threshold ([[splitAssign]]'s discipline): the same doc
    * keeps or drops on every engine and every replay. Scale shape: the
    * rate table is sources-sized (broadcast), selection is one
    * codegen'd scan — no shuffle beyond the counts aggregate. */
  def temperatureSample(docs: DataFrame, idCol: String = "doc_id",
      groupCol: String = "source"): DataFrame = {
    val counts = docs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"))
    val minN = counts.agg(min(col("n_docs")).as("n_min"))
    val rates = counts.crossJoin(broadcast(minN))
      .select(col(groupCol), col("n_docs"),
        floor(sqrt(col("n_min").cast("double")) /
          sqrt(col("n_docs").cast("double")) * 1000000)
          .cast("long").as("q_ppm"))
    docs.join(broadcast(rates), Seq(groupCol))
      .filter(pmod(Dedup.seededHash(col(idCol).cast("string"), 0),
        lit(1000000L)) < col("q_ppm"))
      .select(col(idCol), col(groupCol), col("n_docs"), col("q_ppm"))
  }

  /** Compaction plan for a small-files corpus: pack items into
    * target-sized output bins by RUNNING OFFSET — per source, items in
    * id order accumulate a byte cursor, and an item's bin is
    * `start_offset // targetBytes` (its cursor before the item). The
    * greedy split is deterministic, order-stable under append (new
    * items only extend the last bin or open new ones — earlier bins
    * never re-shuffle, so an incremental compactor re-plans only the
    * tail), and single-pass: one per-source running-sum window, then a
    * bins-sized aggregate. An item larger than `targetBytes` keeps its
    * own bin (bins may overflow by one item — the usual compaction
    * contract; splitting items is the writer's job, not the
    * planner's). Exact integers end to end; `octet_length` counts
    * UTF-8 bytes identically on both engines. At 100 TB the "items"
    * are file-manifest rows (path, size), so the window runs over a
    * metadata-sized frame, never the data. */
  def compactionPlan(docs: DataFrame, targetBytes: Long,
      idCol: String = "doc_id", groupCol: String = "source",
      textCol: String = "text"): DataFrame = {
    // Spark's integral divide returns NULL on a zero divisor, which
    // would silently collapse every item into one NULL-keyed bin
    require(targetBytes > 0, s"targetBytes must be > 0: $targetBytes")
    import org.apache.spark.sql.expressions.Window
    val cum = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(groupCol), col(idCol),
        octet_length(col(textCol)).cast("long").as("bytes"))
      .withColumn("__cum", sum(col("bytes")).over(cum))
      .withColumn("bin",
        expr(s"(__cum - bytes) div ${targetBytes}L"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bytes"),
        min(col(idCol)).as("first_doc"), max(col(idCol)).as("last_doc"))
  }

  /** Vocabulary document frequency: the `k` tokens appearing in the most
    * documents (df desc, token asc — a total order, so the cut is
    * deterministic). distinct-per-doc explode → groupBy token; both
    * stages combine map-side, and the top-k is a single reduction over
    * one row per distinct token. */
  def vocabTopDf(docs: DataFrame, k: Int, textCol: String = "text")
      : DataFrame =
    docs
      .select(explode(array_distinct(TextAnalysis.words(col(textCol))))
        .as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token"))
      .limit(k)

  /** The `k` best documents per group by a score expression (ties broken
    * by ascending id — a total order, so the cut is deterministic): the
    * standard "keep the best docs per domain" curation step. One shuffle
    * on the group key; rank is a window `row_number`, so each group is
    * ranked inside its own partition — no global sort, no driver state.
    * Groups are ~uniform here; a pathological hot domain at 100 TB gets
    * the usual salting treatment (rank within salted subgroup, re-rank
    * the k·salts survivors). */
  def topKPerGroup(docs: DataFrame, k: Int, groupCol: String,
      score: Column, idCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("score").desc, col(idCol))
    docs
      .withColumn("score", score)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(groupCol), col(idCol), col("score"), col("rank"))
  }

  /** Salted variant of [[topKPerGroup]] for hot groups: rank inside
    * (group, salt) subgroups — `salts` deterministic shards per group,
    * salted by a hash of the id so the split is stable — keep each
    * subgroup's top k, then re-rank only the surviving k·salts rows per
    * group. Identical output to the unsalted operator (ExtSpec asserts
    * equality): the true top-k of a group all survive stage one, because
    * a row beaten by fewer than k rows globally is beaten by fewer than
    * k in its own subgroup. Stage one bounds any single task's sort to
    * the subgroup, which is what survives a group holding 10⁹ rows. */
  def topKPerGroupSalted(docs: DataFrame, k: Int, groupCol: String,
      score: Column, idCol: String = "doc_id", salts: Int = 16)
      : DataFrame = {
    val salt = pmod(xxhash64(col(idCol)), lit(salts))
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol), salt)
      .orderBy(col("score").desc, col(idCol))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("score").desc, col(idCol))
    docs
      .withColumn("score", score)
      .withColumn("srank", row_number().over(w1))
      .filter(col("srank") <= k)
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select(col(groupCol), col(idCol), col("score"), col("rank"))
  }

  /** Top TF-IDF terms per document: tf from the per-doc token counts,
    * idf = ln(N / df) over distinct-per-doc occurrence, score = tf·idf
    * rounded to 6; the `k` highest-scoring terms per doc (score desc,
    * term asc). The classic relevance/feature-extraction step.
    *
    * Scale shape: one explode → (doc, term) count aggregate (map-side
    * combining), one distinct-explode → df aggregate whose output is one
    * row per distinct term (a dimension-sized frame — joined in without
    * a broadcast hint so AQE picks broadcast while it fits and falls
    * back to shuffle at web-vocabulary scale), one per-doc window for
    * the top-k cut. N is a one-row in-plan aggregate cross-joined into
    * the scoring projection — fully lazy (building this DataFrame runs
    * no job), and never a driver collect of data rows. */
  def tfidfTopTerms(docs: DataFrame, k: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val nDf = docs.agg(count(lit(1)).cast("double").as("corpus_n"))
    val tf = docs
      .select(col(idCol).as("id"),
        explode(TextAnalysis.words(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = docs
      .select(explode(array_distinct(TextAnalysis.words(col(textCol))))
        .as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(df, Seq("term"))
      .crossJoin(nDf) // one row; AQE broadcasts it
      .withColumn("tfidf",
        round(col("tf") * log(col("corpus_n") / col("df")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id").as(idCol), col("term"), col("tfidf"), col("rank"))
  }

  /** Data-mixture sampling: given target mixture weights per source and
    * a total token budget, compute each source's sampling rate
    * `min(1, budget·weight / sourceTokens)` and keep a deterministic
    * hash-sample of its documents at that rate — how a pretraining
    * pipeline turns "40% web, 40% books, 20% code" into an actual row
    * filter. Returns the kept docs with their source's rate.
    *
    * Scale shape: one aggregation builds the per-source token totals (a
    * handful of rows — joined back without a hint, AQE broadcasts), and
    * membership is a pure per-row predicate on the md5-seeded id hash —
    * no sort, no window, no second pass. Deterministic: a doc's
    * keep/drop flips only if its source's rate changes, never with
    * partitioning or row order; the same id stays sampled as the corpus
    * grows (the reservoir property a rerun-able pipeline needs). */
  def mixtureSample(docs: DataFrame, weights: Map[String, Double],
      tokenBudget: Long, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val w = typedLit(weights)
    val toks = TextAnalysis.tokenCount(col(textCol)).cast("long")
    val totals = docs
      .select(col("source"), toks.as("toks"))
      .groupBy(col("source")).agg(sum(col("toks")).as("src_tokens"))
      .withColumn("rate",
        least(lit(1.0), lit(tokenBudget.toDouble) *
          coalesce(element_at(w, col("source")), lit(0.0)) /
          col("src_tokens")))
    // hash ∈ [0, 1e6) compared against the rate scaled to the same grid:
    // integer-vs-integer, so engines can't disagree at the boundary
    val bucket = pmod(Dedup.seededHash(col(idCol).cast("string"), 1),
      lit(1000000L))
    docs
      .join(totals.select(col("source"), col("rate")), Seq("source"))
      .filter(bucket < floor(col("rate") * 1000000.0).cast("long"))
      .select(col(idCol), col("source"),
        (round(col("rate") * 1000000) / 1000000.0).as("rate"))
  }

  /** Weighted reservoir sample of `k` rows per group — Efraimidis–
    * Spirakis A-ES: each row draws a uniform `u` from its md5-seeded id
    * hash and the k largest priorities `u^(1/w)` per group win, which
    * samples without replacement with probability proportional to
    * weight. Ranked by the monotone-equivalent `ln(u)/w` (rounded to 6
    * so a 1-ulp `ln` disagreement between engines cannot flip a rank;
    * ties break by id).
    *
    * Scale shape: a pure per-row priority (no pre-pass — unlike
    * [[mixtureSample]] there is no totals aggregate to build) into the
    * [[topKPerGroup]] partial+final WindowGroupLimit, so nothing ever
    * sorts a whole group. Deterministic and replayable: the reservoir
    * choice depends only on ids and weights, never partitioning —
    * re-running on a grown corpus keeps every sampled id whose
    * priority still makes the cut, the property that makes weighted
    * subsampling reproducible across pipeline reruns.
    *
    * Weights must be POSITIVE: `w = 0` divides `ln(u)` by zero and a
    * negative `w` flips the priority sign, silently inverting the
    * sampling order (least-likely rows would win). A-ES is only
    * defined for positive weights, so non-positive-weight rows are
    * excluded from the sample outright — the filter is the guard. */
  def weightedSamplePerGroup(docs: DataFrame, k: Int, weight: Column,
      groupCol: String = "source", idCol: String = "doc_id")
      : DataFrame = {
    // u ∈ (0, 1]: 60-bit md5 integer + 1 over 2^60 (seed family 2 —
    // independent of mixtureSample's membership hash)
    val u = (Dedup.seededHash(col(idCol).cast("string"), 2)
      .cast("double") + 1.0) / lit(1152921504606846976.0)
    // + 0.0 canonicalizes the signed zero: a u within one ulp of 1.0
    // yields a tiny negative priority that rounds to ZERO, which
    // Spark's round renders +0.0 but value engines keep as -0.0
    // (IEEE: -0.0 + 0.0 = +0.0 — both sides apply it)
    topKPerGroup(docs.filter(weight.cast("double") > 0), k, groupCol,
      round(log(u) / weight.cast("double"), 6) + lit(0.0), idCol)
  }

  /** Top-k collocations by pointwise mutual information: bigrams whose
    * joint probability beats the independence of their parts —
    * `pmi = ln(p(x,y) / (p(x)·p(y)))` with bigram/unigram probabilities
    * over their respective totals, `minCount` flooring out the unstable
    * low-frequency tail (classic PMI's failure mode is hapax pairs).
    *
    * Shape: bigram occurrences come from the codegen'd shingle kernel
    * (one pass, no interpreted HOF chain), both count tables are
    * map-side-combining aggregates, the totals are 1-row broadcast
    * literals, the unigram joins are plain equi-joins (vocab-sized
    * build side — AQE broadcasts here; at web scale they shuffle on
    * the word key, which is correct), and the final cut is a
    * TakeOrdered, never a global sort. */
  def pmiCollocations(docs: DataFrame, k: Int, minCount: Long,
      textCol: String = "text"): DataFrame = {
    val big = docs
      .select(explode(graft.plans.TextExpressions
        .wordShingleOccurrences(col(textCol), 2)).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("c_xy"))
    val uni = docs
      .select(explode(TextAnalysis.words(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val nb = big.agg(sum(col("c_xy")).as("nb"))
    val nu = uni.agg(sum(col("c")).as("nu"))
    big.filter(col("c_xy") >= minCount)
      .withColumn("x", element_at(split(col("pair"), " "), 1))
      .withColumn("y", element_at(split(col("pair"), " "), 2))
      .join(uni.select(col("w").as("x"), col("c").as("c_x")), Seq("x"))
      .join(uni.select(col("w").as("y"), col("c").as("c_y")), Seq("y"))
      .crossJoin(broadcast(nb)).crossJoin(broadcast(nu))
      .withColumn("pmi", round(log(
        (col("c_xy").cast("double") / col("nb")) /
          ((col("c_x").cast("double") / col("nu")) *
            (col("c_y").cast("double") / col("nu")))), 6))
      .orderBy(col("pmi").desc, col("pair")).limit(k)
      .select(col("pair"), col("c_xy"), col("c_x"), col("c_y"),
        col("pmi"))
  }

  /** Corpus drift monitor: the words most over-represented in half A
    * vs half B of a corpus, by their (Laplace-smoothed) KL
    * contribution `p_a·ln(p_a/p_b)`. Smoothing `(c+1)/(N+V)` over the
    * UNION vocabulary keeps words absent from one half finite, so a
    * brand-new term shows up as drift instead of dividing by zero —
    * the check a recurring ingest runs between yesterday's corpus and
    * today's before a mixture rebalance.
    *
    * Shape: two map-side-combining unigram aggregates, one full outer
    * join on the word key, 1-row totals broadcast, TakeOrdered cut.
    * Deterministic: integer counts, one round-6 `ln` per word. */
  def unigramDrift(corpusA: DataFrame, corpusB: DataFrame, k: Int,
      textCol: String = "text"): DataFrame = {
    def counts(d: DataFrame) = d
      .select(explode(TextAnalysis.words(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val a = counts(corpusA)
    val b = counts(corpusB)
    val joined = a.select(col("w"), col("c").as("c_a"))
      .join(b.select(col("w"), col("c").as("c_b")), Seq("w"), "full")
      .select(col("w"), coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
    val totals = joined.agg(sum(col("c_a")).as("na"),
      sum(col("c_b")).as("nb"), count(lit(1)).as("v"))
    joined.crossJoin(broadcast(totals))
      .withColumn("p_a", (col("c_a").cast("double") + 1.0) /
        (col("na") + col("v")))
      .withColumn("p_b", (col("c_b").cast("double") + 1.0) /
        (col("nb") + col("v")))
      .withColumn("kl_term",
        round(col("p_a") * log(col("p_a") / col("p_b")), 6))
      .orderBy(col("kl_term").desc, col("w")).limit(k)
      .select(col("w"), col("c_a"), col("c_b"), col("kl_term"))
  }

  /** Sequence-length histogram in power-of-two buckets of the BPE token
    * estimate — the profile that drives max-seq-len / packing decisions
    * in a pretraining pipeline. Bucket b holds docs with ⌊log₂(n+1)⌋ =
    * b; the index comes from the BINARY-STRING length of n+1, never
    * floating log2 (log(8)/log(2) can land an ulp below 3.0 and shift
    * every power-of-two doc one bucket down — and engines disagree on
    * exactly which inputs do it). One map-side-combining aggregate;
    * output is ≤ 63 rows. */
  def lengthHistogram(docs: DataFrame, textCol: String = "text")
      : DataFrame =
    docs
      .select(TextAnalysis.bpeTokenCount(col(textCol)).as("n"))
      .withColumn("bucket", (length(bin(col("n") + 1)) - 1).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("total_tokens"))

  /** Gopher-style document filter rules (the Rae et al. 2021 repetition
    * /format family, simplified to the engine-portable core): per doc,
    * word count, mean word length, and the fraction of words containing
    * an alphabetic character; `keep` is the conjunction of the classic
    * bounds (word count in [minWords, maxWords], mean word length in
    * [3, 10], alpha fraction ≥ 0.6). Pure per-row expressions — scan
    * speed, no shuffle; ratios round to 4 so results are
    * engine-reproducible. */
  def gopherRules(docs: DataFrame, minWords: Int = 5,
      maxWords: Int = 100000, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val ws = TextAnalysis.words(col(textCol))
    docs
      .select(col(idCol), filter(ws, w => w =!= "").as("ws"))
      .withColumn("n_words", size(col("ws")).cast("long"))
      // basis points, not round(_, 4): integer-ratio doubles like
      // 153/160 = .95625 are exact 4-decimal half-ties, where Spark's
      // shortest-repr rounding and a value-based engine's pick opposite
      // sides (the class TextAnalysis.qualityScore documents)
      .withColumn("mean_word_len",
        round(when(col("n_words") > 0,
          aggregate(col("ws"), lit(0L), (acc, w) => acc + length(w))
            .cast("double") / col("n_words")).otherwise(lit(0.0))
          * 10000) / 10000.0)
      .withColumn("alpha_frac",
        round(when(col("n_words") > 0,
          size(filter(col("ws"), w => w.rlike("[a-z]"))).cast("double") /
            col("n_words")).otherwise(lit(0.0)) * 10000) / 10000.0)
      .select(col(idCol), col("n_words"), col("mean_word_len"),
        col("alpha_frac"),
        (col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("alpha_frac") >= 0.6).as("keep"))
  }

  /** Per-(source, lang) corpus health: doc count, total chars, mean
    * whitespace-token count, and DISCRETE nearest-rank percentiles
    * (p50/p90) of the integer token counts — the smallest value whose
    * cumulative count reaches ⌈p·n⌉. Continuous-interpolation
    * percentiles (`percentile`/`median` vs `quantile_cont`) differ
    * between engines in the last double ulp and flip rounding
    * boundaries; rank selection over integers is exact in every engine.
    *
    * Shape: one histogram aggregate on (source, lang, toks) — map-side
    * combining collapses the shuffle to the distinct-value level — then
    * a cumulative window over the per-group HISTOGRAM (distinct token
    * values, not rows; bounded by the longest doc, not the corpus),
    * then the rank cut as a plain conditional-min aggregate; the
    * count/sum/mean aggregate joins back on the group key. The target
    * ranks use integer `DIV`, so no double ever sits at a boundary. At
    * 100 TB the same histogram feeds `approx_percentile` instead — the
    * plan keeps the one partial-aggregating shuffle on the group key. */
  def sourceStats(docs: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokenCount(col("text")).cast("long")
    val base = docs
      .select(col("source"), col("lang"), col("n_chars"), toks.as("toks"))
    val hist = base.groupBy(col("source"), col("lang"), col("toks"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"), col("lang")).orderBy(col("toks"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"), col("lang"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
    def rankOf(num: Int, den: Int) = // ⌈num·n / den⌉ in integer math
      expr(s"(n * $num + ${den - 1}) DIV $den")
    val pct = cum.groupBy(col("source"), col("lang")).agg(
      min(when(col("cum") >= rankOf(1, 2), col("toks"))).as("p50_tokens"),
      min(when(col("cum") >= rankOf(9, 10), col("toks"))).as("p90_tokens"))
    base.groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        // basis points: avg of integers is an exact rational that can
        // half-tie at 4 decimals, where repr-based and value-based
        // rounding disagree (see TextAnalysis.qualityScore)
        (round(avg(col("toks")) * 10000) / 10000.0).as("mean_tokens"))
      .join(pct, Seq("source", "lang"))
  }

  /** Unigram-LM cross-entropy per document — the CCNet/Gopher quality
    * signal "how surprising is this document under a language model
    * trained on the corpus itself", with the LM reduced to its unigram
    * term so an external engine can replay it exactly. Score is the
    * tf-weighted mean of -ln P(w), P(w) = corpus count / corpus total;
    * low = stereotypical text, high = rare-token noise.
    *
    * Shape: ONE tokenize+explode builds (doc, term, tf) — cached,
    * because the term-count table and the corpus total both derive from
    * it (Σtf per term / Σtf overall; re-exploding the corpus once per
    * branch was 3× the scan cost). The count table is vocabulary-sized
    * (a dimension — AQE broadcasts it while it fits, falls back to an
    * equi-shuffle on `term` at web-vocabulary scale); the total is a
    * one-row in-plan aggregate cross-joined in (no eager driver job).
    * The per-doc sum of tf·ln terms goes through decimal(38,18) so
    * shuffle order cannot move the rounded result. */
  def unigramLogProb(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    val tf = CacheRegistry.tracked(docs
      .select(col(idCol).as("id"),
        explode(TextAnalysis.words(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf")))
    val cnt = tf.groupBy(col("term")).agg(sum(col("tf")).as("cnt"))
    val tot = tf.agg(sum(col("tf")).cast("double").as("total"))
    tf.join(cnt, Seq("term"))
      .crossJoin(tot) // one row; AQE broadcasts it
      .groupBy(col("id"))
      .agg(sum(col("tf")).as("n_tok"),
        round(sum((col("tf") * log(col("total") / col("cnt"))).cast(dec))
          .cast("double") / sum(col("tf")), 4).as("xent"))
      .select(col("id").as(idCol), col("n_tok"), col("xent"))
  }

  /** Bigram-LM cross-entropy per document — one model order up from
    * [[unigramLogProb]], the honest Spark shape of the CCNet/KenLM
    * perplexity filter: score = mean over the document's bigram
    * occurrences of -ln P(w₂|w₁) under the corpus's own add-α-smoothed
    * conditional model, P(w₂|w₁) = (B(w₁w₂)+α) / (U(w₁)+α·V). Unigram
    * xent flags rare-TOKEN noise; this additionally flags improbable
    * token ORDER (shuffled/templated text whose vocabulary looks
    * normal). Docs with < 2 tokens have no bigrams and no row.
    *
    * Shape: the codegen'd [[graft.plans.TextKernels.shingleOccurrences]]
    * kernel (n=2) emits the bigram stream in one pass — no HOF
    * re-evaluation, no second tokenize; per-doc bigram tf is cached
    * because the corpus bigram-count table aggregates from it. The
    * model tables are vocabulary-sized: AQE broadcasts them while they
    * fit and falls back to equi-shuffles on the n-gram key at
    * web-vocabulary scale (exactly how a sharded KenLM feeds a scoring
    * join). V and the counts stay integers; the per-doc sum runs
    * through decimal(38,18) so shuffle order cannot move the rounded
    * result. */
  def bigramLogProb(docs: DataFrame, alpha: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val (bcnt, uni) = bigramModel(docs, textCol)
    bigramScoreWithModel(docs, bcnt, uni, alpha, idCol, textCol)
  }

  /** The MODEL half of [[bigramLogProb]]: corpus-level bigram counts
    * `(bg, bcnt)` and unigram counts `(term, ucnt)` — everything the
    * scorer needs, both bounded by vocabulary (not corpus) size. The
    * persistence hook: [[graft.sources.LmStore]] writes them once, and
    * every later corpus scores against the frozen model (the CCNet
    * quality-filter lifecycle — the model corpus is the curated
    * target-domain sample, the scored corpus is the crawl). */
  private[graft] def bigramModel(docs: DataFrame,
      textCol: String = "text"): (DataFrame, DataFrame) = {
    val bcnt = docs
      .select(explode(graft.plans.TextExpressions
        .wordShingleOccurrences(col(textCol), 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("bcnt"))
    val uni = docs
      .select(explode(TextAnalysis.words(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("ucnt"))
    (bcnt, uni)
  }

  /** The SCORING half against an explicit `(bg, bcnt)` / `(term,
    * ucnt)` model: per-doc add-α conditional cross-entropy. Joins are
    * LEFT with zero-coalesce, so a bigram or history word the model
    * never saw scores at the smoothing floor (`α/(Vα)` for an unseen
    * history = the uniform 1/V) instead of being dropped — exactly
    * add-α's out-of-model semantics, and a no-op when scoring the
    * model's own training corpus (every join hits). V is the MODEL's
    * vocabulary size — frozen with the model, like every other of its
    * parameters. */
  private[graft] def bigramScoreWithModel(docs: DataFrame,
      bcnt: DataFrame, uni: DataFrame, alpha: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    val btf = CacheRegistry.tracked(docs
      .select(col(idCol).as("id"),
        explode(graft.plans.TextExpressions
          .wordShingleOccurrences(col(textCol), 2)).as("bg"))
      .groupBy(col("id"), col("bg"))
      .agg(count(lit(1)).as("tf")))
    val vocab = uni.agg(count(lit(1)).cast("double").as("v"))
    btf
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .join(bcnt, Seq("bg"), "left")
      .join(uni.withColumnRenamed("term", "w1"), Seq("w1"), "left")
      .crossJoin(vocab) // one row; AQE broadcasts it
      .groupBy(col("id"))
      .agg(sum(col("tf")).as("n_big"),
        round(sum((col("tf") *
            log((coalesce(col("ucnt"), lit(0L)) + col("v") * alpha) /
              (coalesce(col("bcnt"), lit(0L)) + alpha))).cast(dec))
          .cast("double") / sum(col("tf")), 4).as("xent2"))
      .select(col("id").as(idCol), col("n_big"), col("xent2"))
  }

  /** CCNet head/middle/tail tiers: rank documents by quality within each
    * language and cut into `buckets` equal tiles (ntile semantics: the
    * first `n mod buckets` tiles take the extra row — identical in Spark
    * and ANSI SQL). The order key (score desc, id asc) is total, so the
    * tile assignment is deterministic.
    *
    * Scale: ntile needs a full sort within each language partition, and
    * languages are few → skewed. At 100 TB the production form computes
    * the two tier thresholds per language with `approx_percentile` (one
    * map-side-combining aggregate) and assigns tiers with a broadcast
    * threshold join — same output modulo boundary ties, no global sort.
    * The exact ntile here is the oracle-checkable reference shape. */
  def qualityBuckets(docs: DataFrame, buckets: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(col("q").desc, col("doc_id"))
    docs
      .select(col("doc_id"), col("lang"),
        TextAnalysis.qualityScore(col("text")).as("q"))
      .withColumn("tile", ntile(buckets).over(w))
      .withColumn("tier",
        when(col("tile") === 1, lit("head"))
          .when(col("tile") === buckets, lit("tail"))
          .otherwise(lit("middle")))
      .select(col("doc_id"), col("lang"), col("q"), col("tile"),
        col("tier"))
  }

  /** The PRODUCTION form of [[qualityBuckets]] — the shape CCNet
    * actually ships at web scale: instead of a full per-language sort
    * (ntile's window is one sort per language, and languages are few →
    * the most skewed partitioning there is), compute the `buckets-1`
    * tier thresholds per language with GK quantile sketches (ONE
    * map-side-combining aggregate over the scored scan) and assign
    * tiers with a broadcast threshold join — the threshold table is
    * languages × (buckets−1) values, a dimension by construction.
    * Plan: scan → aggregate → broadcast-join → project; no window, no
    * global sort, nothing skew-sensitive.
    *
    * Same output as the exact ntile modulo boundary placement: a
    * document lands in a different tier only when its score sits
    * within GK rank error (n/accuracy) of a tier cut, or ties the cut
    * value (ntile splits ties by doc_id; a value threshold cannot).
    * ExtSpec pins exactly that: disagreements are adjacent-tier only
    * and bounded by the boundary-tie count. */
  def qualityBucketsApprox(docs: DataFrame, buckets: Int = 3,
      accuracy: Int = 10000): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val scored = docs.select(col("doc_id"), col("lang"),
      TextAnalysis.qualityScore(col("text")).as("q"))
    // descending cuts: tile i covers q >= quantile(1 - i/buckets)
    val cuts = (1 until buckets).map(i => 1.0 - i.toDouble / buckets)
    val th = scored.groupBy(col("lang")).agg(
      percentile_approx(col("q"),
        array(cuts.map(lit): _*), lit(accuracy)).as("ths"))
    scored.join(broadcast(th), Seq("lang"))
      // tile = 1 + number of thresholds strictly above q (ths is
      // descending); boundary ties take the UPPER tile
      .withColumn("tile",
        (size(filter(col("ths"), t => col("q") < t)) + 1))
      .withColumn("tier",
        when(col("tile") === 1, lit("head"))
          .when(col("tile") === buckets, lit("tail"))
          .otherwise(lit("middle")))
      .select(col("doc_id"), col("lang"), col("q"), col("tile"),
        col("tier"))
  }

  /** Boilerplate coverage: the fraction of a document's shingle
    * OCCURRENCES whose shingle appears in ≥ `minDf` distinct documents —
    * the repeated-phrase (navigation chrome / license header / template)
    * signal web-corpus curation filters on. Documents too short to
    * shingle get coverage 0 and keep = true.
    *
    * Shape: ONE tokenize+shingle pass — the occurrence explode is
    * cached and the hot set derives from it (distinct (doc, shingle) →
    * df), instead of re-scanning the corpus through a second shingle
    * kernel. The hot set is tiny BY CONSTRUCTION (df ≥ minDf caps it at
    * corpus_docs/minDf entries), so AQE broadcasts the join at any
    * corpus size — the one full shuffle is the df aggregation itself,
    * map-side combining on the shingle. */
  def boilerplateCoverage(docs: DataFrame, minDf: Int,
      maxCoverage: Double): DataFrame = {
    val occ = CacheRegistry.tracked(docs.select(col("doc_id"),
      explode(TextAnalysis.shingleOccurrences(col("text"))).as("s")))
    val hot = occ.select(col("doc_id"), col("s")).distinct()
      .groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select(col("s"), lit(1).as("is_hot"))
    val cov = occ.join(hot, Seq("s"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"),
        sum(coalesce(col("is_hot"), lit(0))).as("n_common"))
    docs.select(col("doc_id")).join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_sh"), lit(0L)).as("n_sh"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
      .withColumn("coverage",
        round(col("n_common") / greatest(col("n_sh"), lit(1L)) * 1000000)
          / 1000000.0)
      .withColumn("keep", col("coverage") <= maxCoverage)
  }

  /** Overlapping retrieval chunks: windows of `width` words every
    * `stride` words (stride < width → overlap, the RAG indexing shape).
    * One row per chunk with its word count and content fingerprint; a
    * doc of L words yields ⌊(L−1)/stride⌋+1 chunks, so the final chunk
    * may run short — kept, because retrieval wants the tail.
    *
    * Shape: pure per-row explode — the word array binds to an attribute
    * ONCE (a lambda re-evaluates non-attribute subexpressions per
    * element), chunks slice from it, no shuffle anywhere. Scan speed at
    * any corpus size; the output is ~L/stride× the input rows, which is
    * the point (it feeds an embedding/index stage downstream). */
  def chunkWindows(docs: DataFrame, width: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(stride >= 1 && width >= stride,
      s"need width >= stride >= 1, got width=$width stride=$stride")
    val nChunks = (floor((size(col("ws")) - 1) / stride) + 1).cast("int")
    docs
      .select(col(idCol), TextAnalysis.words(col(textCol)).as("ws"))
      .withColumn("chunk_idx",
        explode(sequence(lit(0), nChunks - 1)))
      .withColumn("chunk",
        slice(col("ws"), col("chunk_idx") * stride + 1, lit(width)))
      .select(col(idCol), col("chunk_idx"),
        size(col("chunk")).as("n_words"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_fp"))
  }

  /** Sequence packing: concatenate documents in id order and cut at
    * every `budget` tokens — each doc lands in the bin its FIRST token
    * falls into (the concat-then-chunk packing LLM data loaders run
    * before writing fixed-length training sequences). Returns per-bin
    * doc count, token mass, and fill fraction against the budget.
    *
    * Shape: a global ordered prefix sum, which Spark plans as a
    * SINGLE-PARTITION window (an unpartitioned Window.orderBy moves all
    * rows to one task — fine at oracle scale, a bottleneck at corpus
    * scale), then a map-side-combining aggregate on the bin id. At
    * 100 TB the doc order is arbitrary anyway, so production packs each
    * partition independently — the same code with the window keyed by
    * `spark_partition_id()` — paying no global sort and no single-task
    * window; the totally-ordered form here is the oracle-checkable
    * reference. */
  def packSequences(docs: DataFrame, budget: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    docs
      .select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("toks"))
      .withColumn("cum_before",
        coalesce(sum(col("toks")).over(w), lit(0L)))
      .withColumn("seq_id", (col("cum_before") / budget).cast("long"))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        round(sum(col("toks")) / lit(budget.toDouble), 6).as("fill"))
  }

  /** Head+tail truncation to a token budget: docs over `maxToks` words
    * keep the first `headToks` and last `tailToks` (the middle is the
    * least informative span — the standard long-doc truncation). Emits
    * original/kept counts and the kept-content fingerprint. Pure
    * per-row, scan speed. */
  def truncateHeadTail(docs: DataFrame, maxToks: Int, headToks: Int,
      tailToks: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(headToks + tailToks <= maxToks,
      s"head $headToks + tail $tailToks must fit in max $maxToks")
    docs
      .select(col(idCol), TextAnalysis.words(col(textCol)).as("ws"))
      .withColumn("kept",
        when(size(col("ws")) <= maxToks, col("ws"))
          .otherwise(concat(
            slice(col("ws"), 1, headToks),
            slice(col("ws"), -tailToks, tailToks))))
      .select(col(idCol),
        size(col("ws")).as("n_orig"),
        size(col("kept")).as("n_kept"),
        md5(concat_ws(" ", col("kept"))).as("kept_fp"))
  }

  /** Adjacent-symbol pair frequencies over the word-frequency table —
    * the statistic ONE merge step of BPE tokenizer training maximizes
    * (Sennrich et al. 2016: the next merge is the argmax pair). Pairs
    * are weighted by word frequency; ties at the top-k boundary break by
    * pair text, so the cut is a total order.
    *
    * Shape: the corpus collapses to its vocabulary first (one map-side-
    * combining shuffle), pairs explode from the VOCABULARY (≤ vocab ×
    * word length rows — dimension-sized, never corpus-sized), and the
    * top-k cut is a TakeOrdered, not a sort. This is why distributed BPE
    * training is cheap: every iteration after the first runs on the
    * vocab table alone. */
  def bpePairCounts(docs: DataFrame, k: Int,
      textCol: String = "text"): DataFrame = {
    val wf = docs
      .select(explode(TextAnalysis.words(col(textCol))).as("w"))
      .filter(col("w") =!= "" && length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    wf.select(col("freq"),
        explode(transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(k)
  }

  /** FULL BPE tokenizer training: learn the first `nMerges` merges
    * (Sennrich et al. 2016), not just [[bpePairCounts]]'s single-step
    * statistic. Output: one row per merge — `(merge_rank, left, right,
    * cnt)`, where `cnt` is the pair's corpus frequency at the moment it
    * was chosen (ties break by pair text, so training is a total order
    * and deterministic across engines; the max count is provably
    * non-increasing in rank, which the spec pins).
    *
    * Scale shape: the corpus is touched ONCE — collapsed to its
    * word-frequency table by a map-side-combining shuffle. Every
    * iteration after that runs on the VOCABULARY alone: adjacent-pair
    * explode (≤ vocab × word length rows), one aggregate, a 1-row
    * TakeOrdered argmax collected to the driver (bounded metadata — one
    * pair per merge), applied as literals in the codegen'd
    * [[graft.plans.TextExpressions.bpeMergePair]] rewrite of the symbol
    * arrays. No corpus-sized work per merge — at 100 TB each merge
    * costs a vocab-table pass regardless of corpus size. Vocab state is
    * cached per iteration, and lineage stays LINEAR in the merge count
    * (see [[bpeTrainLoop]] for why that matters). */
  def bpeTrainMerges(docs: DataFrame, nMerges: Int,
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeTrainLoop(docs, nMerges, textCol)._1
      .toDF("merge_rank", "left", "right", "cnt")
  }

  /** The shared training loop: returns (merge table, final vocabulary).
    * The vocabulary row keeps the original word so encoders can join
    * against it — (w, freq, syms) with `syms` the word's symbols after
    * ALL `nMerges` rewrites.
    *
    * Each iteration's argmax is a 1-row `collect` (bounded metadata,
    * the same class as the IVF probed-list ids) whose pair is applied
    * as LITERALS — so the vocab plan deepens by ONE projection per
    * merge. The first cut of this loop kept the argmax as a broadcast
    * plan node instead; that makes vocab_r's plan contain both
    * vocab_{r-1} and the argmax-over-vocab_{r-1} subtree, i.e. the
    * logical plan DOUBLES per merge — execution was fine (caches), but
    * plan stringification/canonicalization went exponential and a
    * 2^8-node tree wedged the driver for minutes. Iterative algorithms
    * must keep lineage linear in the iteration count. */
  private def bpeTrainLoop(docs: DataFrame, nMerges: Int,
      textCol: String): (Seq[(Int, String, String, Long)], DataFrame) = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val wf = docs
      .select(explode(TextAnalysis.words(col(textCol))).as("w"))
      .filter(col("w") =!= "" && length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    var vocab = CacheRegistry.tracked(
      wf.select(col("w"), col("freq"),
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))).as("syms")))
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      val best = vocab
        // fully-merged words have one symbol left: no pairs (Spark's
        // sequence(0, -1) would otherwise count DOWN)
        .filter(size(col("syms")) >= 2)
        .select(col("freq"),
          explode(transform(sequence(lit(0), size(col("syms")) - 2),
            i => struct(element_at(col("syms"), i + 1).as("l"),
              element_at(col("syms"), i + 2).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r")).limit(1)
        .collect() // 1 row: the chosen merge — bounded metadata
      best.headOption match {
        case None => exhausted = true // vocabulary fully merged
        case Some(row) =>
          val (l, r, cnt) =
            (row.getString(0), row.getString(1), row.getLong(2))
          merges += ((rank, l, r, cnt))
          vocab = CacheRegistry.tracked(
            vocab.select(col("w"), col("freq"),
              graft.plans.TextExpressions
                .bpeMergePair(col("syms"), lit(l), lit(r)).as("syms")))
          rank += 1
      }
    }
    (merges.result(), vocab)
  }

  /** BPE ENCODE with the vocabulary the training loop produced: every
    * document's words join (broadcast — the vocab is dimension-sized)
    * against their fully-merged symbol sequences; out-of-vocabulary
    * words (length-1, never trained) tokenize as themselves. Output:
    * per-doc word count, learned-subword count, and an order-exact
    * fingerprint of the token stream.
    *
    * Scale shape: training amortizes across every corpus this merge
    * table encodes; the encode itself is one corpus-sized word explode,
    * a broadcast hash join (no shuffle), and one per-doc aggregate (one
    * shuffle on doc_id). The in-order fingerprint reassembles from
    * (position, syms) structs — per-doc sort_array over tokens-per-doc
    * elements, never a global sort. */
  def bpeEncode(docs: DataFrame, nMerges: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    encodeWithVocab(docs, bpeTrainLoop(docs, nMerges, textCol)._2,
      textCol, idCol)

  /** Both halves of the training loop's output as frames — the
    * persistence hook ([[graft.sources.TokenizerStore]] writes them;
    * training runs ONCE per tokenizer, every later corpus encodes
    * against the stored vocabulary). Merges: (merge_rank, left, right,
    * cnt). Vocabulary: (w, freq, syms) with `syms` the word's symbols
    * after all merges. */
  private[graft] def bpeTrainVocab(docs: DataFrame, nMerges: Int,
      textCol: String = "text"): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (merges, vocab) = bpeTrainLoop(docs, nMerges, textCol)
    (merges.toDF("merge_rank", "left", "right", "cnt"), vocab)
  }

  /** The encode body against an explicit `(w, syms)` vocabulary frame —
    * shared by [[bpeEncode]] (vocab trained in-query) and
    * [[graft.sources.TokenizerStore.encodeFromStore]] (vocab read from
    * the persisted store): broadcast join, OOV words tokenize as
    * themselves, per-doc in-order token-stream fingerprint. */
  private[graft] def encodeWithVocab(docs: DataFrame, vocab: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val ws = docs
      .select(col(idCol), posexplode(TextAnalysis.words(col(textCol)))
        .as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    ws.join(broadcast(vocab.select(col("w"), col("syms"))), Seq("w"),
        "left")
      .withColumn("toks", coalesce(col("syms"), array(col("w"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(size(col("toks"))).as("n_subwords"),
        md5(concat_ws(" ", flatten(transform(
          sort_array(collect_list(struct(col("pos"), col("toks")))),
          x => x.getField("toks"))))).as("token_fp"))
  }

  /** Tokenizer LOSSLESSNESS audit at corpus scale: BPE merges only
    * ever CONCATENATE adjacent symbols, so applying the trained vocab
    * and gluing each word's subwords back together must reproduce the
    * word exactly, for every word of every document — `lossless` is
    * the per-doc conjunction. A corrupted merge table, a duplicated
    * symbol, or an encode that drops/reorders subwords flips a hashed
    * boolean on real corpus text with no crafted fixture needed (the
    * round-trip property every production tokenizer deployment
    * asserts before training on the output). Same broadcast-vocab
    * encode shape as [[bpeEncode]]; OOV words tokenize as themselves
    * and round-trip trivially. */
  def bpeRoundtrip(docs: DataFrame, nMerges: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val vocab = bpeTrainVocab(docs, nMerges, textCol)._2
    // plain explode — unlike bpeEncode, nothing here is order-sensitive
    docs
      .select(col(idCol),
        explode(TextAnalysis.words(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .join(broadcast(vocab.select(col("w"), col("syms"))), Seq("w"),
        "left")
      .withColumn("toks", coalesce(col("syms"), array(col("w"))))
      .withColumn("ok", concat_ws("", col("toks")) === col("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(size(col("toks"))).as("n_subwords"),
        min(col("ok")).as("lossless"))
  }

  /** UNIGRAM tokenizer (Kudo, "Subword regularization", ACL 2018 — the
    * SentencePiece model family) beside the BPE rungs: candidate vocab
    * = every 1..maxPieceLen substring of the distinct-word frame
    * (frequency-weighted, multiplicity kept), cut to the top
    * `vocabSize` by (count desc, piece asc) PLUS all single characters
    * (coverage guarantee: every word always has at least the
    * char-by-char cover), scored by the INTEGER-scaled log-frequency
    * `s = ⌊1e6·ln(count)⌉` — the one design decision that makes the
    * whole pipeline engine-exact: Viterbi compares path sums of exact
    * longs (`Σ s_piece − k·s_tot`), never sums of doubles, so both
    * engines land the identical argmax segmentation (the only
    * transcendental exposure is the per-piece rounding itself,
    * vocab-sized and mirrored verbatim in the oracle).
    *
    * Scale shape: candidate generation and Viterbi run over the
    * DISTINCT-WORD frame (one combining aggregate away from the
    * corpus), the vocab is bounded metadata (≤ vocabSize + alphabet
    * rows, collected once into plan literals — the probed-list-ids
    * pattern), segmentation is the codegen'd
    * [[graft.plans.UnigramViterbi]] kernel (exact-long DP, per-task
    * vocab map), and the corpus only ever flows through the same
    * broadcast word→toks join as [[bpeEncode]]. */
  /** One unigram vocabulary row — the tokenizer model itself, held
    * driver-side as bounded metadata (≤ vocabSize + alphabet rows). */
  private[graft] case class UnigramPiece(piece: String, cnt: Long,
      s: Long)

  /** EXACT-INTEGER log score `s ≈ 1e6·ln(c)` by fixed-point binary
    * logarithm (20 fractional bits of shift-square-truncate, then one
    * integer multiply by ⌊1e6·ln2⌋ = 693147 and a final shift) — every
    * operation is 64-bit integer arithmetic, so ANY engine replays the
    * identical value from `c` alone. The previous `round(1e6·ln c)`
    * ran each engine's own libm: a 1-ulp disagreement at a .5 rounding
    * boundary could flip a score by 1 and with it the Viterbi argmax —
    * a latent cross-engine flake this closes (the DuckDB oracles run
    * the same chain as unrolled bigint CTEs). Within 9e-6 of the true
    * 1e6·ln(c); monotone in c (truncation preserves order). */
  private[graft] def fixLogScore(c: Long): Long = {
    require(c >= 1L, s"fixLogScore needs a positive count, got $c")
    val ip = 63 - java.lang.Long.numberOfLeadingZeros(c)
    // mantissa scaled to [2^30, 2^31): squares stay under 2^62
    var m = if (ip >= 30) c >> (ip - 30) else c << (30 - ip)
    var r = 0L
    var k = 0
    while (k < 20) {
      m = (m * m) >> 30
      r <<= 1
      if (m >= (1L << 31)) { m >>= 1; r += 1 }
      k += 1
    }
    ((ip.toLong * (1L << 20) + r) * 693147L) >> 20
  }

  /** The seeded unigram vocabulary, COLLECTED once (piece-sorted):
    * candidate substrings of the distinct-word frame cut to the top
    * `vocabSize` by (count desc, piece asc) plus all single
    * characters, scored driver-side by [[fixLogScore]]. Every unigram
    * entry point shares these rows — the vocab is the model, and
    * collecting it once replaces the re-derivation the EM steps used
    * to pay per consumer. */
  private[graft] def unigramVocabPieces(docs: DataFrame, vocabSize: Int,
      maxPieceLen: Int, textCol: String): Seq[UnigramPiece] = {
    val wf = docs
      .select(explode(TextAnalysis.words(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    val subs = wf
      .select(explode(graft.plans.TextExpressions
        .charGrams(col("w"), maxPieceLen)).as("piece"), col("freq"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
    val topv = subs.orderBy(col("cnt").desc, col("piece"))
      .limit(vocabSize)
    val chars = subs.filter(length(col("piece")) === 1)
    topv.unionByName(chars)
      .groupBy(col("piece")).agg(max(col("cnt")).as("cnt"))
      .orderBy(col("piece"))
      .collect() // bounded metadata — the tokenizer model itself
      .map(r => UnigramPiece(r.getAs[String]("piece"),
        r.getAs[Long]("cnt"), fixLogScore(r.getAs[Long]("cnt"))))
      .toSeq
  }

  /** [[unigramVocabPieces]] as a frame `(piece, cnt, s)` — the shape
    * [[graft.sources.TokenizerStore.writeUnigramVocab]] persists. */
  private[graft] def unigramVocabFrame(docs: DataFrame, vocabSize: Int,
      maxPieceLen: Int, textCol: String): DataFrame =
    docs.sparkSession.createDataFrame(
      unigramVocabPieces(docs, vocabSize, maxPieceLen, textCol))
      .select(col("piece"), col("cnt"), col("s"))

  /** The distinct-word frame segmented by the Viterbi kernel against
    * an explicit vocabulary: `(w, freq, toks)`. Vocab pieces/scores
    * ride as ONE literal array pair (bounded metadata — the kernel
    * builds its hash map once per task off the literal's identity);
    * sTot derives from the vocab counts themselves via the same
    * [[fixLogScore]], so a STORED vocabulary needs no side channel
    * ([[graft.sources.TokenizerStore.encodeUnigramFromStore]]). */
  private[graft] def unigramSegmentedWithVocab(docs: DataFrame,
      vocab: Seq[UnigramPiece], maxPieceLen: Int,
      textCol: String): DataFrame = {
    val pieces = vocab.map(_.piece)
    val scores = vocab.map(_.s)
    val sTot = fixLogScore(vocab.map(_.cnt).sum)
    val wf = docs
      .select(explode(TextAnalysis.words(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    wf.withColumn("toks", graft.plans.TextExpressions.unigramViterbi(
      col("w"), typedLit(pieces), typedLit(scores), maxPieceLen, sTot))
  }

  private def unigramSegmentedWords(docs: DataFrame, vocabSize: Int,
      maxPieceLen: Int, textCol: String): DataFrame =
    unigramSegmentedWithVocab(docs,
      unigramVocabPieces(docs, vocabSize, maxPieceLen, textCol),
      maxPieceLen, textCol)

  /** Per-piece Viterbi usage (word-frequency-weighted) of `vocab`
    * over the corpus — the E-step segmentation plus the M-step
    * recount, shared by both EM rounds. */
  private def unigramUsage(docs: DataFrame, vocab: Seq[UnigramPiece],
      maxPieceLen: Int, textCol: String): DataFrame =
    unigramSegmentedWithVocab(docs, vocab, maxPieceLen, textCol)
      .filter(col("toks").isNotNull)
      .select(explode(col("toks")).as("piece"), col("freq"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt_em"))

  /** One EM re-estimation step (the M-step recount over the E-step's
    * Viterbi segmentations): per vocab piece, the seed count, the
    * integer score the segmentation ran under, and the piece's usage
    * count in the best segmentations (word-frequency-weighted) — the
    * statistic SentencePiece's next iteration renormalizes on, and the
    * pruning signal (em_cnt = 0 pieces are dead weight). The vocab is
    * collected ONCE and reused for both the segmentation literals and
    * the output's seed columns (re-seeding it per consumer was a full
    * extra candidate-generation pass over the distinct-word frame). */
  def unigramTokenEm(docs: DataFrame, vocabSize: Int = 200,
      maxPieceLen: Int = 4, textCol: String = "text"): DataFrame = {
    val vocab = unigramVocabPieces(docs, vocabSize, maxPieceLen,
      textCol)
    unigramEmFrame(docs, vocab, maxPieceLen, textCol)
  }

  private def unigramEmFrame(docs: DataFrame,
      vocab: Seq[UnigramPiece], maxPieceLen: Int,
      textCol: String): DataFrame =
    docs.sparkSession.createDataFrame(vocab)
      .select(col("piece"), col("cnt").as("cnt_seed"),
        col("s").as("score_seed"))
      .join(unigramUsage(docs, vocab, maxPieceLen, textCol),
        Seq("piece"), "left")
      .select(col("piece"), col("cnt_seed"), col("score_seed"),
        coalesce(col("cnt_em"), lit(0L)).as("cnt_em"))

  /** SECOND EM iteration with PRUNING — the convergence step on top of
    * [[unigramTokenEm]]: pieces the round-1 Viterbi never used drop
    * from the vocabulary (SentencePiece's prune move), single
    * characters survive at a floor count of 1 (the coverage guarantee
    * must outlive pruning), counts re-normalize to the round-1 usage,
    * scores re-derive ([[fixLogScore]] — same integer discipline), and
    * the corpus re-segments under the new scores. Output per surviving
    * piece: the round-1 usage it was rescored from, the round-2 score,
    * and the round-2 usage — at convergence `cnt_r2 ≈ cnt_r1`, and a
    * piece that DIED between rounds is visible as `cnt_r2 = 0`.
    * Round 1 runs ONCE: its usage collects (vocab-sized) and the
    * pruned round-2 model derives driver-side, instead of re-running
    * the whole round-1 pipeline a second time. */
  def unigramTokenEm2(docs: DataFrame, vocabSize: Int = 200,
      maxPieceLen: Int = 4, textCol: String = "text"): DataFrame = {
    val v1 = unigramVocabPieces(docs, vocabSize, maxPieceLen, textCol)
    val used1 = unigramUsage(docs, v1, maxPieceLen, textCol)
      .collect() // bounded metadata: one row per surviving piece
      .map(r => r.getAs[String]("piece") -> r.getAs[Long]("cnt_em"))
      .toMap
    val v2 = v1.flatMap { p =>
      val u = used1.getOrElse(p.piece, 0L)
      // single char = one CODE POINT (what the engines' substr/length
      // count), not one UTF-16 unit
      val isChar = p.piece.codePointCount(0, p.piece.length) == 1
      if (u > 0L || isChar) {
        val c = if (u > 0L) u else 1L
        Some(UnigramPiece(p.piece, c, fixLogScore(c)))
      } else None
    }
    docs.sparkSession.createDataFrame(v2)
      .select(col("piece"), col("cnt").as("cnt_r1"),
        col("s").as("score_r2"))
      .join(unigramUsage(docs, v2, maxPieceLen, textCol),
        Seq("piece"), "left")
      .select(col("piece"), col("cnt_r1"), col("score_r2"),
        coalesce(col("cnt_em"), lit(0L)).as("cnt_r2"))
  }

  /** Per-document unigram encode: word/piece counts and the in-order
    * token-stream fingerprint — the same broadcast-join +
    * order-exact-fingerprint shape as [[bpeEncode]]; a word the DP
    * cannot cover (impossible in-corpus: the vocab holds every
    * character) tokenizes as itself. */
  def unigramTokenEncode(docs: DataFrame, vocabSize: Int = 200,
      maxPieceLen: Int = 4, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    unigramEncodeBody(docs,
      unigramSegmentedWords(docs, vocabSize, maxPieceLen, textCol),
      textCol, idCol)

  /** The encode body against a pre-segmented `(w, toks)` frame —
    * shared by [[unigramTokenEncode]] (vocab built in-query) and the
    * stored-vocabulary serving path. */
  private[graft] def unigramEncodeBody(docs: DataFrame,
      seg: DataFrame, textCol: String, idCol: String): DataFrame = {
    docs
      .select(col(idCol), posexplode(TextAnalysis.words(col(textCol)))
        .as(Seq("pos", "w")))
      .filter(col("w") =!= "")
      .join(broadcast(seg.select(col("w"), col("toks"))), Seq("w"),
        "left")
      .withColumn("toks", coalesce(col("toks"), array(col("w"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(size(col("toks"))).as("n_pieces"),
        md5(concat_ws(" ", flatten(transform(
          sort_array(collect_list(struct(col("pos"), col("toks")))),
          x => x.getField("toks"))))).as("token_fp"))
  }

  /** Stratified sample with EXACT largest-remainder allocation: the
    * eval-set construction rule — `total` documents split across the
    * strata PROPORTIONALLY (quota_g = ⌊total·n_g/N⌋, the leftover
    * `total − Σ⌊·⌋` seats going to the largest remainders, ties to the
    * lower stratum name — every step integer, every engine identical),
    * each stratum filled by its md5-lowest documents (seed-0 hash of
    * the id — deterministic, replayable, stable under corpus growth
    * elsewhere). Unlike [[temperatureSample]] / [[mixtureSample]]
    * (RATE-based: output size is binomial around the target), the
    * allocation here is EXACT — the sample has precisely `total` rows
    * whenever every stratum can fill its quota (proportional quotas
    * always can: ⌊total·n_g/N⌋ + 1 ≤ n_g for total < N).
    *
    * Scale shape: one count aggregate (strata-sized), driver-free
    * quota arithmetic as a broadcast join, one per-stratum
    * WindowGroupLimit rank cut — no global sort, no collect. */
  def stratifiedSample(docs: DataFrame, total: Int,
      strataCol: String = "lang", idCol: String = "doc_id"): DataFrame = {
    require(total > 0, s"total=$total")
    val counts = docs.groupBy(col(strataCol).as("g"))
      .agg(count(lit(1)).as("ng"))
    val n = Window.partitionBy(lit(1))
    val quotas = counts
      .withColumn("nn", sum(col("ng")).over(n))
      .withColumn("base", expr(s"($total * ng) div nn"))
      .withColumn("rem", expr(s"($total * ng) % nn"))
      .withColumn("deficit", lit(total) - sum(col("base")).over(n))
      .withColumn("rr", row_number().over(
        Window.partitionBy(lit(1))
          .orderBy(col("rem").desc, col("g"))))
      .withColumn("quota",
        col("base") + when(col("rr") <= col("deficit"), 1L)
          .otherwise(0L))
      .select(col("g").as(strataCol), col("quota"))
    docs
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(strataCol))
          .orderBy(Dedup.seededHash(col(idCol).cast("string"), 0),
            col(idCol))))
      .join(broadcast(quotas), Seq(strataCol))
      .filter(col("rk") <= col("quota"))
      .select(col(idCol), col(strataCol), col("rk"), col("quota"))
  }

  /** Sketch-based corpus profile — the 100 TB shape of [[sourceStats]].
    *
    * The exact per-source stats cost a distinct-level shuffle plus a
    * window; at petabyte scale profiling runs on SKETCHES instead:
    * HLL++ (`approx_count_distinct`) for "how many unique documents
    * does this source hold" (the cheap pre-dedup cardinality probe —
    * estimated dup ratio for free), and GK quantile summaries
    * (`percentile_approx`) for the token-length distribution. Both are
    * mergeable one-pass aggregates: every partition builds a bounded
    * sketch, partial aggregation merges them map-side, and the final
    * merge is order-independent (HLL registers union exactly —
    * ExtSpec pins repartition-invariance), so the plan is ONE
    * map-side-combining shuffle on the group key, no window, no
    * distinct-level blowup. Sketch outputs have no cross-engine
    * oracle (different engines, different register layouts), so this
    * op is spec-bounded instead: estimates within rsd-derived bounds
    * of the exact answers on the real corpus. */
  def sketchProfile(docs: DataFrame, rsd: Double = 0.02,
      accuracy: Int = 10000): DataFrame = {
    val toks = TextAnalysis.tokenCount(col("text")).cast("long")
    docs
      .select(col("source"),
        md5(lower(trim(col("text")))).as("fp"), toks.as("toks"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        approx_count_distinct(col("fp"), rsd).as("approx_unique"),
        percentile_approx(col("toks"), lit(0.5), lit(accuracy))
          .as("approx_p50_tokens"),
        percentile_approx(col("toks"), lit(0.9), lit(accuracy))
          .as("approx_p90_tokens"))
  }

  /** [[sketchProfile]] with its error contract checked IN the result —
    * the auditable shape. Sketch registers are engine-specific, so the
    * estimates themselves can never hash-match an external oracle; what
    * CAN is everything this projects: the exact answers (count,
    * distinct count, discrete nearest-rank percentiles — the
    * [[sourceStats]] percentile definition, exact in every engine) and
    * one boolean per estimate saying it landed within its published
    * error bound. An oracle replays the exact columns and expects every
    * boolean TRUE, so a broken sketch (or a broken bound) flips a
    * hashed value instead of hiding behind a rows-only check.
    *
    * Bounds checked: HLL++ estimate within 5·rsd relative (+10
    * absolute: tiny groups, where HLL is exact-by-sparse-mode, would
    * otherwise fail on integer granularity); each GK percentile value
    * must sit within rank tolerance n/accuracy (+2 slack for the
    * ceil-vs-interpolated rank definition) of its target rank —
    * checked by COUNTING the rows at or below the estimate, the
    * definition of rank error, not by comparing values.
    *
    * Scale: this is the AUDIT query — the exact verifier pays the
    * distinct-level shuffle and the histogram window that
    * [[sketchProfile]] exists to avoid, so at 100 TB it runs on a
    * sampled source subset (or per-partition slice), while production
    * profiling runs the sketch alone. The sketch side stays one
    * map-side-combining aggregate; the rank check joins the
    * GROUP-level estimates back broadcast (sources are a dimension). */
  def sketchProfileValidated(docs: DataFrame, rsd: Double = 0.02,
      accuracy: Int = 10000): DataFrame = {
    val base = CacheRegistry.tracked(docs.select(col("source"),
      md5(lower(trim(col("text")))).as("fp"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("toks")))
    // cached: both the rank-check join and the final projection read
    // this one-row-per-source frame — uncached, the HLL/GK aggregation
    // over the corpus runs twice
    val sketch = CacheRegistry.tracked(base.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      approx_count_distinct(col("fp"), rsd).as("approx_unique"),
      percentile_approx(col("toks"), lit(0.5), lit(accuracy)).as("ap50"),
      percentile_approx(col("toks"), lit(0.9), lit(accuracy)).as("ap90")))
    val exactU = base.groupBy(col("source"))
      .agg(countDistinct(col("fp")).as("exact_unique"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("toks"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
    val pct = base.groupBy(col("source"), col("toks"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .groupBy(col("source")).agg(
        min(when(col("cum") >= expr("(n + 1) DIV 2"), col("toks")))
          .as("p50_tokens"),
        min(when(col("cum") >= expr("(n * 9 + 9) DIV 10"), col("toks")))
          .as("p90_tokens"))
    val ranks = base
      .join(broadcast(sketch.select(col("source"), col("ap50"),
        col("ap90"))), Seq("source"))
      .groupBy(col("source")).agg(
        sum(when(col("toks") <= col("ap50"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("toks") < col("ap50"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("toks") <= col("ap90"), 1L).otherwise(0L)).as("le90"),
        sum(when(col("toks") < col("ap90"), 1L).otherwise(0L)).as("lt90"))
    val tol = expr(s"n_docs DIV $accuracy") + lit(2L)
    val target50 = expr("(n_docs + 1) DIV 2")
    val target90 = expr("(n_docs * 9 + 9) DIV 10")
    sketch.join(exactU, Seq("source")).join(pct, Seq("source"))
      .join(ranks, Seq("source"))
      .select(col("source"), col("n_docs"), col("exact_unique"),
        col("p50_tokens"), col("p90_tokens"),
        (abs(col("approx_unique") - col("exact_unique")) <=
          col("exact_unique") * (5 * rsd) + lit(10.0))
          .as("unique_within_rsd"),
        (col("le50") >= target50 - tol && col("lt50") <= target50 + tol)
          .as("p50_within_rank_tol"),
        (col("le90") >= target90 - tol && col("lt90") <= target90 + tol)
          .as("p90_within_rank_tol"))
  }

  /** Per-(source, part) MERGEABLE profile state: a DataSketches HLL
    * sketch of the doc fingerprints plus the part's doc count — the
    * row an incremental pipeline PERSISTS per ingested batch (binary
    * sketch column; parquet round-trips it — ExtSpec pins the
    * store/reload/merge cycle). `approx_count_distinct`'s HLL++ lives
    * only inside one aggregation; these sketches are values, so
    * profile state composes across batches without ever re-reading
    * old data. */
  def sketchState(docs: DataFrame, partCol: Column): DataFrame =
    docs
      .select(col("source"), partCol.as("part"),
        md5(lower(trim(col("text")))).as("fp"))
      .groupBy(col("source"), col("part"))
      .agg(hll_sketch_agg(col("fp")).as("sketch"),
        count(lit(1)).as("n_docs"))

  /** Merge a set of [[sketchState]] rows down to one profile row per
    * source: sketch union + count sum — the read side of the
    * incremental profile (and of a 1000-executor tree-merge: unions
    * are associative and commutative). */
  def mergeSketchStates(states: DataFrame): DataFrame =
    states.groupBy(col("source"))
      .agg(hll_union_agg(col("sketch")).as("sketch"),
        sum(col("n_docs")).as("n_docs"))

  /** SELF-VALIDATING incremental-profile audit: split the corpus into
    * `parts` deterministic batches, sketch each independently, MERGE,
    * and check — inside the hashed result — that (1) the merged
    * estimate is IDENTICAL to a single whole-corpus sketch (HLL union
    * is lossless: per-bucket max over the same value set) and (2) the
    * estimate sits within a generous bound of the exact distinct
    * count (lgK=12 ⇒ rsd≈0.8%; bound 5% + 10 absolute for tiny
    * sparse-mode groups). The sketch bytes stay un-hashed (engine-
    * specific); the booleans and exact columns replay in any SQL
    * engine. At 100 TB only the exact verifier is corpus-expensive —
    * production keeps the sketch state alone. */
  def sketchMergeProfile(docs: DataFrame, parts: Int = 4): DataFrame = {
    val base = CacheRegistry.tracked(docs.select(col("source"),
      md5(lower(trim(col("text")))).as("fp")))
    val merged = mergeSketchStates(
      sketchState(docs, pmod(col("doc_id"), lit(parts))))
      .select(col("source"), hll_sketch_estimate(col("sketch"))
        .as("est_merged"), col("n_docs"))
    val whole = base.groupBy(col("source"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("fp")))
        .as("est_whole"),
        countDistinct(col("fp")).as("exact_unique"))
    merged.join(whole, Seq("source"))
      .select(col("source"), col("n_docs"), col("exact_unique"),
        (col("est_merged") === col("est_whole"))
          .as("merge_lossless"),
        (abs(col("est_merged") - col("exact_unique")) <=
          col("exact_unique") * 0.05 + lit(10.0))
          .as("within_bound"))
  }

  /** Corpus-wide heavy hitters (frequent tokens) from ONE bounded
    * frequency sketch — the third sketch family of the profile suite
    * (HLL answers "how many distinct", GK "how are lengths
    * distributed", this one "WHICH items dominate"). The aggregate
    * ([[graft.plans.FreqItemsAgg]]) folds each partition's token
    * arrays into a ≤ `maxMapSize`-counter Misra-Gries sketch and
    * merges sketches map-side, so the exchange carries sketch BYTES,
    * never token rows — "top domains/tokens over 100 TB" without the
    * distinct-token shuffle the exact `groupBy` pays. Result: one row
    * per candidate with (estimate, lower, upper) such that the true
    * count always lies in [lower, upper] and no item with true count
    * > 3.5·n/maxMapSize is missing. */
  def heavyHitters(docs: DataFrame, maxMapSize: Int = 1024,
      textCol: String = "text"): DataFrame =
    docs
      .select(graft.plans.SketchFunctions
        .freqItemsAgg(TextAnalysis.words(col(textCol)), maxMapSize)
        .as("cand"))
      .select(explode(col("cand")).as("c"))
      .select(col("c.item").as("item"), col("c.est").as("est"),
        col("c.lb").as("lb"), col("c.ub").as("ub"))

  /** [[heavyHitters]] with its error contract checked IN the hashed
    * result (the `sketchProfileValidated` audit shape): the row set is
    * the EXACT heavy hitters — tokens with exact count strictly above
    * n/`phi` of the total token stream, replayable in any engine — and
    * per row two booleans the oracle expects TRUE: `reported` (the
    * sketch's no-false-negatives guarantee: every item above the
    * 3.5·n/maxMapSize error line is a candidate — `maxMapSize` must
    * dominate 3.5·phi, enforced here with 2× margin) and `bounds_hold`
    * (exact count within the candidate's [lb, ub]). Sketch estimates
    * stay un-hashed (merge-order-dependent); the exact counts and the
    * booleans hash. At 100 TB only this audit pays the exact
    * token-level shuffle — production runs the sketch alone. */
  def heavyHittersValidated(docs: DataFrame, maxMapSize: Int = 1024,
      phi: Int = 64): DataFrame = {
    require(maxMapSize >= 7 * phi,
      s"maxMapSize=$maxMapSize too small for phi=$phi: the " +
        "no-false-negatives guarantee needs 3.5*phi < maxMapSize " +
        "(required here with 2x margin)")
    validateHeavyCandidates(docs, heavyHitters(docs, maxMapSize), phi)
  }

  /** The shared audit tail of the frequency-sketch queries: exact heavy
    * hitters (count·phi > n, replayable in SQL) joined against a
    * candidate list carrying (est, lb, ub), projecting the two contract
    * booleans the oracle expects TRUE. */
  /** ONE definition of "heavy" for every frequency audit (Misra-Gries
    * AND Count-Min): tokens with exact count strictly above n/`phi`,
    * carrying the stream total. The tf frame is cached — the total
    * and the threshold filter both read it; uncached, the corpus-wide
    * explode+agg would run twice. */
  private[operators] def exactHeavyHitters(docs: DataFrame, phi: Int)
      : DataFrame = {
    val tf = CacheRegistry.tracked(docs
      .select(explode(TextAnalysis.words(col("text"))).as("item"))
      .filter(col("item") =!= "")
      .groupBy(col("item")).agg(count(lit(1)).as("exact_cnt")))
    val total = tf.agg(sum(col("exact_cnt")).as("n_tokens"))
    tf.crossJoin(broadcast(total))
      .filter(col("exact_cnt") * phi > col("n_tokens"))
  }

  private def validateHeavyCandidates(docs: DataFrame, cand: DataFrame,
      phi: Int): DataFrame = {
    exactHeavyHitters(docs, phi)
      .join(broadcast(cand), Seq("item"), "left")
      .select(col("item"), col("exact_cnt"), col("n_tokens"),
        col("est").isNotNull.as("reported"),
        coalesce(col("lb") <= col("exact_cnt") &&
          col("exact_cnt") <= col("ub"), lit(false)).as("bounds_hold"))
  }

  /** Per-batch MERGEABLE frequency state: one serialized Misra-Gries
    * sketch (binary) plus the batch's token count per `partCol` group —
    * the row an incremental pipeline PERSISTS per ingested batch, the
    * frequency sibling of [[sketchState]]'s HLL rows. Parquet
    * round-trips the bytes (ExtSpec pins store/reload/merge). */
  def freqState(docs: DataFrame, partCol: Column,
      maxMapSize: Int = 1024): DataFrame =
    docs
      .select(partCol.as("part"),
        TextAnalysis.words(col("text")).as("ws"))
      .groupBy(col("part"))
      .agg(graft.plans.SketchFunctions
          .freqSketchAgg(col("ws"), maxMapSize).as("sketch"),
        sum(size(array_remove(col("ws"), ""))).as("n_tokens"))

  /** Fold stored [[freqState]] rows into one merged candidate list:
    * sketch union is associative and commutative (the 1000-executor
    * tree-merge shape), and the union KEEPS both published contracts —
    * no false negatives above the combined error line, true counts
    * inside each candidate's [lb, ub]. Old batches are never re-read. */
  def mergeFreqStates(states: DataFrame,
      maxMapSize: Int = 1024): DataFrame =
    states.agg(graft.plans.SketchFunctions
        .freqUnionAgg(col("sketch"), maxMapSize).as("cand"),
      sum(col("n_tokens")).as("n_tokens"))

  /** SELF-VALIDATING incremental heavy-hitters audit: split the corpus
    * into `parts` deterministic batches, sketch each INDEPENDENTLY
    * ([[freqState]]), merge the stored states ([[mergeFreqStates]]) and
    * check — inside the hashed result — that the merged candidate list
    * still honors the sketch contract against the exact heavy hitters
    * (same row set and booleans as [[heavyHittersValidated]], so a
    * merge that lost candidacy or widened bounds past truth flips a
    * hashed value). Unlike HLL union, a frequency-sketch merge is NOT
    * register-lossless — candidates may differ from the whole-corpus
    * sketch — but the error CONTRACT survives any merge order, and that
    * contract is what this hashes. */
  def freqMergeValidated(docs: DataFrame, parts: Int = 4,
      maxMapSize: Int = 1024, phi: Int = 64): DataFrame =
    freqStatesValidated(docs,
      freqState(docs, pmod(col("doc_id"), lit(parts)), maxMapSize),
      maxMapSize, phi)

  /** The [[freqMergeValidated]] audit against an EXTERNAL set of
    * stored state rows (any frame with a `sketch` binary column and
    * `n_tokens`) — the form the STREAMING maintenance path uses: the
    * stream appends one sketch row per trigger, and this validates
    * the merged store against the exact heavy hitters of `docs` (the
    * same rows + booleans contract, so stream-maintained state that
    * lost candidacy or widened bounds past truth flips a hashed
    * value). */
  def freqStatesValidated(docs: DataFrame, states: DataFrame,
      maxMapSize: Int = 1024, phi: Int = 64): DataFrame = {
    require(maxMapSize >= 7 * phi,
      s"maxMapSize=$maxMapSize too small for phi=$phi")
    val merged = mergeFreqStates(states, maxMapSize)
    val cand = merged.select(explode(col("cand")).as("c"))
      .select(col("c.item").as("item"), col("c.est").as("est"),
        col("c.lb").as("lb"), col("c.ub").as("ub"))
    validateHeavyCandidates(docs, cand, phi)
  }

  /** GROUPED heavy hitters — one bounded frequency sketch PER SOURCE
    * (the "top tokens per domain / top domains per language" shape),
    * self-validating like [[heavyHittersValidated]] but with the
    * threshold applied against each source's own token mass. The
    * sketch side is one ObjectHashAggregate keyed on source: P
    * partitions × S sources bounded sketches merge map-side, so the
    * exchange carries S sketches per partition at most — still no
    * token-level shuffle. Rows: (source, item) pairs where the item
    * holds > 1/phi of ITS source's tokens; booleans pin the per-group
    * sketch contract. */
  def heavyHittersBySourceValidated(docs: DataFrame,
      maxMapSize: Int = 1024, phi: Int = 64): DataFrame = {
    require(maxMapSize >= 7 * phi,
      s"maxMapSize=$maxMapSize too small for phi=$phi")
    val tf = CacheRegistry.tracked(docs
      .select(col("source"),
        explode(TextAnalysis.words(col("text"))).as("item"))
      .filter(col("item") =!= "")
      .groupBy(col("source"), col("item"))
      .agg(count(lit(1)).as("exact_cnt")))
    val totals = tf.groupBy(col("source"))
      .agg(sum(col("exact_cnt")).as("n_tokens"))
    val cand = docs
      .groupBy(col("source"))
      .agg(graft.plans.SketchFunctions
        .freqItemsAgg(TextAnalysis.words(col("text")), maxMapSize)
        .as("cand"))
      .select(col("source"), explode(col("cand")).as("c"))
      .select(col("source"), col("c.item").as("item"),
        col("c.est").as("est"), col("c.lb").as("lb"),
        col("c.ub").as("ub"))
    tf.join(totals, Seq("source"))
      .filter(col("exact_cnt") * phi > col("n_tokens"))
      .join(broadcast(cand), Seq("source", "item"), "left")
      .select(col("source"), col("item"), col("exact_cnt"),
        col("n_tokens"),
        col("est").isNotNull.as("reported"),
        coalesce(col("lb") <= col("exact_cnt") &&
          col("exact_cnt") <= col("ub"), lit(false)).as("bounds_hold"))
  }
}
