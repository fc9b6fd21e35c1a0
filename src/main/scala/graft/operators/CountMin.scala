package graft.operators

import graft.plans.{CmsBuffer, CmsFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch operators (see [[graft.plans.CmsSketch]] for the
  * family rationale): point-frequency estimation over every item, a
  * persistable mergeable batch state, and the inner-product join-size
  * estimate a cost-based planner wants. Unlike the Misra-Gries /
  * Theta audits, the CMS audits hash the ESTIMATES, not just contract
  * booleans — the md5 bucket hash replays in any engine, so the
  * DuckDB oracle rebuilds the full counter matrix with one GROUP BY
  * and recomputes every min-of-rows estimate bit-for-bit.
  *
  * Scale shape shared by all three audits: the sketch side is one
  * ObjectHashAggregate whose exchange carries depth·width longs per
  * partition (24 KB at 3×1024) — never an item-level shuffle; the
  * EXACT side (heavy-hitter counts, per-key count squares) pays a
  * keyed shuffle and exists only to validate — production runs the
  * sketch alone. Driver-side sketch handling is bounded metadata,
  * the [[SketchAlgebra]] pattern. */
object CountMin {

  /** Per-batch mergeable CMS state: one serialized sketch plus the
    * batch token count per `partCol` group — the row an incremental
    * pipeline persists per ingested batch ([[CorpusStats.freqState]]'s
    * shape; merge is LOSSLESS here, counters add element-wise). */
  def cmsState(docs: DataFrame, partCol: Column, depth: Int,
      width: Int, textCol: String = "text"): DataFrame =
    docs
      .select(partCol.as("part"),
        TextAnalysis.words(col(textCol)).as("ws"))
      .groupBy(col("part"))
      .agg(CmsFunctions.cmsTokensAgg(col("ws"), depth, width)
          .as("sketch"),
        sum(size(array_remove(col("ws"), ""))).as("n_tokens"))

  /** Fold stored [[cmsState]] rows into ONE driver-held sketch —
    * bounded metadata (4 + 4 + 8 + 8·depth·width bytes), never a data
    * collect. Empty input yields the zero sketch. */
  def mergedSketch(states: DataFrame, depth: Int, width: Int)
      : CmsBuffer = {
    val rows = states
      .agg(CmsFunctions.cmsUnionAgg(col("sketch"), depth, width).as("u"))
      .collect() // one serialized sketch: bounded metadata
    if (rows.isEmpty || rows.head.isNullAt(0)) new CmsBuffer(depth, width)
    else graft.plans.CmsBuffer.deserialize(rows.head.getAs[Array[Byte]]("u"))
  }

  /** The exact heavy line — [[CorpusStats.exactHeavyHitters]], the
    * ONE definition shared with the Misra-Gries audits so the two
    * sketch families can never disagree on what "heavy" means. */
  private def heavyExact(docs: DataFrame, phi: Int): DataFrame =
    CorpusStats.exactHeavyHitters(docs, phi)

  /** SELF-VALIDATING point-estimate audit: rows are the exact heavy
    * hitters (replayable in SQL), each carrying the sketch's point
    * estimate — itself replayable, the md5 matrix — plus the
    * deterministic `no_underest` guarantee (counters only add, so
    * est ≥ exact always; a hash flip here means the sketch lost
    * mass). The estimate lookup runs DISTRIBUTED via the codegen'd
    * [[graft.plans.CmsEstimate]] against the driver-held sketch — no
    * join, no item collect. */
  def cmsPointValidated(docs: DataFrame, depth: Int = 3,
      width: Int = 1024, phi: Int = 64): DataFrame = {
    val sketch = mergedSketch(
      cmsState(docs, lit(0), depth, width), depth, width)
    heavyExact(docs, phi)
      .select(col("item"), col("exact_cnt"), col("n_tokens"),
        CmsFunctions.cmsEstimate(col("item"), sketch).as("est"))
      .withColumn("no_underest", col("est") >= col("exact_cnt"))
  }

  /** SELF-VALIDATING merge audit: split the corpus into `parts`
    * deterministic batches, sketch each independently, union the
    * stored states — and hash that the merged matrix EQUALS the
    * single-pass matrix (`merge_lossless`; CMS merge is exact, the
    * property that makes per-batch states safe to persist), alongside
    * the same replayable estimates as [[cmsPointValidated]]. */
  def cmsMergeValidated(docs: DataFrame, parts: Int = 4,
      depth: Int = 3, width: Int = 1024, phi: Int = 64): DataFrame = {
    val merged = mergedSketch(
      cmsState(docs, pmod(col("doc_id"), lit(parts)), depth, width),
      depth, width)
    val single = mergedSketch(
      cmsState(docs, lit(0), depth, width), depth, width)
    val lossless = java.util.Arrays.equals(merged.counters,
      single.counters) && merged.n == single.n
    heavyExact(docs, phi)
      .select(col("item"), col("exact_cnt"), col("n_tokens"),
        CmsFunctions.cmsEstimate(col("item"), merged).as("est"),
        lit(parts).as("n_parts"), lit(lossless).as("merge_lossless"))
      .withColumn("no_underest", col("est") >= col("exact_cnt"))
  }

  /** Element-wise counter subtraction — defined because CMS is a
    * LINEAR sketch (each counter is a sum over stream items), so
    * removing a sub-stream's own sketch yields exactly the sketch of
    * the remaining stream. */
  private def subtract(a: CmsBuffer, b: CmsBuffer): CmsBuffer = {
    require(a.depth == b.depth && a.width == b.width,
      s"CMS shape mismatch: ${a.depth}x${a.width} vs " +
        s"${b.depth}x${b.width}")
    val out = new CmsBuffer(a.depth, a.width)
    var i = 0
    while (i < out.counters.length) {
      out.counters(i) = a.counters(i) - b.counters(i)
      i += 1
    }
    out.n = a.n - b.n
    out
  }

  /** TAKEDOWN on sketch state: subtract the REMOVED docs' sketch from
    * the corpus sketch. CMS is linear, so the retracted matrix equals
    * the filtered-corpus rebuild BIT-FOR-BIT (`retract_exact` carries
    * the byte-compare — the property Misra-Gries lacks: MG's error
    * admissions are stream-order state, not sums, so ITS takedown is
    * a rebuild). The audit rows are the FILTERED corpus's exact heavy
    * hitters with the retracted sketch's replayable estimates and the
    * usual no-underestimate guarantee. The 100 TB shape: a takedown
    * touches one 24 KB sketch row per maintained window — never the
    * token stream — after sketching just the removed docs. */
  /** The post-takedown sketch itself: corpus sketch minus the removed
    * docs' sketch — what a maintained frequency state commits after a
    * takedown (the serving artifact [[cmsRetractValidated]] audits). */
  def retractedSketch(docs: DataFrame, removed: Column, depth: Int,
      width: Int): CmsBuffer =
    subtract(
      mergedSketch(cmsState(docs, lit(0), depth, width), depth, width),
      mergedSketch(cmsState(docs.filter(removed), lit(0), depth,
        width), depth, width))

  def cmsRetractValidated(docs: DataFrame, removed: Column,
      depth: Int = 3, width: Int = 1024, phi: Int = 64): DataFrame = {
    val retracted = retractedSketch(docs, removed, depth, width)
    val rebuilt = mergedSketch(
      cmsState(docs.filter(!removed), lit(0), depth, width),
      depth, width)
    val exact = java.util.Arrays.equals(retracted.counters,
      rebuilt.counters) && retracted.n == rebuilt.n
    heavyExact(docs.filter(!removed), phi)
      .select(col("item"), col("exact_cnt"), col("n_tokens"),
        CmsFunctions.cmsEstimate(col("item"), retracted).as("est"),
        lit(exact).as("retract_exact"))
      .withColumn("no_underest", col("est") >= col("exact_cnt"))
  }

  /** SKETCH-SERVED corpus drift: the `k` tokens whose RATE (ppm of the
    * stream) moved most between two corpus halves, each row carrying
    * the exact counts (replayable), the exact integer rate difference
    * that RANKS it, and both sketches' point estimates — themselves
    * replayable (the md5 matrices), plus the deterministic
    * no-underestimate booleans. The 100 TB shape: production keeps one
    * 24 KB CMS per day and diffs ESTIMATES to flag drift candidates
    * (two sketch reads, no token shuffle); this audit re-ranks by the
    * exact rates only to pin the sketch columns against truth. The
    * rate is `10⁶·cnt div N` per side — integer, total tiebreak
    * (|Δ| desc, item). */
  def cmsDriftValidated(docs: DataFrame, depth: Int = 3,
      width: Int = 1024, k: Int = 40): DataFrame = {
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    val skA = mergedSketch(cmsState(a, lit(0), depth, width), depth,
      width)
    val skB = mergedSketch(cmsState(b, lit(0), depth, width), depth,
      width)
    def tf(side: DataFrame, cnt: String) = side
      .select(explode(TextAnalysis.words(col("text"))).as("item"))
      .filter(col("item") =!= "")
      .groupBy(col("item")).agg(count(lit(1)).as(cnt))
    val tfA = CacheRegistry.tracked(tf(a, "cnt_a"))
    val tfB = CacheRegistry.tracked(tf(b, "cnt_b"))
    val totals = tfA.agg(sum(col("cnt_a")).as("na"))
      .crossJoin(tfB.agg(sum(col("cnt_b")).as("nb")))
    tfA.join(tfB, Seq("item"), "full_outer")
      .na.fill(0L, Seq("cnt_a", "cnt_b"))
      .crossJoin(broadcast(totals))
      .withColumn("rate_diff_ppm",
        expr("abs((1000000 * cnt_a) div na - (1000000 * cnt_b) div nb)"))
      .orderBy(col("rate_diff_ppm").desc, col("item"))
      .limit(k)
      .select(col("item"), col("cnt_a"), col("cnt_b"),
        col("rate_diff_ppm"),
        CmsFunctions.cmsEstimate(col("item"), skA).as("est_a"),
        CmsFunctions.cmsEstimate(col("item"), skB).as("est_b"))
      .withColumn("no_underest",
        col("est_a") >= col("cnt_a") && col("est_b") >= col("cnt_b"))
  }

  /** One advisor row for an equi-join: the EXACT join cardinality
    * Σ_k cnt_l(k)·cnt_r(k) (the validation side — a keyed shuffle)
    * beside the CMS inner-product ESTIMATE from two 24 KB sketches
    * (the production side — scan-speed, no shuffle), with the
    * deterministic est ≥ exact guarantee. */
  def joinSizeProfile(name: String, left: DataFrame, lKey: String,
      right: DataFrame, rKey: String, depth: Int = 3,
      width: Int = 1024): DataFrame = {
    // NULL keys match nothing in the equi-join being sized, so they
    // enter neither side's counts nor sketch (the aggregate skips
    // nulls; the exact side filters so its per-key frame replays)
    val l = left.filter(col(lKey).isNotNull)
    val r = right.filter(col(rKey).isNotNull)
    def sketchOf(df: DataFrame, key: String) =
      graft.plans.CmsBuffer.deserialize(df
        .agg(CmsFunctions.cmsSketchAgg(col(key).cast("string"),
          depth, width).as("sk"))
        .collect().head.getAs[Array[Byte]]("sk")) // bounded metadata
    val est = sketchOf(l, lKey).innerProduct(sketchOf(r, rKey))
    val lc = l.groupBy(col(lKey).cast("string").as("item"))
      .agg(count(lit(1)).as("cl"))
    val rc = r.groupBy(col(rKey).cast("string").as("item"))
      .agg(count(lit(1)).as("cr"))
    lc.join(rc, Seq("item"))
      .agg(coalesce(sum(col("cl") * col("cr")), lit(0L))
        .as("exact_rows"))
      .select(lit(name).as("join_name"), col("exact_rows"),
        lit(est).as("est_rows"),
        (lit(est) >= col("exact_rows")).as("no_underest"))
  }

  /** The advisor composed: profile several candidate joins, flag the
    * one(s) a cost-based planner would pick by SKETCH estimate alone
    * (`chosen` = minimum estimated cardinality — at planning time the
    * exact sizes don't exist; the audit carries them to show the
    * estimate-driven choice against truth). */
  def joinSizeAdvisor(profiles: Seq[DataFrame]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    profiles.reduce(_ unionByName _)
      .withColumn("chosen",
        col("est_rows") === min(col("est_rows")).over(
          Window.partitionBy(lit(1))))
  }

  /** SELF-JOIN SIZE (F2 moment) audit over an integer key column: one
    * row with the exact Σ count(k)² (the size of the key-equi
    * self-join — THE cardinality a planner needs before picking a
    * strategy for a skewed join) and the CMS inner-product estimate,
    * min over rows of the counter dot product — deterministic
    * `no_underest` (cross-collision terms only add). Both replayable:
    * the oracle rebuilds the matrix and takes the same min-of-dots. */
  def cmsSelfJoinProfile(events: DataFrame, depth: Int = 3,
      width: Int = 1024, keyCol: String = "user_id"): DataFrame = {
    // NULL keys join NOTHING in an equi-join (NULL = NULL is not a
    // match), so they belong in neither the exact Σcnt² nor the
    // sketch — the aggregate skips nulls on its own; the exact side
    // must skip them explicitly or a null group would inflate it
    // past the estimate and flip the deterministic guarantee
    val rows = events.filter(col(keyCol).isNotNull)
    val sketch = graft.plans.CmsBuffer.deserialize(
      rows
        .agg(CmsFunctions.cmsSketchAgg(col(keyCol).cast("string"),
          depth, width).as("sk"))
        .collect().head.getAs[Array[Byte]]("sk")) // bounded metadata
    val est = sketch.innerProduct(sketch)
    rows
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_keys"),
        coalesce(sum(col("cnt") * col("cnt")), lit(0L))
          .as("exact_self_join"))
      .select(col("n_rows"), col("n_keys"), col("exact_self_join"),
        lit(est).as("est_self_join"),
        (lit(est) >= col("exact_self_join")).as("no_underest"))
  }
}
