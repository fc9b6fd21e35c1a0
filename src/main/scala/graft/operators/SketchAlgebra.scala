package graft.operators

import graft.plans.ThetaFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Set algebra over Theta sketches: audience overlap between two key
  * sets defined by row predicates — the "users who did A vs users who
  * did B" question every analytics deployment asks, answered from two
  * bounded sketches instead of a distinct-key shuffle per audience.
  *
  * At 100 TB each audience's sketch is one scan-speed
  * ObjectHashAggregate (sketch bytes through the exchange), sketches
  * persist/merge like the suite's HLL and frequency states, and
  * intersection/difference estimates come from the retained-hash
  * overlap with published bounds — HLL offers no intersection at all
  * (inclusion-exclusion over HLL estimates compounds error without a
  * bound). The driver query is SELF-VALIDATING in the suite's sketch
  * pattern: the hashed row carries the EXACT audience sizes (replayed
  * by the oracle) plus one boolean per sketch estimate asserting it
  * landed inside its published bounds; the estimates themselves stay
  * un-hashed (retained-hash values have no SQL replay).
  */
object SketchAlgebra {

  /** One-row overlap audit for the audiences `inA` / `inB` (row
    * predicates over `events`): exact sizes of A, B, A∩B, A∪B plus
    * in-bounds booleans for the four sketch estimates at `nSd`
    * standard deviations. `nomEntries` sized so the driver SFs cross
    * from exact mode (θ = 1, bounds collapse to the exact value) into
    * genuine estimation. Sketch combination happens driver-side over
    * two compact sketches — bounded metadata, not a data collect. */
  def audienceOverlap(events: DataFrame, labelA: String, labelB: String,
      inA: Column, inB: Column, keyCol: String = "user_id",
      nomEntries: Int = 256, nSd: Int = 3): DataFrame = {
    val rows = CacheRegistry.tracked(
      events.filter(inA).select(col(keyCol).as("k"), lit("a").as("side"))
        .unionByName(events.filter(inB)
          .select(col(keyCol).as("k"), lit("b").as("side"))))
    val skBySide = rows.groupBy(col("side"))
      .agg(ThetaFunctions.thetaSketchAgg(col("k"), nomEntries).as("sk"))
      .collect() // ≤ 2 compact sketches: bounded metadata
      .map(r => r.getAs[String]("side") -> r.getAs[Array[Byte]]("sk"))
      .toMap
    def side(s: String) = skBySide.get(s).map(ThetaFunctions.wrap)
      .getOrElse(ThetaFunctions.empty(nomEntries))
    val (ska, skb) = (side("a"), side("b"))
    val inter = ThetaFunctions.intersect(ska, skb)
    val uni = ThetaFunctions.union(ska, skb, nomEntries)
    def inBounds(exact: Column, sk: org.apache.datasketches.theta.Sketch) =
      exact >= lit(sk.getLowerBound(nSd)) &&
        exact <= lit(sk.getUpperBound(nSd))
    rows.groupBy(col("k"))
      .agg(max(when(col("side") === "a", 1).otherwise(0)).as("ina"),
        max(when(col("side") === "b", 1).otherwise(0)).as("inb"))
      .agg(coalesce(sum(col("ina")), lit(0L)).as("exact_a"),
        coalesce(sum(col("inb")), lit(0L)).as("exact_b"),
        coalesce(sum(col("ina") * col("inb")), lit(0L)).as("exact_inter"),
        count(lit(1)).as("exact_union")) // both-empty: 0s, not NULLs
      .select(lit(labelA).as("audience_a"), lit(labelB).as("audience_b"),
        col("exact_a"), col("exact_b"), col("exact_inter"),
        col("exact_union"),
        inBounds(col("exact_a"), ska).as("a_in_bounds"),
        inBounds(col("exact_b"), skb).as("b_in_bounds"),
        inBounds(col("exact_inter"), inter).as("inter_in_bounds"),
        inBounds(col("exact_union"), uni).as("union_in_bounds"))
  }

  /** Per-part Theta sketch state rows for `keyCol` — the persistable
    * incremental form: one binary sketch row per ingest batch (here:
    * per `pmod(key, parts)` slice), the same parquet-state pattern the
    * HLL and frequency sketches ride. */
  def thetaState(events: DataFrame, parts: Int,
      keyCol: String = "user_id", nomEntries: Int = 256): DataFrame =
    events.groupBy(pmod(col(keyCol), lit(parts)).as("part"))
      .agg(graft.plans.ThetaFunctions
        .thetaSketchAgg(col(keyCol), nomEntries).as("sk"),
        count(lit(1)).as("n_rows"))

  /** Self-validating merge audit in the `x_freq_merge` pattern: split
    * the keys into `parts` sketch-state rows, union them back, and
    * hash the contract that SURVIVES any merge order — the exact
    * distinct count (replayed by the oracle) sits inside the merged
    * sketch's `nSd` bounds. The merged estimate itself is a set
    * function of retained hashes but not contractually identical
    * across merge tree shapes, so it stays un-hashed. */
  def thetaMergeProfile(events: DataFrame, parts: Int = 4,
      keyCol: String = "user_id", nomEntries: Int = 256,
      nSd: Int = 3): DataFrame = {
    val merged = ThetaFunctions.wrap(
      thetaState(events, parts, keyCol, nomEntries)
        .agg(graft.plans.ThetaFunctions
          .thetaUnionAgg(col("sk"), nomEntries).as("u"))
        .collect().head.getAs[Array[Byte]]("u")) // one compact sketch
    events.agg(countDistinct(col(keyCol)).as("exact_keys"))
      .select(lit(parts).as("n_parts"), col("exact_keys"),
        (col("exact_keys") >= lit(merged.getLowerBound(nSd)) &&
          col("exact_keys") <= lit(merged.getUpperBound(nSd)))
          .as("merged_in_bounds"))
  }
}
