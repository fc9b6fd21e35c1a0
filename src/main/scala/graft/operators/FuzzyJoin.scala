package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) string join — the entity-resolution /
  * record-linkage primitive: all pairs of strings within Levenshtein
  * distance `maxDist`, WITHOUT the all-pairs cross join.
  *
  * Candidates come from the symmetric-delete neighborhood (the
  * SymSpell family): `lev(a, b) <= d` implies `a` and `b` share a
  * string reachable by deleting at most `d` characters from each —
  * a substitution resolves by deleting the mismatched position on
  * BOTH sides, an insert/delete by one deletion on the longer side,
  * so `d` edits never need more than `d` deletions per side. Each
  * string therefore publishes its O(L^d) deletion variants, pairs
  * meet by EQUI-join on a shared variant (the same banded shape as
  * every LSH path in this repo — shuffle on the variant key, never a
  * nested loop), and an exact `levenshtein` pass verifies the
  * survivors. The filter is exact-complete: no true pair can be
  * missed, which the all-pairs DuckDB oracle proves on every run.
  *
  * Scale shape: the join fans out O(n · L^d) variant rows of a
  * VOCABULARY-sized relation (distinct strings, not corpus rows) —
  * at 100 TB the corpus-sized work is only the distinct-extraction
  * aggregate feeding it. The variant generator runs as interpreted
  * higher-order functions, acceptable exactly because the relation
  * is vocabulary-sized; a corpus-sized caller would want a codegen'd
  * kernel (graft.plans.TextKernels is the template). */
object FuzzyJoin {

  /** All strings reachable from `s` by deleting up to `maxDist`
    * (1 or 2) characters, `s` itself included, de-duplicated. */
  def deletionVariants(s: Column, maxDist: Int): Column = {
    require(maxDist == 1 || maxDist == 2, s"maxDist 1 or 2, got $maxDist")
    def delOne(t: Column): Column =
      transform(sequence(lit(1), length(t)), i =>
        concat(t.substr(lit(1), i - 1),
          t.substr(i + 1, greatest(length(t) - i, lit(0)))))
    val d1 = delOne(s)
    val all =
      if (maxDist == 1) concat(array(s), d1)
      else concat(array(s), d1, flatten(transform(d1, delOne(_))))
    array_distinct(all)
  }

  /** Distinct unordered pairs (`s_a` < `s_b`) from `strings(sCol)`
    * within Levenshtein distance `maxDist`, with the exact distance.
    * One variant equi-join + one exact verify — never a cross join. */
  def editDistancePairs(strings: DataFrame, sCol: String,
      maxDist: Int): DataFrame = {
    // variants bind via withColumn BEFORE the re-aliasing projection:
    // aliasing sCol to "s" in the same select list would capture the
    // explode's sCol reference as a lateral column alias (Spark 4
    // implicit LCA resolution — rejected inside Generate)
    val v = strings
      .withColumn("__variant", explode(
        deletionVariants(col(sCol), maxDist)))
      .select(col(sCol).as("s"), col("__variant").as("v"))
    v.as("a").join(v.as("b"),
        col("a.v") === col("b.v") && col("a.s") < col("b.s"))
      .select(col("a.s").as("s_a"), col("b.s").as("s_b"))
      .distinct()
      .withColumn("dist",
        levenshtein(col("s_a"), col("s_b")).cast("bigint"))
      .filter(col("dist") <= maxDist)
  }

  /** Canonical-term map — the normalization step entity resolution
    * runs after matching: connected components over the edit-distance
    * pairs, every string mapped to its component's lexicographic
    * minimum (singletons map to themselves). Reuses the repo's
    * adaptive connected-components rung on dense surrogate ids
    * assigned in LEXICOGRAPHIC order (a vocabulary-sized
    * single-partition window — the corpus never rides it), so the
    * min-ID label the propagation computes IS the min-string
    * canonical. */
  def canonicalMap(strings: DataFrame, sCol: String,
      maxDist: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // tracked-cache the id map: it is referenced from five plan
    // branches (two edge joins, the CC vertices, two canonical
    // joins), and uncached each branch would re-run the whole
    // upstream corpus explode + distinct + window
    val ids = graft.operators.CacheRegistry.tracked(
      strings.select(col(sCol).as("s")).distinct()
        .withColumn("id",
          row_number().over(Window.orderBy(col("s"))).cast("long")))
    val pairs = editDistancePairs(strings, sCol, maxDist)
    val edges = pairs
      .join(ids.select(col("s").as("s_a"), col("id").as("id_a")), "s_a")
      .join(ids.select(col("s").as("s_b"), col("id").as("id_b")), "s_b")
      .select(col("id_a"), col("id_b"))
    Dedup.clusterAssignments(ids, edges, "id")
      .join(ids, "id")
      .join(ids.select(col("id").as("cluster_id"),
        col("s").as("canonical_s")), "cluster_id")
      .select(col("s"), col("canonical_s"))
  }
}
