package graft

import org.apache.spark.sql.DataFrame

/** The driver-shaped RE-ENTRY drill: every store-lifecycle query runs
  * TWICE in one JVM and must return byte-identical rows.
  *
  * Why this exists: the driver harness may retry or re-enter a query
  * within one session (a transient failure, a re-dump), and these are
  * exactly the queries with side effects — ensure-gated builds,
  * clone+sweep lifecycles, admission appends. The per-query oracles
  * check one execution against DuckDB; what they cannot check is that
  * a SECOND execution observes the same store state the first one
  * left (an append that re-admits, a sweep that re-subtracts, a
  * rebuild that renumbers versions would all pass a single-shot
  * oracle and red only on re-entry). This is also the one sequencing
  * class the takedown determinism spec (same bases, fresh clones)
  * does not cover — if a driver-side hash red ever reproduces, this
  * drill is the first place to look.
  *
  * sf0.001 keeps the double execution cheap; the store protocols
  * under test are scale-independent. */
class ReentrySpec extends SparkSpec {

  /** Every driver query that reads or mutates a persisted store —
    * ensure-gated builds, branch lifecycles, admissions, takedowns,
    * sketch maintenance, the SQL front door's store listing. */
  private val LifecycleQueries = Seq(
    "x_dedup_incremental", "x_fp_branch",
    "x_neardup_append", "x_cluster_store", "x_community_l1",
    "x_community_l2", "x_community_merge", "x_edge_branch",
    "x_ann_ivfpq_read", "x_ann_ivfpq_append", "x_ann_delete",
    "x_mv_rewrite", "x_agg_branch", "x_lm_branch", "x_tok_branch",
    "x_mg_rebuild", "x_cms_retract",
    "x_takedown", "x_takedown_fp", "x_takedown_edges",
    "x_takedown_ann", "x_takedown_agg", "x_takedown_lm",
    "x_takedown_tok", "x_takedown_layout", "x_takedown_scd2",
    "x_takedown_branch",
    "x_sql_stores")

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("store-lifecycle queries are re-entrant: a second run in the " +
      "same JVM returns identical rows") {
    val missing = LifecycleQueries.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"unknown queries: $missing")
    val moved = LifecycleQueries.flatMap { name =>
      val q = SparkEntry.queries(name)
      val first = rows(q(spark, sf0001))
      val second = rows(q(spark, sf0001))
      if (first == second) None
      else Some(s"$name: ${first.size} -> ${second.size} rows, " +
        s"first diff: ${first.diff(second).headOption
          .orElse(second.diff(first).headOption).getOrElse("?")}")
    }
    assert(moved.isEmpty,
      "re-entered queries moved:\n" + moved.mkString("\n"))
  }
}
