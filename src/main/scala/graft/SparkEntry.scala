package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{AggQueries, ExtQueries, ScalarQueries, SyncQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator family's query map; each key has a
  * matching DuckDB oracle in `oracleSql` unless the operator is not
  * SQL-expressible (then the driver records a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    SyncQueries.queries("c4_sync_router")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ScalarQueries.queries ++ SyncQueries.queries ++ AggQueries.queries ++
      ExtQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ScalarQueries.oracleSql ++ SyncQueries.oracleSql ++
      AggQueries.oracleSql ++ ExtQueries.oracleSql
}
