package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed table layout — the co-located-join story at 100 TB.
  *
  * A fact-to-fact join (too big to broadcast either side) normally
  * shuffles BOTH sides on the join key every time it runs. Bucketing
  * pays that shuffle ONCE at write time: rows are hash-clustered into a
  * fixed number of buckets on the key, the layout is recorded in the
  * catalog, and every later equi-join or aggregation on that key reads
  * the clustering straight from the scan — zero exchanges at query
  * time (PlanSpec pins this for `x_bucketed_join`). Both join sides
  * must use the same bucket count; per-bucket files are sorted on the
  * key so merge joins need at most an in-partition sort, never a
  * shuffle. This is Spark's native (DataSource) bucketing — no Hive
  * dependency; the in-memory session catalog carries the bucket spec. */
object BucketedStore {

  /** Write `df` as a bucketed external parquet table registered under
    * `table`, hash-clustered and sorted by `key` into `buckets`
    * buckets at `path`. Re-registers (drop + create) so repeated runs
    * in one session are idempotent. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, path: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write.format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)
  }
}
