package graft.operators

import org.apache.spark.sql.DataFrame

/** Tracks the intermediate caches the similarity/dedup operators create
  * (exploded shingle indexes, LSH signatures) so long-lived sessions can
  * release them: Spark's CacheManager dedupes identical plans, so repeated
  * calls with the same inputs reuse one entry, but every distinct corpus or
  * parameterization pins a new cache until [[unpersistAll]] (or a global
  * `spark.catalog.clearCache()`) runs. Operators never unpersist eagerly —
  * their results are lazy, and the cache must survive until the caller's
  * action has consumed it. */
private[graft] object CacheRegistry {
  private val live = scala.collection.mutable.ArrayBuffer[DataFrame]()

  /** Cache `df` and remember it for [[unpersistAll]]. */
  def tracked(df: DataFrame): DataFrame = synchronized {
    df.cache()
    live += df
    df
  }

  def size: Int = synchronized(live.size)

  /** Release every tracked cache (non-blocking). Call between corpora in a
    * long-lived session; safe while no query that read them is running. */
  def unpersistAll(): Unit = synchronized {
    live.foreach(_.unpersist(blocking = false))
    live.clear()
  }

  /** Run `body` and release every cache it CREATED once it returns —
    * for per-batch loops (the streaming admission sink) where each
    * trigger's operator caches would otherwise stay pinned for the
    * stream's lifetime. Only safe when `body` fully CONSUMES its
    * results (runs its actions) before returning; pre-existing caches
    * are untouched. */
  def scoped[T](body: => T): T = {
    // snapshot by IDENTITY, not index: if body (or anything during it)
    // calls unpersistAll or a nested scoped, `live` can shrink below a
    // captured index and positional removal would either throw
    // (negative count) or release caches some OTHER caller tracked
    val before = synchronized(
      java.util.Collections.newSetFromMap(
        new java.util.IdentityHashMap[DataFrame, java.lang.Boolean]()))
    synchronized(live.foreach(before.add))
    try body
    finally {
      val created = synchronized {
        val c = live.filterNot(before.contains).toList
        live.filterInPlace(before.contains)
        c
      }
      created.foreach(_.unpersist(blocking = false))
    }
  }
}
