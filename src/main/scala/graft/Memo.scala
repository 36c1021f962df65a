package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memoization for shared scenario frames.
  *
  * Several gate queries derive from the same logical frame (the SCD2
  * store, the changeset classification, the shingle set). Building and
  * caching that frame once per (session, dir) — instead of once per query
  * — matches the store-once / filter-per-read production layout, removes
  * redundant `cache()` calls on identical plans (the `CacheManager: Asked
  * to cache already cached data` warnings), and lets a bench run reuse the
  * store the way consecutive production reads would.
  */
object Memo {
  // Keyed by the session object itself (weakly, so a stopped session's
  // entries become collectable) rather than identityHashCode — distinct
  // sessions can collide on identity hash, which would hand one session's
  // cached plan to another.
  private val sessions =
    new java.util.WeakHashMap[SparkSession, TrieMap[(String, String), DataFrame]]()

  private def framesOf(s: SparkSession): TrieMap[(String, String), DataFrame] =
    sessions.synchronized {
      var m = sessions.get(s)
      if (m == null) { m = TrieMap.empty; sessions.put(s, m) }
      m
    }

  def cached(s: SparkSession, key: String, dir: String)
            (mk: => DataFrame): DataFrame =
    framesOf(s).getOrElseUpdate((key, dir), mk.cache())
}
