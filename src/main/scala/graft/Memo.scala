package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

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
  // Keyed by the session object itself rather than identityHashCode —
  // distinct sessions can collide on identity hash, which would hand one
  // session's cached plan to another. Note the values (DataFrames) hold
  // their session via QueryExecution, so entries are NOT freed by GC when
  // a session stops; lifecycle is explicit — callers that tear sessions
  // down or re-run suites call `clear(session)`, which also unpersists
  // the cached data.
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
    framesOf(s).getOrElseUpdate((key, dir), {
      val df = mk
      // builders that materialize-then-release internal state hand over an
      // already-persisted frame; re-caching it would only log a warning
      if (df.storageLevel == StorageLevel.NONE) df.cache() else df
    })

  /** Unpersist and drop every frame memoized for `s` (bench pass
    * isolation, suite teardown). The next `cached` call rebuilds.
    */
  def clear(s: SparkSession): Unit = sessions.synchronized {
    val m = sessions.get(s)
    if (m != null) {
      m.values.foreach(df => df.unpersist(): Unit)
      m.clear()
    }
  }
}
