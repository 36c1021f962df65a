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
  private val frames = TrieMap[(Int, String, String), DataFrame]()

  def cached(s: SparkSession, key: String, dir: String)
            (mk: => DataFrame): DataFrame =
    frames.getOrElseUpdate(
      (System.identityHashCode(s), key, dir), mk.cache())
}
