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

  /** [[cached]], but the frame is handed over as an EAGER localCheckpoint
    * LEAF. A cached-but-lazy memo keeps its full logical plan, and every
    * consumer across every gate re-ANALYZES that deep subtree (the r17
    * persist-vs-checkpoint lesson — measured as pure driver planning
    * time); the checkpoint truncates the plan to a LogicalRDD leaf once
    * per (session, dir). Use for multi-consumer artifacts with DEEP build
    * plans (LSH candidate chains, hashed-feature builds, layer graphs);
    * plain [[cached]] stays right for shallow or single-digit-consumer
    * frames. The checkpoint blocks are ContextCleaner-freed once
    * [[clear]] drops the reference.
    */
  def cachedLeaf(s: SparkSession, key: String, dir: String)
                (mk: => DataFrame): DataFrame =
    if (leafHandover)
      // registered DIRECTLY: the eager checkpoint already holds
      // materialized blocks, so the extra .cache() layer [[cached]] would
      // add is a second copy plus one InMemoryRelation build per
      // artifact; consumers scan the checkpoint blocks as-is. clear()'s
      // unpersist is a no-op on these — the blocks release via
      // ContextCleaner once the registry drops the reference.
      framesOf(s).getOrElseUpdate((key, dir), mk.localCheckpoint(true))
    else mk

  /** TEST-ONLY seam for the plan-shape specs: inside `f`, [[cachedLeaf]]
    * returns the RAW builder frame (no checkpoint, no registry), so a
    * spec can assert on the build plan that the leaf handover otherwise
    * truncates to a `LogicalRDD` scan. Never used by Bench/Verify.
    */
  @volatile private var leafHandover = true
  private[graft] def withoutLeafHandover[T](f: => T): T = {
    leafHandover = false
    try f finally leafHandover = true
  }

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
