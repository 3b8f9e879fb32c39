package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-level registry for operator-persisted intermediates.
  *
  * Operators return LAZY plans, so they cannot unpersist their own
  * intermediates (the caller hasn't run them yet). Every persist an
  * operator takes goes through [[cached]], which registers the frame
  * here; [[clear]] (surfaced as `Graft.clearOperatorCaches()`) then
  * releases everything in one call. The driver surfaces (`Bench`,
  * `Verify`) call it between queries; a long-lived session calls it at
  * its own cadence — or relies on Spark's LRU eviction, which can only
  * cost recompute, never correctness.
  *
  * [[cached]] is also idempotent: Spark's CacheManager canonicalizes
  * plans, so two operators caching the same intermediate (the families
  * pass and a standalone operator over the same shingle relation, or a
  * spec comparing them) would log "Asked to cache already cached data"
  * and re-register; checking the storage level first keeps caching
  * idempotent and the logs clean.
  *
  * Registry entries are driver-side plan handles (cheap); [[clear]]
  * empties the registry, so a clear-per-batch loop holds O(one batch)
  * of them, never the session's history.
  */
object OperatorCache {

  private val live = java.util.concurrent.ConcurrentHashMap.newKeySet[DataFrame]()

  /** Idempotent persist + register. Returns the input frame. */
  def cached(df: DataFrame): DataFrame = {
    if (df.storageLevel == StorageLevel.NONE) {
      df.persist()
      live.add(df)
    }
    df
  }

  /** Caller-managed early release (iterative operators drop each
    * round's labels as soon as the next round materializes). */
  def release(df: DataFrame): Unit = {
    df.unpersist(blocking = false)
    live.remove(df)
  }

  /** Number of currently registered intermediates (spec surface). */
  def size: Int = live.size

  /** Unpersist and unregister every operator intermediate. Unlike
    * `spark.catalog.clearCache()` this touches ONLY frames the graft
    * operators persisted — user caches in the same session survive. */
  def clear(): Unit = {
    val it = live.iterator()
    while (it.hasNext) {
      it.next().unpersist(blocking = false)
      it.remove()
    }
  }
}
