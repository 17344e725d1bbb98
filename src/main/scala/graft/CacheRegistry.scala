package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Deterministic lifecycle for the persisted intermediates inside graft
  * queries (dedup signature stages, connected-components frontiers).
  *
  * Why this exists: Spark's `CacheManager` holds STRONG references to
  * every `Dataset.persist` entry until `unpersist`/`clearCache` — the
  * ContextCleaner only reclaims RDD/broadcast/shuffle state whose
  * owners are garbage-collected, and cached Datasets never are. A query
  * that persists an intermediate and hands back a lazy DataFrame
  * therefore leaks a MEMORY_AND_DISK entry per call in any long-lived
  * session (Verify materializes 60+ queries in one session; at cluster
  * scale the leak evicts useful cache and spills shuffles).
  *
  * The contract: query builders register intermediates via [[cache]];
  * the CONSUMER calls [[releaseAll]] once it has fully materialized the
  * returned DataFrame (Bench and Verify do this between queries; a
  * pipeline embedding these queries calls it at its own batch
  * boundaries). After release, the returned DataFrame is still valid —
  * re-executing it just recomputes the intermediate instead of reading
  * cache.
  */
object CacheRegistry {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist (MEMORY_AND_DISK) and track for later [[releaseAll]]. */
  def cache(df: DataFrame): DataFrame =
    track(df.persist(StorageLevel.MEMORY_AND_DISK))

  /** Track an already-persisted DataFrame for later [[releaseAll]]. */
  def track(df: DataFrame): DataFrame = { live.add(df); df }

  /** Unpersist every tracked intermediate (non-blocking). */
  def releaseAll(): Unit = {
    var d = live.poll()
    while (d != null) {
      try d.unpersist(blocking = false)
      catch { case _: Throwable => () } // session may already be stopped
      d = live.poll()
    }
  }
}
