package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * session (Verify materializes 70+ queries in one session; at cluster
  * scale the leak evicts useful cache and spills shuffles).
  *
  * The contract: query builders register intermediates via [[cache]];
  * the CONSUMER calls [[releaseAll]] once it has fully materialized the
  * returned DataFrame (Bench and Verify do this between queries; a
  * pipeline embedding these queries calls it at its own batch
  * boundaries). After release, the returned DataFrame is still valid —
  * re-executing it just recomputes the intermediate instead of reading
  * cache.
  *
  * Concurrency: entries are keyed by SparkSession, so two sessions in
  * one JVM (e.g. a pipeline embedding graft queries while a Verify run
  * is live) cannot release each other's intermediates —
  * `releaseAll(session)` frees only that session's entries. WITHIN one
  * session the registry is single-consumer by design: interleaving two
  * query batches on the same session and calling the no-arg
  * [[releaseAll]] mid-flight degrades the other batch's persisted
  * stages to recompute-per-reference (correct, slower). Run batches
  * sequentially per session or use separate sessions.
  */
object CacheRegistry {
  private val live = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.concurrent.ConcurrentLinkedQueue[DataFrame]]()

  /** Persist (MEMORY_AND_DISK) and track for later [[releaseAll]]. */
  def cache(df: DataFrame): DataFrame =
    track(df.persist(StorageLevel.MEMORY_AND_DISK))

  /** Track an already-persisted DataFrame for later [[releaseAll]]. */
  def track(df: DataFrame): DataFrame = {
    live.computeIfAbsent(df.sparkSession,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()).add(df)
    df
  }

  private def drain(q: java.util.concurrent.ConcurrentLinkedQueue[DataFrame]): Unit = {
    var d = q.poll()
    while (d != null) {
      try d.unpersist(blocking = false)
      catch { case _: Throwable => () } // session may already be stopped
      d = q.poll()
    }
  }

  /** Unpersist every intermediate tracked for `session` (non-blocking);
    * other sessions' entries are untouched. */
  def releaseAll(session: SparkSession): Unit = {
    val q = live.remove(session)
    if (q != null) drain(q)
  }

  /** Run `body`, then unpersist ONLY the intermediates tracked for
    * `session` DURING body — entries tracked before it stay tracked
    * (r18 advice: a streaming micro-batch that called
    * `releaseAll(session)` after each refresh also dropped every
    * OTHER consumer's tracked caches on a shared session). This makes
    * a repeated embedded consumer (a foreachBatch refresh, a pipeline
    * stage) clean up after exactly itself. Entries tracked by a
    * CONCURRENT third thread during body are swept with the scope's
    * own — the registry's documented session-level single-consumer
    * convention still applies to simultaneous use; this scopes the
    * sequential-interleaving case. */
  def scoped[T](session: SparkSession)(body: => T): T = {
    val before = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[DataFrame, java.lang.Boolean]())
    val q0 = live.get(session)
    if (q0 != null) q0.forEach(df => before.add(df))
    try body
    finally {
      val q = live.get(session)
      if (q != null) {
        val keep = new java.util.ArrayList[DataFrame]()
        var d = q.poll()
        while (d != null) {
          if (before.contains(d)) keep.add(d)
          else { try d.unpersist(blocking = false) catch { case _: Throwable => () } }
          d = q.poll()
        }
        keep.forEach(df => q.add(df))
      }
    }
  }

  /** Unpersist every tracked intermediate across ALL sessions. Single-
    * consumer convenience (Bench/Verify own their whole JVM); prefer
    * [[releaseAll(session*]] when other sessions may be mid-query. */
  def releaseAll(): Unit = {
    val it = live.entrySet().iterator()
    while (it.hasNext) {
      val q = it.next().getValue
      it.remove()
      drain(q)
    }
  }
}
