package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Surfaces the hot-bucket-cap `observe` metrics that
  * [[graft.operators.Dedup.bucketPairs]] attaches to every pair-
  * generation plan (`dropped_buckets` / `max_bucket` / `capped_ids`).
  *
  * The cap itself is standard LSH practice, but a drop nobody can see
  * is a silent-recall hole: at 100 TB an operator decides whether a
  * capped bucket is a degenerate key (fine) or real signal (raise the
  * cap) by LOOKING AT THESE NUMBERS. Bench and Verify register this
  * listener, so every capped bucket shows up in their stderr stream
  * (and is queryable via [[drained]], which tests use to assert the
  * drop is observable end-to-end).
  */
object BucketCapMetrics extends QueryExecutionListener {

  final case class Cap(droppedBuckets: Long, maxBucket: Long, cappedIds: Long)

  private val seen = new java.util.concurrent.ConcurrentHashMap[String, Cap]()
  // weak keys: the idempotence set must not pin stopped SparkSessions
  // in memory for the JVM lifetime (sessions churn in long-lived
  // pipelines; the listener registration dies with the session anyway)
  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Attach to a session (idempotent per session). */
  def register(s: SparkSession): Unit =
    if (registered.put(s, java.lang.Boolean.TRUE) == null)
      s.listenerManager.register(this)

  /** Snapshot and clear the capped-bucket observations recorded so far.
    * Listener delivery is async (Spark's listener bus) — callers that
    * need a deterministic read poll until the expected entry lands. */
  def drained(): Map[String, Cap] = {
    import scala.jdk.CollectionConverters._
    val m = seen.asScala.toMap
    seen.clear()
    m
  }

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    qe.observedMetrics.foreach { case (name, row) =>
      if (name.startsWith("graft_bucket_pairs_") && !row.isNullAt(0)) {
        // field order = the observe() expression order in bucketPairs;
        // numeric types vary (sum→long, max(size)→int), so go through
        // Number rather than getLong
        def l(i: Int): Long =
          if (row.isNullAt(i)) 0L else row.getAs[Number](i).longValue
        val cap = Cap(l(0), l(1), l(2))
        if (cap.droppedBuckets > 0) {
          seen.put(name, cap)
          System.err.println(s"[graft:bucket-cap] $name dropped_buckets=" +
            s"${cap.droppedBuckets} max_bucket=${cap.maxBucket} capped_ids=${cap.cappedIds}")
        }
      }
    }

  override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
}
