package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bench-only accessor: `LiveListenerBus.waitUntilEmpty` is
  * private[spark], but per-query task-metric deltas (GC time, spill
  * bytes) are only correct if the async listener bus has drained
  * before the delta is read. Declaring the one-line flush inside the
  * `org.apache.spark` namespace is the standard way third-party
  * harnesses reach it (the same device Spark's own external tests
  * use); nothing else from spark-internals is touched. */
object ListenerFlush {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
