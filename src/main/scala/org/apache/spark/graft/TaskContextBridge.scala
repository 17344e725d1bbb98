package org.apache.spark.graft

import org.apache.spark.TaskContext

/** Bridge to `TaskContext.setTaskContext`, which is `protected[spark]`.
  *
  * Spark stores the task context in a thread-local; any helper thread a
  * task spawns (e.g. the pipe stdin writer in graft.operators.PipeOps)
  * sees `TaskContext.get() == null` unless the context is propagated.
  * Upstream iterators — shuffle readers, unsafe-memory acquisition, SQL
  * metric updaters — call `TaskContext.get()` internally, so consuming a
  * partition iterator from a foreign thread without this can NPE or
  * corrupt memory accounting on real upstreams. Spark's own
  * `org.apache.spark.rdd.PipedRDD` sets the context in its stdin-writer
  * thread for exactly this reason (core/src/main/scala/org/apache/spark/
  * rdd/PipedRDD.scala).
  */
object TaskContextBridge {
  def set(tc: TaskContext): Unit = TaskContext.setTaskContext(tc)
  def unset(): Unit = TaskContext.unset()
}
