package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bounded flush of the async SparkListener bus (private[spark] —
  * this shim is the standard ecosystem escape hatch). Used by the
  * pg_stat_statements scan-metric attachment so a statement's own
  * task-end events are counted into ITS delta instead of lagging
  * onto the connection's next statement. Returns false on timeout
  * (the delta then lands later — counters stay conserved).
  */
object ListenerBusDrain {
  def drain(sc: SparkContext, timeoutMs: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: Throwable => false }
}
