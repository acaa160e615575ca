package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Core-side bridge (package org.apache.spark so private[spark] members are
  * reachable — same pattern as sql.graftbridge.Bridge for private[sql]).
  *
  * Used by the bench harness: task-end events (which carry
  * `TaskMetrics.executorCpuTime`) are posted on the async listener bus, so
  * attributing CPU time to the query that just finished requires draining
  * the bus before reading the accumulator. Without this, the tail of query
  * N's task metrics would be charged to query N+1. */
object CoreBridge {
  /** Block until all queued listener events are delivered (best-effort:
    * swallows the TimeoutException a wedged bus would throw — the bench
    * must never crash on a metrics plumbing hiccup). Only NonFatal
    * hiccups are swallowed: an interrupt re-asserts the thread's flag
    * (losing it would break cancellation), and fatal errors (OOM, …)
    * propagate — a bench limping on after those would report silently
    * mis-attributed metrics. */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch {
      case _: InterruptedException => Thread.currentThread().interrupt()
      case scala.util.control.NonFatal(_) => ()
    }
}
