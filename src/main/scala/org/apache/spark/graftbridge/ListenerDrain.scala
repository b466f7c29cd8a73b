package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Minimal bridge into Spark's `private[spark]` listener-bus surface.
  *
  * Task-metric events are posted to [[org.apache.spark.scheduler.LiveListenerBus]]
  * asynchronously, so when an action returns, the last task-end events may
  * still be queued. Deterministic per-query metrics (graft.bench.QueryMetrics)
  * need a barrier: "every event for the job I just ran has been delivered".
  * Spark exposes exactly that as `waitUntilEmpty`, but `private[spark]` — this
  * object lives under `org.apache.spark` solely to re-export it. No other
  * internal surface is touched, and nothing here mutates Spark state.
  */
object ListenerDrain {

  /** Block until the listener bus has delivered all queued events, or
    * `timeoutMs` elapsed. Returns false on timeout (metrics may then be
    * short — callers should flag, not throw: a bench run must not die on
    * a slow bus).
    */
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
