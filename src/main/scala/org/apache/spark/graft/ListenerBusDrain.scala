package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Deterministic listener-bus drain for bench telemetry bracketing.
  *
  * `SparkContext.listenerBus` is `private[spark]`, so this one-file
  * package-in shim exposes the same `waitUntilEmpty` that Spark's own
  * test harness uses to make listener-derived counters exact. This
  * replaces the timing-based "two reads agree 25 ms apart" heuristic
  * (ADVICE r8: a GC pause longer than one step silently mis-attributed
  * a query's trailing shuffle bytes to the next query's baseline, and
  * the fixed sleeps added minutes of untimed wall clock over 300+
  * queries).
  */
object ListenerBusDrain {
  /** Block until every queued listener event has been delivered, or
    * `timeoutMs` elapses. Returns true iff the bus drained.
    */
  def drain(sc: SparkContext, timeoutMs: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
