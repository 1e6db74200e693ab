package org.apache.spark

/** `private[spark]` accessor (the GraftColumnBridge pattern): Bench needs
  * to DRAIN the async listener bus before it re-attributes streaming
  * progress events to the next gate — StreamingQueryListener events are
  * delivered on the shared LiveListenerBus threads, so an event still in
  * flight when a gate's `count()` returns would otherwise be dropped or
  * credited to the NEXT gate's accumulator (the exact attribution drift
  * the per-gate stream breakdown exists to remove).
  */
object GraftListenerBridge {
  /** Block until every event posted so far has been dispatched to every
    * listener (or the timeout passes — returns normally either way; a
    * timed-out drain just degrades to the pre-drain behavior). */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
