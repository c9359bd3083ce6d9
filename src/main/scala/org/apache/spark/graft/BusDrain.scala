package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Doorway to `private[spark]` LiveListenerBus.waitUntilEmpty, used by
  * [[graft.Bench]]'s per-query task-metrics attribution: listener events
  * are posted on an async bus, so a cpu/shuffle counter read immediately
  * after an action can miss the tail of that query's own tasks (and
  * charge them to the NEXT query). Draining the bus between queries makes
  * the per-query executor-cpu numbers in bench_detail.json attributable.
  * A drain timeout degrades to a slightly-smeared sample, never an error
  * — measurement must not fail the bench.
  */
object BusDrain {
  def drain(sc: SparkContext, timeoutMs: Long = 5000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
