package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Deterministic listener-bus drain for the probe receipts.
  *
  * The erasure receipts in [[graft.ScaleProbe]] meter a mutation's task
  * input bytes off a `SparkListener`; event delivery is ASYNC, so "zero
  * the counter, run the mutation, read the counter" only measures the
  * mutation if the bus is EMPTY at both edges — otherwise build-job
  * stragglers inflate the zeroed window, or the mutation's own late
  * task-end events miss the read. Fixed sleeps only make that race
  * unlikely; `LiveListenerBus.waitUntilEmpty()` makes it impossible, but
  * it is `private[spark]` — this one-method bridge (the standard
  * package-private escape hatch, same-package object) exposes exactly
  * the drain and nothing else.
  */
object ListenerDrain {
  /** Block until every queued listener event has been dispatched, up to
    * two minutes. The no-arg `waitUntilEmpty()` hard-codes a 10 s bound
    * and THROWS on a busy bus — which would abort a whole probe run
    * where the receipt merely needed a longer drain; past the generous
    * bound we proceed with whatever has been delivered (the counter
    * then approximates, exactly the pre-drain behavior) rather than
    * losing the run.
    */
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(120000L)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
