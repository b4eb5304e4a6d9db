package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only accessor for the private[spark] listener bus: job-count
  * specs must drain the ASYNC listener queue deterministically before
  * reading their counters (ADVICE r11 — a fixed sleep is flaky on a
  * loaded machine; `waitUntilEmpty` is the bus's own drain barrier).
  */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
