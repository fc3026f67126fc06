package org.apache.spark

/** Test-only bridge into `private[spark]` surface: lets specs drain the
  * listener bus so job-count assertions are deterministic (job-start events
  * are posted asynchronously).
  */
object GraftTestBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
