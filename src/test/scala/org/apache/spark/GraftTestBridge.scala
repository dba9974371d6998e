package org.apache.spark

/** Test-only bridge to `private[spark]` surfaces: deterministic listener
  * assertions need the bus drained, and `listenerBus.waitUntilEmpty()` is
  * package-private. */
object GraftTestBridge {
  def flushListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
