package org.apache.spark

/** Test-only bridge into the (private[spark]) listener bus: plan pins
  * for ITERATIVE operators capture per-round executed plans through a
  * QueryExecutionListener, whose callbacks ride the async bus — the
  * assertion must flush it first. Same package-bridge precedent as
  * `org.apache.spark.sql.classic.GraftColumnBridge` in main. */
object GraftTestBus {
  def flush(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(30000)
}
