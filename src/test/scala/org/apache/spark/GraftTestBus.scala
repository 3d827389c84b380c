package org.apache.spark

/** Test-only shim: drain the listener bus so job-count assertions are
  * deterministic (`listenerBus` is private[spark]). */
object GraftTestBus {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty(30000)
}
