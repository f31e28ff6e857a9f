package org.apache.spark

/** Test bridge into Spark internals: flush the listener bus so task
  * metrics observed by a just-registered listener are complete. */
object GraftTestBus {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
