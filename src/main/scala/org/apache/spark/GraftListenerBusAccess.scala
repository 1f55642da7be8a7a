package org.apache.spark

/** Package-private access shim: lets the shuffle audit drain the
  * async listener bus so stage metrics are complete before reading
  * (the same device Spark's own test harness uses). */
object GraftListenerBusAccess {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
