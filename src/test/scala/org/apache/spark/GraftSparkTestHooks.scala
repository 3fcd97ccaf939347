package org.apache.spark

/** Test-only bridge to `private[spark]` internals: lets specs drain the
  * async listener bus before asserting on listener-observed state (job
  * counts in PlanAuditSpec's laziness checks).
  */
object GraftSparkTestHooks {
  def waitListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
