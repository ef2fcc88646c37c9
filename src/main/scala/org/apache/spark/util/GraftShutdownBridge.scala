package org.apache.spark.util

/** Bridge into Spark's package-private [[ShutdownHookManager]] so a
  * flush-on-exit hook can run BEFORE the SparkContext's own shutdown hook
  * (priority 50 — `SparkContext.SHUTDOWN_HOOK_PRIORITY`). A plain JVM
  * `sys.addShutdownHook` races it: when the context's hook wins, the
  * flush's write job finds a stopped SparkContext and dies silently —
  * found live driving `graft.Serve`'s SIGTERM path (the store directory
  * was never written). Higher priority = earlier in Spark's manager. */
object GraftShutdownBridge {
  def addHook(priority: Int)(body: => Unit): AnyRef =
    ShutdownHookManager.addShutdownHook(priority)(() => body)

  /** Run `body` when `signal` (e.g. "TERM", "INT") arrives, BEFORE any JVM
    * shutdown hook: the JVM runs shutdown hooks in PARALLEL threads, so
    * even a high-priority Spark-manager hook races Netty/Hadoop teardown
    * hooks — a flush write job dies under a closing FileSystem. A signal
    * handler runs while the whole stack is still alive; returning false
    * falls through to the previous handler (default = terminate). */
  def onSignal(signal: String)(body: => Unit): Unit =
    SignalUtils.register(signal) { body; false }
}
