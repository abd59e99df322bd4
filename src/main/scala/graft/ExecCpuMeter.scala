package graft

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Sums per-task `executorCpuTime` via a SparkListener — CPU actually
  * burned inside the executor processes, the contention-robust work
  * metric on this host (BASELINE.md noise rules). Shared by the
  * multi-process scaling legs ([[BenchMultiProc]], [[SubmitLeg]]).
  */
final class ExecCpuMeter(sc: SparkContext) {
  private val cpuNs = new java.util.concurrent.atomic.AtomicLong(0)

  sc.addSparkListener(new SparkListener {
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      if (e.taskMetrics != null) cpuNs.addAndGet(e.taskMetrics.executorCpuTime)
  })

  /** The counter once the async listener bus has drained. Listener
    * events arrive AFTER the action returns; require THREE consecutive
    * quiet 150 ms samples (one quiet sample can coincide with a driver
    * GC pause mid-drain) before trusting the value, or trailing
    * onTaskEnd events from one run leak into the next run's window.
    */
  def settledNs(): Long = {
    var quiet = 0
    var prev = cpuNs.get
    var spins = 0
    while (quiet < 3 && spins < 100) {
      Thread.sleep(150)
      val v = cpuNs.get
      if (v == prev) quiet += 1 else { quiet = 0; prev = v }
      spins += 1
    }
    if (quiet < 3)
      System.err.println("[cpumeter] WARNING: listener bus still " +
        "draining after 15s; CPU attribution may bleed between runs")
    prev
  }
}
