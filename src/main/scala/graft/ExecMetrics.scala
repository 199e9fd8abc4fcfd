package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Process-wide task-metric counters for phase-log attribution (VERDICT r18
  * #3 / guide §5): the q214 band-join dedup swings 0.8 → 51 s between
  * windows with bit-identical candidate counts, which is exactly the
  * signature §5 predicts for execution-memory pressure (spill) — but the
  * phase log could not SAY so, forcing a floor adjudication every round.
  * These counters put the two §5 quantities (bytes spilled, peak execution
  * memory) into the same `label:number` stream the candidate counts ride.
  *
  * One listener per JVM, registered lazily on first use, accumulating over
  * EVERY task of the SparkContext:
  *   - [[spilledBytes]] — cumulative memory+disk bytes spilled; bracket a
  *     phase by delta (monotone, so brackets compose).
  *   - [[resetWindowPeak]]/[[windowPeakBytes]] — max per-task peak execution
  *     memory since the last reset. A max is not delta-bracketable, so the
  *     window is process-global: like the GC bracket beside it, concurrent
  *     brackets would blend — acceptable for attribution counters read by
  *     serial gates, documented here rather than locked around.
  *
  * Listener delivery is asynchronous; readers that need the last task's
  * numbers should read AFTER an action completed plus any natural sync
  * point (the dedup diag reads after awaiting its Observation futures). A
  * few stray late events mis-bracket kilobytes, not the multi-GB signals
  * this exists to catch.
  */
object ExecMetrics {
  private val spilled = new AtomicLong(0L)
  private val windowPeak = new AtomicLong(0L)
  @volatile private var registered = false

  private def ensureRegistered(sc: SparkContext): Unit = {
    if (!registered) synchronized {
      if (!registered) {
        sc.addSparkListener(new SparkListener {
          override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
            val m = t.taskMetrics
            if (m != null) {
              spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
              val p = m.peakExecutionMemory
              var cur = windowPeak.get()
              while (p > cur && !windowPeak.compareAndSet(cur, p))
                cur = windowPeak.get()
            }
          }
        })
        registered = true
      }
    }
  }

  /** Cumulative spilled bytes (memory + disk) across all tasks so far. */
  def spilledBytes(sc: SparkContext): Long = {
    ensureRegistered(sc); spilled.get()
  }

  /** Reset the window peak; subsequent [[windowPeakBytes]] reads report the
    * max per-task peak execution memory observed since this call.
    */
  def resetWindowPeak(sc: SparkContext): Unit = {
    ensureRegistered(sc); windowPeak.set(0L)
  }

  def windowPeakBytes(sc: SparkContext): Long = {
    ensureRegistered(sc); windowPeak.get()
  }
}
