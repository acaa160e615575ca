package graft.util

import org.apache.spark.SparkContext

/** Measurement machinery shared by [[graft.Bench]] and
  * [[graft.ScaleDemo]] — one definition so a hardening fix to either
  * consumer cannot silently diverge from the other (r12: the jsonNum
  * leading-zero/escape fix landed in Bench while ScaleDemo still
  * interpolated its env raw). */
object BenchHarness {

  /** Normalize a SPARK_GRAFT_CPUS value: "*" is a legitimate master spec
    * (local[*]) but must resolve to the core count before it reaches
    * `spark.sql.shuffle.partitions` (which rejects it) or a JSON
    * artifact (where it would land unquoted and break parsing). */
  def cpus(raw: Option[String]): String =
    raw.getOrElse(Runtime.getRuntime.availableProcessors.toString) match {
      case "*" => Runtime.getRuntime.availableProcessors.toString
      case c => c
    }

  /** Canonical-integer-or-escaped-string JSON scalar: "08" passes
    * Spark's local[N] master regex but is ILLEGAL bare JSON (leading
    * zero), and Character.isDigit accepts non-ASCII Unicode digits —
    * both would silently break the adjudication tooling reading the
    * artifact; anything non-canonical lands as an ESCAPED string. */
  def jsonNum(v: String): String =
    if (v.matches("0|[1-9][0-9]*")) v
    else "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** Executor-CPU accounting: `TaskMetrics.executorCpuTime` summed via a
    * listener, with a listener-bus drain before every read so tail task
    * metrics attribute to the right measurement window. Wall time alone
    * is contention-contaminated on a shared host; cpu rides beside it in
    * every artifact. */
  final class CpuMeter(sc: SparkContext) {
    private val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    private val spill = new java.util.concurrent.atomic.AtomicLong(0L)
    private val taskPeak = new java.util.concurrent.atomic.AtomicLong(0L)
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          cpuNs.addAndGet(m.executorCpuTime)
          spill.addAndGet(m.memoryBytesSpilled)
          // the skew signature: the largest single task's execution
          // memory + spill footprint (a hot-key buffer shows up here
          // whether or not it spilled)
          val peak = m.peakExecutionMemory + m.memoryBytesSpilled
          var cur = taskPeak.get()
          while (peak > cur && !taskPeak.compareAndSet(cur, peak))
            cur = taskPeak.get()
          (): Unit
        }
      }
    })
    def snapshot(): Long = {
      org.apache.spark.graftbridge.CoreBridge.drainListenerBus(sc)
      cpuNs.get()
    }
    /** Cumulative memoryBytesSpilled across all tasks so far. */
    def spillSnapshot(): Long = {
      org.apache.spark.graftbridge.CoreBridge.drainListenerBus(sc)
      spill.get()
    }
    /** Max single-task (peakExecutionMemory + spill) so far; reset per
      * measurement to attribute the peak to one run. */
    def taskPeakSnapshotAndReset(): Long = {
      org.apache.spark.graftbridge.CoreBridge.drainListenerBus(sc)
      taskPeak.getAndSet(0L)
    }
  }
}
