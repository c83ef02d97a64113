package graft.bench

import java.lang.management.ManagementFactory

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Per-pipeline-stage memory/spill accounting for soak runs (VERDICT r3
  * next-round #4: "record per-stage peak memory in BASELINE.md").
  *
  * Attribution is by a driver-set phase label (the soak driver brackets
  * each logical stage with [[phase]]): every completed task's metrics are
  * folded into the label active when it ENDED — exact for a sequential
  * driver like [[graft.tools.Pipeline]], where stages never overlap.
  *
  * Tracked per phase:
  *  - peak_task_exec_mem: max per-task peak unified execution memory
  *    (Tungsten shuffle/agg/join buffers) — the number that predicts
  *    whether an executor-sized partition fits at a bigger scale factor;
  *  - spilled_mem / spilled_disk: Tungsten spill volumes (zero = the whole
  *    working set stayed in execution memory);
  *  - shuffle_write: bytes shuffled — the scale-dominant cost;
  *  - heap_peak: JVM heap-pool peak across the phase (pools reset at each
  *    phase switch), the single-JVM local-mode proxy for executor memory.
  */
final class StageMemoryTracker extends SparkListener {

  final class PhaseMetrics {
    var peakTaskExecMem = 0L
    var spilledMem = 0L
    var spilledDisk = 0L
    var shuffleWrite = 0L
    var tasks = 0L
    var heapPeak = 0L
  }

  @volatile private var current = "setup"
  private val phases =
    new java.util.concurrent.ConcurrentHashMap[String, PhaseMetrics]()
  private val order = new java.util.concurrent.CopyOnWriteArrayList[String]()

  private def pool(name: String): PhaseMetrics = {
    // addIfAbsent: the listener-bus thread (onTaskEnd) and the driver
    // (phase) race here — a check-then-act would record a phase twice
    order.addIfAbsent(name)
    phases.computeIfAbsent(name, _ => new PhaseMetrics)
  }

  /** Switch the active phase; snapshots the finished phase's heap peak and
    * resets JVM pool peaks so the next phase measures only itself. */
  def phase(name: String): Unit = synchronized {
    snapshotHeap(pool(current))
    resetHeapPeaks()
    current = name
    pool(name)
  }

  /** Close out the final phase (call once, after the last stage). */
  def finish(): Unit = synchronized { snapshotHeap(pool(current)) }

  private def resetHeapPeaks(): Unit = {
    import scala.jdk.CollectionConverters._
    ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .foreach(p => try p.resetPeakUsage() catch { case _: Throwable => () })
  }

  private def snapshotHeap(p: PhaseMetrics): Unit = {
    import scala.jdk.CollectionConverters._
    val peak = ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .map(b => try b.getPeakUsage.getUsed catch { case _: Throwable => 0L })
      .sum
    p.heapPeak = math.max(p.heapPeak, peak)
  }

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      val p = pool(current)
      p.synchronized {
        p.peakTaskExecMem = math.max(p.peakTaskExecMem, m.peakExecutionMemory)
        p.spilledMem += m.memoryBytesSpilled
        p.spilledDisk += m.diskBytesSpilled
        p.shuffleWrite += m.shuffleWriteMetrics.bytesWritten
        p.tasks += 1
      }
    }
  }

  /** One JSON object per phase, in first-seen order. */
  def toJson: String = {
    // Locale.ROOT-pinned: the f-interpolator formats with the JVM default
    // locale, which renders a COMMA decimal separator under e.g. de_DE —
    // malformed JSON in metrics.json / the pipeline stdout line
    def mb(b: Long): String =
      String.format(java.util.Locale.ROOT, "%.1f",
        Double.box(b / 1048576.0))
    import scala.jdk.CollectionConverters._
    order.asScala.map { name =>
      val p = phases.get(name)
      s"""{"phase":"$name","tasks":${p.tasks},""" +
        s""""peak_task_exec_mem_mb":${mb(p.peakTaskExecMem)},""" +
        s""""spilled_mem_mb":${mb(p.spilledMem)},""" +
        s""""spilled_disk_mb":${mb(p.spilledDisk)},""" +
        s""""shuffle_write_mb":${mb(p.shuffleWrite)},""" +
        s""""heap_peak_mb":${mb(p.heapPeak)}}"""
    }.mkString("[", ",", "]")
  }
}
