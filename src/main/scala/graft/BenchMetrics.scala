package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-query shuffle/spill telemetry for [[Bench]].
  *
  * Wall-time at sf0.1 hides quadratic shuffles — a query can finish in
  * seconds while moving 100× the bytes its plan should, and only the
  * bytes column exposes it before the 100 TB run does (VERDICT r7 task
  * #3). A stage-completion listener accumulates shuffle read/write and
  * spill bytes into atomics; the bench snapshots the counters around
  * each query and records the deltas. Attribution is exact because the
  * bench runs queries strictly sequentially on one session.
  */
class ShuffleTelemetry extends SparkListener {
  val shuffleRead = new AtomicLong(0L)
  val shuffleWrite = new AtomicLong(0L)
  val spillMem = new AtomicLong(0L)
  val spillDisk = new AtomicLong(0L)

  override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
    val m = ev.stageInfo.taskMetrics
    if (m != null) {
      shuffleRead.addAndGet(
        m.shuffleReadMetrics.remoteBytesRead + m.shuffleReadMetrics.localBytesRead)
      shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      spillMem.addAndGet(m.memoryBytesSpilled)
      spillDisk.addAndGet(m.diskBytesSpilled)
    }
  }

  def snapshot(): ShuffleTelemetry.Snap = ShuffleTelemetry.Snap(
    shuffleRead.get(), shuffleWrite.get(), spillMem.get(), spillDisk.get())
}

object ShuffleTelemetry {
  /** Counter snapshot; `delta` yields the bytes a bracketed query moved. */
  case class Snap(read: Long, write: Long, spillMem: Long, spillDisk: Long) {
    def delta(prev: Snap): Snap =
      Snap(read - prev.read, write - prev.write,
        spillMem - prev.spillMem, spillDisk - prev.spillDisk)
  }

  def install(spark: SparkSession): ShuffleTelemetry = {
    val t = new ShuffleTelemetry
    spark.sparkContext.addSparkListener(t)
    t
  }

  /** Stage-completion events ride the async listener bus; drain it so a
    * snapshot taken right after a job returns sees that job's stages.
    * The bus is private[spark], so this polls the public queue-size
    * metric indirectly: a short bounded sleep-loop until two successive
    * reads of the counters agree. Worst case adds `rounds·stepMs` to a
    * query's bracketing (NOT its timed section — Bench snapshots after
    * the timer stops).
    */
  def settle(t: ShuffleTelemetry, rounds: Int = 20, stepMs: Long = 25L): Snap = {
    var prev = t.snapshot()
    var i = 0
    while (i < rounds) {
      Thread.sleep(stepMs)
      val cur = t.snapshot()
      if (cur == prev) i = rounds else { prev = cur; i += 1 }
    }
    prev
  }
}
