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
    * This is the deterministic drain (`listenerBus.waitUntilEmpty`, via
    * the package-in shim [[org.apache.spark.graft.ListenerBusDrain]]) —
    * the counters then provably reflect every event the just-finished
    * job posted, with zero sleep on the common path. The prior
    * "two reads agree 25 ms apart" heuristic could mis-attribute a
    * query's trailing shuffle bytes to the next query's baseline under
    * a GC pause and cost ≥50 ms per query (ADVICE r8). A timeout is
    * logged loudly: the snapshot is then a lower bound, not garbage.
    */
  def settle(t: ShuffleTelemetry, spark: SparkSession,
             timeoutMs: Long = 10000L): Snap = {
    val drained =
      org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext, timeoutMs)
    if (!drained)
      System.err.println(
        s"[BenchMetrics] listener bus did not drain in ${timeoutMs} ms; " +
          "shuffle bytes for the bracketing query are a lower bound")
    t.snapshot()
  }
}
