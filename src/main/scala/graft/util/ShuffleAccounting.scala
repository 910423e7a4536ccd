package graft.util

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Cumulative task-level metrics accounting for the bench mains: shuffle
  * WRITE bytes, spill bytes (memory + disk), and execution-memory peaks.
  *
  * Why bytes and not seconds: wall-clock on a shared box drifts (observed
  * ±25% run to run), but the shuffle volume a plan moves is a property of
  * the PLAN and the data — it is the number that predicts cluster cost at
  * 100 TB, and two runs of the same plan on the same corpus report the
  * same bytes. Per-query deltas of this counter are therefore the
  * drift-immune half of the bench evidence.
  *
  * Why spill: a query whose partitions stop fitting execution memory
  * silently falls back to sort/agg spill files — wall-clock gets noisy
  * (the observed dedup_ngram_capped 12.3×-vs-4.5× run variance at 30×
  * data) but sec+shuffle_mb alone can't distinguish a spill regression
  * from box noise. Spill bytes name the cause directly, and at cluster
  * scale they are the "partitions must fit executor memory" sizing signal.
  *
  * A stage-completion listener accumulates `shuffleWriteMetrics
  * .bytesWritten` / `memoryBytesSpilled` / `diskBytesSpilled` (covers
  * EVERY job a query runs, including iterative operators' internal
  * supersteps); snapshots drain the async listener bus before reading so
  * a just-finished stage cannot race the read.
  *
  * Peak execution memory is NOT cumulative across a query — it is the
  * max over completed stages of the stage-aggregated task peak (Spark
  * sums per-task peaks into the stage metric, so this is an upper bound
  * on concurrent pressure, comparable across runs of the same plan). It
  * is tracked as a resettable high-water mark: [[resetPeak]] before the
  * measured window, [[peakSinceReset]] after.
  */
final class ShuffleAccounting(sc: SparkContext) {
  private val acc = new AtomicLong
  private val memSpill = new AtomicLong
  private val diskSpill = new AtomicLong
  private val peak = new AtomicLong
  sc.addSparkListener(new SparkListener {
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        acc.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
        peak.getAndAccumulate(m.peakExecutionMemory, math.max)
      }
    }
  })

  /** Drain the listener bus, then read the cumulative shuffle-write
    * byte counter. */
  def snapshot(): Long = {
    org.apache.spark.GraftSparkShim.drainListenerBus(sc)
    acc.get()
  }

  /** Drain the bus, then read all three cumulative byte counters:
    * (shuffle write, memory spilled, disk spilled). */
  def snapshotAll(): (Long, Long, Long) = {
    org.apache.spark.GraftSparkShim.drainListenerBus(sc)
    (acc.get(), memSpill.get(), diskSpill.get())
  }

  /** Zero the execution-memory high-water mark (call at the start of a
    * measured window). */
  def resetPeak(): Unit = peak.set(0L)

  /** Drain the bus, then read the max per-stage execution-memory peak
    * since the last [[resetPeak]]. */
  def peakSinceReset(): Long = {
    org.apache.spark.GraftSparkShim.drainListenerBus(sc)
    peak.get()
  }
}
