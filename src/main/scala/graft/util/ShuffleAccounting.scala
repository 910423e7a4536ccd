package graft.util

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Cumulative task-level shuffle-WRITE accounting for the bench mains.
  *
  * Why bytes and not seconds: wall-clock on a shared box drifts (observed
  * ±25% run to run), but the shuffle volume a plan moves is a property of
  * the PLAN and the data — it is the number that predicts cluster cost at
  * 100 TB, and two runs of the same plan on the same corpus report the
  * same bytes. Per-query deltas of this counter are therefore the
  * drift-immune half of the bench evidence.
  *
  * A stage-completion listener accumulates `shuffleWriteMetrics
  * .bytesWritten` (covers EVERY job a query runs, including iterative
  * operators' internal supersteps); [[snapshot]] drains the async listener
  * bus before reading so a just-finished stage cannot race the read.
  */
final class ShuffleAccounting(sc: SparkContext) {
  private val acc = new AtomicLong
  sc.addSparkListener(new SparkListener {
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val m = s.stageInfo.taskMetrics
      if (m != null) acc.addAndGet(m.shuffleWriteMetrics.bytesWritten)
    }
  })

  /** Drain the listener bus, then read the cumulative byte counter. */
  def snapshot(): Long = {
    org.apache.spark.GraftSparkShim.drainListenerBus(sc)
    acc.get()
  }
}
