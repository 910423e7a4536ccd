// Per-job/per-stage wall breakdown for one query (optimization-round
// diagnosis):
//   sbt "Test/runMain graft.tools.JobProfile <query1,query2,...> [sfDir]"
// Runs each query warm then once instrumented, printing every Spark job's
// duration and every completed stage's duration, task count and name — so
// optimization effort lands on the stage that actually burns the wall
// clock (guide §1: measure first).
package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

object JobProfile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val b0 = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // ad-hoc A/B confs: SPARK_GRAFT_PROFILE_CONF="k=v;k2=v2"
    val b = sys.env.get("SPARK_GRAFT_PROFILE_CONF").map(_.split(";").toSeq)
      .getOrElse(Nil).foldLeft(b0) { (acc, kv) =>
        val Array(k, v) = kv.split("=", 2); acc.config(k, v)
      }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.tuneSession(spark)

    case class Job(id: Int, var start: Long = 0L, var end: Long = 0L)
    case class Stg(id: Int, name: String, ms: Long, tasks: Int,
                   taskTimeMs: Long, gcMs: Long, deserMs: Long)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[Stg]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.put(e.jobId, Job(e.jobId, e.time))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.end = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        stages.add(Stg(si.stageId, si.name.linesIterator.next(), ms,
          si.numTasks, si.taskMetrics.executorRunTime,
          si.taskMetrics.jvmGCTime, si.taskMetrics.executorDeserializeTime))
      }
    }

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm
      System.gc(); Thread.sleep(300)
      jobs.clear(); stages.clear()
      spark.sparkContext.addSparkListener(listener)
      val cg = org.apache.spark.metrics.source.CodegenMetrics
      val (c0, t0c) = (cg.METRIC_COMPILATION_TIME.getCount,
        cg.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val c1 = cg.METRIC_COMPILATION_TIME.getCount
      println(f"[jobprofile] $name codegen compiles during timed run: ${c1 - c0} (histo-mean ${cg.METRIC_COMPILATION_TIME.getSnapshot.getMean}%.1f ms)")
      Thread.sleep(400) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val js = jobs.values.asScala.toSeq.sortBy(_.id)
      val ss = stages.asScala.toSeq.sortBy(_.id)
      val jobSum = js.map(j => (j.end - j.start) / 1e3).sum
      val stageSum = ss.map(_.ms).sum / 1e3
      println(f"[jobprofile] $name wall=$wall%.3f s, jobs=${js.size} (sum $jobSum%.3f s), stages=${ss.size} (sum $stageSum%.3f s)")
      ss.foreach { s =>
        println(f"[jobprofile]   stage ${s.id}%3d ${s.ms / 1e3}%7.3f s tasks=${s.tasks}%4d taskTime=${s.taskTimeMs / 1e3}%7.2f s gc=${s.gcMs / 1e3}%5.2f deser=${s.deserMs / 1e3}%5.2f  ${s.name.take(80)}")
      }
    }
    spark.stop()
  }
}
