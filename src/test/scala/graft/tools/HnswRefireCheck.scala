package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{cosine_distance, vector_lit}
import graft.plans.{AnnIndexRegistry, GraftExtensions}

/** Scratch review probe: does the transparent hnsw rewrite re-fire inside
  * the optimizer's fixed-point batch (it leaves the base relation in
  * place), and how many candidate Filter(In(...)) nodes end up stacked in
  * the optimized plan? */
object HnswRefireCheck {
  def main(args: Array[String]): Unit = {
    val tablePath = "/root/testdata/sf0.001/embeddings.parquet"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(e => new GraftExtensions()(e))
      .getOrCreate()
    try {
      spark.read.parquet(tablePath).createOrReplaceTempView("items2")
      val q = spark.table("items2").filter(col("vec_id") === 0)
        .head().getAs[collection.Seq[Float]]("embedding").toArray
      spark.sql("CREATE INDEX items2_hnsw ON items2 " +
        "USING hnsw (embedding vector_cosine_ops) WITH (shards = 2)")

      def topK = spark.table("items2")
        .orderBy(cosine_distance(col("embedding"), vector_lit(q)), col("vec_id"))
        .limit(10)

      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })

      jobs.set(0)
      val t0 = System.nanoTime()
      val plan = topK.queryExecution.optimizedPlan
      val optMs = (System.nanoTime() - t0) / 1e6
      val planStr = plan.toString
      val nFilters = planStr.linesIterator.count(_.trim.startsWith("+- Filter"))
      val nIn = "vec_id#\\d+L? IN".r.findAllIn(planStr).length +
        "vec_id#\\d+L? INSET".r.findAllIn(planStr).length
      Thread.sleep(500)
      println(s"### bare kNN: optimize took $optMs ms, plan-time jobs=${jobs.get}, " +
        s"filter-ish lines=$nFilters, IN/INSET occurrences=$nIn")
      jobs.set(0)
      println("### optimized plan:\n" + planStr.take(4000))

      def filteredTopK = spark.table("items2")
        .filter(col("vec_id") % 2 === 0)
        .orderBy(cosine_distance(col("embedding"), vector_lit(q)), col("vec_id"))
        .limit(10)
      val t1 = System.nanoTime()
      val fPlan = filteredTopK.queryExecution.optimizedPlan.toString
      val fMs = (System.nanoTime() - t1) / 1e6
      val fIn = "IN \\(".r.findAllIn(fPlan).length + "INSET".r.findAllIn(fPlan).length
      Thread.sleep(500)
      println(s"### filtered kNN: optimize took $fMs ms, plan-time jobs=${jobs.get}, IN/INSET occurrences=$fIn")
      // second run of the SAME bare kNN: memo hit should mean zero jobs
      jobs.set(0)
      val t2 = System.nanoTime()
      topK.queryExecution.optimizedPlan
      val ms2 = (System.nanoTime() - t2) / 1e6
      Thread.sleep(500)
      println(s"### bare kNN again (memo): optimize took $ms2 ms, plan-time jobs=${jobs.get}")

      // Graft.enable path: rule runs in the experimental extraOptimizations
      // batch (no CombineFilters there) — count fires + final plan shape
      val s3 = SparkSession.builder().getOrCreate().newSession()
      graft.plans.Graft.enable(s3)
      s3.read.parquet(tablePath).createOrReplaceTempView("items3")
      val t3 = System.nanoTime()
      val plan3 = s3.table("items3")
        .orderBy(cosine_distance(col("embedding"), vector_lit(q)), col("vec_id"))
        .limit(10).queryExecution.optimizedPlan.toString
      val ms3 = (System.nanoTime() - t3) / 1e6
      val nIn3 = "IN \\(".r.findAllIn(plan3).length + "INSET".r.findAllIn(plan3).length
      println(s"### Graft.enable bare kNN: optimize took $ms3 ms, IN/INSET occurrences=$nIn3, plan lines=${plan3.linesIterator.size}")
      println("### filtered optimized plan:\n" + fPlan.take(4000))
    } finally {
      AnnIndexRegistry.unregister(tablePath)
      spark.stop()
    }
  }
}
