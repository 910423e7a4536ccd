// Paired in-JVM A/B of the r13 input-scaled shuffle sizing
// (spark.sql.adaptive.coalescePartitions.initialPartitionNum = 16x
// parallelism) against a constant shuffle-partition count, on the scale
// queries the r13 sf30 artifact shows slower than r12's: the co-probe ANN
// family (+~30-100% wall with only ~5-10% more shuffle bytes — overhead
// shape, not plan shape) and the capped-ngram pipeline.
//   SPARK_DRIVER_MEM=64g sbt "Test/runMain graft.tools.AbInitParts /tmp/graft_scale/x300"
package graft.tools

import org.apache.spark.sql.SparkSession

object AbInitParts {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_scale/x300"
    val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPS", "2").toInt
    val queries = sys.env.get("SPARK_GRAFT_AB_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("dedup_embedding_ivf", "knn_graph_ivf",
        "semantic_clusters_ivf", "dedup_ngram_capped"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.registerAll(spark) // applies tuneSession (512 initial)
    val acc = new graft.util.ShuffleAccounting(spark.sparkContext)
    val initKey = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    val tuned = spark.conf.get(initKey) // 16x32 = 512 from tuneSession

    def time(name: String)(f: => Long): Unit = {
      System.gc()
      val (s0, m0, d0) = acc.snapshotAll()
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      val (s1, m1, d1) = acc.snapshotAll()
      println(f"[abp] $name%-44s ${dt}%8.2f s  rows=$n%,12d  shuffle ${(s1 - s0) / 1e6}%9.1f MB  spill ${(m1 - m0 + d1 - d0) / 1e6}%9.1f MB")
    }

    queries.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      fn(spark, sfDir).count() // warm (index builds, codegen)
      (1 to reps).foreach { r =>
        spark.conf.set(initKey, tuned)
        time(s"$q INIT=$tuned rep$r")(fn(spark, sfDir).count())
        spark.conf.set(initKey, "32")
        time(s"$q INIT=32   rep$r")(fn(spark, sfDir).count())
      }
      spark.conf.set(initKey, tuned)
    }
    spark.stop()
  }
}
