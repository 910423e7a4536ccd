// Scratch timing runner for perf work on individual queries:
//   sbt "Test/runMain graft.tools.MiniBench <query1,query2,...> [sfDir]"
// Mirrors Bench's method (local[32], shuffle.partitions=32, warm-up then
// best-of-2 with a GC drain) so numbers are comparable to BENCH_r{N}.json.
package graft.tools

import org.apache.spark.sql.SparkSession

object MiniBench {
  def main(args: Array[String]): Unit = {
    val names =
      if (args.nonEmpty && args(0).nonEmpty) args(0).split(",").toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.tuneSession(spark) // mirror Bench exactly (r16)

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm-up
      System.gc(); Thread.sleep(500)
      val times = (1 to 2).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[minibench] $name%-28s best=${times.min}%.3f  runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
