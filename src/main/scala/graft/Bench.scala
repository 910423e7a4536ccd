package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line.
  *
  * Method: one untimed warm-up execution per query (absorbs JVM/JIT,
  * whole-stage-codegen compilation and parquet footer reads — one-time
  * session costs that would otherwise dwarf the ~sub-second steady-state
  * query times at local scale), then the best of 2 timed runs; `total` is
  * the sum of per-query times.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val queries = SparkEntry.queries.toSeq.sortBy(_._1)

    // Warm-up: run each query once, untimed.
    queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count()
      catch { case _: Throwable => () }
    }

    val results = queries.map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
