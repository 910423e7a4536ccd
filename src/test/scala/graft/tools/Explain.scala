// Scratch explain runner: sbt "Test/runMain graft.tools.Explain <query> <sfDir>"
package graft.tools

import org.apache.spark.sql.SparkSession

object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    df.count()
    println(s"count time: ${(System.nanoTime() - t0) / 1e9}s")
    val t1 = System.nanoTime()
    df.count()
    println(s"warm count time: ${(System.nanoTime() - t1) / 1e9}s")
    spark.stop()
  }
}
