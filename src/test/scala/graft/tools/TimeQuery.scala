// Throwaway timing helper: sbt "Test/runMain graft.tools.TimeQuery <query> <sfDir>"
package graft.tools
import org.apache.spark.sql.SparkSession
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(args(0))
    fn(spark, args(1)).count() // warm
    val t0 = System.nanoTime(); fn(spark, args(1)).count()
    println(f"TIMED ${args(0)} ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
