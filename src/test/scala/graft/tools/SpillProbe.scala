package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B the ObjectHashAggregate fallback threshold for one query at a
  * scale dir, printing sec + spill for each setting:
  *   Test/runMain graft.tools.SpillProbe <query> <dir> */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(args(0))
    val dir = args(1)
    val acc = new graft.util.ShuffleAccounting(spark.sparkContext)
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    def run(tag: String): Unit = {
      val (_, m0, d0) = acc.snapshotAll()
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val (_, m1, d1) = acc.snapshotAll()
      println(f"PROBE ${args(0)} $tag%-8s ${dt}%8.2f s  memSpill ${(m1 - m0) / 1e6}%9.1f MB  diskSpill ${(d1 - d0) / 1e6}%9.1f MB")
    }
    run("warm")
    // the warm run invoked registerAll -> tuneSession, which raised the
    // threshold — pin it back to Spark's default BEFORE the default leg,
    // or "default" silently measures the raised setting (ADVICE r12)
    spark.conf.set(key, "128")
    run("default")
    spark.conf.set(key, graft.functions.ObjectHashFallbackKeys.toString)
    run("raised")
    spark.conf.set(key, "128")
    run("default2")
    spark.stop()
  }
}
