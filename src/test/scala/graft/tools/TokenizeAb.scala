// Interleaved A/B of the whitespace tokenizer: builtin split(trim, "\s+")
// vs the byte-scanning ws_tokens expression, same session, alternating
// reps so box drift hits both arms equally.
//   sbt "Test/runMain graft.tools.TokenizeAb [reps] [sfDir]"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object TokenizeAb {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 5
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def oldTok = split(trim(col("text")), "\\s+")
    def newTok = graft.functions.TextFunctions.tokens(col("text"))

    // count distinct-ish agg so the array is fully consumed, not pruned
    def run(c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      docs.select(explode(c).as("t"))
        .select(sum(length(col("t")))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    run(oldTok); run(newTok) // warm both
    val olds = collection.mutable.ArrayBuffer.empty[Double]
    val news = collection.mutable.ArrayBuffer.empty[Double]
    (1 to reps).foreach { _ =>
      olds += run(oldTok)
      news += run(newTok)
    }
    println(f"[tokab] builtin  best=${olds.min}%.3f runs=${olds.map(t => f"$t%.3f").mkString(",")}")
    println(f"[tokab] ws_tokens best=${news.min}%.3f runs=${news.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
