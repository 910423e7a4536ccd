// Scratch profiler: sbt "Test/runMain graft.tools.AblateNgram /root/testdata/sf0.1"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

object AblateNgram {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[ablate] $label: ${(System.nanoTime() - t0) / 1e9}%.3fs"); r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    val sh = docs.select(col("doc_id"), explode(shingles3(tokens(col("text")))).as("shingle"))
    time("tokenize+shingle+explode count")(println(sh.count()))
    time("again")(sh.count())
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    time("sizes")(sizes.count())
    val common = sh.as("x").join(sh.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("c"))
    time("common cold")(println(common.count()))
    time("common warm")(common.count())
    val joined = common
      .join(sizes.as("sa"), col("a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("b") === col("sb.doc_id"))
      .select(col("a"), col("b"),
        (col("c").cast("double") / (col("sa.sz") + col("sb.sz") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= 0.1)
    time("full cold")(println(joined.count()))
    time("full warm")(joined.count())
    joined.explain("formatted")
    spark.stop()
  }
}
