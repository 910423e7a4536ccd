// Scratch profiler: sbt "Test/runMain graft.tools.Ablate /root/testdata/sf0.1"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.cosine_distance

object Ablate {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[ablate] $label: ${(System.nanoTime() - t0) / 1e9}%.3fs"); r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
      .join(Tables.embeddings(spark, sfDir), col("doc_id") === col("vec_id"), "inner")
    time("warm scan")(Tables.documents(spark, sfDir).count())
    time("docs join count")(docs.count())
    time("docs join count again")(docs.count())
    val seed = docs.filter(col("text").ilike(graft.operators.ReferenceQueries.SeedPattern))
      .orderBy(col("doc_id")).limit(1).select(col("embedding").as("qv"))
    time("seed collect")(seed.collect())
    time("seed collect again")(seed.collect())
    val full = docs.crossJoin(broadcast(seed))
      .filter(!col("text").ilike(graft.operators.ReferenceQueries.SeedPattern))
      .select(col("doc_id"),
        (lit(1.0) - cosine_distance(col("embedding"), col("qv"))).as("similarity"))
      .orderBy(col("similarity").desc, col("doc_id")).limit(5)
    time("full cold")(full.count())
    time("full warm")(full.count())
    time("full warm2")(full.count())
    spark.stop()
  }
}
