// Scratch profiler for the ngram dedup pipeline stages:
//   sbt "Test/runMain graft.tools.ProfileDedup [sfDir]"
package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions._

    def time(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-42s ${(System.nanoTime() - t0) / 1e9}%.3f s  (rows=$n)")
    }

    val docs = graft.Tables.documents(spark, sfDir)
    val sh = docs.select(col("doc_id"), explode(shingles3(tokens(col("text")))).as("shingle"))

    time("docs scan")(docs.count())
    time("tokenize only")(docs.select(explode(tokens(col("text")))).count())
    time("shingleRel (tokenize+shingle+explode)")(sh.count())
    time("sizes: sh groupBy doc_id count")(sh.groupBy("doc_id").count().count())
    val postings = sh.groupBy("shingle").agg(collect_list(col("doc_id")).as("ids"))
    time("postings: groupBy shingle collect_list")(postings.count())
    val pairs = postings
      .select(explode(graft.functions.sorted_pairs(col("ids"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    time("pair expansion")(pairs.count())
    time("pair counts groupBy(a,b)")(pairs.groupBy("a", "b").count().count())
    time("full dedup_ngram")(graft.operators.Dedup.dedupNgram(spark, sfDir).count())

    // hashed-shingle variant: same pipeline over md5_long(shingle)
    val shH = sh.select(col("doc_id"), graft.functions.md5_long(col("shingle")).as("shingle"))
    val postingsH = shH.groupBy("shingle").agg(collect_list(col("doc_id")).as("ids"))
    val pairsH = postingsH
      .select(explode(graft.functions.sorted_pairs(col("ids"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    time("HASHED shingleRel")(shH.count())
    time("HASHED postings")(postingsH.count())
    time("HASHED pair counts")(pairsH.groupBy("a", "b").count().count())

    spark.stop()
  }
}
