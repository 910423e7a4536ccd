// Throwaway stage profiler for the co-probe family's scale behavior:
//   sbt "Test/runMain graft.tools.ProfileKnnGraphIvf <sfDir>"
// Times each stage of knnGraphIvf separately (index build, probe
// assignment, candidate equi-join, bounded-heap top-k) so a super-linear
// scale ratio can be attributed to the stage that caused it.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfileKnnGraphIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.{cosine_distance, top_k_by_distance}
    import graft.operators.{IndexQueries, SimilarityQueries}

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val idx = time("index build (cached)") { IndexQueries.indexFor(spark, sfDir) }
    val cents = spark.read.parquet(s"$idx/centroids").select("list_id", "centroid")
    val nLists = cents.count()
    val e = graft.Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val n = e.count()
    println(s"corpus n=$n lists=$nLists probes=${SimilarityQueries.KnnGraphProbes}")

    val assigned = graft.index.IvfIndex.assignProbes(
      e, cents, "vec_id", "embedding", SimilarityQueries.KnnGraphProbes, metric = "cosine")
    time("assignProbes count")(println(s"  assigned rows: ${assigned.count()}"))
    time("assignProbes count (2nd)")(assigned.count())

    val cand = spark.read.parquet(s"$idx/lists")
      .join(assigned, Seq("list_id"))
      .filter(col("qid") =!= col("vec_id"))
    time("candidate join count")(println(s"  candidate rows: ${cand.count()}"))

    val scored = cand.select(col("qid"), col("vec_id"),
        cosine_distance(col("embedding"), col("qv")).as("dist"))
      .groupBy("qid")
      .agg(top_k_by_distance(col("dist"), col("vec_id"),
        SimilarityQueries.KnnGraphK).as("top"))
    time("join+score+heap count")(scored.count())

    time("full knnGraphIvf")(SimilarityQueries.knnGraphIvf(spark, sfDir).count())
    spark.stop()
  }
}
