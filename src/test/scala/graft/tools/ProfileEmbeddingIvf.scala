// Stage-level time/shuffle/spill breakdown of dedup_embedding_ivf at a
// scale dir — attributes the 1000×-point cost (bench_sf100.json: 173 s,
// 28.6 GB shuffle, zero spill) to assignment vs candidate join vs the
// survivor tail:
//   SPARK_DRIVER_MEM=64g sbt "Test/runMain graft.tools.ProfileEmbeddingIvf /tmp/graft_scale_r14/x1000"
package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

object ProfileEmbeddingIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_scale_r14/x1000"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.{cosine_distance, cosine_similarity}
    import graft.operators.{Dedup, IndexQueries}
    val acc = new graft.util.ShuffleAccounting(spark.sparkContext)

    def time(name: String)(f: => Long): Unit = {
      System.gc()
      val (s0, m0, d0) = acc.snapshotAll()
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      val (s1, m1, d1) = acc.snapshotAll()
      println(f"[pfl] $name%-46s ${dt}%8.2f s  rows=$n%,14d  shuffle ${(s1 - s0) / 1e6}%9.1f MB  spill ${(m1 - m0 + d1 - d0) / 1e6}%9.1f MB")
    }

    val t0 = System.nanoTime()
    val idx = IndexQueries.indexFor(spark, sfDir)
    println(f"[pfl] index build/cache lookup ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val cents = spark.read.parquet(s"$idx/centroids").select("list_id", "centroid")
    val e = graft.Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val n = e.count()
    val nLists = cents.count()
    println(s"[pfl] n=$n lists=$nLists occupancy=${(n + nLists - 1) / nLists} probes=${Dedup.EmbeddingIvfProbes}")

    val assigned = graft.index.IvfIndex.assignProbes(
      e, cents, "vec_id", "embedding", Dedup.EmbeddingIvfProbes, metric = "cosine")
    time("assignProbes")(assigned.count())
    time("assignProbes (2nd)")(assigned.count())

    // the sized candidate join exactly as dedupEmbeddingIvf plans it
    val occupancy = (n + nLists - 1) / nLists
    val cands = Dedup.EmbeddingIvfProbes.toLong * n * occupancy
    val w = graft.util.Exchanges.widthFor(
      cands, spark.sessionState.conf.numShufflePartitions, 4L * 1000 * 1000)
    println(s"[pfl] cands=$cands sizedWidth=$w")
    val home = spark.read.parquet(s"$idx/lists")
      .select(col("vec_id").as("m"), col("embedding").as("mv"), col("list_id"))
    val scored = assigned.repartition(w, col("list_id"))
      .join(home.hint("shuffle_hash"), Seq("list_id"))
      .filter(col("qid") =!= col("m"))
    time("candidate join (count only, no scoring)")(scored.count())
    val surv = scored.select(least(col("qid"), col("m")).as("a"),
        greatest(col("qid"), col("m")).as("b"),
        cosine_similarity(col("qv"), col("mv")).as("sim"))
      .filter(col("sim") >= Dedup.EmbeddingThreshold)
    time("+ scoring + threshold filter")(surv.count())
    time("FULL dedup_embedding_ivf")(
      Dedup.dedupEmbeddingIvf(spark, sfDir).count())
    time("FULL knn_graph_ivf (comparison)")(
      graft.operators.SimilarityQueries.knnGraphIvf(spark, sfDir).count())
    spark.stop()
  }
}
