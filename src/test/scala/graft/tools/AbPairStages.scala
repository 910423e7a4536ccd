// Paired in-JVM A/B of the two remaining ngram-dedup scale walls:
//   1. postings collect_list under threshold 128 vs raised (2^20)
//   2. wide-path pair expansion: struct explode vs nested primitive explode
//   SPARK_DRIVER_MEM=64g sbt "Test/runMain graft.tools.AbPairStages /tmp/graft_scale/x300"
package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

object AbPairStages {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_scale/x300"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.registerAll(spark)
    import graft.functions.TextFunctions._
    val acc = new graft.util.ShuffleAccounting(spark.sparkContext)
    val thKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"

    def time(name: String)(f: => Long): Unit = {
      System.gc()
      val (_, m0, d0) = acc.snapshotAll()
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      val (_, m1, d1) = acc.snapshotAll()
      println(f"[ab2] $name%-52s ${dt}%8.2f s  rows=$n%,14d  spill ${(m1 - m0 + d1 - d0) / 1e6}%9.1f MB")
    }

    val docs = graft.Tables.documents(spark, sfDir)
    def sh = graft.Tables.rowParallel(docs)
      .select(col("doc_id"), explode(shingles3(tokens(col("text")))).as("shingle"))
      .select(col("doc_id"), graft.functions.md5_long(col("shingle")).as("h"))
    def postingsDf = sh.groupBy("h").agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) <= graft.operators.Dedup.MaxShingleDf)

    // ---- 1. postings build threshold A/B (interleaved, 2 reps) --------
    postingsDf.count() // warm
    (1 to 2).foreach { r =>
      spark.conf.set(thKey, "128")
      time(s"postings TH=128          rep$r")(postingsDf.count())
      spark.conf.set(thKey, graft.functions.ObjectHashFallbackKeys.toString)
      time(s"postings TH=2^20         rep$r")(postingsDf.count())
    }

    // ---- 2. pair expansion variants over a FIXED checkpointed postings -
    spark.conf.set(thKey, "128")
    val postings = postingsDf.localCheckpoint()
    println(s"[ab2] postings checkpointed: ${postings.count()} lists")
    spark.conf.set(thKey, graft.functions.ObjectHashFallbackKeys.toString)

    // current shape: struct explode -> repartition -> count
    def structPairs = postings
      .select(explode(graft.functions.sorted_pairs(col("ids"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    // candidate: nested primitive explode (posexplode + slice), no structs
    def nestedPairs = postings
      .select(array_sort(col("ids")).as("ids"))
      .select(col("ids"), posexplode(col("ids")))
      .select(col("col").as("a"),
        explode(slice(col("ids"), col("pos") + lit(2),
          lit(graft.operators.Dedup.MaxShingleDf))).as("b"))

    def agg(df: org.apache.spark.sql.DataFrame) =
      df.repartition(col("a"), col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("c")).count()

    structPairs.count(); nestedPairs.count() // warm the explode paths
    (1 to 2).foreach { r =>
      time(s"pairs explode only STRUCT rep$r")(structPairs.count())
      time(s"pairs explode only NESTED rep$r")(nestedPairs.count())
    }
    (1 to 2).foreach { r =>
      time(s"pairCounts STRUCT         rep$r")(agg(structPairs))
      time(s"pairCounts NESTED         rep$r")(agg(nestedPairs))
    }

    // ---- 3. DENSE-PACKED wide-id alternative --------------------------
    // Densify doc ids to [0, n) (zipWithIndex over the sorted id set —
    // distributed, deterministic), then run the NARROW packed-key pair
    // count even though the raw id space is wide: explode emits primitive
    // longs instead of 2-long structs (smaller shuffle rows, half-size
    // aggregate hash maps, no per-pair struct allocation). Survivor
    // mapping back to raw ids is pair-result-sized (tiny) and untimed
    // here; the densify join on the shingle relation IS timed.
    {
      import spark.implicits._
      val t0 = System.nanoTime()
      val dmap = docs.select("doc_id").orderBy("doc_id").rdd
        .map(_.getLong(0)).zipWithIndex()
        .toDF("doc_id", "dense")
        .localCheckpoint()
      println(f"[ab2] dense map built: ${dmap.count()}%,d docs in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      def shD = graft.Tables.rowParallel(docs)
        .select(col("doc_id"), explode(shingles3(tokens(col("text")))).as("shingle"))
        .select(col("doc_id"), graft.functions.md5_long(col("shingle")).as("h"))
        .join(broadcast(dmap), "doc_id")
        .select(col("dense").as("doc_id"), col("h"))
      def postDf = shD.groupBy("h").agg(collect_list(col("doc_id")).as("ids"))
        .filter(size(col("ids")) <= graft.operators.Dedup.MaxShingleDf)
      spark.conf.set(thKey, "128")
      time("dense postings build TH=128 (w/ densify join)")(postDf.count())
      val postD = postDf.localCheckpoint()
      println(s"[ab2] dense postings checkpointed: ${postD.count()} lists")
      spark.conf.set(thKey, graft.functions.ObjectHashFallbackKeys.toString)
      def densePairs = postD
        .select(explode(graft.functions.sorted_pair_keys(col("ids"))).as("pk"))
      def aggDense = densePairs.repartition(col("pk"))
        .groupBy("pk").agg(count(lit(1)).as("c")).count()
      aggDense // warm
      (1 to 2).foreach { r =>
        time(s"pairCounts DENSE-PACKED   rep$r")(aggDense)
        time(s"pairCounts STRUCT (ctrl)  rep$r")(agg(structPairs))
      }

      // ---- 4. initialPartitionNum A/B on the winning count shape ------
      // (the r13 session-wide 16x raise measurably hurts the co-probe
      // family; does the pair count actually need it, or does AQE
      // coalescing make 32-wide starts equivalent here?)
      val initKey = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
      val tuned = spark.conf.get(initKey)
      (1 to 2).foreach { r =>
        spark.conf.set(initKey, tuned)
        time(s"pairCounts DENSE INIT=$tuned rep$r")(aggDense)
        spark.conf.set(initKey, "32")
        time(s"pairCounts DENSE INIT=32   rep$r")(aggDense)
      }
      spark.conf.set(initKey, tuned)
    }
    spark.stop()
  }
}
