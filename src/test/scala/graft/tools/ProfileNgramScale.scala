// Stage-level time/shuffle/spill breakdown of the capped-ngram dedup
// pipeline at a scale dir — finds WHERE the sf30 spill wall lives:
//   SPARK_DRIVER_MEM=64g sbt "Test/runMain graft.tools.ProfileNgramScale /tmp/graft_scale/x300"
package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

object ProfileNgramScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_scale/x300"
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", "32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.registerAll(spark)
    import graft.functions.TextFunctions._
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

    val docs = graft.Tables.documents(spark, sfDir)
    val sh = graft.Tables.rowParallel(docs)
      .select(col("doc_id"), explode(shingles3(tokens(col("text")))).as("shingle"))
      .select(col("doc_id"), graft.functions.md5_long(col("shingle")).as("h"))

    time("docs scan")(docs.count())
    time("hashedShingleRel")(sh.count())
    val sessionParts0 = spark.sessionState.conf.numShufflePartitions
    // the EXACT postings shape dedupNgramCapped plans (scoped 128-key sort
    // fallback + wide initial partitions) — isolates the r14 suspect: the
    // MAP-SIDE partial ObjectHashAggregate's sort fallback externally
    // sorting the whole shingle stream at input partitioning
    time("postings SCOPED (fallback=128 + initParts, partial agg)") {
      graft.functions.withSqlConf(spark,
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "128",
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum" ->
          graft.functions.InitialShufflePartitionsFor(sessionParts0).toString) {
        sh.groupBy("h").agg(collect_list(col("doc_id")).as("ids"))
          .filter(size(col("ids")) <= graft.operators.Dedup.MaxShingleDf)
          .localCheckpoint().count()
      }
    }
    // candidate fix: explicit sized exchange on h BEFORE the aggregate —
    // distribution satisfied => planner plans a FINAL-ONLY agg (no
    // map-side partial to sort-fallback over the raw scan partitioning)
    val wPost = graft.util.Exchanges.widthFor(
      260L * 1000 * 1000, sessionParts0, 4L * 1000 * 1000)
    time(s"postings EXCHANGED (repartition h w=$wPost, final-only agg)") {
      graft.functions.withSqlConf(spark,
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "128") {
        sh.repartition(wPost, col("h"))
          .groupBy("h").agg(collect_list(col("doc_id")).as("ids"))
          .filter(size(col("ids")) <= graft.operators.Dedup.MaxShingleDf)
          .localCheckpoint().count()
      }
    }
    val postingsNoCk = sh.groupBy("h").agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) <= graft.operators.Dedup.MaxShingleDf)
    val postings = postingsNoCk.localCheckpoint()
    time("postings (session-threshold build + ckpt)")(postings.count())
    val sizes = postings.select(explode(col("ids")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("sz"))
    time("sizes from postings")(sizes.count())
    val wide = graft.operators.Dedup.idsWide(docs)
    println(s"[pfl] idsWide=$wide")
    // SIZED variants — exactly the shapes dedupNgramCapped plans past the
    // broadcast tier, isolated so spill can be attributed per stage
    val nPairs = {
      val sz = size(col("ids")).cast("long")
      postings.agg(sum(sz * (sz - lit(1L)) / lit(2L)).cast("long")).head().getLong(0)
    }
    val w = graft.operators.Dedup.pairAggPartitions(
      nPairs, spark.sessionState.conf.numShufflePartitions)
    println(s"[pfl] nPairs=$nPairs sizedWidth=$w")
    // pairCounts decomposition: explode alone (no pair exchange), the
    // exchange alone (toRdd foreach — write + read, no aggregate), then
    // the full exchange + (a,b)-count — attributes the 1000× spill to
    // volume (shuffle-writer buffer recycling) vs aggregate pathology
    val rawPairs = postings
      .select(explode(graft.functions.sorted_pairs(col("ids"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    time("pairs EXPLODE only (no exchange)")(rawPairs.count())
    time(s"pairs EXCHANGE only (w=$w, no agg)")(
      rawPairs.repartition(w, col("a")).queryExecution.toRdd.count())
    val commonSized = graft.operators.Dedup.pairCounts(postings, wide, Some(w))
    time(s"pairCounts SIZED (w=$w)")(commonSized.count())
    // the single-exchange shape dedupNgramCapped plans past the broadcast
    // tier: sa join reuses pairCounts' a-partitioning, prefilter
    // c ≥ t·sa, survivor-sized b join
    val joinedSized = commonSized
      .join(sizes.as("sa").hint("shuffle_hash"), col("a") === col("sa.doc_id"))
      .filter(col("c").cast("double") >=
        lit(graft.operators.Dedup.NgramThreshold) * col("sa.sz").cast("double") - lit(1e-9))
      .join(sizes.as("sb").hint("shuffle_hash"), col("b") === col("sb.doc_id"))
      .select(col("a"), col("b"),
        (col("c").cast("double") / (col("sa.sz") + col("sb.sz") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= graft.operators.Dedup.NgramThreshold)
    time("jaccard join SIZED (1-exchange + prefilter)")(joinedSized.count())
    if (sys.env.get("SPARK_GRAFT_PROFILE_UNSIZED").contains("1")) {
      val common = graft.operators.Dedup.pairCounts(postings, wide)
      time("pairCounts (explode pairs + groupBy)")(common.count())
      val joined = common
        .join(sizes.as("sa"), col("a") === col("sa.doc_id"))
        .join(sizes.as("sb"), col("b") === col("sb.doc_id"))
        .select(col("a"), col("b"),
          (col("c").cast("double") / (col("sa.sz") + col("sb.sz") - col("c"))).as("jaccard"))
        .filter(col("jaccard") >= graft.operators.Dedup.NgramThreshold)
      time("jaccard join + filter")(joined.count())
    }
    if (!sys.env.get("SPARK_GRAFT_PROFILE_FULL").contains("0")) {
      time("FULL dedup_ngram_capped")(
        graft.operators.Dedup.dedupNgramCapped(spark, sfDir).count())
      time("FULL dedup_clean")(
        graft.operators.Dedup.dedupClean(spark, sfDir).count())
    }
    spark.stop()
  }
}
