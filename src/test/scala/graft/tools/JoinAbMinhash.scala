// Paired in-JVM A/B of the LSH pair pipeline's join-strategy hints:
//   sbt "Test/runMain graft.tools.JoinAbMinhash [sfDir] [reps]"
// Interleaves minhashPairs(sh, big=true) (forced shuffle_hash) with
// big=false (Spark's own selection / AQE auto-broadcast) in one session,
// so box drift hits both legs equally — the method the r12 shuffle_hash
// switch was measured with at 300x.
package graft.tools

import org.apache.spark.sql.SparkSession

object JoinAbMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.registerAll(spark)
    val acc = new graft.util.ShuffleAccounting(spark.sparkContext)
    def sh = graft.operators.Dedup.hashedShingleRelOf(
      graft.Tables.documents(spark, sfDir))
    def leg(big: Boolean): (Double, Double) = {
      val (s0, m0, d0) = acc.snapshotAll()
      val t0 = System.nanoTime()
      graft.operators.Dedup.minhashPairs(sh, big).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val (s1, m1, d1) = acc.snapshotAll()
      (dt, (s1 - s0) / 1e6)
    }
    leg(true); leg(false) // warm both plans
    val rows = (1 to reps).flatMap { r =>
      System.gc()
      val (tH, shH) = leg(true)
      System.gc()
      val (tN, shN) = leg(false)
      println(f"[ab] rep$r  hinted ${tH}%6.3f s (${shH}%8.1f MB shuffle)   unhinted ${tN}%6.3f s (${shN}%8.1f MB shuffle)")
      Seq((tH, tN))
    }
    val (hs, ns) = (rows.map(_._1), rows.map(_._2))
    println(f"[ab] BEST   hinted ${hs.min}%6.3f s   unhinted ${ns.min}%6.3f s   MEDIANish hinted ${hs.sorted.apply(hs.size / 2)}%6.3f unhinted ${ns.sorted.apply(ns.size / 2)}%6.3f")
    spark.stop()
  }
}
