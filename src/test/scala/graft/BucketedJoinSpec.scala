package graft

import org.apache.spark.sql.functions._

/** Bucketing demo (builder brief: "bucketing for co-located joins").
  * Pre-bucketing both fact tables on the join key lets repeated joins run
  * WITHOUT a shuffle — at 100 TB the one-time bucketed write amortizes
  * across every downstream join. Asserted here by the absence of a shuffle
  * Exchange in the physical plan of a bucketed-bucketed join.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed lineitem ⋈ orders plans without a shuffle exchange") {
    // external table paths (warehouse.dir is a static conf on a live session)
    val wh = graft.util.TempDirs.create("graft_wh").toString
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    Tables.lineitem(spark, Sf0001)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").saveAsTable("li_b")
    Tables.orders(spark, Sf0001)
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/ord_b").saveAsTable("ord_b")

    val joined = spark.table("li_b").join(spark.table("ord_b"), "l_orderkey")
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
    // co-located: no shuffle before the join (bucket layout IS the
    // partitioning); only the scan-side bucket reads appear
    val plan = joined.queryExecution.executedPlan.toString
    val exchangesBeforeJoin = plan.split("SortMergeJoin").head
    assert(!exchangesBeforeJoin.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    // and it still computes the right answer
    val n = joined.count()
    val expected = Tables.lineitem(spark, Sf0001)
      .join(Tables.orders(spark, Sf0001),
        col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey").distinct().count()
    assert(n === expected)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
  }
}
