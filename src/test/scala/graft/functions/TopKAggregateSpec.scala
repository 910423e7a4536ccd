package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two-phase top-k aggregate must agree EXACTLY with the window
  * formulation it replaces (row_number over (dist ASC, id ASC)), including
  * duplicate-distance tie-breaks and groups smaller than k. */
class TopKAggregateSpec extends SparkSpec {

  test("top_k_by_distance equals the row_number window on adversarial data") {
    // 8 groups × 1000 rows with heavy distance ties (dist quantized to 10
    // levels) — tie-break correctness is the risky part of a heap impl
    val df = spark.range(8000).select(
      (col("id") % 8).as("g"),
      col("id").as("rid"),
      ((pmod(col("id") * 2654435761L % 1000000007L, lit(10))).cast("double") / 10.0).as("dist"))
      .persist()
    val k = 7
    val viaWindow = df
      .withColumn("rank", row_number().over(
        Window.partitionBy("g").orderBy(col("dist"), col("rid"))).cast("long"))
      .filter(col("rank") <= k)
      .select("g", "rank", "rid", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val viaHeap = df
      .groupBy("g").agg(top_k_by_distance(col("dist"), col("rid"), k).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("g"), (col("pos") + 1).cast("long").as("rank"),
        col("s.vec_id"), col("s.dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(viaHeap === viaWindow)
    df.unpersist()
  }

  test("groups smaller than k return all members, sorted") {
    val df = spark.range(3).select(lit(0L).as("g"), col("id").as("rid"),
      (lit(3.0) - col("id").cast("double")).as("dist"))
    val rows = df.groupBy("g")
      .agg(top_k_by_distance(col("dist"), col("rid"), 10).as("top"))
      .select(explode(col("top")).as("s")).select("s.vec_id", "s.dist")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows === Seq((2L, 1.0), (1L, 2.0), (0L, 3.0)))
  }

  test("tuneSession raises the ObjectHashAggregate fallback, never tramples an explicit value") {
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val before = spark.conf.getOption(key)
    try {
      // SparkSpec's session already ran tuneSession — many-distinct-key
      // bounded-heap aggregates must not hit the 128-key sort fallback
      assert(spark.conf.get(key) === graft.functions.ObjectHashFallbackKeys.toString)
      // an explicit user setting survives a re-tune
      spark.conf.set(key, "777")
      graft.functions.tuneSession(spark)
      assert(spark.conf.get(key) === "777")
      // the Spark default (or an explicit 128) is raised
      spark.conf.set(key, "128")
      graft.functions.tuneSession(spark)
      assert(spark.conf.get(key) === graft.functions.ObjectHashFallbackKeys.toString)
    } finally before.foreach(spark.conf.set(key, _))
  }
}
