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

  test("id-distinct heap: a duplicate id never occupies two slots, across merges too") {
    // direct buffer: dup id with bit-equal dist (the symmetric co-probe
    // case) occupies one slot; a better dist for a retained id improves
    // it in place
    val buf = new TopKBuffer(3)
    buf.offer(0.5, 10L); buf.offer(0.5, 10L); buf.offer(0.7, 20L)
    assert(buf.sorted.toSeq === Seq((0.5, 10L), (0.7, 20L)))
    buf.offer(0.3, 20L) // same id, better dist → replaces, heap stays valid
    assert(buf.sorted.toSeq === Seq((0.3, 20L), (0.5, 10L)))
    buf.offer(0.9, 30L); buf.offer(0.8, 40L) // 30 evicted by 40
    assert(buf.sorted.toSeq === Seq((0.3, 20L), (0.5, 10L), (0.8, 40L)))
    // merge path (partial buffers from different partitions both saw id 10)
    val other = new TopKBuffer(3)
    other.offer(0.5, 10L); other.offer(0.1, 50L)
    buf.mergeFrom(other)
    assert(buf.sorted.toSeq === Seq((0.1, 50L), (0.3, 20L), (0.5, 10L)))
  }

  test("id-distinct heap through the aggregate: symmetric duplicate rows collapse") {
    // every (g, rid) candidate appears twice with bit-equal dist — the
    // exact stream shape knnGraphIvf's symmetric explode produces; top-k
    // must hold k DISTINCT neighbors, not k/2 duplicated ones
    val once = spark.range(40).select(
      (col("id") % 4).as("g"), col("id").as("rid"),
      (col("id").cast("double") / 40.0).as("dist"))
    val twice = once.unionAll(once)
    val k = 5
    def topSets(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("g").agg(top_k_by_distance(col("dist"), col("rid"), k).as("top"))
      .select(col("g"), explode(col("top.vec_id")).as("nbr"))
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val s1 = topSets(once)
    val s2 = topSets(twice)
    assert(s2 === s1)
    assert(s2.forall(_._2.size === k))
  }
}
