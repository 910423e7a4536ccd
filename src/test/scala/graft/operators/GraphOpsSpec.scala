package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("distributed kernel equals the driver kernel bit-for-bit on the type graph") {
    val ev = graft.Tables.events(spark, Sf0001)
      .select(col("user_id"), col("event_id"), col("event_type"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("event_id")
    val edges = ev
      .select(col("event_type").as("dst"),
        lag(col("event_type"), 1).over(w).as("src"))
      .filter(col("src").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    val nodes = ev.select(col("event_type").as("node")).distinct()
    val driver = GraphOps.pageRank(nodes, edges, iterations = 2, damping = 0.85)
      .orderBy("node").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val dist = GraphOps.pageRank(nodes, edges, iterations = 2, damping = 0.85,
        forceDistributed = true)
      .orderBy("node").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(dist === driver, "the two kernels share one numeric contract")
  }

  test("pagerank: hand-checked 3-node chain, both kernels") {
    // a -> b (w=1), b -> c (w=1): after 1 iteration with d=0.5, n=3:
    // contrib(b) = round9(1/3 · 1/1) ; contrib(c) likewise; a gets none
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L)).toDF("src", "dst", "w")
    val nodes = Seq("a", "b", "c").toDF("node")
    val third = java.math.BigDecimal.valueOf(1.0 / 3)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
    val expect = Map(
      "a" -> (0.5 / 3),
      "b" -> (0.5 / 3 + 0.5 * third),
      "c" -> (0.5 / 3 + 0.5 * third))
    for (force <- Seq(false, true)) {
      val got = GraphOps.pageRank(nodes, edges, iterations = 1, damping = 0.5,
          forceDistributed = force)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got === expect, s"forceDistributed=$force")
    }
  }

  test("kernel contract: long node ids canonicalize to string and unknown-src edges drop, both kernels") {
    // long-keyed graph with one edge from a node outside the node set
    // (stale snapshot shape): both kernels must return the same
    // string-typed schema and drop the unknown edge rather than throw
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (99L, 1L, 5L)).toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val results = Seq(false, true).map { force =>
      val df = GraphOps.pageRank(nodes, edges, iterations = 2, damping = 0.85,
        forceDistributed = force)
      assert(df.schema("node").dataType === org.apache.spark.sql.types.StringType,
        s"forceDistributed=$force must canonicalize node ids to string")
      df.orderBy("node").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    }
    assert(results(0) === results(1), "kernels must agree after dropping the stale edge")
  }

  test("user_pagerank: the forced-distributed contract query equals its driver-kernel twin") {
    // same edge construction as StarSchemaQueries.userPagerank, but routed
    // through the driver kernel — pins that the contract query's forced
    // iterate-join path is bit-equal to exact local arithmetic
    val ev = graft.Tables.events(spark, Sf0001)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"), date_trunc("hour", col("ts")))
      .orderBy(col("ts"), col("event_id"))
    val edges = ev
      .select(col("user_id").as("dst"), lag(col("user_id"), 1).over(w).as("src"))
      .filter(col("src").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    val nodes = ev.select(col("user_id").as("node")).distinct()
    val driverTwin = GraphOps.pageRank(nodes, edges, iterations = 2,
        damping = StarSchemaQueries.PrDamping)
      .select(col("node").cast("long").as("user_id"), col("pagerank"))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val contract = StarSchemaQueries.userPagerank(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(contract.nonEmpty)
    assert(contract === driverTwin, "forced-distributed contract ≡ driver kernel")
  }

  test("1M-edge smoke: distributed kernel iterates a graph no driver edge list should hold") {
    // deterministic synthetic graph: 50k nodes, 1M edges (20 out-edges per
    // node via affine maps — no RNG, reproducible)
    val n = 50000L
    val nodes = spark.range(n).select(col("id").cast("string").as("node"))
    val edges = spark.range(n)
      .select(col("id"), explode(sequence(lit(1), lit(20))).as("j"))
      .select(col("id").cast("string").as("src"),
        pmod(col("id") * col("j") + col("j") * lit(7919L), lit(n)).cast("string").as("dst"),
        lit(1L).as("w"))
    assert(edges.count() === 20L * n)
    val ranks = GraphOps.distributedPageRank(nodes, edges, iterations = 2, damping = 0.85)
    assert(ranks.count() === n)
    val agg = ranks.agg(sum("pagerank").as("s"), min("pagerank").as("mn")).head()
    // dangling mass is dropped, so total rank ≤ 1 but stays substantial;
    // every node keeps at least the teleport floor
    assert(agg.getDouble(0) > 0.5 && agg.getDouble(0) <= 1.000001)
    assert(agg.getDouble(1) >= (1.0 - 0.85) / n)
  }
}
