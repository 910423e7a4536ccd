package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ReferenceQueriesSpec extends SparkSpec {

  test("entry / knn_topk returns k rows with seed first (self-similarity 1.0)") {
    val rows = ReferenceQueries.knnTopK(spark, Sf0001).collect()
    assert(rows.length === 10)
    // nearest neighbor of vec 0 is vec 0 itself
    assert(rows.head.getAs[Long]("vec_id") === 0L)
    assert(math.abs(rows.head.getAs[Double]("similarity") - 1.0) < 1e-9)
    // similarities are non-increasing
    val sims = rows.map(_.getAs[Double]("similarity"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("top-k(k=n) equals full sort (SURVEY.md §5 property)") {
    val n = graft.Tables.embeddings(spark, Sf0001).count().toInt
    val topAll = ReferenceQueries.knnTopK(spark, Sf0001, n).collect().map(_.getLong(0))
    val full = ReferenceQueries.knnTopK(spark, Sf0001, n + 100).collect().map(_.getLong(0))
    assert(topAll.toSeq === full.toSeq)
  }

  test("knn_cte_seed excludes the seed pattern and returns 5 rows") {
    val df = ReferenceQueries.knnCteSeed(spark, Sf0001)
    val rows = df.collect()
    assert(rows.length === 5)
    val docs = graft.Tables.documents(spark, Sf0001)
    val excluded = docs.filter(col("text").ilike(ReferenceQueries.SeedPattern))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).forall(id => !excluded.contains(id)))
  }

  test("self_sim is ≈1 for every row") {
    val bad = ReferenceQueries.selfSim(spark, Sf0001)
      .filter(abs(col("self_sim") - 1.0) > 1e-9).count()
    assert(bad === 0)
  }

  test("avg_pairwise_sim returns a single bounded value") {
    val v = ReferenceQueries.avgPairwiseSim(spark, Sf0001).head().getDouble(0)
    assert(v >= -1.0 && v <= 1.0)
  }

  test("count/list/recent/ilike/dims shapes") {
    assert(ReferenceQueries.countDocs(spark, Sf0001).head().getLong(0) === 500L)
    assert(ReferenceQueries.listDocs(spark, Sf0001).count() === 500L)
    val recent = ReferenceQueries.recentDocs(spark, Sf0001).collect()
    assert(recent.map(_.getLong(0)).toSeq === Seq(499L, 498L, 497L, 496L, 495L))
    val il = ReferenceQueries.ilikeFilter(spark, Sf0001)
    assert(il.count() > 0)
    val dims = ReferenceQueries.vectorDims(spark, Sf0001)
      .select("dim").distinct().collect().map(_.getLong(0)).toSeq
    assert(dims === Seq(64L))
  }

  test("l2/ip top-k deterministic ordering") {
    val l2 = ReferenceQueries.l2TopK(spark, Sf0001).collect()
    assert(l2.length === 10 && l2.head.getLong(0) === 0L && l2.head.getDouble(1) === 0.0)
    val ip = ReferenceQueries.ipTopK(spark, Sf0001).collect()
    assert(ip.length === 10)
    val ips = ip.map(_.getAs[Double]("ip"))
    assert(ips.zip(ips.tail).forall { case (a, b) => a >= b })
  }

  test("flagship plan compiles to TakeOrderedAndProject with broadcast seed (scale audit)") {
    val plan = ReferenceQueries.knnTopK(spark, Sf0001).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k physical op, got:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"), s"expected broadcast seed join, got:\n$plan")
  }
}
