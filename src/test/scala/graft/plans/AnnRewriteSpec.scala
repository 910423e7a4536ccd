package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{cosine_distance, vector_lit}
import graft.operators.IndexQueries

class AnnRewriteSpec extends SparkSpec {

  private lazy val indexPath = IndexQueries.indexFor(spark, Sf0001)
  private val tablePath = s"$Sf0001/embeddings.parquet"

  private def queryVec: Array[Float] =
    graft.Tables.embeddings(spark, Sf0001).filter(col("vec_id") === 0)
      .head().getAs[collection.Seq[Float]]("embedding").toArray

  private def topK(k: Int) =
    spark.read.parquet(tablePath)
      .orderBy(cosine_distance(col("embedding"), vector_lit(queryVec)), col("vec_id"))
      .limit(k)

  override def withFixture(test: NoArgTest) = {
    Graft.enable(spark)
    try super.withFixture(test)
    finally AnnIndexRegistry.unregister(tablePath)
  }

  test("unregistered table: plan unchanged (scans the base table)") {
    val plan = topK(10).queryExecution.executedPlan.toString
    assert(plan.contains("embeddings.parquet"))
    assert(!plan.contains("list_id"))
  }

  test("registered table: plan swaps to a pruned index scan") {
    AnnIndexRegistry.register(tablePath, indexPath, nprobe = 4)
    val df = topK(10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("list_id"), s"expected index scan:\n$plan")
    assert(!plan.contains("embeddings.parquet"), s"base table should be pruned out:\n$plan")
    // query's own cluster is always probed → vec 0 first
    assert(df.collect().head.getLong(0) === 0L)
  }

  test("nprobe = lists: rewritten plan returns exactly the exact answer") {
    val exact = topK(10).collect().map(_.getLong(0)).toSeq
    AnnIndexRegistry.register(tablePath, indexPath, nprobe = IndexQueries.Lists)
    val ann = topK(10).collect().map(_.getLong(0)).toSeq
    assert(ann === exact)
  }

  test("rewrite preserves full row schema (all columns readable)") {
    AnnIndexRegistry.register(tablePath, indexPath, nprobe = 4)
    val row = topK(3).select("vec_id", "label", "embedding").collect()
    assert(row.length === 3)
    assert(row.forall(_.getAs[collection.Seq[Float]]("embedding").length === 64))
  }
}
