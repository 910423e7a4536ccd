package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SimilarityQueries

class SparseVectorSpec extends SparkSpec {
  import spark.implicits._

  private val eps = SimilarityQueries.SparseEps

  test("sparse_vectorize keeps only |x| > eps, ascending indices; round-trips") {
    val df = Seq(Tuple1(Array(0.5f, -0.05f, 0.0f, -0.4f, 0.1f)))
      .toDF("v")
      .select(sparse_vectorize(col("v"), eps).as("s"), col("v"))
    val r = df.select("s.dim", "s.indices", "s.values").head()
    assert(r.getInt(0) === 5)
    // 0.1f widens to 0.10000000149… > 0.1d — kept, and both engines agree
    // because each compares the double-widened float to the double literal
    assert(r.getAs[collection.Seq[Int]](1) === Seq(0, 3, 4))
    assert(r.getAs[collection.Seq[Float]](2) === Seq(0.5f, -0.4f, 0.1f))
    val back = df.select(sparse_to_dense(col("s"))).head().getAs[collection.Seq[Float]](0)
    assert(back === Seq(0.5f, 0.0f, 0.0f, -0.4f, 0.1f))
  }

  test("sparse cosine/inner-product are bit-equal to dense on zero-masked vectors") {
    val e = graft.Tables.embeddings(spark, Sf0001)
    val masked = transform(col("embedding"),
      x => when(abs(x.cast("double")) > eps, x).otherwise(lit(0.0f)))
    val sv = sparse_vectorize(col("embedding"), eps)
    val pairs = e.select(col("vec_id"), masked.as("m"), sv.as("s"))
      .crossJoin(broadcast(
        e.filter(col("vec_id") === 0).select(masked.as("qm"), sv.as("qs"))))
    val rows = pairs.select(
      cosine_distance(col("m"), col("qm")).as("dense_cos"),
      sparse_cosine_distance(col("s"), col("qs")).as("sparse_cos"),
      inner_product(col("m"), col("qm")).as("dense_ip"),
      sparse_inner_product(col("s"), col("qs")).as("sparse_ip")).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val (dc, sc) = (r.getDouble(0), r.getDouble(1))
      assert(java.lang.Double.doubleToRawLongBits(dc)
        === java.lang.Double.doubleToRawLongBits(sc), s"cos $dc vs $sc")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2))
        === java.lang.Double.doubleToRawLongBits(r.getDouble(3)),
        s"ip ${r.getDouble(2)} vs ${r.getDouble(3)}")
    }
  }

  test("sparse l2/l1 are bit-equal to dense on zero-masked vectors") {
    import graft.functions.{l1_distance, l2_distance, sparse_l1_distance, sparse_l2_distance}
    val e = graft.Tables.embeddings(spark, Sf0001)
    val masked = transform(col("embedding"),
      x => when(abs(x.cast("double")) > eps, x).otherwise(lit(0.0f)))
    val sv = sparse_vectorize(col("embedding"), eps)
    val pairs = e.select(col("vec_id"), masked.as("m"), sv.as("s"))
      .crossJoin(broadcast(
        e.filter(col("vec_id") === 0).select(masked.as("qm"), sv.as("qs"))))
    val rows = pairs.select(
      l2_distance(col("m"), col("qm")).as("dense_l2"),
      sparse_l2_distance(col("s"), col("qs")).as("sparse_l2"),
      l1_distance(col("m"), col("qm")).as("dense_l1"),
      sparse_l1_distance(col("s"), col("qs")).as("sparse_l1")).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0))
        === java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"l2 ${r.getDouble(0)} vs ${r.getDouble(1)}")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2))
        === java.lang.Double.doubleToRawLongBits(r.getDouble(3)),
        s"l1 ${r.getDouble(2)} vs ${r.getDouble(3)}")
    }
  }

  test("sparse distance on disjoint supports; dimension mismatch throws") {
    val df = Seq(
      (Array(1.0f, 0.0f, 0.0f, 0.0f), Array(0.0f, 0.0f, 0.0f, 2.0f)))
      .toDF("a", "b")
      .select(sparse_vectorize(col("a"), eps).as("sa"),
        sparse_vectorize(col("b"), eps).as("sb"))
    val r = df.select(
      sparse_inner_product(col("sa"), col("sb")),
      sparse_cosine_distance(col("sa"), col("sb"))).head()
    assert(r.getDouble(0) === 0.0)
    assert(r.getDouble(1) === 1.0, "orthogonal supports → distance 1")
    val bad = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
      .select(sparse_inner_product(
        sparse_vectorize(col("a"), eps), sparse_vectorize(col("b"), eps)))
    val err = intercept[Exception] { bad.collect() }
    assert(err.getMessage != null)
  }

  test("sparse_knn_topk: self at rank 1, deterministic, nnz bounded by dim") {
    val r1 = SimilarityQueries.sparseKnnTopK(spark, Sf0001).collect()
    val r2 = SimilarityQueries.sparseKnnTopK(spark, Sf0001).collect()
    assert(r1.toSeq === r2.toSeq)
    assert(r1.head.getLong(0) === 0L)
    assert(math.abs(r1.head.getDouble(1)) < 1e-12, "self-distance ~ 0")
    assert(r1.forall(r => r.getLong(2) > 0 && r.getLong(2) <= 64))
  }
}
