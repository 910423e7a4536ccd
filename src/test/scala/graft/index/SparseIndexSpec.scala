package graft.index

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{sparse_cosine_distance, sparse_vectorize}

class SparseIndexSpec extends SparkSpec {
  import spark.implicits._

  /** Genuinely sparse fixture (~3% density): 400 lexical-TF-shaped vectors
    * over 1000 dims, each with 30 non-zeros at deterministic positions. */
  private lazy val (tablePath, indexPath) = {
    val dim = 1000
    val rows = (0L until 400L).map { id =>
      val v = new Array[Float](dim)
      (0 until 30).foreach { j =>
        v(((id * 37 + j * j * 13 + 7) % dim).toInt) = ((id + j) % 9 + 1) * 0.1f
      }
      (id, v)
    }
    val dir = graft.util.TempDirs.create("graft_sparse_fix").toString
    rows.toDF("vec_id", "embedding").coalesce(2)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val idx = s"$dir/index"
    SparseIndex.build(
      spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), sparse_vectorize(col("embedding"), 0.0).as("sv")),
      idx)
    (s"$dir/embeddings.parquet", idx)
  }

  private def queryOf(id: Long): (Array[Int], Array[Float]) = {
    val r = spark.read.parquet(tablePath).filter(col("vec_id") === id)
      .select(sparse_vectorize(col("embedding"), 0.0).as("sv"))
      .select("sv.indices", "sv.values").head()
    (r.getAs[collection.Seq[Int]](0).toArray, r.getAs[collection.Seq[Float]](1).toArray)
  }

  private def bruteForce(id: Long, k: Int): Seq[(Long, Double)] = {
    val e = spark.read.parquet(tablePath)
      .select(col("vec_id"), sparse_vectorize(col("embedding"), 0.0).as("sv"))
    val seed = e.filter(col("vec_id") === id).select(col("sv").as("qv"))
    e.crossJoin(broadcast(seed))
      .select(col("vec_id"), sparse_cosine_distance(col("sv"), col("qv")).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(k)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  test("indexed kNN equals brute-force merge-walk bit-for-bit (several queries)") {
    for (id <- Seq(0L, 17L, 399L)) {
      val (qi, qv) = queryOf(id)
      val got = SparseIndex.knn(spark, indexPath, qi, qv, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got === bruteForce(id, 10), s"query $id diverged")
      assert(got.head._1 === id, "self at rank 1")
      assert(got.head._2 < 1e-12)
    }
  }

  test("postings scan prunes to the query's dim buckets") {
    val (qi, qv) = queryOf(5L)
    val df = SparseIndex.knn(spark, indexPath, qi, qv, 10)
    val postingsScan = fileScans(df.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(_.toString.contains("postings")))
      .get
    val parts = postingsScan.relation.location
      .listFiles(postingsScan.partitionFilters, postingsScan.dataFilters)
    val expect = qi.map(d => math.floorMod(d, SparseIndex.Buckets)).distinct.length
    assert(parts.length <= expect,
      s"expected ≤$expect posting buckets read, got ${parts.length}")
    assert(parts.length < SparseIndex.Buckets, "must not read every bucket")
  }

  test("k beyond the candidate set pads with exact distance-1.0 rows") {
    // a query living on its own private dims: only itself is a candidate
    val dims = Array(990, 991, 992)
    val vals = Array(1.0f, 2.0f, 3.0f)
    val idx2 = graft.util.TempDirs
      .create("graft_sparse_pad").resolve("idx").toString
    val rows = Seq(
      (0L, Array(990, 991, 992), Array(1.0f, 2.0f, 3.0f)),
      (1L, Array(1, 2), Array(1.0f, 1.0f)),
      (2L, Array(3, 4), Array(2.0f, 2.0f)))
    SparseIndex.build(
      rows.toDF("vec_id", "indices", "values")
        .select(col("vec_id"),
          struct(lit(1000).as("dim"), col("indices"), col("values")).as("sv")),
      idx2)
    val got = SparseIndex.knn(spark, idx2, dims, vals, 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.head === ((0L, 0.0)))
    assert(got.tail === Seq((1L, 1.0), (2L, 1.0)),
      "non-candidates must pad at exactly 1.0 in vec_id order")
  }
}
