package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{sq_cosine_distance, sq_quantize}

class SimilarityQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("sq_quantize round-trips within quantization error; codes bounded") {
    val v = Array(0.5f, -1.0f, 0.25f, 0.0f)
    val row = Seq(Tuple1(v)).toDF("v").select(sq_quantize(col("v")).as("sq"))
      .select("sq.scale", "sq.codes").head()
    val scale = row.getFloat(0)
    val codes = row.getAs[collection.Seq[Byte]](1)
    assert(scale === 1.0f)
    assert(codes.forall(c => c >= -127 && c <= 127))
    val back = codes.map(_ * scale / 127.0)
    v.zip(back).foreach { case (orig, dq) =>
      assert(math.abs(orig - dq) <= scale / 254.0 + 1e-6)
    }
  }

  test("sq distance approximates exact cosine distance closely") {
    val e = graft.Tables.embeddings(spark, Sf0001)
    val q = e.filter(col("vec_id") === 0)
      .head().getAs[collection.Seq[Float]]("embedding").toArray
    val joined = e.select(col("vec_id"),
        sq_quantize(col("embedding")).as("sq"), col("embedding"))
      .select(col("vec_id"),
        sq_cosine_distance(col("sq.codes"), col("sq.scale"),
          graft.functions.vector_lit(q)).as("sq_dist"),
        graft.functions.cosine_distance(col("embedding"),
          graft.functions.vector_lit(q)).as("dist"))
    val maxErr = joined.agg(max(abs(col("sq_dist") - col("dist")))).head().getDouble(0)
    assert(maxErr < 0.02, s"SQ8 cosine error too large: $maxErr")
  }

  test("sq_knn_topk recall@10 vs exact is high; self is rank 1") {
    val exact = ReferenceQueries.knnTopK(spark, Sf0001, 10)
      .collect().map(_.getLong(0)).toSet
    val sq = SimilarityQueries.sqKnnTopK(spark, Sf0001, 10).collect()
    // self-distance through SQ8 is the quantization error itself (~1e-5
    // at dim 64), not numerically zero
    assert(sq.head.getLong(0) === 0L && sq.head.getDouble(1) < 1e-3)
    val recall = sq.map(_.getLong(0)).toSet.intersect(exact).size / 10.0
    assert(recall >= 0.8, s"SQ8 recall@10 was $recall")
  }
}
