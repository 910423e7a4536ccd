package graft.index

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{IndexQueries, ReferenceQueries}

class PqIndexSpec extends SparkSpec {

  private lazy val indexPath = IndexQueries.pqIndexFor(spark, Sf0001)

  private def queryVec: Array[Float] =
    graft.Tables.embeddings(spark, Sf0001).filter(col("vec_id") === 0)
      .head().getAs[collection.Seq[Float]]("embedding").toArray

  test("build encodes every vector once into m bounded byte codes") {
    val codes = spark.read.parquet(s"$indexPath/codes")
    assert(codes.count() === 500L)
    assert(codes.select("vec_id").distinct().count() === 500L)
    // Array[Byte] stores as BINARY — validate driver-side
    val all = codes.select("codes").collect().map(_.getAs[Array[Byte]](0))
    assert(all.forall(_.length === PqIndex.DefaultM), "every code must be m bytes")
    assert(all.forall(_.forall(b => (b & 0xff) < PqIndex.DefaultCodes)),
      "every code must be in [0, codes)")
    val cb = spark.read.parquet(s"$indexPath/codebook")
    assert(cb.count() === PqIndex.DefaultM.toLong * PqIndex.DefaultCodes)
  }

  test("ADC search recall@10 vs exact meets floor; self near rank 1; deterministic") {
    val exact = ReferenceQueries.knnTopK(spark, Sf0001, 10)
      .collect().map(_.getLong(0)).toSet
    val r1 = PqIndex.search(spark, indexPath, queryVec, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val r2 = PqIndex.search(spark, indexPath, queryVec, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(r1.toSeq === r2.toSeq, "ADC search must be deterministic")
    val recall = r1.map(_._1).toSet.intersect(exact).size / 10.0
    info(f"PQ recall@10: $recall%.1f")
    assert(recall >= 0.5, s"PQ recall@10 was $recall")
    // the query's own vector: its reconstruction is the closest codeword
    // chain to q, so it must surface in the (generous) top-10
    assert(r1.map(_._1).contains(0L), "indexed query vector must appear in its own top-10")
  }

  test("ADC + exact re-rank recovers high recall reading only overfetch·k full vectors") {
    val exact = ReferenceQueries.knnTopK(spark, Sf0001, 10)
      .collect().map(_.getLong(0)).toSeq
    val reranked = PqIndex.searchRerank(spark, indexPath,
      graft.Tables.embeddings(spark, Sf0001), queryVec, k = 10, overfetch = 4)
      .collect().map(_.getLong(0)).toSeq
    val recall = reranked.toSet.intersect(exact.toSet).size / 10.0
    info(f"PQ+rerank recall@10: $recall%.1f")
    assert(recall >= 0.8, s"reranked recall@10 was $recall")
    assert(reranked.head === 0L, "the query's own vector must rank first after re-rank")
  }

  test("searchRerankAll equals exact top-k with no broadcast over the corpus-sized candidate frame") {
    val df = PqIndex.searchRerankAll(spark, indexPath,
      graft.Tables.embeddings(spark, Sf0001), queryVec, k = 10)
    // scale guard: the candidate frame is corpus-sized, so the static plan
    // must join it by shuffle, never by a hinted BroadcastExchange (AQE may
    // still downgrade small runtime sizes — that gate is size-measured)
    val staticPlan = df.queryExecution.sparkPlan.toString
    assert(!staticPlan.contains("BroadcastExchange"),
      s"corpus-sized candidate frame must not be broadcast-hinted:\n$staticPlan")
    val exact = ReferenceQueries.knnTopK(spark, Sf0001, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(df.collect().map(_.getLong(0)).toSeq === exact)
  }

  test("ADC distance approximates exact cosine distance within PQ error") {
    import graft.functions.{cosine_distance, vector_lit}
    val approx = PqIndex.search(spark, indexPath, queryVec, 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact = graft.Tables.embeddings(spark, Sf0001)
      .select(col("vec_id"),
        cosine_distance(col("embedding"), vector_lit(queryVec)).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val errs = exact.keys.map(id => math.abs(approx(id) - exact(id)))
    val meanErr = errs.sum / errs.size
    info(f"PQ mean |ADC - exact| distance error: $meanErr%.4f")
    assert(meanErr < 0.15, s"mean ADC error too large: $meanErr")
  }
}
