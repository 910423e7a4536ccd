package graft.index

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{IndexQueries, ReferenceQueries}

class NswIndexSpec extends SparkSpec {

  private lazy val indexPath = IndexQueries.nswIndexFor(spark, Sf0001)

  private def queryVec: Array[Float] =
    graft.Tables.embeddings(spark, Sf0001).filter(col("vec_id") === 0)
      .head().getAs[collection.Seq[Float]]("embedding").toArray

  test("build indexes every vector exactly once; degrees bounded; edges stay in-shard") {
    val graph = spark.read.parquet(s"$indexPath/graph")
    assert(graph.count() === 500L)
    assert(graph.select("vec_id").distinct().count() === 500L)
    val overCap = graph.filter(size(col("neighbors")) > NswIndex.MaxDegree).count()
    assert(overCap === 0L, "degree cap violated")
    // neighbors must live in the owner's shard (vec_id % shards)
    val crossShard = graph
      .select(col("shard_id"), explode(col("neighbors")).as("nb"))
      .filter(pmod(col("nb"), lit(IndexQueries.NswShards)) =!= col("shard_id"))
      .count()
    assert(crossShard === 0L)
    // every multi-node shard's nodes are connected (no isolated vectors)
    val isolated = graph.filter(size(col("neighbors")) === 0).count()
    assert(isolated === 0L, "every node in a 125-node shard must have edges")
  }

  test("search with a beam covering the shard equals exact brute-force top-k") {
    val exact = ReferenceQueries.knnTopK(spark, Sf0001, 10)
      .collect().map(_.getLong(0)).toSeq
    val wide = NswIndex.search(spark, indexPath, queryVec, 10, ef = 500)
      .collect().map(_.getLong(0)).toSeq
    assert(wide === exact,
      "a beam as wide as the shard must visit every reachable node → exact")
  }

  test("search recall@10 at default ef meets threshold; self is rank 1; deterministic") {
    val exact = ReferenceQueries.knnTopK(spark, Sf0001, 10)
      .collect().map(_.getLong(0)).toSet
    val r1 = NswIndex.search(spark, indexPath, queryVec, 10)
      .collect().map(_.getLong(0)).toSeq
    val r2 = NswIndex.search(spark, indexPath, queryVec, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(r1 === r2, "NSW search must be deterministic")
    assert(r1.head === 0L, "the query's own vector must rank first")
    val recall = r1.toSet.intersect(exact).size / 10.0
    assert(recall >= 0.9, s"NSW recall@10 was $recall")
  }

  test("SET hnsw.ef_search governs the default beam (pgvector session knob)") {
    val exact = ReferenceQueries.knnTopK(spark, Sf0001, 10)
      .collect().map(_.getLong(0)).toSeq
    try {
      // conf wide enough to cover the shard → default-ef search goes exact
      spark.conf.set("hnsw.ef_search", "500")
      val viaConf = NswIndex.search(spark, indexPath, queryVec, 10)
        .collect().map(_.getLong(0)).toSeq
      assert(viaConf === exact,
        "hnsw.ef_search=shard-size must make the default search exact")
      // explicit ef still wins over the conf
      spark.conf.set("hnsw.ef_search", "1")
      val explicit = NswIndex.search(spark, indexPath, queryVec, 10, ef = 500)
        .collect().map(_.getLong(0)).toSeq
      assert(explicit === exact, "explicit ef must override the session conf")
      // garbage value falls back to the engine default instead of failing
      spark.conf.set("hnsw.ef_search", "not-a-number")
      assert(NswIndex.search(spark, indexPath, queryVec, 10).count() === 10L)
    } finally spark.conf.unset("hnsw.ef_search")
  }

  test("searchMany matches single-query search per qid") {
    val queries = graft.Tables.embeddings(spark, Sf0001)
      .filter(col("vec_id") < 3).select(col("vec_id").as("qid"), col("embedding"))
    val batch = NswIndex.searchMany(spark, indexPath, queries, "qid", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    (0L until 3L).foreach { qid =>
      val qv = graft.Tables.embeddings(spark, Sf0001)
        .filter(col("vec_id") === qid)
        .head().getAs[collection.Seq[Float]]("embedding").toArray
      val single = NswIndex.search(spark, indexPath, qv, 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val fromBatch = batch(qid).sortBy(_._2).map(r => (r._3, r._4)).toSeq
      assert(fromBatch === single, s"qid $qid diverged")
    }
  }

  test("append inserts into existing shard graphs; appended vectors searchable") {
    val dir = graft.util.TempDirs.create("graft_nsw_app").resolve("idx").toString
    val e = graft.Tables.embeddings(spark, Sf0001)
    NswIndex.build(e.filter(col("vec_id") < 450), dir, shards = IndexQueries.NswShards)
    val n = NswIndex.append(spark, dir, e.filter(col("vec_id") >= 450))
    assert(n === 500L)
    val graph = spark.read.parquet(s"$dir/graph")
    assert(graph.select("vec_id").distinct().count() === 500L)
    assert(graph.filter(size(col("neighbors")) > NswIndex.MaxDegree).count() === 0L)
    assert(graph.filter(size(col("neighbors")) === 0).count() === 0L,
      "appended nodes must be wired into the existing topology")
    // an appended vector must be findable — its own query ranks it first
    val qv = e.filter(col("vec_id") === 480)
      .head().getAs[collection.Seq[Float]]("embedding").toArray
    val top = NswIndex.search(spark, dir, qv, 5).collect()
    assert(top.head.getLong(0) === 480L && top.head.getDouble(1) < 1e-12)
  }

  test("streaming NSW maintenance extends the graph per micro-batch; streamed vectors searchable") {
    import graft.streaming.StreamingIngest
    val dir = graft.util.TempDirs.create("nsw_maint").resolve("idx").toString
    val e = graft.Tables.embeddings(spark, Sf0001)
    NswIndex.build(e.filter(col("vec_id") < 400), dir, shards = IndexQueries.NswShards)
    // two source files + maxFilesPerTrigger=1 → two append micro-batches
    val src = graft.util.TempDirs.create("nsw_maint_src").resolve("v").toString
    val newRows = e.filter(col("vec_id") >= 400)
    newRows.filter(col("vec_id") < 450).coalesce(1).write.mode("append").parquet(src)
    newRows.filter(col("vec_id") >= 450).coalesce(1).write.mode("append").parquet(src)
    val q = StreamingIngest.startNswMaintenance(spark, src,
      spark.read.parquet(src).schema, dir, maxFilesPerTrigger = Some(1))
    q.awaitTermination(120000)
    val graph = spark.read.parquet(s"$dir/graph")
    assert(graph.select("vec_id").distinct().count() === 500L)
    assert(graph.filter(size(col("neighbors")) === 0).count() === 0L,
      "streamed nodes must be wired into the existing topology")
    // one vector from EACH micro-batch must be findable post-stream
    Seq(420L, 480L).foreach { id =>
      val qv = e.filter(col("vec_id") === id)
        .head().getAs[collection.Seq[Float]]("embedding").toArray
      val top = NswIndex.search(spark, dir, qv, 5).collect()
      assert(top.head.getLong(0) === id && top.head.getDouble(1) < 1e-12,
        s"streamed vector $id must rank first for its own query")
    }
  }

  test("streaming NSW serving resolves query batches against the graph") {
    import graft.streaming.StreamingIngest
    val src = graft.util.TempDirs.create("nsw_srv_src").resolve("q").toString
    val out = graft.util.TempDirs.create("nsw_srv_out").resolve("r").toString
    val queries = graft.Tables.embeddings(spark, Sf0001)
      .filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    queries.write.parquet(src)
    val q = StreamingIngest.startNswServing(
      spark, src, queries.schema, indexPath, out, k = 3)
    q.awaitTermination(120000)
    val results = spark.read.parquet(out)
    assert(results.select("qid").distinct().count() === 4)
    // an indexed query vector always finds itself at rank 1, dist ~0
    val rank1 = results.filter(col("rank") === 1)
      .select("qid", "vec_id", "dist").collect()
    assert(rank1.forall(r => r.getLong(0) === r.getLong(1) && r.getDouble(2) < 1e-12))
  }

  test("halfvec NSW: full-beam ≡ brute-force half-cosine; approximate default holds recall") {
    import graft.functions.{half_cosine_distance, half_pack}
    // brute-force half-cosine top-k — the oracle's twin, in-engine
    val e = graft.Tables.embeddings(spark, Sf0001)
    val packed = e.select(col("vec_id"), half_pack(col("embedding")).as("hv"))
    val seed = packed.filter(col("vec_id") === 0).select(col("hv").as("qv"))
    val exact = packed.crossJoin(broadcast(seed))
      .select(col("vec_id"), half_cosine_distance(col("hv"), col("qv")).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSeq
    val full = IndexQueries.halfvecHnswKnnExact(spark, Sf0001)
      .collect().map(_.getLong(0)).toSeq
    assert(full === exact,
      "full-beam over the half-widened graph must equal brute-force half cosine")
    val approx = IndexQueries.halfvecHnswKnn(spark, Sf0001)
      .collect().map(_.getLong(0)).toSeq
    assert(approx.head === 0L, "the query's own vector must rank first")
    val recall = approx.toSet.intersect(exact.toSet).size / 10.0
    assert(recall >= 0.9, s"halfvec NSW recall@10 was $recall")
  }

  test("sparse NSW: full-beam ≡ brute-force masked cosine; approximate default holds recall") {
    import graft.functions.{sparse_cosine_distance, sparse_vectorize}
    val eps = graft.operators.SimilarityQueries.SparseEps
    // brute-force SPARSE cosine — the merge-walk kernels, pinned bit-equal
    // to the masked-dense distances the graph ranks by
    val e = graft.Tables.embeddings(spark, Sf0001)
      .select(col("vec_id"), sparse_vectorize(col("embedding"), eps).as("sv"))
    val seed = e.filter(col("vec_id") === 0).select(col("sv").as("qv"))
    val exact = e.crossJoin(broadcast(seed))
      .select(col("vec_id"), sparse_cosine_distance(col("sv"), col("qv")).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = IndexQueries.sparseHnswKnnExact(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full === exact,
      "full-beam over the masked-dense graph must equal brute-force sparse cosine, dist bit-equal")
    val approx = IndexQueries.sparseHnswKnn(spark, Sf0001)
      .collect().map(_.getLong(0)).toSeq
    assert(approx.head === 0L, "the query's own vector must rank first")
    val recall = approx.toSet.intersect(exact.map(_._1).toSet).size / 10.0
    assert(recall >= 0.9, s"sparse NSW recall@10 was $recall")
  }

  test("rebuilding the graph is bit-reproducible") {
    val dir = graft.util.TempDirs.create("graft_nsw_re").resolve("idx").toString
    NswIndex.build(graft.Tables.embeddings(spark, Sf0001), dir,
      shards = IndexQueries.NswShards)
    val a = spark.read.parquet(s"$indexPath/graph")
      .select(col("vec_id"), col("neighbors")).collect()
      .map(r => r.getLong(0) -> r.getAs[collection.Seq[Long]](1).toSeq).toMap
    val b = spark.read.parquet(s"$dir/graph")
      .select(col("vec_id"), col("neighbors")).collect()
      .map(r => r.getLong(0) -> r.getAs[collection.Seq[Long]](1).toSeq).toMap
    assert(a === b, "same data + same insertion order must yield the same graph")
  }
}
