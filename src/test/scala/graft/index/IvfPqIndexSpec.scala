package graft.index

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.ReferenceQueries

class IvfPqIndexSpec extends SparkSpec {

  private val Lists = 8

  private lazy val indexPath = {
    val p = graft.util.TempDirs.create("graft_ivfpq").resolve("idx").toString
    IvfPqIndex.build(graft.Tables.embeddings(spark, Sf0001), p, lists = Lists)
    p
  }

  private def queryVec: Array[Float] =
    graft.Tables.embeddings(spark, Sf0001).filter(col("vec_id") === 0)
      .head().getAs[collection.Seq[Float]]("embedding").toArray

  test("build encodes every vector exactly once across the lists") {
    val codes = spark.read.parquet(s"$indexPath/codes")
    assert(codes.count() === 500L)
    assert(codes.select("vec_id").distinct().count() === 500L)
    val used = codes.select("list_id").distinct().count()
    assert(used > 1 && used <= Lists)
  }

  test("probe scans only the probed list partitions") {
    val nprobe = 2
    val df = IvfPqIndex.probe(spark, indexPath, queryVec, k = 10, nprobe = nprobe)
    df.collect()
    val codeScan = fileScans(df.queryExecution.executedPlan).find(
      _.relation.location.rootPaths.exists(_.toString.contains("codes")))
      .getOrElse(fail(s"no codes scan in plan:\n${df.queryExecution.executedPlan}"))
    assert(codeScan.partitionFilters.nonEmpty, "probe must place a partition filter")
    assert(codeScan.selectedPartitions.partitionCount <= nprobe,
      s"scanned ${codeScan.selectedPartitions.partitionCount} partitions, expected ≤ $nprobe")
  }

  test("probe-all recall meets the PQ floor; rerank recovers; deterministic") {
    val exact = ReferenceQueries.knnTopK(spark, Sf0001, 10)
      .collect().map(_.getLong(0)).toSeq
    val r1 = IvfPqIndex.probe(spark, indexPath, queryVec, 10, nprobe = Lists)
      .collect().map(_.getLong(0)).toSeq
    val r2 = IvfPqIndex.probe(spark, indexPath, queryVec, 10, nprobe = Lists)
      .collect().map(_.getLong(0)).toSeq
    assert(r1 === r2, "probe must be deterministic")
    val recall = r1.toSet.intersect(exact.toSet).size / 10.0
    info(f"IVFPQ probe-all recall@10: $recall%.1f")
    assert(recall >= 0.5, s"probe-all recall@10 was $recall")
    val reranked = IvfPqIndex.probeRerank(spark, indexPath,
      graft.Tables.embeddings(spark, Sf0001), queryVec, k = 10,
      nprobe = Lists, overfetch = 4)
      .collect().map(_.getLong(0)).toSeq
    val rr = reranked.toSet.intersect(exact.toSet).size / 10.0
    info(f"IVFPQ rerank recall@10: $rr%.1f")
    assert(rr >= 0.8, s"reranked recall@10 was $rr")
    assert(reranked.head === 0L)
  }

  test("searchMany ≡ probeMany bit-for-bit on a 10k-query batch; guard rejects oversize") {
    // 10k synthetic queries — big enough that the distributed form is the
    // right tool, small enough that the LUT serving form can still cross-
    // check it; hashNoise keeps them off the indexed vectors (no self hits)
    val nq = 10000
    val queries = spark.range(nq).select(col("id").as("qid"),
      hashNoise(col("id"), 64).as("qv")).persist()
    try {
      val viaSearch = IvfPqIndex.searchMany(spark, indexPath, queries,
          "qid", "qv", k = 5, nprobe = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
      val viaLut = IvfPqIndex.probeMany(spark, indexPath, queries,
          "qid", "qv", k = 5, nprobe = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
      assert(viaSearch.length === nq * 5)
      // bit-identical, not approximately equal: the factored ADC sums run
      // in the same op order in both forms
      assert(viaSearch === viaLut)
    } finally queries.unpersist()
    // the serving form must refuse a frame past the serving-batch bound
    // with guidance toward searchMany, not OOM the driver building LUTs
    val oversize = spark.range(IvfPqIndex.MaxServingBatch + 1L)
      .select(col("id").as("qid"), array(lit(1.0f)).as("qv"))
    val e = intercept[IllegalArgumentException] {
      IvfPqIndex.probeMany(spark, indexPath, oversize, "qid", "qv", 5, 2)
    }
    assert(e.getMessage.contains("searchMany"))
  }

  test("probeMany matches single-query probe per qid") {
    val queries = graft.Tables.embeddings(spark, Sf0001)
      .filter(col("vec_id") < 3).select(col("vec_id").as("qid"), col("embedding"))
    val batch = IvfPqIndex.probeMany(spark, indexPath, queries, "qid", "embedding",
        k = 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    (0L until 3L).foreach { qid =>
      val qv = graft.Tables.embeddings(spark, Sf0001)
        .filter(col("vec_id") === qid)
        .head().getAs[collection.Seq[Float]]("embedding").toArray
      val single = IvfPqIndex.probe(spark, indexPath, qv, 5, nprobe = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val fromBatch = batch(qid).sortBy(_._2).map(r => (r._3, r._4)).toSeq
      assert(fromBatch === single, s"qid $qid diverged")
    }
  }

  test("residual coding beats raw-vector PQ at equal budget on a clustered corpus") {
    // residuals only concentrate when the coarse quantizer has structure to
    // grab — so the IVFPQ advantage is pinned on a CLUSTERED fixture (the
    // near-uniform driver fixtures show no residual win, by design)
    import graft.functions.hash_embed
    val nClusters = 20; val perCluster = 25; val n = nClusters * perCluster
    val raw = spark.range(n).select(
      col("id").as("vec_id"),
      hash_embed(concat(lit("cl"), (col("id") % nClusters).cast("string")), 64).as("base"),
      hashNoise(col("id"), 64).as("noise"))
    val emb = raw.select(col("vec_id"),
      zip_with(col("base"), col("noise"), (b, nz) => (b + nz * lit(0.05f)).cast("float"))
        .as("embedding"))
      .persist()
    val q = emb.filter(col("vec_id") === 7)
      .head().getAs[collection.Seq[Float]]("embedding").toArray
    val pqPath = graft.util.TempDirs.create("graft_pq_cmp").resolve("idx").toString
    val ivfpqPath = graft.util.TempDirs.create("graft_ivfpq_cmp").resolve("idx").toString
    PqIndex.build(emb, pqPath)
    IvfPqIndex.build(emb, ivfpqPath, lists = nClusters)
    import graft.functions.{cosine_distance, vector_lit}
    val exact = emb
      .select(col("vec_id"), cosine_distance(col("embedding"), vector_lit(q)).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def meanErr(scored: Map[Long, Double]) =
      exact.keys.map(id => math.abs(scored(id) - exact(id))).sum / exact.size
    val rawErr = meanErr(PqIndex.search(spark, pqPath, q, n)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap)
    val resErr = meanErr(IvfPqIndex.probe(spark, ivfpqPath, q, n, nprobe = nClusters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap)
    info(f"mean ADC error raw-PQ $rawErr%.4f vs residual-IVFPQ $resErr%.4f")
    assert(resErr < rawErr, "residual coding must tighten the approximation on clustered data")
    emb.unpersist()
  }
}
