package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{sq_cosine_distance, sq_quantize}

class SimilarityQueriesSpec extends SparkSpec {
  import spark.implicits._

  /** Clustered-embedding fixture — the geometry REAL embedding corpora
    * have (the sf hash fixture is the adversarial un-clustered worst
    * case): 12 orthogonal one-hot-block centers on the 64-dim sphere, 50
    * points each = center + bounded hash noise, written once as
    * embeddings.parquet so the dir drops into every IVF-keyed query
    * unchanged (indexFor caches per dir). */
  lazy val clusteredDir: String = {
    val dir = graft.util.TempDirs.create("graft_clustered").toString
    val c = 12
    val dim = 64
    val center = transform(sequence(lit(0), lit(dim - 1)), d =>
      when(pmod(d, lit(c)) === col("label"), lit(4.0)).otherwise(lit(0.0)))
    val emb = zip_with(center, hashNoise(col("vec_id"), dim),
      (ct, nz) => (ct + nz).cast("float"))
    spark.range(c * 50L)
      .select(col("id").as("vec_id"), (col("id") % c).cast("int").as("label"))
      .select(col("vec_id"), col("label"), emb.as("embedding"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

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

  test("sq_quantize on NaN/Inf embeddings degrades (zero codes), never throws") {
    // dirty embeddings happen in real pipelines; the quantizer must not
    // fail the whole query with NumberFormatException from BigDecimal(NaN)
    val dirty = Seq(
      Array(Float.NaN, 1.0f),
      Array(Float.PositiveInfinity, -2.0f),
      Array(Float.NegativeInfinity, 0.5f))
    val rows = dirty.map(Tuple1(_)).toDF("v")
      .select(sq_quantize(col("v")).as("sq"))
      .select("sq.scale", "sq.codes").collect()
    rows.foreach { r =>
      assert(!java.lang.Float.isFinite(r.getFloat(0)),
        "non-finite scale must propagate to flag the garbage row")
      assert(r.getAs[collection.Seq[Byte]](1).forall(_ == 0))
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

  test("embedding_outliers surfaces a planted garbage vector at rank 1") {
    val dir = graft.util.TempDirs.create("graft_outlier").toString
    // 10 clusters of 30 near-identical vectors + one flipped-sign intruder
    // mislabeled into cluster 0
    val dim = 16
    val rows = (for {
      label <- 0 until 10
      i <- 0 until 30
    } yield {
      val v = Array.tabulate(dim)(d =>
        (if (d == label) 10.0f else 0.0f) + ((i * 7 + d) % 5) * 0.01f)
      ((label * 30 + i).toLong, v, label)
    }) :+ (999L, Array.tabulate(dim)(d => if (d == 7) -10.0f else 0.1f), 0) :+
      // a single-member label: stddev_samp is NaN — must be dropped, not
      // surface as a spurious z=NaN "worst outlier" (Spark NaN > 0.0 is true)
      (1000L, Array.tabulate(dim)(d => (d + 1).toFloat / dim), 99)
    rows.toDF("vec_id", "embedding", "label").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SimilarityQueries.embeddingOutliers(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.head.getLong(0) === 999L, "the intruder must be the worst outlier")
    assert(out.head.getAs[Double]("z") > 5.0)
    // inliers of untouched clusters don't appear
    assert(out.forall(_.getAs[Double]("z") >= SimilarityQueries.OutlierZ))
    // single-member label 99: NaN stddev must drop it, never rank it
    assert(!out.exists(_.getLong(0) === 1000L))
    assert(out.forall(r => !r.getAs[Double]("z").isNaN))
  }

  test("kmeans_assign: one-hot copies converge to their seed clusters at distance 0") {
    val dir = graft.util.TempDirs.create("graft_kmeans").toString
    // vec 0..7 are the 8 orthogonal one-hots (the seeds); vecs 8..39 are
    // exact copies — every cosine distance is exactly 0 or 1, the centroid
    // update reproduces the one-hot bit-for-bit, so the whole run is
    // float-ambiguity-free
    val dim = 8
    val rows = (0L until 40L).map { i =>
      val hot = (i % 8).toInt
      (i, Array.tabulate(dim)(d => if (d == hot) 1.0f else 0.0f), hot)
    }
    rows.toDF("vec_id", "embedding", "label").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SimilarityQueries.kmeansAssign(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSeq === (0L until 40L))
    out.foreach { r =>
      assert(r.getLong(1) === r.getLong(0) % 8, s"vec ${r.getLong(0)}")
      assert(r.getDouble(2) === 0.0)
    }
  }

  test("kmeans_assign on the fixture corpus: total assignment, bounded ids, deterministic") {
    val a = SimilarityQueries.kmeansAssign(spark, Sf0001).collect()
    val b = SimilarityQueries.kmeansAssign(spark, Sf0001).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq, "must be deterministic")
    val n = graft.Tables.embeddings(spark, Sf0001).count()
    assert(a.length.toLong === n, "every vector assigned exactly once")
    assert(a.forall(r => r.getLong(1) >= 0 && r.getLong(1) < SimilarityQueries.KmeansK))
    assert(a.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 2.0))
    // the corpus is not degenerate: more than one cluster survives
    assert(a.map(_.getLong(1)).distinct.length > 1)
  }

  test("cluster_sample: bounded per-cluster picks agree with a window replay of the heap") {
    val out = SimilarityQueries.clusterSample(spark, Sf0001).collect()
    val assigns = SimilarityQueries.kmeansAssign(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every pick belongs to its claimed cluster; rnk is 1..N dense per cluster
    out.groupBy(_.getLong(0)).foreach { case (cid, rs) =>
      assert(rs.length <= SimilarityQueries.ClusterSampleN)
      assert(rs.map(_.getLong(1)).sorted.toSeq === (1L to rs.length))
      rs.foreach(r => assert(assigns(r.getLong(2)) === cid))
    }
    // replay the pick driver-side: per cluster, order by (salted hash, id)
    def hd(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:cs".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16) % 1000000000000L
    }
    val expected = assigns.toSeq.groupBy(_._2).flatMap { case (cid, members) =>
      members.map(_._1).sortBy(id => (hd(id), id))
        .take(SimilarityQueries.ClusterSampleN)
        .zipWithIndex.map { case (id, i) => (cid, i + 1L, id) }
    }.toSet
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet === expected)
  }

  test("avg_pairwise_sim_fast equals the O(n²) crossJoin form; plan is join-free") {
    val slow = ReferenceQueries.avgPairwiseSim(spark, Sf0001).head().getDouble(0)
    val fastDf = SimilarityQueries.avgPairwiseSimFast(spark, Sf0001)
    val fast = fastDf.head().getDouble(0)
    // the identity is exact; both sides round to 6dp, so allow only a
    // boundary ulp at the rounding step
    assert(math.abs(fast - slow) <= 1e-6 + 1e-12, s"fast=$fast slow=$slow")
    val plan = fastDf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") || !plan.contains("embeddings.parquet\n"),
      "linear form must not self-join the embeddings table")
    // the only joins are over 1-row aggregates (ss × n)
    assert(!plan.contains("SortMergeJoin"), s"unexpected shuffle join:\n$plan")
  }

  test("sim_histogram_sampled bucket shares track the exact histogram within ±0.03") {
    val exact = SimilarityQueries.simHistogram(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sampled = SimilarityQueries.simHistogramSampled(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nExact = exact.values.sum.toDouble
    val nSampled = sampled.values.sum.toDouble
    // the sample must actually prune: ≈ (1/mod)² of the pairs
    assert(nSampled < nExact / (SimilarityQueries.HistSampleMod * 2),
      s"sample too large: $nSampled of $nExact pairs")
    (exact.keySet ++ sampled.keySet).foreach { b =>
      val se = exact.getOrElse(b, 0L) / nExact
      val ss = sampled.getOrElse(b, 0L) / nSampled
      assert(math.abs(se - ss) <= 0.03, f"bucket $b: exact share $se%.4f vs sampled $ss%.4f")
    }
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

  test("bq_hamming equals naive sign-mismatch count, incl. non-multiple-of-64 dims") {
    import graft.functions.{bq_hamming, bq_pack}
    val rnd = new scala.util.Random(42)
    Seq(3, 64, 100, 384).foreach { dim =>
      val a = Array.fill(dim)(rnd.nextFloat() - 0.5f)
      val b = Array.fill(dim)(rnd.nextFloat() - 0.5f)
      val want = a.zip(b).count { case (x, y) => (x >= 0) != (y >= 0) }.toLong
      val got = Seq((a, b)).toDF("a", "b")
        .select(bq_hamming(bq_pack(col("a")), bq_pack(col("b"))).as("h"))
        .head().getLong(0)
      assert(got === want, s"dim $dim")
    }
  }

  test("bq_jaccard equals naive sign-set jaccard; empty-union convention; SQL names registered") {
    import graft.functions.{bq_jaccard, bq_pack}
    val rnd = new scala.util.Random(7)
    Seq(3, 64, 100, 384).foreach { dim =>
      val a = Array.fill(dim)(rnd.nextFloat() - 0.5f)
      val b = Array.fill(dim)(rnd.nextFloat() - 0.5f)
      val inter = a.zip(b).count { case (x, y) => x >= 0 && y >= 0 }
      val union = a.zip(b).count { case (x, y) => x >= 0 || y >= 0 }
      val want = if (union == 0) 0.0 else 1.0 - inter.toDouble / union
      val got = Seq((a, b)).toDF("a", "b")
        .select(bq_jaccard(bq_pack(col("a")), bq_pack(col("b"))).as("j"))
        .head().getDouble(0)
      assert(got === want, s"dim $dim")
    }
    // all-negative vectors → empty sign sets → distance 0, never NaN
    val z = Array.fill(8)(-1.0f)
    assert(Seq((z, z)).toDF("a", "b")
      .select(bq_jaccard(bq_pack(col("a")), bq_pack(col("b"))).as("j"))
      .head().getDouble(0) === 0.0)
    // the pgvector names resolve through spark.sql
    graft.functions.registerAll(spark)
    val viaSql = spark.sql(
      "SELECT jaccard_distance(binary_quantize(array(1.0f, -1.0f)), " +
        "binary_quantize(array(1.0f, 1.0f))) AS j, " +
        "hamming_distance(binary_quantize(array(1.0f, -1.0f)), " +
        "binary_quantize(array(1.0f, 1.0f))) AS h").head()
    assert(viaSql.getDouble(0) === 0.5 && viaSql.getLong(1) === 1L)
  }

  test("bq_knn_jaccard: self at distance 0; agrees with a hamming-ranked reorder on ties") {
    val rows = SimilarityQueries.bqKnnJaccard(spark, Sf0001).collect()
    assert(rows.length === SimilarityQueries.BqK)
    assert(rows.head.getLong(0) === 0L && rows.head.getDouble(1) === 0.0,
      "jaccard(q, q) = 0 must rank the query vector first")
    // jaccard ascending with vec_id tie-break
    assert(rows.map(r => (r.getDouble(1), r.getLong(0))).toSeq ===
      rows.map(r => (r.getDouble(1), r.getLong(0))).sortBy(identity).toSeq)
    val plan = SimilarityQueries.bqKnnJaccard(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$plan")
  }

  test("bq_knn_topk: self is rank 1; recall@10 vs exact holds; two-stage plan shape") {
    val exact = ReferenceQueries.knnTopK(spark, Sf0001, 10)
      .collect().map(_.getLong(0)).toSet
    val bq = SimilarityQueries.bqKnnTopK(spark, Sf0001)
    val rows = bq.collect()
    assert(rows.head.getLong(0) === 0L, "query vector must rerank to the top")
    assert(rows.head.getLong(1) === 0L, "hamming(q, q) = 0")
    val recall = rows.map(_.getLong(0)).toSet.intersect(exact).size / 10.0
    // sign bits at dim 384 preserve coarse angular order; the 5× candidate
    // over-fetch + exact rerank recovers most of the true top-10
    assert(recall >= 0.6, s"BQ recall@10 was $recall")
    val plan = bq.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$plan")
  }

  test("mrl_knn_topk: prefix candidates + full rerank; self first; recall vs exact") {
    val exact = ReferenceQueries.knnTopK(spark, Sf0001, 10)
      .collect().map(_.getLong(0)).toSet
    val df = SimilarityQueries.mrlKnnTopK(spark, Sf0001)
    val rows = df.collect()
    assert(rows.head.getLong(0) === 0L, "query vector must rerank to the top")
    assert(rows.head.getDouble(1) < 1e-12 && rows.head.getDouble(2) < 1e-12,
      "prefix and full self-distance are both ~zero")
    val recall = rows.map(_.getLong(0)).toSet.intersect(exact).size / 10.0
    // a 16/64 prefix preserves coarse angular order on the hash fixture;
    // the 10× over-fetch (MrlCandidates=100 for k=10) + exact rerank
    // recovers most of the true top-10
    assert(recall >= 0.6, s"MRL recall@10 was $recall")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$plan")
  }

  test("halfvec_l2_topk: self first with zero l2/l1; ip(self) = ||h||²") {
    import graft.functions.{half_pack, half_unpack}
    import org.apache.spark.sql.functions.col
    val rows = SimilarityQueries.halfDistancesTopK(spark, Sf0001).collect()
    assert(rows.length === SimilarityQueries.HalfK)
    val self = rows.head
    assert(self.getLong(0) === 0L)
    assert(self.getDouble(1) === 0.0 && self.getDouble(3) === 0.0)
    val h = graft.Tables.embeddings(spark, Sf0001).filter(col("vec_id") === 0)
      .select(half_unpack(half_pack(col("embedding")))).head()
      .getSeq[Float](0)
    val normSq = h.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
    assert(self.getDouble(2) === normSq, "ip of self is the exact squared norm")
  }

  test("knn_graph: k edges per node, no self loops; ivf twin holds recall") {
    import SimilarityQueries.{KnnGraphK, knnGraph, knnGraphIvf}
    val exact = knnGraph(spark, Sf0001).collect()
    val n = graft.Tables.embeddings(spark, Sf0001).count()
    assert(exact.length === n * KnnGraphK)
    assert(exact.forall(r => r.getLong(0) != r.getLong(2)), "no self loops")
    val exactSets = exact.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val approx = knnGraphIvf(spark, Sf0001).collect()
    assert(approx.forall(r => r.getLong(0) != r.getLong(2)))
    assert(approx.groupBy(_.getLong(0)).forall(_._2.length <= KnnGraphK))
    val approxSets = approx.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val recall = exactSets.map { case (q, t) =>
      approxSets.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }.sum / exactSets.size
    // hash-fixture embeddings are un-clustered (the adversarial case);
    // 4/16 probed lists measured 0.62 during development
    assert(recall >= 0.5, s"mean recall@$KnnGraphK was $recall")
  }

  test("probesFor: KnnGraphProbes floor through mid-scale, sqrt growth past it") {
    import SimilarityQueries.{probesFor, KnnGraphProbes}
    // fixture and every point <= 300x keep the measured probes-4 plans
    assert(probesFor(16) === KnnGraphProbes)
    assert(probesFor(640) === KnnGraphProbes)
    assert(probesFor(9375) === KnnGraphProbes) // 300x point (r14 recall 0.979)
    // the 1000x point (recall 0.875 at fixed probes, r14) doubles
    assert(probesFor(31250) === 8)
    // the 65,536-list cap: 256/22 -> 12, still ~sqrt — never ∝ lists
    assert(probesFor(65536) === 12)
    assert(probesFor(0) === KnnGraphProbes) // degenerate guard
  }

  test("knn_graph_ivf: default probes reach recall >= 0.8 on a clustered corpus") {
    import SimilarityQueries.{knnGraph, knnGraphIvf}
    val exactSets = knnGraph(spark, clusteredDir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val approxSets = knnGraphIvf(spark, clusteredDir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val recall = exactSets.map { case (q, t) =>
      approxSets.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }.sum / exactSets.size
    // where real embeddings live (clustered), the default 4/16 probes must
    // hold production-grade recall; the un-clustered hash fixture keeps
    // its separate 0.5 adversarial floor (test above)
    assert(recall >= 0.8, s"mean recall@${SimilarityQueries.KnnGraphK} was $recall")
  }

  test("semantic_clusters_ivf: >=0.9 pair agreement with the exact form; structure holds") {
    val exact = SimilarityQueries.semanticClusters(spark, clusteredDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ivf = SimilarityQueries.semanticClustersIvf(spark, clusteredDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // same structural contract as the exact form
    ivf.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.map(_._1).min === rep, s"cluster $rep min mismatch")
      assert(members.forall(_._3 == members.length), s"cluster $rep size mismatch")
      assert(members.length >= 2, "mutual-kNN clusters have no singletons")
    }
    // pair-level agreement: Jaccard of the co-clustered pair sets
    def pairSet(asg: Seq[(Long, Long)]): Set[(Long, Long)] =
      asg.groupBy(_._2).values.flatMap { m =>
        val ids = m.map(_._1).sorted
        for { i <- ids.indices; j <- i + 1 until ids.length }
          yield (ids(i), ids(j))
      }.toSet
    val pe = pairSet(exact.toSeq)
    val pi = pairSet(ivf.map(t => (t._1, t._2)).toSeq)
    val agreement = pe.intersect(pi).size.toDouble / pe.union(pi).size
    assert(agreement >= 0.9, s"pair-level agreement was $agreement")
  }

  test("cluster_purity: sizes partition the corpus; purity bounded and consistent") {
    val rows = SimilarityQueries.clusterPurity(spark, Sf0001).collect()
    assert(rows.nonEmpty && rows.length <= SimilarityQueries.KmeansK)
    val n = graft.Tables.embeddings(spark, Sf0001).count()
    assert(rows.map(_.getLong(2)).sum === n, "cluster sizes must partition the corpus")
    val nLabels = graft.Tables.embeddings(spark, Sf0001)
      .select("label").distinct().count().toDouble
    rows.foreach { r =>
      val purity = r.getDouble(3)
      assert(purity > 0.0 && purity <= 1.0, s"purity out of range: $r")
      // the majority label's share can never dip below the uniform floor
      assert(purity >= 1.0 / nLabels, s"below-uniform purity: $r")
    }
  }

  test("semantic_clusters: reps are cluster minima, sizes consistent, no singletons") {
    val rows = SimilarityQueries.semanticClusters(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // the rep is the smallest member of its own cluster
    rows.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.map(_._1).min === rep, s"cluster $rep min mismatch")
      assert(members.forall(_._3 == members.length), s"cluster $rep size mismatch")
      assert(members.length >= 2, "mutual-kNN clusters have no singletons")
    }
  }

  test("mmr_rerank: self first, unique picks, diverges from pure top-k") {
    import SimilarityQueries.{MmrK, MmrLambda}
    val rows = SimilarityQueries.mmrRerank(spark, Sf0001).collect()
    assert(rows.length === MmrK)
    assert(rows.map(_.getLong(0)).toSeq === (1L to MmrK.toLong))
    // the query vector is its own most-relevant result
    assert(rows.head.getLong(1) === 0L)
    assert(math.abs(rows.head.getDouble(2) - 1.0) < 1e-12)
    assert(math.abs(rows.head.getDouble(3) - MmrLambda) < 1e-12,
      "first pick's mmr is λ·rel with zero diversity penalty")
    assert(rows.map(_.getLong(1)).distinct.length === MmrK, "picks are unique")
    // the diversity penalty must actually bite: the MMR pick sequence
    // differs from the pure-relevance top-k on this fixture (verified
    // against the DuckDB chain during development)
    val topk = ReferenceQueries.knnTopK(spark, Sf0001, MmrK)
      .collect().map(_.getLong(0)).toSeq
    assert(rows.map(_.getLong(1)).toSeq !== topk)
  }

  test("label_centroids_fast equals the explode form; plan has no pre-agg explode") {
    val slow = SimilarityQueries.labelCentroids(spark, Sf0001).collect()
    val fast = SimilarityQueries.labelCentroidsFast(spark, Sf0001).collect()
    assert(fast.length === slow.length)
    fast.zip(slow).foreach { case (f, s) =>
      assert(f.get(0) === s.get(0))
      assert(f.getLong(1) === s.getLong(1))
      assert(f.getDouble(2) === s.getDouble(2),
        s"label ${f.get(0)} dim ${f.getLong(1)}")
    }
    // the explode must sit ABOVE the aggregate (|labels| rows), not below it
    val plan = SimilarityQueriesSpecHelper.analyzedTree(
      SimilarityQueries.labelCentroidsFast(spark, Sf0001))
    assert(plan.indexOf("Generate") < plan.indexOf("vector_avg"),
      s"explode must be post-aggregate (analyzed plans print top-down):\n$plan")
  }

  test("vector_sum / vector_avg: values, null handling, dimension mismatch") {
    import graft.functions.{vector_avg, vector_sum}
    val df = Seq(
      ("a", Array(1.0f, 2.0f)),
      ("a", Array(3.0f, 4.5f)),
      ("b", Array(10.0f, -1.0f)),
      ("c", null.asInstanceOf[Array[Float]])).toDF("g", "v")
    val sums = df.groupBy("g")
      .agg(vector_sum(col("v")).as("s"), vector_avg(col("v")).as("m"))
      .orderBy("g").collect()
    assert(sums(0).getAs[collection.Seq[Double]]("s") === Seq(4.0, 6.5))
    assert(sums(0).getAs[collection.Seq[Double]]("m") === Seq(2.0, 3.25))
    assert(sums(1).getAs[collection.Seq[Double]]("s") === Seq(10.0, -1.0))
    // all-null group → SQL NULL, like built-in aggregates
    assert(sums(2).isNullAt(1) && sums(2).isNullAt(2))
    val mixed = Seq(Array(1.0f), Array(1.0f, 2.0f)).toDF("v")
    val err = intercept[Exception] {
      mixed.agg(vector_sum(col("v"))).collect()
    }
    assert(err.getMessage != null)
  }

  test("embedding_covariance matches a direct two-pass computation") {
    val d = SimilarityQueries.CovDims
    val rows = SimilarityQueries.embeddingCovariance(spark, Sf0001).collect()
    assert(rows.length === d * (d + 1) / 2, "full upper triangle")
    val cov = rows.map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getDouble(2)).toMap
    // independent reference: plain-double two-pass covariance on the driver
    val vecs = graft.Tables.embeddings(spark, Sf0001)
      .select(org.apache.spark.sql.functions.col("embedding"))
      .collect().map(_.getAs[collection.Seq[Float]](0).map(_.toDouble).toArray)
    val n = vecs.length
    val mean = Array.tabulate(d)(i => vecs.map(_(i)).sum / n)
    for ((i, j) <- Seq((0, 0), (0, 1), (5, 40), (63, 63), (31, 32))) {
      val ref = vecs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
      assert(math.abs(cov((i, j)) - ref) < 1e-5, s"cov($i,$j): ${cov((i, j))} vs $ref")
    }
    // diagonal entries are variances: non-negative up to the 6dp rounding
    (0 until d).foreach(i => assert(cov((i, i)) >= -1e-6))
  }

  test("pca: eigen residual, orthonormality, variance capture, whitening") {
    val model = Pca.fit(spark, Sf0001)
    val d = model.dims
    assert(d === SimilarityQueries.CovDims)
    // eigenvalues sorted descending, non-negative up to rounding noise
    model.eigenvalues.sliding(2).foreach(w => assert(w(0) >= w(1) - 1e-12))
    assert(model.eigenvalues.forall(_ >= -1e-6))
    // rebuild C from the oracle-gated covariance query and check C·v ≈ λ·v
    val covRows = SimilarityQueries.embeddingCovariance(spark, Sf0001).collect()
    val c = Array.ofDim[Double](d, d)
    covRows.foreach { r =>
      c(r.getLong(0).toInt)(r.getLong(1).toInt) = r.getDouble(2)
      c(r.getLong(1).toInt)(r.getLong(0).toInt) = r.getDouble(2)
    }
    for (k <- 0 until 3) {
      val v = model.components(k)
      val cv = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * v(j)).sum)
      val resid = (0 until d).map(i => math.abs(cv(i) - model.eigenvalues(k) * v(i))).max
      assert(resid < 1e-8, s"eigenpair $k residual $resid")
    }
    // orthonormal components
    for (a <- 0 until 3; b <- 0 until 3) {
      val dot = (0 until d).map(i => model.components(a)(i) * model.components(b)(i)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9)
    }
    // trace preservation: Σλ = Σ var_i
    val trace = (0 until d).map(i => c(i)(i)).sum
    assert(math.abs(model.eigenvalues.sum - trace) < 1e-8)
    // projected variance realizes the eigenvalues; whitening flattens it
    val emb = graft.Tables.embeddings(spark, Sf0001)
    val pc = Pca.project(emb, model, 2).select("pc").collect()
      .map(_.getAs[collection.Seq[Double]](0))
    for (k <- 0 until 2) {
      val xs = pc.map(_(k))
      val m = xs.sum / xs.length
      val v = xs.map(x => (x - m) * (x - m)).sum / xs.length
      assert(math.abs(v - model.eigenvalues(k)) < 1e-3,
        s"projected var $v vs eigenvalue ${model.eigenvalues(k)}")
    }
    val white = Pca.whiten(emb, model, 2).select("white").collect()
      .map(_.getAs[collection.Seq[Double]](0))
    for (k <- 0 until 2) {
      val xs = white.map(_(k))
      val m = xs.sum / xs.length
      val v = xs.map(x => (x - m) * (x - m)).sum / xs.length
      assert(math.abs(v - 1.0) < 1e-2, s"whitened var $v should be ~1")
    }
  }
}

private object SimilarityQueriesSpecHelper {
  def analyzedTree(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString
}
