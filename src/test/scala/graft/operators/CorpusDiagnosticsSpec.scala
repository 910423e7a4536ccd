package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusDiagnosticsSpec extends SparkSpec {
  import spark.implicits._

  /** Throwaway documents.parquet with the columns corpus-level operators
    * read (doc_id, text, source, n_chars). */
  private def corpusDir(rows: (Long, String, String)*): String = {
    val dir = graft.util.TempDirs.create("graft_diag").toString
    rows.toSeq.toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("bigram_novelty: frequent bigrams are familiar, short docs drop") {
    val dir = corpusDir(
      (0L, "a b c", "s"), (1L, "a b d", "s"), (2L, "a b e", "s"),
      (3L, "solo", "s"))
    val rows = CorpusDiagnostics.bigramNovelty(spark, dir).collect()
    // "a b" appears in 3 docs (= NoveltyDf) → familiar; "b c"/"b d"/"b e"
    // are singletons; the 1-token doc has no bigrams and no row
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L))
    rows.foreach { r =>
      assert(r.getLong(1) === 2L, "two distinct bigrams per doc")
      assert(r.getLong(2) === 1L, "only 'a b' clears the df threshold")
      assert(r.getDouble(3) === 0.5)
    }
  }

  test("bigram_novelty: forced shuffle-join path is row-identical to the broadcast path") {
    // the frequent-set join carries no broadcast hint (a df≥3 cut is not
    // selective at scale); the planner size-gates it. Force the fallback
    // (shuffle) plan by disabling broadcast joins entirely and pin that
    // both paths return identical rows.
    val dir = corpusDir(
      (0L, "a b c a b", "s"), (1L, "a b d", "s"), (2L, "a b e c a", "s"),
      (3L, "x y x y x y", "s"), (4L, "solo", "s"))
    val default = CorpusDiagnostics.bigramNovelty(spark, dir).collect().map(_.toSeq).toSeq
    val conf = spark.conf
    // restore-by-unset when a key was not explicitly set before: leaving
    // an explicit value behind changes AQE decisions for later suites
    // (SkewSpec's runtime skew-split assertion is sensitive to it)
    val savedStatic = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedAdaptive = conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val fallback = CorpusDiagnostics.bigramNovelty(spark, dir)
      val plan = fallback.queryExecution.sparkPlan.toString
      assert(!plan.contains("BroadcastExchange"),
        s"broadcast disabled — fallback plan must shuffle:\n$plan")
      assert(fallback.collect().map(_.toSeq).toSeq === default)
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", savedStatic)
      savedAdaptive match {
        case Some(v) => conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("heavy_hitters: sketch+verify equals the exact aggregation, any capacity") {
    val texts = (0 until 40).map { i =>
      // token t<j> appears in docs 0..j-1 → global count of t<j> is 40-j…
      // plus a universal filler so counts are skewed
      (i.toLong, (s"filler " * 5) + (0 to i).map(j => s"t$j").mkString(" "), "s")
    }
    val dir = corpusDir(texts: _*)
    val expected = graft.Tables.documents(spark, dir)
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(CorpusDiagnostics.HeavyK)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // default capacity (guarded path) and a tiny capacity (forces the
    // fallback guard) must both return the exact answer
    for (cap <- Seq(CorpusDiagnostics.MgCapacity, 4)) {
      val got = CorpusDiagnostics.heavyHitters(spark, dir, cap)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got === expected, s"capacity=$cap")
    }
  }

  test("source_divergence: KL ≥ 0, in-distribution source scores below a shifted one") {
    val rows = CorpusDiagnostics.sourceDivergence(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    // Gibbs: KL is non-negative up to the 9dp per-term rounding
    // (≤ 128 · 0.5e-9 accumulated error)
    rows.foreach(r => assert(r.getDouble(2) >= -1e-6,
      s"KL(${r.getString(0)}) = ${r.getDouble(2)}"))
    // n_tokens partitions the corpus token stream
    val total = graft.Tables.documents(spark, Sf0001)
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))).count()
    assert(rows.map(_.getLong(1)).sum === total)
    // a source drawn from the corpus vocabulary diverges less than one
    // writing a disjoint vocabulary
    val base = (1 to 40).map(i => s"w${i % 7}").mkString(" ")
    val dir = corpusDir(
      (0L, base, "same"), (1L, base, "same"),
      (2L, (1 to 40).map(i => s"odd$i").mkString(" "), "shifted"),
      (3L, base, "same"))
    val kl = CorpusDiagnostics.sourceDivergence(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(kl("same") < kl("shifted"),
      s"in-distribution ${kl("same")} must beat shifted ${kl("shifted")}")
  }

  test("temperature_mix: sqrt weighting flattens the head; targets replay") {
    // source a: 2 docs × 50 chars = 100 char mass; source b: 2 docs × 200
    // chars = 400 → raw ratio 1:4 flattens to sqrt ratio 1:2
    val dir = corpusDir(
      (0L, "x" * 50, "a"), (1L, "y" * 50, "a"),
      (2L, "p" * 200, "b"), (3L, "q" * 200, "b"))
    val rows = CorpusDiagnostics.temperatureMix(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("a").getLong(2) === 100L)
    assert(rows("b").getLong(2) === 400L)
    assert(math.abs(rows("a").getDouble(3) - 1.0 / 3) < 1e-6)
    assert(math.abs(rows("b").getDouble(3) - 2.0 / 3) < 1e-6)
    // corpus budget = floor(4/2) = 2 → targets floor(share·2)
    assert(rows("a").getLong(4) === 0L)
    assert(rows("b").getLong(4) === 1L)
  }

  test("pca_project: Rayleigh identity — var(pc1) matches the eigenvalue") {
    val out = SimilarityQueries.pcaProject(spark, Sf0001)
      .select(col("pc1"), col("eigenvalue")).collect()
    val scores = out.map(_.getDouble(0))
    val eig = out.head.getDouble(1)
    val n = scores.length.toDouble
    val mean = scores.sum / n
    val varP = scores.map(x => (x - mean) * (x - mean)).sum / n
    // projection onto a converged unit eigenvector: Var(x·v) = vᵀΣv ≈ λ₁.
    // The fixture's synthetic spectrum is nearly flat (λ₂/λ₁ ≈ 1), where
    // two power rounds converge slowly — the estimate lands within ~15%
    // there; the planted-direction test below is the tight semantic gate.
    assert(varP > 0.0 && eig > 0.0)
    assert(math.abs(varP - eig) / eig < 0.15,
      s"var(pc1)=$varP vs eigenvalue=$eig")
  }

  test("prototype_prune keeps the per-cluster far tail of kmeans_assign") {
    val assign = SimilarityQueries.kmeansAssign(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = assign.groupBy(_._2).toSeq.flatMap { case (cluster, rows) =>
      rows.toSeq.sortBy { case (id, _, d) => (-d, id) }
        .take(SimilarityQueries.PrunePerCluster)
        .zipWithIndex
        .map { case ((id, _, d), i) => (cluster, i + 1L, id, d) }
    }.toSet
    val got = SimilarityQueries.prototypePrune(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === expected)
  }

  test("pca_project finds a planted dominant direction") {
    val d = SimilarityQueries.CovDims
    // dim 7 carries ±10 signal; all other dims tiny deterministic noise
    val rows = (0 until 200).map { i =>
      val v = Array.tabulate(d)(j =>
        if (j == 7) (if (i % 2 == 0) 10.0f else -10.0f)
        else ((i * 31 + j * 17) % 13 - 6) / 100.0f)
      (i.toLong, v)
    }
    val dir = graft.util.TempDirs.create("graft_pca").toString
    rows.toDF("vec_id", "embedding").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SimilarityQueries.pcaProject(spark, dir).collect()
    val byId = out.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // scores must separate the two planted groups by ~20·|v₇| with a
    // consistent sign per group
    val even = (0 until 200 by 2).map(i => byId(i.toLong))
    val odd = (1 until 200 by 2).map(i => byId(i.toLong))
    assert(even.forall(x => math.signum(x) == math.signum(even.head)))
    assert(odd.forall(x => math.signum(x) == math.signum(odd.head)))
    assert(math.signum(even.head) == -math.signum(odd.head))
    assert(math.abs(even.head - odd.head) > 15.0, "groups separate along v₇")
    val eig = out.head.getDouble(2)
    assert(math.abs(eig - 100.0) / 100.0 < 0.1,
      s"top eigenvalue ≈ Var(±10 signal) = 100, got $eig")
  }
}
