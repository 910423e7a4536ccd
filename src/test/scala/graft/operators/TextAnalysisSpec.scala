package graft.operators

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  test("text_stats ratios bounded and token counts positive") {
    val rows = TextAnalysis.textStats(spark, Sf0001).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tokens") > 0)
      val sr = r.getAs[Double]("stop_ratio")
      assert(sr >= 0.0 && sr <= 1.0)
      val q = r.getAs[Double]("quality_score")
      assert(q >= 0.0 && q <= 1.0)
    }
  }

  test("lang_id predicts a language for every doc with deterministic tie-break") {
    val rows = TextAnalysis.langId(spark, Sf0001).collect()
    assert(rows.length === 500)
    val langs = rows.map(_.getAs[String]("pred_lang")).toSet
    assert(langs.subsetOf(Set("de", "en", "es", "fr", "zh", "und")))
    // fixture vocabulary is English-ish filler: 'the'/'a'/'in' dominate
    assert(rows.count(_.getAs[String]("pred_lang") == "en") > 250)
  }

  test("doc_fingerprint is stable md5 hex and collides only for identical text") {
    val rows = TextAnalysis.docFingerprint(spark, Sf0001).collect()
    assert(rows.forall(_.getString(1).matches("[0-9a-f]{32}")))
  }

  test("quality_filter: rules attribute first-failing; counts sum to corpus size") {
    val rows = TextAnalysis.qualityFilter(spark, Sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.values.sum === 500L)
    assert(rows.getOrElse("retained", 0L) > 0L, "some documents must survive")
    assert(rows.getOrElse("too_short", 0L) > 0L, "the length rule must fire on this corpus")
    assert(rows.keySet.subsetOf(Set("too_short", "low_stopword", "high_punct", "retained")))
  }

  test("quality_signals: ratios bounded, counts consistent") {
    val rows = TextAnalysis.qualitySignals(spark, Sf0001).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val (n, d) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_distinct_tokens"))
      assert(d >= 1 && d <= n)
      val dr = r.getAs[Double]("distinct_ratio")
      val tf = r.getAs[Double]("top_token_frac")
      assert(dr > 0 && dr <= 1.0 && tf > 0 && tf <= 1.0)
      assert(tf >= 1.0 / d, "most frequent token covers at least its uniform share")
      assert(r.getAs[Double]("mean_word_len") > 0)
    }
  }

  test("corpus_sample: deterministic ~10% subset, stable across runs") {
    val s1 = TextAnalysis.corpusSample(spark, Sf0001).collect().map(_.getLong(0))
    val s2 = TextAnalysis.corpusSample(spark, Sf0001).collect().map(_.getLong(0))
    assert(s1.sameElements(s2), "hash sampling must be reproducible")
    // binomial(500, 0.1): ±5σ bounds
    assert(s1.length > 20 && s1.length < 90, s"got ${s1.length} of 500")
  }

  test("knn_batch: rank 1 of each query is itself at distance ~0") {
    val rows = SimilarityQueries.knnBatch(spark, Sf0001).collect()
    assert(rows.length === SimilarityQueries.BatchQueries * SimilarityQueries.BatchK)
    val rank1 = rows.filter(_.getAs[Long]("rank") == 1L)
    rank1.foreach { r =>
      assert(r.getAs[Long]("qid") === r.getAs[Long]("vec_id"))
      assert(math.abs(r.getAs[Double]("dist")) < 1e-9)
    }
  }
}
