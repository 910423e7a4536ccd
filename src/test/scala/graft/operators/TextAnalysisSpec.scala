package graft.operators

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  /** Write a throwaway documents.parquet so corpus-level operators can run
    * on handcrafted texts. */
  private def corpusDir(texts: (Long, String)*): String = {
    val dir = graft.util.TempDirs.create("graft_txt").toString
    texts.toSeq.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("bpe_merge_iter2 applies the winning merge and recounts symbol pairs") {
    // vocab: low×2, lower×1. Iteration 1: lo:3, ow:3, we:1, er:1 —
    // tie between "lo" and "ow" breaks pair-ascending → merge "lo".
    // Re-segmented: [lo,w]×2, [lo,w,e,r]×1 → pairs lo+w:3, w+e:1, e+r:1.
    val dir = corpusDir(0L -> "low low lower")
    val got = TextAnalysis.bpeMergeIter2(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("lo+w", 3L), ("e+r", 1L), ("w+e", 1L)))
  }

  test("bpe_merge_iter2 merge application is greedy left-to-right on overlaps") {
    // "aaa": iteration-1 top pair "aa" (count 2 from overlapping windows);
    // greedy replace gives [aa, a] — so the single iteration-2 pair is
    // aa+a, never a+aa
    val dir = corpusDir(0L -> "aaa aaa")
    val got = TextAnalysis.bpeMergeIter2(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("aa+a", 2L)))
  }

  test("bpe_learn: k-merge trainer loop, hand-computed on low/lower") {
    // vocab low:2, lower:1. Merge 1: lo:3, ow:3 tie → "l+o". Merge 2:
    // re-segmented [lo,w]×2 [lo,w,e,r] → lo+w:3. Merge 3: [low]×2
    // [low,e,r] → low+e:1 vs e+r:1 tie → "e+r". Merge 4: [low,er] →
    // low+er:1. Merge 5: vocab is single symbols → loop stops early.
    val dir = corpusDir(0L -> "low low lower")
    val got = TextAnalysis.bpeLearn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, "l+o", 3L), (2L, "lo+w", 3L),
      (3L, "e+r", 1L), (4L, "low+er", 1L)))
  }

  test("bpe_learn iterations 1-2 equal the unrolled bpe_pair_counts / bpe_merge_iter2 winners") {
    // the trainer's k=2 prefix must reproduce the two existing unrolled
    // queries: merge 1 = bpe_pair_counts' top pair, merge 2 = the top
    // recounted pair bpe_merge_iter2 reports
    val dir = corpusDir(0L -> "low low lower newest newest wider low")
    val learned = TextAnalysis.bpeLearn(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq
    val iter1 = TextAnalysis.bpePairCounts(spark, dir).head
    val pair1 = s"${iter1.getString(0).charAt(0)}+${iter1.getString(0).charAt(1)}"
    assert(learned.head === ((pair1, iter1.getLong(1))))
    val iter2 = TextAnalysis.bpeMergeIter2(spark, dir).head
    assert(learned(1) === ((iter2.getString(0), iter2.getLong(1))))
  }

  test("bpe_tokens_per_doc: learned merges compress the corpus they were trained on") {
    // same corpus as the trainer spec: merges are l+o, lo+w, e+r, low+er
    // (then exhaustion). Segmentations: "low" → [low] (1 symbol),
    // "lower" → [lower] (1 symbol: low+er fires after e+r)
    val dir = corpusDir(0L -> "low low lower")
    val rows = TextAnalysis.bpeTokensPerDoc(spark, dir).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(1) === 3L, "three word instances")
    assert(r.getLong(2) === 3L, "each word collapses to one learned symbol")
    // 11 chars / 3 symbols
    assert(r.getDouble(3) === 11.0 / 3.0)
  }

  test("bpe_tokens_per_doc: untrainable chars stay one symbol each") {
    // "ab ab" trains merge a+b (then exhausts); "xyz" shares no pair with
    // the vocab's learned merges... but x+y / y+z DO get learned (they are
    // pairs of the corpus). Use disjoint docs to hand-check totals: vocab
    // {ab:2, xyz:1}: merge1 ab:2 ("a+b"), merge2 over {␁:2, xyz:1}:
    // xy:1 vs yz:1 tie → ep "x+y" < "y+z" → merge x+y; merge3 ␂z → "xy+z";
    // then exhaustion. Final: ab→1 sym, xyz→1 sym.
    val dir = corpusDir(0L -> "ab ab", 1L -> "xyz")
    val rows = TextAnalysis.bpeTokensPerDoc(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows(0L) === ((2L, 2L)))
    assert(rows(1L) === ((1L, 1L)))
  }

  test("corpus_shuffle: contiguous positions, deterministic permutation, salt-sensitive") {
    val dir = corpusDir((0L to 19L).map(i => i -> s"doc number $i"): _*)
    val a = TextAnalysis.corpusShuffle(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // positions are exactly 0..n-1 (zipWithIndex offsets line up)
    assert(a.map(_._2).sorted.toSeq === (0L to 19L))
    // a permutation, not the identity (hash ordering actually shuffles)
    assert(a.sortBy(_._2).map(_._1).toSeq !== (0L to 19L))
    // rerun is bit-identical (pure function of doc_id + salt)
    val b = TextAnalysis.corpusShuffle(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq === b.toSeq)
  }

  test("stupid_backoff_score: seen bigrams use c2/c1, unseen ride the α backoff") {
    val dir = graft.util.TempDirs.create("graft_sb").toString
    Seq((0L, "a b", "en"), (1L, "a b", "en"), (2L, "a c", "en"),
      (3L, "a b z a", "fr"))
      .toDF("doc_id", "text", "lang").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // en LM: unigrams a:3 b:2 c:1 (T=6, V=3); bigrams (a,b):2 (a,c):1
    def term(p: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(-math.log(p))
        .setScale(6, java.math.RoundingMode.HALF_UP)
    val rows = TextAnalysis.stupidBackoffScore(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(0L).getLong(2) === 0L)
    assert(rows(0L).getDouble(3) === term(2.0 / 3).doubleValue)
    // fr doc: (a,b) seen; (b,z) backs off to unseen z (c1=0); (z,a) backs
    // off to a (c1=3)
    assert(rows(3L).getLong(1) === 3L)
    assert(rows(3L).getLong(2) === 2L)
    val expected = term(2.0 / 3)
      .add(term(0.4 * (0 + 1.0) / (6 + 3.0)))
      .add(term(0.4 * (3 + 1.0) / (6 + 3.0)))
      .doubleValue / 3
    assert(rows(3L).getDouble(3) === expected)
    // out-of-domain scores above in-domain
    assert(rows(3L).getDouble(3) > rows(0L).getDouble(3))
  }

  test("stupid_backoff_score: salted bigram join is row-identical to the plain join on a skewed fixture") {
    // Zipfian head: "of the" dominates the bigram stream (the key shape
    // that piles one reducer at scale); salt=1 IS the plain equi-join
    val dir = graft.util.TempDirs.create("graft_sb_skew").toString
    val head = Array.fill(40)("of the").mkString(" ")
    Seq((0L, s"$head tail one", "en"), (1L, s"$head tail two", "en"),
      (2L, "of the of the of the", "en"), (3L, "novel words here", "fr"),
      (4L, s"$head", "en"))
      .toDF("doc_id", "text", "lang").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val plain = TextAnalysis.stupidBackoffScore(spark, dir, salt = 1)
      .collect().map(_.toSeq).toSeq
    val salted = TextAnalysis.stupidBackoffScore(spark, dir, salt = TextAnalysis.SbJoinSalt)
      .collect().map(_.toSeq).toSeq
    assert(salted === plain)
  }

  test("stupid_backoff_score: adaptive probe engages on a hot head, stays plain when uniform") {
    // 200 docs so the deterministic ~5% salted-bucket sample is non-empty
    // (fixed doc_ids + fixed salt → a fixed sampled subset)
    val skewDir = graft.util.TempDirs.create("graft_sb_hot").toString
    (0L until 200L).map(i => (i, "of the of the of the of the", "en"))
      .toDF("doc_id", "text", "lang").coalesce(1)
      .write.mode("overwrite").parquet(s"$skewDir/documents.parquet")
    assert(TextAnalysis.adaptiveSbSalt(spark, skewDir) === TextAnalysis.SbJoinSalt,
      "every doc is the head bigram — the probe must engage the salt")
    val uniDir = graft.util.TempDirs.create("graft_sb_uni").toString
    (0L until 200L).map(i => (i, s"w${i}a w${i}b w${i}c w${i}d w${i}e", "en"))
      .toDF("doc_id", "text", "lang").coalesce(1)
      .write.mode("overwrite").parquet(s"$uniDir/documents.parquet")
    assert(TextAnalysis.adaptiveSbSalt(spark, uniDir) === 1,
      "all bigrams distinct — replication insurance is pure waste")
  }

  test("adaptiveSbSalt memoizes: the skew probe runs NO second job within a session") {
    // fresh corpus path → fresh memo key (the memo is keyed on
    // path + mtime, shared across the suite's session)
    val dir = graft.util.TempDirs.create("graft_sb_memo").toString
    (0L until 200L).map(i => (i, "one two three four five", "en"))
      .toDF("doc_id", "text", "lang").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      def drained(): Int = {
        org.apache.spark.GraftSparkShim.drainListenerBus(spark.sparkContext)
        jobs.get()
      }
      val before = drained()
      val s1 = TextAnalysis.adaptiveSbSalt(spark, dir)
      val afterFirst = drained()
      assert(afterFirst > before, "the cold probe must run at least one job")
      val s2 = TextAnalysis.adaptiveSbSalt(spark, dir)
      assert(drained() === afterFirst,
        "the memo must answer the second call with ZERO jobs — a repeated " +
          "probe scan would re-pay the sample aggregation per execution")
      assert(s2 === s1)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("repetition_signals separates degenerate from diverse text") {
    val dir = corpusDir(
      0L -> "spam spam spam spam spam spam spam spam",      // one bigram repeated
      1L -> "alpha beta gamma delta epsilon zeta eta theta", // all distinct
      2L -> "go go stop go go stop go go")                   // mixed
    val rows = TextAnalysis.repetitionSignals(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 0: 7 bigrams, all "spam spam" → dup frac 1−1/7, top share 1.0
    assert(rows(0L).getAs[Long]("n_bigrams") === 7L)
    assert(math.abs(rows(0L).getAs[Double]("dup_bigram_frac") - (1.0 - 1.0 / 7)) < 1e-6)
    assert(rows(0L).getAs[Double]("top_bigram_share") === 1.0)
    assert(rows(0L).getAs[Double]("dup_trigram_frac") > 0.8)
    // doc 1: no repeated n-grams at all
    assert(rows(1L).getAs[Double]("dup_bigram_frac") === 0.0)
    assert(rows(1L).getAs[Double]("dup_trigram_frac") === 0.0)
    // degenerate ranks strictly above diverse on every signal
    assert(rows(0L).getAs[Double]("dup_bigram_frac") >
      rows(2L).getAs[Double]("dup_bigram_frac"))
    assert(rows(2L).getAs[Double]("dup_bigram_frac") >
      rows(1L).getAs[Double]("dup_bigram_frac"))
  }

  test("repetition_signals drops docs shorter than the n-gram order") {
    val dir = corpusDir(0L -> "solo", 1L -> "two tokens", 2L -> "three tokens here")
    val ids = TextAnalysis.repetitionSignals(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(ids === Set(2L), "needs ≥3 tokens for the trigram join")
  }

  test("doc_chunks: windows reconstruct the document; overlap and offsets hold") {
    val text = ("abcdefghij" * 45) + "tail" // 454 chars → chunks at 0/150/300/450
    val dir = corpusDir(0L -> text, 1L -> "short", 2L -> "")
    val rows = TextAnalysis.docChunks(spark, dir).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(!byDoc.contains(2L), "empty docs produce no chunks")
    assert(byDoc(1L).length === 1 && byDoc(1L).head.getString(3) === "short")
    val chunks = byDoc(0L).sortBy(_.getLong(1))
    assert(chunks.length === 4)
    chunks.foreach { c =>
      val start = c.getLong(2).toInt
      assert(start === c.getLong(1).toInt * (TextAnalysis.ChunkSize - TextAnalysis.ChunkOverlap))
      assert(c.getString(3) === text.substring(start,
        math.min(start + TextAnalysis.ChunkSize, text.length)))
    }
    // consecutive chunks overlap by exactly ChunkOverlap chars
    chunks.sliding(2).foreach { case Array(a, b) =>
      if (a.getString(3).length == TextAnalysis.ChunkSize)
        assert(a.getString(3).takeRight(TextAnalysis.ChunkOverlap) ===
          b.getString(3).take(TextAnalysis.ChunkOverlap))
    }
    // full coverage: every char of the source appears in some chunk
    assert(chunks.map(c => c.getLong(2) + c.getString(3).length).max === text.length)
  }

  test("sequence_packing matches a driver-side sequential packer per shard") {
    // token counts 1..1000 so plenty of docs span a 512-token sequence
    val texts = (0L until 60L).map { i =>
      i -> Seq.fill((i * 41 % 1000 + 1).toInt)(s"w$i").mkString(" ")
    }
    val dir = corpusDir(texts: _*)
    val rows = TextAnalysis.sequencePacking(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq === (0L until 60L))
    val nTokByDoc = texts.map { case (id, t) =>
      id -> (t.trim.split("\\s+").length.toLong + 1L) // +1 EOS
    }.toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tok") === nTokByDoc(r.getLong(0)))
      assert(r.getAs[Long]("shard") >= 0L &&
        r.getAs[Long]("shard") < TextAnalysis.PackShards)
    }
    // replay each shard's concatenated token stream and check the layout
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (_, rs) =>
      var pos = 0L
      rs.sortBy(_.getLong(0)).foreach { r =>
        val n = r.getAs[Long]("n_tok")
        assert(r.getAs[Long]("first_seq") === pos / TextAnalysis.PackSeqLen)
        assert(r.getAs[Long]("seq_offset") === pos % TextAnalysis.PackSeqLen)
        assert(r.getAs[Long]("n_seqs_spanned") ===
          (pos + n - 1) / TextAnalysis.PackSeqLen - pos / TextAnalysis.PackSeqLen + 1)
        pos += n
      }
    }
  }

  test("bpe_pair_counts: hand-computed merge statistics with tie-break") {
    val dir = corpusDir(0L -> "low lower low", 1L -> "lowest")
    // vocab: low×2, lower×1, lowest×1 → lo=4, ow=4, we=2, er=1, es=1, st=1
    val rows = TextAnalysis.bpePairCounts(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq === Seq(
      "lo" -> 4L, "ow" -> 4L, "we" -> 2L, "er" -> 1L, "es" -> 1L, "st" -> 1L))
  }

  test("vocab_coverage: hand-computed cumulative shares with tie-break") {
    val dir = corpusDir(0L -> "a a a b b c", 1L -> "a d")
    // counts: a=4 b=2 c=1 d=1, total 8 → coverage .5 .75 .875 1.0 (c before d)
    val rows = TextAnalysis.vocabCoverage(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq === Seq(
      (1L, "a", 4L, 0.5), (2L, "b", 2L, 0.75),
      (3L, "c", 1L, 0.875), (4L, "d", 1L, 1.0)))
  }

  test("corpus_mix: kept fraction tracks each source's weight; deterministic") {
    val rows = TextAnalysis.corpusMix(spark, Sf0001).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val (pct, n, kept) = (r.getInt(1), r.getLong(2), r.getLong(3))
      assert(Set(25, 50, 75, 100).contains(pct))
      assert(kept <= n)
      if (pct == 100) assert(kept === n, "weight 1.0 keeps everything")
      // salted-hash sampling: expect pct% ± wide tolerance at n=25
      assert(math.abs(kept.toDouble / n - pct / 100.0) <= 0.35,
        s"${r.getString(0)}: kept $kept/$n vs $pct%")
    }
    val again = TextAnalysis.corpusMix(spark, Sf0001).collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq, "mix must be deterministic")
  }

  test("corpus_mix: digit-less source names default to keep-everything") {
    val dir = graft.util.TempDirs.create("graft_mix_nodigit").toString
    (0L until 10L).map(i => (i, s"doc $i", if (i < 5) "wiki" else "src3"))
      .toDF("doc_id", "text", "source").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.corpusMix(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows("wiki") === ((100, 5L, 5L)),
      "no digits → weight 100%, everything kept (not a silent kept=0)")
    assert(rows("src3")._1 === 100) // 3 % 4 + 1 = 4 → 100
  }

  test("lm_score: rare-token documents score higher than common-token ones") {
    val common = "the data table row value"
    val dir = corpusDir(
      (0L to 19L).map(i => i -> common) :+ (20L -> "zyzzyva qwerty xylophone"): _*)
    val rows = TextAnalysis.lmScore(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("lm_score")).toMap
    assert(rows(20L) > rows(0L) * 2,
      s"rare doc ${rows(20L)} must far exceed common doc ${rows(0L)}")
    // all common docs share one score (same text → same mean log-prob)
    assert((0L to 19L).map(rows).toSet.size === 1)
    assert(rows.values.forall(_ > 0.0), "negative log probs are positive")
  }


  test("quality_classifier: NB filter separates planted classes and rescues curated-like crawl") {
    // positive class = NbPositiveSources members; a crawl doc WITH
    // curated-looking text must still score positive — that rescue is the
    // entire point of the GPT-3-style classifier gate
    val dir = graft.util.TempDirs.create("graft_nbq").toString
    val curated = "fine curated encyclopedic prose paragraph"
    val spam = "click casino win prize casino click"
    val rows = ((0L to 4L).map(i => (i, curated, "src0")) ++
      (10L to 14L).map(i => (i, spam, "crawl")) :+
      ((20L, curated, "crawl"))).toDF("doc_id", "text", "source")
    rows.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.qualityClassifier(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Double]("nb_score"), r.getLong(3)))).toMap
    assert(got.size === 11)
    (0L to 4L).foreach(i => assert(got(i)._2 === 1L, s"curated doc $i must score positive"))
    (10L to 14L).foreach(i => assert(got(i)._2 === 0L, s"spam doc $i must score negative"))
    assert(got(20L)._2 === 1L && got(20L)._1 === got(0L)._1,
      "curated-like crawl text gets the curated score (the model sees tokens, not labels)")
    // deterministic end to end (decimal sums, no float accumulation order)
    val again = TextAnalysis.qualityClassifier(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Double]("nb_score"), r.getLong(3)))).toMap
    assert(again === got)
  }

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

  test("phrase_search counts adjacent repeats and guards sub-phrase docs") {
    // PhraseTerms = ("table","scan"): doc 0 matches at positions 1 and 3;
    // doc 1 is SHORTER than the phrase (the sequence(1,0)-descends guard);
    // doc 2 has both terms but not adjacent in order; doc 3 matches once
    // mid-stream
    val dir = corpusDir(
      0L -> "table scan table scan", 1L -> "table",
      2L -> "scan table", 3L -> "x table scan y")
    val got = TextAnalysis.phraseSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((0L, 2L), (3L, 1L)))
  }

  test("phrase_search_indexed is row-identical to the scan form") {
    val scan = TextAnalysis.phraseSearch(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val idx = TextAnalysis.phraseSearchIndexed(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(scan.nonEmpty, "fixture must contain the phrase")
    assert(idx === scan)
  }

  test("weighted_sample: reproducible, k rows, and length-biased as designed") {
    val s1 = TextAnalysis.weightedSample(spark, Sf0001).collect()
    val s2 = TextAnalysis.weightedSample(spark, Sf0001).collect()
    assert(s1.map(_.getLong(0)).sameElements(s2.map(_.getLong(0))),
      "hash-driven A-ES must be reproducible")
    assert(s1.length === TextAnalysis.WsK)
    val corpusMean = graft.Tables.documents(spark, Sf0001)
      .agg(org.apache.spark.sql.functions.avg("n_chars")).head().getDouble(0)
    val sampleMean = s1.map(_.getLong(1)).sum.toDouble / s1.length
    assert(sampleMean > corpusMean,
      s"n_chars-weighted sample mean $sampleMean should exceed corpus mean $corpusMean")
  }

  test("corpus_sample: deterministic ~10% subset, stable across runs") {
    val s1 = TextAnalysis.corpusSample(spark, Sf0001).collect().map(_.getLong(0))
    val s2 = TextAnalysis.corpusSample(spark, Sf0001).collect().map(_.getLong(0))
    assert(s1.sameElements(s2), "hash sampling must be reproducible")
    // binomial(500, 0.1): ±5σ bounds
    assert(s1.length > 20 && s1.length < 90, s"got ${s1.length} of 500")
  }

  test("bm25_topk matches a driver-side reference implementation exactly") {
    import TextAnalysis.{Bm25B, Bm25K, Bm25K1, Bm25Query}
    val docs = graft.Tables.documents(spark, Sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq).toMap
    val n = docs.size.toDouble
    val avgdl = docs.values.map(_.size).sum.toDouble / n
    val df = Bm25Query.map(t => t -> docs.values.count(_.contains(t)).toDouble).toMap
    val scores = docs.map { case (id, toks) =>
      val s = Bm25Query.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0 || df(t) == 0) 0.0
        else math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0) *
          (tf * (Bm25K1 + 1.0)) /
          (tf + Bm25K1 * (1.0 - Bm25B + Bm25B * toks.size.toDouble / avgdl))
      }.sum
      val matched = Bm25Query.count(t => toks.contains(t)).toLong
      (id, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, matched)
    }.filter(_._3 > 0).toSeq
      .sortBy { case (id, s, _) => (-s, id) }.take(Bm25K)
    val got = TextAnalysis.bm25TopK(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq === scores, "BM25 top-k must match the reference scorer")
    val plan = TextAnalysis.bm25TopK(spark, Sf0001).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$plan")
  }

  test("hybrid_search: RRF fuses vector and BM25 ranks; deterministic; bounded") {
    import TextAnalysis.{RrfK, RrfTopK}
    val r1 = TextAnalysis.hybridSearch(spark, Sf0001).collect()
    val r2 = TextAnalysis.hybridSearch(spark, Sf0001).collect()
    assert(r1.toSeq === r2.toSeq)
    assert(r1.length === RrfTopK)
    // doc 0 is the vector query itself → vrank 1; max possible fused score
    // is 1/(k+1) + 1/(k+1)
    val top = r1.head
    assert(r1.exists(r => r.getLong(0) === 0L && r.getLong(2) === 1L),
      "the query vector's own doc must appear with vector rank 1")
    assert(top.getDouble(1) <= 2.0 / (RrfK + 1) + 1e-12)
    r1.foreach { r =>
      val (s, vr, br) = (r.getDouble(1), r.getLong(2), r.getLong(3))
      assert(vr > 0 || br > 0, "a fused doc must come from at least one retriever")
      val expect = (if (vr > 0) 1.0 / (RrfK + vr) else 0.0) +
        (if (br > 0) 1.0 / (RrfK + br) else 0.0)
      assert(math.abs(s - expect) < 1e-12)
    }
    // scores non-increasing
    assert(r1.map(_.getDouble(1)).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("pii detection and redaction on synthetic PII; clean corpus scans to zero") {
    import spark.implicits._
    import graft.functions.TextFunctions.{piiCounts, piiRedact}
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      "contact me at alice@example.com or bob.smith@mail.co.uk today",
      "ssn 123-45-6789 leaked with phone 555-123-4567",
      "server at 192.168.1.100 and 10.0.0.1 responded",
      "a perfectly clean sentence with no identifiers at all")
    val df = rows.toDF("text")
    val counts = df.select(piiCounts(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect()
    assert(counts(0).getLong(0) === 2L, "two emails")
    assert(counts(1).getLong(1) === 1L, "one ssn")
    assert(counts(1).getLong(3) === 1L, "one phone")
    assert(counts(2).getLong(2) === 2L, "two ipv4s")
    assert(counts(3).toSeq === Seq(0L, 0L, 0L, 0L), "clean row flags nothing")
    val red = df.select(piiRedact(col("text")).as("r")).collect().map(_.getString(0))
    assert(red(0).contains("<EMAIL>") && !red(0).contains("@"))
    assert(red(1).contains("<SSN>") && red(1).contains("<PHONE>")
      && !red(1).contains("123-45-6789") && !red(1).contains("555-123-4567"))
    assert(red(2).contains("<IPV4>") && !red(2).contains("192.168.1.100"))
    assert(red(3) === rows(3), "clean text passes through unchanged")
    // the fixture corpus is clean: the audit query reports zeros
    val scan = TextAnalysis.piiScan(spark, Sf0001).head()
    assert(scan.toSeq === Seq(0L, 0L, 0L, 0L, 0L))
  }

  test("dsir_weights: target-looking docs score higher; weights cover all docs") {
    val rows = TextAnalysis.dsirWeights(spark, Sf0001).collect()
    val nDocs = graft.Tables.documents(spark, Sf0001).count()
    assert(rows.length === nDocs, "every document gets a weight")
    rows.foreach(r => assert(r.getLong(1) > 0L, "token counts positive"))
    // the target-domain (en) docs must average a higher importance weight
    // than the rest — that is the whole point of the estimator
    import org.apache.spark.sql.functions.col
    val langs = graft.Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (tgt, rest) = rows.partition(r => langs(r.getLong(0)) == TextAnalysis.DsirTargetLang)
    assert(tgt.nonEmpty && rest.nonEmpty)
    def meanW(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getDouble(2)).sum / rs.length
    assert(meanW(tgt) > meanW(rest),
      s"en docs should out-score non-en: ${meanW(tgt)} vs ${meanW(rest)}")
  }

  test("dsir_weights: per-doc weight is additive over hashed-bucket log-ratios") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // a two-lang micro corpus where the target unigram distribution is
    // hand-checkable: 'en' docs use token A, the other lang token B
    val dir = graft.util.TempDirs.create("graft_dsir").toString
    val rows = Seq(
      (0L, "alpha alpha alpha", "en", "s", 17L),
      (1L, "alpha alpha alpha", "en", "s", 17L),
      (2L, "bravo bravo bravo", "zz", "s", 17L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.dsirWeights(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // raw: alpha 6, bravo 3 (T=9); target: alpha 6 (T=6); B=128 buckets
    val lamA = BigDecimal(math.log(((6.0 + 1) / (6 + 128.0)) / ((6.0 + 1) / (9 + 128.0))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lamB = BigDecimal(math.log(((0.0 + 1) / (6 + 128.0)) / ((3.0 + 1) / (9 + 128.0))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(0L) - 3 * lamA) < 1e-9)
    assert(math.abs(out(1L) - 3 * lamA) < 1e-9)
    assert(math.abs(out(2L) - 3 * lamB) < 1e-9)
    assert(out(0L) > 0.0 && out(2L) < 0.0)
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
