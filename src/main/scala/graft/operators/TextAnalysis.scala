package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis operators over `documents` — the quality/metadata pass of a
  * large-scale training-data pipeline (builder brief; SURVEY.md §7.1.8).
  * Every op is a narrow projection over one scan: at 100 TB these run as a
  * single embarrassingly-parallel map with no shuffle (the ORDER BY here is
  * only for the deterministic oracle compare; production use drops it).
  *
  * All arithmetic is int-count ratios with single double divisions and
  * left-associated weighted sums, written identically in the DuckDB oracle
  * → bit-exact cross-engine.
  */
object TextAnalysis {

  private val punctClass = "[.,;:!?]"

  /** Per-document stats: token count, stopword ratio, punctuation ratio,
    * average token length, and a composite quality score (length/punct/
    * stopword mix — the classic C4/Gopher-style heuristics, deterministic). */
  def textStats(spark: SparkSession, sfDir: String): DataFrame = {
    val t = tokens(col("text"))
    val nTok = size(t).cast("long")
    val nStop = stopwordHits(t, StopwordsByLang.toMap.apply("en"))
    val nPunct = (length(col("text")) - length(regexp_replace(col("text"), punctClass, ""))).cast("long")
    val stopRatio = nStop.cast("double") / nTok
    val punctRatio = nPunct.cast("double") / length(col("text")).cast("long")
    val avgTokLen = length(regexp_replace(col("text"), "\\s+", "")).cast("double") / nTok
    val quality = lit(0.5) * stopRatio + lit(0.3) * least(lit(1.0), nTok.cast("double") / lit(100.0)) +
      lit(0.2) * (lit(1.0) - punctRatio)
    // BPE-ish subtoken count: alnum runs + individual punctuation marks —
    // the usual fast proxy for LLM token budgeting (identical regex
    // semantics on lowercased text in both engines)
    val nSubTok = regexp_count(lower(col("text")), lit("[a-z0-9]+|[^a-z0-9\\s]")).cast("long")
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      nTok.as("n_tokens"),
      nSubTok.as("n_subtokens"),
      nStop.as("n_stop"),
      stopRatio.as("stop_ratio"),
      punctRatio.as("punct_ratio"),
      avgTokLen.as("avg_token_len"),
      quality.as("quality_score"))
      .orderBy("doc_id")
  }

  // Gopher/C4-style retention thresholds (tuned to the fixture corpus so
  // every rule actually fires; production exposes them as parameters)
  val MinTokens = 20L
  val MinStopRatio = 0.02
  val MaxPunctRatio = 0.2

  /** Corpus quality filter — the retention pass a pre-training pipeline
    * runs after scoring: first-failing-rule attribution (too_short →
    * low_stopword → high_punct → retained), reported as (reason, n)
    * counts. One scan, map-side partial agg into ≤4 groups — shuffle-free
    * in practice at any scale. */
  def qualityFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val t = tokens(col("text"))
    val nTok = size(t).cast("long")
    val nStop = stopwordHits(t, StopwordsByLang.toMap.apply("en"))
    val stopRatio = nStop.cast("double") / nTok
    val nPunct = (length(col("text")) - length(regexp_replace(col("text"), punctClass, ""))).cast("long")
    val punctRatio = nPunct.cast("double") / length(col("text")).cast("long")
    val reason = when(nTok < MinTokens, "too_short")
      .when(stopRatio < MinStopRatio, "low_stopword")
      .when(punctRatio > MaxPunctRatio, "high_punct")
      .otherwise("retained")
    Tables.documents(spark, sfDir)
      .select(reason.as("reason"))
      .groupBy("reason").agg(count(lit(1)).as("n"))
      .orderBy("reason")
  }

  /** Language ID: stopword-hit votes per language, argmax with alphabetical
    * tie-break (deterministic; mirrors fasttext-style scoring shape). */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val t = tokens(col("text"))
    val hits: Seq[(String, Column)] =
      StopwordsByLang.map { case (lang, words) => lang -> stopwordHits(t, words) }
    // argmax in fixed alphabetical order: first lang whose hits >= all others
    val pred = hits.foldRight(lit("und")) { case ((lang, h), elseCol) =>
      val isMax = hits.filter(_._1 != lang).map { case (_, o) => h >= o }.reduce(_ && _)
      when(isMax, lit(lang)).otherwise(elseCol)
    }
    Tables.documents(spark, sfDir).select(
      (col("doc_id") +: hits.map { case (l, h) => h.as(s"hits_$l") } :+ pred.as("pred_lang")): _*)
      .orderBy("doc_id")
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase text —
    * the exact-dedup key (both engines share md5 hex output). */
  def docFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("fingerprint"))
      .orderBy("doc_id")

  val TfidfTopK = 3

  /** TF-IDF top-[[TfidfTopK]] salient terms per document — the keyword/
    * topic-extraction pass (dataset cards, cluster labeling). tf = raw
    * in-doc count, idf = ln(N/df) over the corpus; ranked on the 6dp-rounded
    * score with an alphabetical tie-break, so the selection is deterministic
    * cross-engine (ln may differ in the last ulp between libm builds —
    * ranking on the ROUNDED score absorbs it, same recipe as the avg-sim
    * queries).
    *
    * Scale shape: tf is one hash-agg on (doc_id, token); df one hash-agg on
    * token; the df join is a token equi-join (broadcastable while the vocab
    * is small, hash otherwise); top-k per doc is a window partitioned by
    * doc_id — groups are per-document (bounded by doc vocab), so no
    * single-reducer funnel at any corpus size. */
  def tfidfTopTerms(spark: SparkSession, sfDir: String): DataFrame = {
    val tok = Tables.documents(spark, sfDir)
      .transform(Tables.rowParallel) // row-parallel fan-out (see Tables.rowParallel)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = Tables.documents(spark, sfDir)
      .agg(count(lit(1)).cast("double").as("n"))
    val scored = tf.join(df, "token").crossJoin(n)
      .select(col("doc_id"), col("token"),
        round(col("tf").cast("double") * log(col("n") / col("df").cast("double")), 6)
          .as("tfidf"))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("token").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TfidfTopK)
      .select("doc_id", "rank", "token", "tfidf")
      .orderBy("doc_id", "rank")
  }

  /** Corpus PII audit — per-type match totals + count of flagged docs
    * (emails, SSNs, IPv4s, phone shapes; [[graft.functions.TextFunctions
    * .PiiPatterns]]). One shuffle-free scan folding into a single row; at
    * 100 TB this is a map-side-only pass like [[textStats]]. The fixture
    * corpus is clean (all zeros — the audit's expected steady state);
    * detection and redaction themselves are pinned on synthetic PII in
    * TextAnalysisSpec, since a zero-match corpus can't exercise them. */
  def piiScan(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = piiCounts(col("text"))
    val flagged = counts.map(_._2).reduce(_ + _) > 0L
    Tables.documents(spark, sfDir)
      .select((counts.map { case (n, c) => c.as(s"n_$n") } :+
        flagged.cast("long").as("flagged")): _*)
      .agg(
        sum(col(s"n_${counts.head._1}")).as(s"n_${counts.head._1}"),
        (counts.tail.map { case (n, _) => sum(col(s"n_$n")).as(s"n_$n") } :+
          sum(col("flagged")).as("n_docs_flagged")): _*)
  }

  // BM25 (Robertson/Sparck Jones) parameters — the standard defaults
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val Bm25K = 10
  val Bm25Query = Seq("vector", "hash", "join")

  /** BM25 top-[[Bm25K]] lexical retrieval for the fixed query
    * [[Bm25Query]] — the sparse-retrieval operator every hybrid
    * (lexical + vector) search stack pairs with the kNN family.
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl)),
    * idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1).
    *
    * Scale shape: corpus stats (dl, df, avgdl) come from the
    * [[graft.index.Bm25Index]] sidecar built once per corpus version
    * (mtime-fingerprinted, like the ANN registry) — a query reads ONLY its
    * terms' posting buckets + a one-row stats table, never the corpus.
    * Final top-k is TakeOrderedAndProject. Ranked on the 6dp-rounded score
    * (ln ulp — same recipe as [[tfidfTopTerms]]) with doc_id tie-break. */
  def bm25TopK(spark: SparkSession, sfDir: String): DataFrame =
    bm25TopKImpl(spark, sfDir, Bm25K)

  // sfDir → (documents fingerprint, sidecar path): stale corpora rebuild
  private val bm25Cache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, String)]()

  /** The BM25 sidecar for `sfDir`'s documents table, built on first use and
    * rebuilt when the backing parquet's mtime changes. Superseded sidecars
    * are tombstoned per corpus and reclaimed only after a grace window on a
    * later rebuild of the SAME corpus ([[graft.util.StaleSidecars]]) — an
    * inline delete, or a shared queue another corpus's rebuild drains,
    * could remove a directory that racing queries still scan. */
  def bm25IndexFor(spark: SparkSession, sfDir: String): String = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(s"$sfDir/documents.parquet")
    val fp = p.getFileSystem(conf).getFileStatus(p).getModificationTime
    bm25Cache.compute(sfDir, (_, old) =>
      if (old != null && old._1 == fp) old
      else {
        if (old != null)
          graft.util.StaleSidecars.supersede(conf, s"bm25:$sfDir", old._2)
        val path = graft.util.TempDirs
          .create("graft_bm25").resolve("index").toString
        graft.index.Bm25Index.build(Tables.documents(spark, sfDir), path)
        (fp, path)
      })._2
  }

  /** (sfDir, corpus fingerprint, sidecar path) rows — catalog export for
    * [[graft.plans.Graft.saveCatalog]], so a fresh session can serve
    * [[bm25TopK]] without rebuilding the sidecar. */
  def bm25Registrations: Seq[(String, Long, String)] = {
    import scala.jdk.CollectionConverters._
    bm25Cache.asScala.toSeq.map { case (d, (fp, p)) => (d, fp, p) }
  }

  /** Re-wire a cataloged sidecar ([[graft.plans.Graft.loadCatalog]]).
    * `putIfAbsent`: a registration built live this session wins over the
    * catalog's. Staleness stays honored — [[bm25IndexFor]] compares the
    * restored fingerprint against the table's current mtime and rebuilds
    * on mismatch. */
  def restoreBm25Registration(sfDir: String, fingerprint: Long, path: String): Unit =
    bm25Cache.putIfAbsent(sfDir, (fingerprint, path))

  /** Test hook: simulate a fresh session (registrations are in-memory). */
  private[graft] def clearBm25Registrations(): Unit = bm25Cache.clear()

  private def bm25TopKImpl(spark: SparkSession, sfDir: String, k: Int): DataFrame =
    graft.index.Bm25Index.topK(spark, bm25IndexFor(spark, sfDir),
      Bm25Query, k, Bm25K1, Bm25B)

  // Reciprocal-rank-fusion constants (Cormack et al.: k=60 is the
  // standard damping; CandK bounds each retriever's contribution list)
  val RrfK = 60
  val RrfCandK = 30
  val RrfTopK = 10

  /** Hybrid search — BM25 lexical ranking fused with vector kNN by
    * reciprocal rank fusion: score(d) = Σ_retrievers 1/(k + rank_r(d)).
    * The shape every production RAG/search stack runs (pgvector pairs
    * with tsvector exactly this way; here both retrievers are native).
    *
    * Each retriever contributes its top-[[RrfCandK]] (bounded lists —
    * the rank windows run over ≤ CandK rows after TakeOrderedAndProject,
    * never the corpus), fused with a full outer join on the doc key.
    * Exactness: ranks are integers, each RRF term is ONE double division,
    * and the two-term sum is written in fixed left-to-right order in both
    * engines — bit-exact with no rounding. */
  def hybridSearch(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.cosine_distance
    val e = Tables.embeddings(spark, sfDir)
    val seed = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val vecTop = e.crossJoin(broadcast(seed))
      .select(col("vec_id").as("doc_id"),
        cosine_distance(col("embedding"), col("qv")).as("dist"))
      .orderBy(col("dist"), col("doc_id"))
      .limit(RrfCandK)
    val vecRanked = vecTop.select(col("doc_id"),
      row_number().over(Window.orderBy(col("dist"), col("doc_id")))
        .cast("long").as("vrank"))
    val bmRanked = bm25TopKImpl(spark, sfDir, RrfCandK).select(col("doc_id"),
      row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
        .cast("long").as("brank"))
    vecRanked.join(bmRanked, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(lit(1.0) / (lit(RrfK).cast("double") + col("vrank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK).cast("double") + col("brank")), lit(0.0)))
          .as("rrf_score"),
        coalesce(col("vrank"), lit(0L)).as("vrank"),
        coalesce(col("brank"), lit(0L)).as("brank"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(RrfTopK)
  }

  /** Query phrase for [[phraseSearch]]/[[phraseSearchIndexed]] — an exact
    * token sequence, the retrieval shape BM25's bag-of-words scoring can't
    * express (Postgres: `phraseto_tsquery` / `<->` tsquery adjacency). */
  val PhraseTerms: Seq[String] = Seq("table", "scan")

  /** Exact-phrase search, scan form: count the positions where the token
    * stream matches [[PhraseTerms]] contiguously. The match counter is ONE
    * codegen'd higher-order expression per row (`size(filter(sequence(1,
    * n-len+1), i -> t[i]=w₁ ∧ t[i+1]=w₂ …))`) — map-only, zero shuffle,
    * embarrassingly parallel: the 100 TB scan cost is bandwidth, not
    * coordination. Overlapping matches count individually (start
    * positions), matching the oracle's lambda over the same index list.
    * [[phraseSearchIndexed]] is the index-path twin that skips the scan. */
  def phraseSearch(spark: SparkSession, sfDir: String): DataFrame = {
    val n = PhraseTerms.length
    // the "has ≥1 match" predicate as a token-boundary regex — EXACTLY
    // "the phrase occurs" under \s+ tokenization, and cheap (one linear
    // regex pass per row at the scan). A `n_matches > 0` column filter
    // instead gets pushed below the projection with the token-array alias
    // re-substituted INTO the lambda, re-running the split per element_at
    // per index — O(tokens²) regex splits per doc over the WHOLE corpus
    // (measured 3.0 s at sf0.1 vs ~0.2 s this way)
    val rx = PhraseTerms.map(java.util.regex.Pattern.quote)
      .mkString("(^|\\s)", "\\s+", "(\\s|$)")
    // the counter's token array is a bound column, evaluated once per
    // (already-matching) row
    val t = col("t")
    val starts = sequence(lit(1), size(t) - lit(n - 1))
    val hit = (i: Column) => PhraseTerms.zipWithIndex.map { case (w, j) =>
      element_at(t, (i + lit(j)).cast("int")) === lit(w)
    }.reduce(_ && _)
    // guard: sequence(1, 0) DESCENDS in Spark (DuckDB's generate_series
    // yields []); unreachable post-regex but kept for safety
    val matches = when(size(t) >= n, size(filter(starts, hit)).cast("long"))
      .otherwise(lit(0L))
    Tables.documents(spark, sfDir)
      .filter(col("text").rlike(rx)) // n_matches ≥ 1 by construction
      .transform(Tables.rowParallel)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), matches.as("n_matches"))
      .orderBy("doc_id")
  }

  /** Exact-phrase search, positional-postings form — the INDEX path of
    * [[phraseSearch]]: reads the [[graft.index.Bm25Index]] positional
    * sidecar (built once per corpus with the BM25 postings, memoized via
    * [[bm25IndexFor]]), pruned to the phrase terms' bucket directories,
    * re-based by phrase offset and intersected with (doc_id, base)
    * equi-joins — the query never rescans the corpus, only each term's
    * Zipf-bounded postings ([[graft.index.Bm25Index.phraseSearch]]).
    * A catalog-restored index predating the positional sidecar falls back
    * to the row-identical scan form. Shared oracle with [[phraseSearch]];
    * plan-distinct (specs pin both). */
  def phraseSearchIndexed(spark: SparkSession, sfDir: String): DataFrame = {
    val idx = bm25IndexFor(spark, sfDir)
    if (graft.index.Bm25Index.hasPositions(spark, idx))
      graft.index.Bm25Index.phraseSearch(spark, idx, PhraseTerms)
    else phraseSearch(spark, sfDir)
  }

  // train/val/test cutoffs over 100 deterministic hash buckets
  val ValBuckets = 10L   // buckets [0,10) → val
  val TestBuckets = 10L  // buckets [10,20) → test; rest train
  val SplitSalt = "split-v1"

  /** Deterministic corpus split assignment — the held-out-set operator every
    * training pipeline needs: hash each doc_id (salted, so re-splitting with
    * a new salt is a one-line change) into 100 buckets and map fixed bucket
    * ranges to train/val/test. Reported as per-(lang, split) counts.
    * Hash-based splits are reproducible across runs, engines and shards —
    * no RNG state — and the md5-derived hash makes the assignment
    * bit-identical in the DuckDB oracle. Shuffle-free scale shape: one scan,
    * partial agg into ≤ 3·|langs| groups. */
  /** The split label for a doc_id column — shared by [[corpusSplits]] and
    * the train/test contamination check ([[graft.operators.Dedup]]). */
  def splitCol(docId: Column): Column = {
    val bucket = graft.functions.salted_bucket(docId, SplitSalt, 100L)
    when(bucket < ValBuckets, "val")
      .when(bucket < ValBuckets + TestBuckets, "test")
      .otherwise("train")
  }

  /** [[splitCol]]'s DuckDB twin over a doc_id SQL fragment. */
  def splitSql(docId: String): String =
    s"""CASE
       |    WHEN ${graft.OracleSql.saltedBucket(docId, SplitSalt, 100)} < $ValBuckets THEN 'val'
       |    WHEN ${graft.OracleSql.saltedBucket(docId, SplitSalt, 100)} < ${ValBuckets + TestBuckets} THEN 'test'
       |    ELSE 'train' END""".stripMargin

  def corpusSplits(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .select(col("lang"), splitCol(col("doc_id")).as("split"))
      .groupBy("lang", "split").agg(count(lit(1)).as("n"))
      .orderBy("lang", "split")
  }

  /** Per-document repetition signals — the Gopher-style quality pass that
    * catches degenerate/templated text BEFORE training: distinct-token
    * ratio, most-frequent-token share, mean word length. (The fixture
    * corpus has no newlines or symbols, so the line- and symbol-based
    * Gopher rules would be constant here; the token-repetition family is
    * the discriminating subset.)
    *
    * Scale shape: one hash agg on (doc_id, token) with map-side partials,
    * then one on doc_id — per-doc groups are bounded by doc vocabulary, so
    * no reducer ever sees more than one document's terms. All ratios are
    * single double divisions of exact integer counts → bit-exact
    * cross-engine. */
  def qualitySignals(spark: SparkSession, sfDir: String): DataFrame = {
    val tf = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
    tf.groupBy("doc_id").agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct_tokens"),
        max(col("c")).as("top_c"),
        sum(col("c") * length(col("token")).cast("long")).as("char_sum"))
      .select(
        col("doc_id"), col("n_tokens"), col("n_distinct_tokens"),
        (col("n_distinct_tokens").cast("double") / col("n_tokens")).as("distinct_ratio"),
        (col("top_c").cast("double") / col("n_tokens")).as("top_token_frac"),
        (col("char_sum").cast("double") / col("n_tokens")).as("mean_word_len"))
      .orderBy("doc_id")
  }

  /** Per-document n-gram repetition signals — the rest of the Gopher
    * repetition family ([[qualitySignals]] covers unigrams): duplicate
    * bigram/trigram fraction (1 − distinct/total) and top bigram/trigram
    * share. Degenerate generated text ("the the the…", templated spam)
    * scores high here while passing unigram checks.
    *
    * Scale shape: ngram expansion is a per-row zip of SHIFTED SLICES of the
    * token array (an `element_at(tokens(text), i)` lambda would re-split
    * the text per element — O(n²) per doc; slices keep the split outside
    * the lambda where codegen CSE evaluates it once); counting is the same
    * two bounded hash aggs as [[qualitySignals]] — (doc_id, gram) partials
    * then doc_id — no windows, no sorts except the oracle ORDER BY. Ratios
    * are single double divisions of exact integer counts, rounded 6dp.
    * Docs shorter than n+1 tokens have no n-grams and are dropped (inner
    * join), identically in the oracle. */
  def repetitionSignals(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .transform(Tables.rowParallel) // row-parallel fan-out (see Tables.rowParallel)
    def gramStats(n: Int, label: String): DataFrame = {
      val t = tokens(col("text"))
      val m = size(t)
      val grams = n match {
        case 2 => zip_with(slice(t, lit(1), m - 1), slice(t, lit(2), m - 1),
          (a, b) => concat_ws(" ", a, b))
        case 3 => zip_with(
          zip_with(slice(t, lit(1), m - 2), slice(t, lit(2), m - 2),
            (a, b) => concat_ws(" ", a, b)),
          slice(t, lit(3), m - 2),
          (ab, c) => concat_ws(" ", ab, c))
      }
      docs.filter(size(tokens(col("text"))) >= n)
        .select(col("doc_id"), explode(grams).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(
          sum(col("c")).as(s"n_${label}s"),
          count(lit(1)).as("d"),
          max(col("c")).as("m"))
        .select(col("doc_id"), col(s"n_${label}s"),
          round(lit(1.0) - col("d").cast("double") / col(s"n_${label}s"), 6)
            .as(s"dup_${label}_frac"),
          round(col("m").cast("double") / col(s"n_${label}s"), 6)
            .as(s"top_${label}_share"))
    }
    gramStats(2, "bigram").join(gramStats(3, "trigram"), "doc_id")
      .orderBy("doc_id")
  }

  /** Unigram-LM quality score — the deterministic core of CCNet-style LM
    * filtering: train unigram probabilities on the corpus itself (Laplace
    * smoothing: p(t) = (count+1)/(N+V)) and score each document by its
    * mean per-token negative log-probability. High = surprising under the
    * corpus distribution (gibberish, wrong-language); low = templated.
    * (Real pipelines swap in a KenLM 5-gram — the dataflow, smoothing and
    * scoring contract are identical; unigram keeps it exactly
    * reproducible + oracle-checkable offline.)
    *
    * Scale shape: the "model" is one hash agg (vocab-sized, broadcast);
    * scoring is one (doc_id, token) agg + a broadcast join. Cross-engine
    * exactness: each term tf·(−ln p) is rounded to 6dp and summed as
    * DECIMAL(18,6) — exact integer-scaled addition, no float
    * accumulation-order dependence — then one division by the doc's token
    * count ([[graft.OracleSql.sumExact]] recipe). */
  def lmScore(spark: SparkSession, sfDir: String): DataFrame = {
    val tok = Tables.documents(spark, sfDir)
      .transform(Tables.rowParallel) // row-parallel fan-out (see Tables.rowParallel)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val vocab = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
    val scalars = vocab.agg(
      sum(col("cnt")).cast("double").as("n_total"),
      count(lit(1)).cast("double").as("v"))
    val probs = vocab.crossJoin(broadcast(scalars))
      .select(col("token"),
        ((col("cnt").cast("double") + lit(1.0)) / (col("n_total") + col("v")))
          .as("p"))
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    tf.join(broadcast(probs), "token")
      .select(col("doc_id"), col("tf"),
        round(col("tf").cast("double") * -log(col("p")), 6)
          .cast("decimal(18,6)").as("term"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("term")).as("neg_log_sum"))
      .select(col("doc_id"), col("n_tokens"),
        // unrounded on purpose: exact-decimal sum / exact integer is one
        // IEEE division — already bit-identical cross-engine; rounding it
        // can DIVERGE at the reachable 6dp midpoints of decimal/int
        // quotients (see stupidBackoffScore)
        (col("neg_log_sum").cast("double") / col("n_tokens").cast("double"))
          .as("lm_score"))
      .orderBy("doc_id")
  }

  /** Positive-class sources for [[qualityClassifier]] — the stand-in for
    * a curated reference corpus (in production: Wikipedia/books/WebText
    * vs raw crawl). */
  val NbPositiveSources: Seq[String] = Seq("src0", "src1", "src2", "src3")

  /** Classifier-based quality scoring — the GPT-3/PaLM data-curation
    * filter (Brown et al. 2020, App. A; Chowdhery et al. 2022 §3: train a
    * classifier on a curated-positive vs crawl-negative split, keep crawl
    * documents the classifier likes): a multinomial Naive Bayes
    * token model trained on [[NbPositiveSources]] vs the rest, scoring
    * every document by log-likelihood ratio
    * `prior + Σ_t tf·(ln p(t|pos) − ln p(t|neg))` with add-one smoothing.
    * NB rather than logistic regression KEEPS TRAINING A PURE COUNT
    * AGGREGATION — no SGD order-dependence — so training is one shuffle
    * and the whole operator is oracle-exact. Positive scores read
    * "looks like the curated set"; the downstream gate is a filter on
    * `nb_score` (or Pareto-noisy sampling, as GPT-3 did).
    *
    * Scale shape: training is ONE (token × class) hash agg with map-side
    * combine (vocab-sized result); per-token weights derive from a 1-row
    * scalar cross join; scoring is one (doc_id, token) tf agg joined to
    * the weight table WITHOUT a broadcast hint — AQE broadcasts a small
    * vocab and shuffles an open one (the bigram_novelty size-gating
    * argument); one per-doc decimal agg closes it out. Unseen-at-inference
    * tokens take the smoothed floor weight (cpos=cneg=0 in the same
    * formula) via the left join + coalesce on both engines — unreachable
    * while train and score corpora coincide, live the moment a scorer
    * runs over a corpus the trainer never saw.
    *
    * Exactness: the [[lmScore]] recipe — weights are deterministic double
    * expressions (ln of smoothed count ratios, same op order both
    * engines), each tf·w term rounds 6dp into DECIMAL(18,6) order-free
    * sums, and the class prior (one ln of a doc-count ratio) adds as a
    * final double op. */
  def qualityClassifier(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .transform(Tables.rowParallel) // row-parallel fan-out (see Tables.rowParallel)
    val isPos = col("source").isInCollection(NbPositiveSources)
    val tok = docs.select(col("doc_id"), isPos.as("pos"),
      explode(tokens(col("text"))).as("token"))
    val vocab = tok.groupBy("token").agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("cpos"),
      sum(when(col("pos"), 0L).otherwise(1L)).as("cneg"))
    val scal = vocab.agg(
      sum(col("cpos")).cast("double").as("tpos"),
      sum(col("cneg")).cast("double").as("tneg"),
      count(lit(1)).cast("double").as("v"))
    val weights = vocab.crossJoin(broadcast(scal))
      .select(col("token"),
        (log((col("cpos").cast("double") + lit(1.0)) / (col("tpos") + col("v")))
          - log((col("cneg").cast("double") + lit(1.0)) / (col("tneg") + col("v"))))
          .as("w"))
    val prior = docs.agg(
      log(sum(when(isPos, 1L).otherwise(0L)).cast("double")
        / sum(when(isPos, 0L).otherwise(1L)).cast("double")).as("prior"))
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    tf.join(weights, Seq("token"), "left")
      .crossJoin(broadcast(scal))
      .select(col("doc_id"), col("tf"),
        round(col("tf").cast("double") * coalesce(col("w"),
          log(lit(1.0) / (col("tpos") + col("v")))
            - log(lit(1.0) / (col("tneg") + col("v")))), 6)
          .cast("decimal(18,6)").as("term"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"), sum(col("term")).as("llr"))
      .crossJoin(broadcast(prior))
      .select(col("doc_id"), col("n_tokens"),
        (col("llr").cast("double") + col("prior")).as("nb_score"),
        when(col("llr").cast("double") + col("prior") > 0.0, 1L).otherwise(0L)
          .as("predicted_pos"))
      .orderBy("doc_id")
  }

  /** Stupid Backoff discount (Brants et al. 2007, §4 — the published
    * constant). */
  val SbAlpha = 0.4

  /** Bigram Stupid Backoff LM scoring (Brants et al. 2007, "Large Language
    * Models in Machine Translation" — the LM built FOR MapReduce-scale
    * corpora: unnormalized relative-frequency scores, no held-out
    * discounting pass): train bigram/unigram counts on the
    * [[DsirTargetLang]] slice, score EVERY document's bigram stream by
    * mean −ln s(w₂|w₁), where s = c(w₁w₂)/c(w₁) when the bigram was seen
    * and α·(c(w₂)+1)/(T+V) (add-one-smoothed unigram backoff) otherwise.
    * In-domain text scores low; out-of-domain/garbage text rides the
    * backoff path and scores high — the CCNet-style domain filter one
    * order up from [[lmScore]].
    *
    * Scale shape: LM construction is two hash aggs over the target slice;
    * scoring joins the corpus bigram stream to the bigram table by
    * equi-join (corpus-sized, shuffle on (w1,w2) — inherent, the LM *is*
    * that table) and to the vocab-sized unigram table twice by broadcast
    * (at open-vocab scale swap those for shuffle joins), then one per-doc
    * agg. No windows. The bigram join key is Zipfian at scale — head
    * bigrams ("of the") would pile one reducer — so when the probe finds a
    * hot head it runs through [[graft.util.Skew.saltedEquiJoin]] with
    * [[SbJoinSalt]] salts: the corpus stream salts uniformly, the LM table
    * replicates ×salt (LM-table-sized, bounded), and each hot key spreads
    * over salt reducers. Row-identical to the plain join (spec-pinned).
    *
    * The salt is ADAPTIVE (default salt=0 sentinel): replication is
    * insurance whose ×[[SbJoinSalt]] LM-copy premium is pure waste on a
    * well-behaved corpus, so a deterministic ~[[SbProbePct]]% salted-bucket
    * doc sample is probed first ([[graft.util.Skew.hotKeyShare]] over its
    * bigram stream — a bounded fraction of the insured work) and salting
    * engages only when the hottest bigram would load its one reducer more
    * than [[SbHotFactor]]× the fair 1/parts share. Either branch is
    * row-identical, so the probe can only trade performance, never
    * correctness.
    *
    * Exactness: counts are exact integers; each s is 1-2 deterministic
    * double ops; −ln rounds 6dp into DECIMAL(18,6) order-free sums (the
    * [[lmScore]] recipe); the final mean is one division rounded 6dp. */
  /** Salt fan-out for the [[stupidBackoffScore]] bigram join when skew is
    * detected (spec runs salt=1 as the plain-join twin). */
  val SbJoinSalt = 8

  /** Percent of docs (by salted bucket) the skew probe reads. */
  val SbProbePct = 5

  /** Hot-key threshold: salt when the head bigram's stream share exceeds
    * this multiple of a reducer's fair share (1/shuffle-partitions). */
  val SbHotFactor = 2.0

  /** The exploded (w1, w2) bigram-struct stream over `text` — ONE
    * definition shared by [[stupidBackoffScore]]'s join stream and
    * [[adaptiveSbSalt]]'s probe, so the probe always measures exactly the
    * key distribution the join shuffles (a drifted copy would degrade the
    * salt decision to noise with no test failing — either branch is
    * row-identical). */
  private def bigramCol: Column = {
    val t = tokens(col("text"))
    explode(zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2"))))
  }

  /** Probe-decision memo: the sampled skew probe is a deterministic
    * function of the corpus, and a bench run's repeated executions (or
    * any query mix touching the LM) would re-pay its two probe jobs each
    * time. Keyed on documents path + mtime (the [[mergeMemo]] pattern). */
  private val sbSaltMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Integer]()

  /** The [[stupidBackoffScore]] skew-probe decision (exposed for specs):
    * hottest-bigram share over a deterministic ~[[SbProbePct]]% salted-
    * bucket doc sample (filter pushes to the scan — the probe reads a
    * bounded fraction of the work it insures), salting only when that key
    * would load its one reducer past [[SbHotFactor]]× the fair share.
    * Memoized per corpus generation ([[sbSaltMemo]]). */
  def adaptiveSbSalt(spark: SparkSession, sfDir: String): Int = {
    val key = {
      val p = new org.apache.hadoop.fs.Path(s"$sfDir/documents.parquet")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      (p.toString, fs.getFileStatus(p).getModificationTime)
    }
    // no lock held during the probe jobs; a racing duplicate compute is
    // benign — same deterministic value
    val cached = sbSaltMemo.get(key)
    if (cached != null) return cached.intValue
    val sampleBg = Tables.documents(spark, sfDir)
      .filter(graft.functions.salted_bucket(col("doc_id"), "sbprobe", 100L) < SbProbePct)
      .select(bigramCol.as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val share = graft.util.Skew.hotKeyShare(sampleBg, Seq("w1", "w2"))
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val salt = if (share * parts > SbHotFactor) SbJoinSalt else 1
    sbSaltMemo.put(key, salt)
    salt
  }

  def stupidBackoffScore(spark: SparkSession, sfDir: String,
                         salt: Int = 0): DataFrame = {
    val t = tokens(col("text"))
    val base = Tables.documents(spark, sfDir)
      .transform(Tables.rowParallel) // row-parallel fan-out (see Tables.rowParallel)
    val docBg = base
      .select(col("doc_id"), col("lang"), bigramCol.as("bg"))
      .select(col("doc_id"), col("lang"),
        col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val c1 = base.filter(col("lang") === DsirTargetLang)
      .select(explode(t).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c1"))
    val c2 = docBg.filter(col("lang") === DsirTargetLang)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val scal = c1.agg(sum(col("c1")).cast("double").as("tt"),
      count(lit(1)).cast("double").as("v"))
    val effectiveSalt = if (salt >= 1) salt else adaptiveSbSalt(spark, sfDir)
    graft.util.Skew.saltedEquiJoin(docBg, c2, Seq("w1", "w2"), effectiveSalt, "left")
      .join(broadcast(c1.select(col("token").as("w1"), col("c1").as("c1w1"))),
        Seq("w1"), "left")
      .join(broadcast(c1.select(col("token").as("w2"), col("c1").as("c1w2"))),
        Seq("w2"), "left")
      .crossJoin(broadcast(scal))
      .select(col("doc_id"),
        when(col("c2").isNotNull,
          col("c2").cast("double") / col("c1w1").cast("double"))
          .otherwise(lit(SbAlpha) * (coalesce(col("c1w2"), lit(0L)).cast("double") + lit(1.0))
            / (col("tt") + col("v"))).as("p"),
        when(col("c2").isNull, 1L).otherwise(0L).as("backoff"))
      .select(col("doc_id"), col("backoff"),
        round(-log(col("p")), 6).cast("decimal(18,6)").as("term"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("backoff")).as("n_backoff"),
        sum(col("term")).as("s"))
      .select(col("doc_id"), col("n_bigrams"), col("n_backoff"),
        // deliberately NOT rounded: the numerator is an exact 6dp decimal
        // and the denominator an exact integer, so the single IEEE division
        // is already bit-identical cross-engine — whereas rounding it CAN
        // diverge: sum/n can land exactly on a 6dp midpoint (e.g.
        // 62.769447/18 = 3.48719150), where Spark's BigDecimal
        // shortest-string rounding and DuckDB's scaled-multiply rounding
        // disagree on the straddle
        (col("s").cast("double") / col("n_bigrams").cast("double"))
          .as("sb_score"))
      .orderBy("doc_id")
  }

  // RAG-style chunking parameters: fixed windows with overlap
  val ChunkSize = 200
  val ChunkOverlap = 50

  /** Document chunking — the window/segmentation operator every RAG and
    * long-context training pipeline runs before embedding: fixed
    * [[ChunkSize]]-char windows advancing by size−overlap, each chunk
    * carrying its doc, ordinal and start offset so spans map back to the
    * source. Pure per-row explode (chunks/doc = ⌈len/stride⌉) — no
    * shuffle, embarrassingly parallel, the chunk rows feed straight into
    * [[graft.embed.Embedder.embedFrame]]. */
  def docChunks(spark: SparkSession, sfDir: String): DataFrame = {
    val stride = ChunkSize - ChunkOverlap
    Tables.documents(spark, sfDir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), floor((length(col("text")) - 1) / stride).cast("int")),
          i => substring(col("text"), i * stride + 1, lit(ChunkSize)))))
      .select(col("doc_id"),
        col("pos").cast("long").as("chunk_id"),
        (col("pos").cast("long") * stride).as("start_char"),
        col("col").as("chunk"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Per-source mixing weights for [[corpusMix]] — deterministic from the
    * source name (suffix digits mod 4 → keep 25/50/75/100%), standing in
    * for the configured per-source sampling rates of a data-mixing recipe
    * (Pile/Dolma-style source weighting). Integer percent thresholds: the
    * keep test is pure integer compare, bit-free cross-engine. */
  val MixSalt = "mix-v1"

  /** Weighted corpus mixing — the down/up-weighting pass that composes a
    * training mix from heterogeneous sources: each source keeps a
    * deterministic salted-hash fraction of its docs per its weight.
    * Reports per-source corpus size, mix threshold and kept count.
    * Same hash-bucket machinery as [[corpusSample]]/[[corpusSplits]], so
    * mixes are reproducible, composable with splits, and stable across
    * engines/partitionings. Shuffle-free scan + one small agg. */
  def corpusMix(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.md5_long
    val digits = regexp_extract(col("source"), "(\\d+)", 1)
    // digit-less source names default to keep-everything rather than a
    // silent kept=0 row; the emptiness test runs BEFORE the cast — ANSI
    // Spark and DuckDB both hard-error casting '' to int
    val threshold = when(digits === "", lit(100))
      .otherwise((pmod(digits.cast("int"), lit(4)) + 1) * 25)
    val bucket = graft.functions.salted_bucket(col("doc_id"), MixSalt, 100L)
    Tables.documents(spark, sfDir)
      .select(col("source"), threshold.as("keep_pct"),
        when(bucket < threshold.cast("long"), 1L).otherwise(0L).as("kept"))
      .groupBy("source", "keep_pct")
      .agg(count(lit(1)).as("n_docs"), sum(col("kept")).as("n_kept"))
      .orderBy("source")
  }

  // deterministic-sample parameters: keep buckets [0, SampleBuckets) of 100
  val SampleBuckets = 10L
  val SampleSalt = "sample-v1"

  /** Deterministic ~[[SampleBuckets]]% corpus sample by salted md5 bucket —
    * the reproducible-sampling operator (eval subsets, ablation corpora).
    * Unlike RNG-based `sample()`, the hash sample is stable across runs,
    * engines, partitionings and shard counts, and composes with itself
    * (a 10% sample of a 10% sample re-salted is an unbiased 1%).
    * Shuffle-free: one scan, one codegen'd hash compare per row. */
  def corpusSample(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = graft.functions.salted_bucket(col("doc_id"), SampleSalt, 100L)
    Tables.documents(spark, sfDir)
      .filter(bucket < SampleBuckets)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }

  /** Salt for [[weightedSample]]'s per-doc uniform draw. */
  val WsSalt = "wsample-v1"
  /** Sample size [[weightedSample]] returns. */
  val WsK = 50
  /** Modulus mapping the 60-bit doc hash onto [0, 2⁵³) — the largest range
    * where every integer is exact in double, so `(h+1)/2⁵³` is an exact
    * dyadic rational in (0, 1] on both engines. */
  val WsMod: Long = 1L << 53

  /** Weighted sampling without replacement — Efraimidis–Spirakis 2006
    * (A-ES, the one-pass distributed weighted reservoir): each doc draws
    * u ∈ (0, 1] and ranks by key = −ln(u)/w; the S smallest keys ARE a
    * weighted sample without replacement. Weight here is `n_chars` — the
    * "sample long docs proportionally more" curation pass (token-budget
    * sampling). The RNG is the repo's deterministic salted-hash uniform
    * instead of seeded randomness, so the sample is reproducible across
    * runs/engines/shards like [[corpusSample]], and the whole operator is
    * oracle-exact: hash, ln and divide are bit-identical IEEE ops both
    * sides. Scale shape: map-only key computation + TakeOrderedAndProject
    * (bounded heaps, no global sort, no shuffle beyond S rows/partition). */
  def weightedSample(spark: SparkSession, sfDir: String): DataFrame = {
    // the ONE sampling primitive (graft.functions.salted_bucket) so the
    // salt/cast/modulus contract cannot drift from its oracle twin
    val h = graft.functions.salted_bucket(col("doc_id"), WsSalt, WsMod)
    val u = (h + lit(1L)).cast("double") / lit(WsMod.toDouble)
    val key = -log(u) / col("n_chars").cast("double")
    Tables.documents(spark, sfDir).transform(Tables.rowParallel)
      .filter(col("n_chars") > 0) // zero-weight rows are unsampleable by definition
      .select(col("doc_id"), col("n_chars"), key.as("sample_key"))
      .orderBy(col("sample_key"), col("doc_id"))
      .limit(WsK)
  }

  /** Salt for [[corpusShuffle]]'s ordering key — a different epoch salt
    * reshuffles the corpus reproducibly. */
  val ShuffleSalt = "shuffle-epoch-0"

  /** Reproducible global training order — the "shuffle your corpus"
    * pass every pre-training dataloader build runs: each doc's position
    * is its rank under a salted hash, so the order is uniform-random in
    * distribution yet a pure function of (doc_id, salt) — re-runs and
    * engines agree, and a new epoch salt is a fresh permutation.
    *
    * Scale shape: ONE distributed range sort on the 8-byte hash key (the
    * thing Spark's orderBy is built to do at any size — sampled range
    * partitioning, no single reducer), then contiguous positions via the
    * per-partition offset pattern (`zipWithIndex`: one small count job
    * over partition sizes, then a map — the ONLY corpus-wide contiguous
    * numbering that avoids a global window funnel; this is the documented
    * RDD-exception case, per-partition imperative logic). A global
    * `row_number()` window here would funnel 100 TB through one reducer.
    * The returned rows INHERIT the range sort's global shuffle_pos order
    * (zipWithIndex preserves partition order) — a trailing orderBy would
    * just re-sort already-sorted data.
    *
    * Exactness: positions are integers from a total order with a doc_id
    * tie-break — bit-exact by construction. */
  def corpusShuffle(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.md5_long
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        md5_long(concat(col("doc_id").cast("string"), lit(":" + ShuffleSalt)))
          .as("k"))
      .orderBy("k", "doc_id")
      .select(col("doc_id")).as[Long].rdd
      .zipWithIndex() // partition-offset numbering, preserves sort order
      .toDF("doc_id", "shuffle_pos")
  }

  /** Per-source dataset card — the rollup published next to a training
    * corpus: doc count, mean length, exact-duplicate rate (docs sharing a
    * normalized fingerprint with an earlier doc), and language breadth,
    * per `source`. Composes the fingerprint and token machinery in one
    * two-level aggregation; the duplicate flag is a window over the
    * fingerprint (bounded groups — duplicates of one text), everything
    * else is partial+final hash aggs on `source`. */
  def sourceStats(spark: SparkSession, sfDir: String): DataFrame = {
    val fp = md5(regexp_replace(lower(trim(col("text"))), "\\s+", " "))
    val w = Window.partitionBy("fp").orderBy("doc_id")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("lang"),
        length(col("text")).cast("long").as("len"), fp.as("fp"))
      .withColumn("is_dup", (row_number().over(w) > 1).cast("long"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        (sum(col("len")).cast("double") / count(lit(1))).as("mean_len"),
        sum(col("is_dup")).as("n_dups"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy("source")
  }

  /** One-pass table profile (ANALYZE/data-card analog): per column of
    * `documents` — non-null count, exact distinct count, min/max rendered
    * as strings. All 5×3 aggregates fold in a SINGLE aggregation (Spark
    * plans the multi-distinct via one Expand — same cost as one explode
    * pass, no per-column scans), then the 1-row result unpivots to rows
    * with `stack` (driver-free). At 100 TB exact ndv on high-cardinality
    * columns is the expensive part; swap `countDistinct` for
    * `approx_count_distinct` per column when the card tolerates ±2%. */
  def tableProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val colsP = Seq("doc_id", "text", "lang", "source", "n_chars")
    val aggs = colsP.flatMap(c => Seq(
      count(col(c)).as(s"${c}_n"),
      countDistinct(col(c)).as(s"${c}_ndv"),
      min(col(c)).cast("string").as(s"${c}_min"),
      max(col(c)).cast("string").as(s"${c}_max"))) :+ count(lit(1)).as("_total")
    val row = Tables.documents(spark, sfDir).agg(aggs.head, aggs.tail: _*)
    row.select(expr(
        s"stack(${colsP.size}, " + colsP.map(c =>
          s"'$c', ${c}_n, ${c}_ndv, ${c}_min, ${c}_max, _total").mkString(", ") +
          ") as (col_name, n_non_null, n_distinct, min_value, max_value, n_rows)"))
      .select(col("col_name"), col("n_rows"), col("n_non_null"),
        (col("n_rows") - col("n_non_null")).as("n_null"),
        col("n_distinct"), col("min_value"), col("max_value"))
      .orderBy("col_name")
  }

  val BigramTopK = 20

  /** Corpus-wide top-[[BigramTopK]] token bigrams by DOCUMENT frequency —
    * the collocation/boilerplate diagnostic (bigrams shared by many docs
    * surface template text that pair-dedup thresholds miss). Distinct
    * bigrams per doc via the codegen'd [[graft.functions.Shingles]] with
    * n=2 (zip_with/transform HOFs are CodegenFallback), one hash agg, then
    * a global top-k that compiles to TakeOrderedAndProject: the limit moves
    * k rows per partition, not the bigram table. */
  def bigramTop(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    val bigrams2 = ColumnBridge.column(graft.functions.Shingles(
      ColumnBridge.expression(tokens(col("text"))), 2))
    Tables.documents(spark, sfDir)
      .select(explode(bigrams2).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("bigram").asc)
      .limit(BigramTopK)
  }

  /** Hashed-feature space size for [[dsirWeights]] — DSIR's dimensionality
    * knob; 128 keeps the bucket relation broadcastable at any corpus size. */
  val DsirBuckets = 128L

  /** The DSIR target domain: English documents (select multilingual raw
    * data that "looks like" the English target distribution). */
  val DsirTargetLang = "en"

  /** DSIR importance weights (Data Selection via Importance Resampling,
    * Xie et al. 2023, public): score every raw document by how much its
    * hashed-unigram distribution resembles a target domain, here
    * lang = [[DsirTargetLang]]. Features are [[graft.functions.md5_long]]
    * unigram hashes folded into [[DsirBuckets]] buckets; per-bucket
    * log-ratio λ_b = ln(p_target(b) / p_raw(b)) with add-one smoothing;
    * per-doc weight = Σ_b n_b·λ_b. Documents with positive weight resemble
    * the target more than the corpus average — the resampling pass then
    * draws by weight.
    *
    * Scale shape: two hash-aggs over (bucket) — 128 groups, map-side
    * combined to nothing — plus one per-doc bucket-count agg joined to the
    * broadcast 128-row λ table; no corpus-sized shuffle anywhere.
    * Bit-exactness: λ is rounded to 6dp and summed as DECIMAL(18,6)·count —
    * exact integer-scaled arithmetic after one deterministic ln+round per
    * bucket (the lm_score recipe). */
  def dsirWeights(spark: SparkSession, sfDir: String): DataFrame = {
    val bucketed = Tables.documents(spark, sfDir)
      .transform(Tables.rowParallel) // row-parallel fan-out (see Tables.rowParallel)
      .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("token"))
      .select(col("doc_id"), col("lang"),
        (graft.functions.md5_long(col("token")) % DsirBuckets).as("bucket"))
    val raw = bucketed.groupBy("bucket").agg(count(lit(1)).as("cr"))
    val tgt = bucketed.filter(col("lang") === DsirTargetLang)
      .groupBy("bucket").agg(count(lit(1)).as("ct"))
    val totals = raw.agg(sum(col("cr")).cast("double").as("tr"))
      .crossJoin(tgt.agg(sum(col("ct")).cast("double").as("tt")))
    val lam = raw.join(tgt, Seq("bucket"), "left")
      .na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        round(log(
          ((col("ct") + lit(1L)).cast("double") / (col("tt") + lit(DsirBuckets.toDouble))) /
            ((col("cr") + lit(1L)).cast("double") / (col("tr") + lit(DsirBuckets.toDouble)))), 6)
          .cast("decimal(18,6)").as("lam"))
    bucketed.groupBy("doc_id", "bucket").agg(count(lit(1)).as("nb"))
      .join(broadcast(lam), "bucket")
      .groupBy("doc_id")
      .agg(sum(col("nb")).as("n_tokens"),
        sum(col("nb").cast("decimal(18,0)") * col("lam")).as("s"))
      .select(col("doc_id"), col("n_tokens"), col("s").cast("double").as("dsir_weight"))
      .orderBy("doc_id")
  }

  /** Vocabulary prefix size for [[vocabCoverage]]. */
  val VocabTopN = 100

  /** Cumulative corpus coverage of the top-[[VocabTopN]] token vocabulary —
    * the tokenizer-budget diagnostic: how much of the token stream the
    * first N vocabulary entries absorb (a steep curve means a small vocab
    * suffices; a flat tail predicts many OOV/byte-fallback tokens).
    *
    * Scale shape: corpus-sized work is ONE token-count hash agg; the
    * top-N cut compiles to TakeOrderedAndProject, the 1-row total
    * broadcasts, and the rank/cumulative window runs over ≤ N post-limit
    * rows (bounded — never corpus-sized). All counts are integers; the
    * coverage is one double division per row → oracle-exact. */
  def vocabCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    val v = Tables.documents(spark, sfDir)
      .transform(Tables.rowParallel) // row-parallel fan-out (see Tables.rowParallel)
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val tot = v.agg(sum(col("cnt")).cast("long").as("t"))
    val win = Window.orderBy(col("cnt").desc, col("w").asc)
    v.orderBy(col("cnt").desc, col("w").asc).limit(VocabTopN)
      .crossJoin(broadcast(tot))
      .select(row_number().over(win).cast("long").as("rnk"),
        col("w").as("token"), col("cnt"),
        (sum(col("cnt")).over(win).cast("double") / col("t").cast("double"))
          .as("coverage"))
      .orderBy("rnk")
  }

  /** Merge-candidate list size for [[bpePairCounts]]. */
  val BpeTopK = 30

  /** First BPE merge iteration (Sennrich et al. 2016, public): count
    * adjacent character pairs inside words, weighted by word frequency —
    * the statistic a tokenizer-induction pass maximizes when choosing the
    * next merge. Top-[[BpeTopK]] pairs by total count, pair-ascending
    * tie-break.
    *
    * Scale shape: the corpus-sized work is ONE token-count hash agg; the
    * character-pair fan-out then runs over the *vocabulary* (distinct
    * words) weighted by count — the classic BPE trick that makes each
    * merge iteration vocab-sized, not corpus-sized. The top-k compiles to
    * TakeOrderedAndProject (k rows per partition cross the wire). */
  def bpePairCounts(spark: SparkSession, sfDir: String): DataFrame =
    pairCountsIter1(wordCounts(spark, sfDir))
      .orderBy(col("n_total").desc, col("pair").asc)
      .limit(BpeTopK)

  /** Vocab word-frequency table — the input relation of every BPE merge
    * iteration (corpus-sized work happens exactly once, here). */
  private def wordCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .transform(Tables.rowParallel) // row-parallel fan-out (see Tables.rowParallel)
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))

  /** Iteration-1 adjacent char-pair counts over the vocab (unordered). */
  private def pairCountsIter1(wc: DataFrame): DataFrame =
    wc.filter(length(col("w")) >= 2)
      .select(col("c"),
        explode(transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum(col("c")).as("n_total"))

  /** Merged-symbol stand-in inside re-segmented words — a control char no
    * whitespace-split token can contain. */
  private val BpeMarker = "\u0001"

  /** Second BPE merge iteration — the step that makes BPE *training* a
    * loop (Sennrich 2016 §3.2): take iteration 1's winning pair, apply the
    * merge to the vocabulary (greedy left-to-right non-overlapping — which
    * is exactly `replace`'s contract in both engines, so no bespoke
    * segmenter), and recount symbol pairs over the re-segmented words.
    * Pairs are reported as `s1+s2` with the merged symbol expanded, so
    * `lo+w` is distinguishable from `l+ow`.
    *
    * Scale shape: identical to [[bpePairCounts]] — the merge application
    * and recount run over the DISTINCT VOCAB weighted by word frequency
    * (the classic trick that makes each merge iteration vocab-sized, not
    * corpus-sized); the winner is ONE driver-side row that returns as a
    * literal. Iterations 3..N repeat this shape unchanged.
    *
    * Exactness: all integer counts and string ops — float-free. */
  def bpeMergeIter2(spark: SparkSession, sfDir: String): DataFrame = {
    // persist the vocab across the two passes (winner lookup + recount) so
    // the corpus-sized word-count aggregation truly runs once; both passes
    // and the ≤BpeTopK result are vocab/driver-sized, so the query
    // computes eagerly and returns a local frame (the heavyHitters shape)
    val wc = wordCounts(spark, sfDir).persist()
    try {
      val top1 = pairCountsIter1(wc)
        .orderBy(col("n_total").desc, col("pair").asc)
        .limit(1).head.getString(0) // 1-row collect: the merge-table entry
      def expand(s: Column): Column = replace(s, lit(BpeMarker), lit(top1))
      val rows = wc.select(col("c"),
          replace(col("w"), lit(top1), lit(BpeMarker)).as("w2"))
        .filter(length(col("w2")) >= 2)
        .select(col("c"),
          explode(transform(sequence(lit(1), length(col("w2")) - 1),
            i => concat(expand(col("w2").substr(i, lit(1))), lit("+"),
              expand(col("w2").substr(i + 1, lit(1)))))).as("pair2"))
        .groupBy("pair2").agg(sum(col("c")).as("n_total"))
        .orderBy(col("n_total").desc, col("pair2").asc)
        .limit(BpeTopK)
        .collect().map(r => (r.getString(0), r.getLong(1))).toIndexedSeq
      import spark.implicits._
      rows.toDF("pair2", "n_total")
    } finally wc.unpersist()
  }

  /** Number of greedy merges [[bpeLearn]] performs. Bounded by 8 so every
    * merged symbol gets its own control-char marker chr(1)..chr(8) — none
    * of which can appear inside a whitespace-split token — and the unrolled
    * DuckDB oracle stays tractable. Production would raise this with a
    * wider marker alphabet (any unused codepoints). */
  val BpeLearnK = 8

  /** BPE trainer loop (Sennrich et al. 2016 §3.2): k greedy merge
    * iterations, each one winner-select → apply-merge → recount, over the
    * persisted vocab-sized word-frequency state. Returns the learned merge
    * table — `rank, merge_pair ("sa+sb", symbols expanded), n_total` — the
    * artifact a tokenizer build ships. Generalizes [[bpeMergeIter2]] (its
    * 2 unrolled iterations are this loop's k=2 prefix; spec-pinned).
    *
    * Scale shape: the corpus-sized work is ONE token-count hash agg
    * (inside [[wordCounts]], persisted); every iteration after that runs
    * over the DISTINCT VOCAB weighted by word frequency — the classic
    * Sennrich trick that makes each merge vocab-sized, not corpus-sized.
    * Per iteration: one vocab-sized pair recount + a 1-row collect (the
    * winner), then one vocab-sized `replace` projection. The re-segmented
    * vocab is re-persisted each iteration so lineage stays one step deep.
    *
    * Merged symbols are tracked as control-char markers inside the vocab
    * strings (merge i ⇒ chr(i)); candidate pairs are expanded through the
    * driver-side symbol table both for reporting and for the tie-break, so
    * ordering is over the human-readable "sa+sb" form — byte-identical in
    * both engines (binary UTF-8 collation).
    *
    * Exactness: integer counts and string ops end-to-end — float-free. */
  def bpeLearn(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    learnMerges(spark, sfDir)
      .map { case (rank, _, ep, n) => (rank.toLong, ep, n) }
      .toDF("rank", "merge_pair", "n_total")
  }

  /** Learned-merge memo: the trainer is a deterministic function of the
    * corpus, and both [[bpeLearn]] and [[bpeTokensPerDoc]] (and a bench
    * run's repeated executions) would otherwise re-run its 2k vocab-sized
    * jobs each time. Keyed on the documents dataset's path + mtime (the
    * [[graft.plans.AnnIndexRegistry]] fingerprint pattern), LRU-bounded.
    * A trainer artifact is exactly the kind of sidecar a production
    * pipeline persists; the memo is its in-session form. */
  private val mergeMemo = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, Long), IndexedSeq[(Int, String, String, Long)]](
        16, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long), IndexedSeq[(Int, String, String, Long)]]) =
        size() > 32
    })

  /** The trainer loop itself — one entry per learned merge:
    * `(rank, markedPair, expandedPair, n_total)`, where `markedPair` is
    * the 2-char pair in marker space (what `replace` applies) and
    * `expandedPair` the human-readable "sa+sb". Shared by [[bpeLearn]]
    * (reports the table) and [[bpeTokensPerDoc]] (applies it); memoized
    * per corpus generation ([[mergeMemo]]). */
  private def learnMerges(spark: SparkSession, sfDir: String)
      : IndexedSeq[(Int, String, String, Long)] = {
    val key = {
      val p = new org.apache.hadoop.fs.Path(s"$sfDir/documents.parquet")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      (p.toString, fs.getFileStatus(p).getModificationTime)
    }
    // no lock held while the trainer's Spark jobs run (probedLists rule);
    // a racing duplicate compute is benign — same deterministic value
    val cached = mergeMemo.get(key)
    if (cached != null) return cached
    val learned = learnMergesUncached(spark, sfDir)
    mergeMemo.put(key, learned)
    learned
  }

  private def learnMergesUncached(spark: SparkSession, sfDir: String)
      : IndexedSeq[(Int, String, String, Long)] = {
    var wc = wordCounts(spark, sfDir).persist()
    wc.count() // materialize before the loop so iteration lineage starts here
    // marker char -> fully-expanded symbol (expansions never contain
    // markers, so chained replace in any order expands correctly)
    var symtab = List.empty[(String, String)]
    def expand(c: Column): Column =
      symtab.foldLeft(c) { case (acc, (m, e)) => replace(acc, lit(m), lit(e)) }
    def expandStr(s: String): String =
      symtab.foldLeft(s) { case (acc, (m, e)) => acc.replace(m, e) }
    val merges = IndexedSeq.newBuilder[(Int, String, String, Long)]
    try {
      var i = 1
      var exhausted = false
      while (i <= BpeLearnK && !exhausted) {
        // 1-row collect: this iteration's merge-table entry (empty when a
        // tiny fixture vocab runs out of adjacent pairs before k merges)
        val winArr = wc.filter(length(col("w")) >= 2)
          .select(col("c"),
            explode(transform(sequence(lit(1), length(col("w")) - 1),
              j => col("w").substr(j, lit(2)))).as("p"))
          .groupBy("p").agg(sum(col("c")).as("n_total"))
          .select(col("p"), col("n_total"),
            concat(expand(col("p").substr(1, 1)), lit("+"),
              expand(col("p").substr(2, 1))).as("ep"))
          .orderBy(col("n_total").desc, col("ep").asc)
          .limit(1).collect()
        if (winArr.isEmpty) exhausted = true
        else {
          val win = winArr(0)
          val (pMarked, nTotal, ep) = (win.getString(0), win.getLong(1), win.getString(2))
          merges += ((i, pMarked, ep, nTotal))
          val marker = i.toChar.toString // chr(i): this merge's symbol marker
          symtab ::= (marker, expandStr(pMarked))
          val next = wc.select(replace(col("w"), lit(pMarked), lit(marker)).as("w"),
            col("c")).persist()
          next.count() // cut lineage: each iteration reads the previous persist
          wc.unpersist()
          wc = next
          i += 1
        }
      }
    } finally wc.unpersist()
    merges.result()
  }

  /** Apply the learned BPE tokenizer — the train→apply loop closed: run
    * [[learnMerges]], then segment EVERY document's words with the k
    * learned merges (the same greedy left-to-right `replace` contract the
    * trainer used) and report per-doc token accounting: word count, BPE
    * symbol count, and the compression the merges bought
    * (chars per BPE token). This is the token-budget pass a pre-training
    * pipeline runs with its real tokenizer before packing.
    *
    * Scale shape: training is vocab-sized per iteration ([[bpeLearn]]);
    * application is map-only — k chained codegen'd `replace`s per word
    * instance, zero joins — followed by one per-doc hash agg. No windows.
    *
    * Exactness: integer counts; one unrounded double division per doc
    * (int/int quotients reach 6dp midpoints — the house rule). */
  def bpeTokensPerDoc(spark: SparkSession, sfDir: String): DataFrame = {
    val merges = learnMerges(spark, sfDir)
    val seg = merges.foldLeft(col("w")) { case (c, (i, pMarked, _, _)) =>
      replace(c, lit(pMarked), lit(i.toChar.toString))
    }
    Tables.documents(spark, sfDir)
      .transform(Tables.rowParallel) // row-parallel fan-out (see Tables.rowParallel)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .select(col("doc_id"), length(col("w")).cast("long").as("n_chars"),
        length(seg).cast("long").as("n_sym"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sym")).as("n_bpe_tokens"),
        sum(col("n_chars")).as("n_chars"))
      .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"),
        // a whitespace-only doc tokenizes to one empty token → 0 symbols;
        // guard the 0/0 (ANSI Divide throws; DuckDB yields NaN) with an
        // explicit NULL, mirrored in the oracle's CASE
        when(col("n_bpe_tokens") > 0,
          col("n_chars").cast("double") / col("n_bpe_tokens").cast("double"))
          .as("chars_per_token"))
      .orderBy("doc_id")
  }

  /** Training-sequence length for [[sequencePacking]] — the model context
    * the packer fills (production exposes it as a parameter). */
  val PackSeqLen = 512L

  /** Independent packing shards for [[sequencePacking]]: docs hash into
    * shards and each shard packs its own token stream, so the running-sum
    * window never sees more than corpus/shards rows. Scale knob: raise it
    * with the cluster (each shard is one window partition). */
  val PackShards = 32L

  /** GPT-style sequence packing layout (concat-and-slice): concatenate
    * documents (plus one EOS token each) in doc_id order within a hash
    * shard, slice the stream into [[PackSeqLen]]-token training sequences,
    * and report where each document lands — its shard-local first sequence,
    * offset inside it, and how many sequences it spans. This is the batch
    * audit a pre-training dataloader build runs: boundary-crossing counts
    * size the attention-mask waste, offsets make the layout reproducible.
    *
    * Scale shape: one per-row token count (no explode), a shuffle into
    * [[PackShards]] hash shards, and a cumulative-sum window *within* each
    * shard — partition sizes are corpus/shards regardless of corpus size,
    * and every derived column is integer arithmetic on the running sum.
    * Nothing here is float, so the oracle is exact by construction. */
  def sequencePacking(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.md5_long
    val nTok = size(tokens(col("text"))).cast("long") + lit(1L) // +1 EOS
    val shard = graft.functions.salted_bucket(col("doc_id"), "pack", PackShards)
    val w = Window.partitionBy("shard").orderBy("doc_id")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), shard.as("shard"), nTok.as("n_tok"))
      .withColumn("running", sum(col("n_tok")).over(w))
      .select(col("doc_id"), col("shard"), col("n_tok"),
        // true integral division (`div`), matching the oracle's `//` —
        // a double-floor detour would silently cap exactness at 2^53
        expr(s"(running - n_tok) div $PackSeqLen").as("first_seq"),
        pmod(col("running") - col("n_tok"), lit(PackSeqLen)).as("seq_offset"),
        expr(s"((running - 1) div $PackSeqLen) - ((running - n_tok) div $PackSeqLen) + 1")
          .as("n_seqs_spanned"))
      .orderBy("doc_id")
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sequence_packing" -> ((s, d) => sequencePacking(s, d)),
    "bpe_pair_counts" -> ((s, d) => bpePairCounts(s, d)),
    "bpe_merge_iter2" -> ((s, d) => bpeMergeIter2(s, d)),
    "bpe_learn" -> ((s, d) => bpeLearn(s, d)),
    "bpe_tokens_per_doc" -> ((s, d) => bpeTokensPerDoc(s, d)),
    "vocab_coverage" -> ((s, d) => vocabCoverage(s, d)),
    "dsir_weights" -> ((s, d) => dsirWeights(s, d)),
    "text_stats" -> ((s, d) => textStats(s, d)),
    "lang_id" -> ((s, d) => langId(s, d)),
    "doc_fingerprint" -> ((s, d) => docFingerprint(s, d)),
    "quality_filter" -> ((s, d) => qualityFilter(s, d)),
    "tfidf_top_terms" -> ((s, d) => tfidfTopTerms(s, d)),
    "bm25_topk" -> ((s, d) => bm25TopK(s, d)),
    "pii_scan" -> ((s, d) => piiScan(s, d)),
    "hybrid_search" -> ((s, d) => hybridSearch(s, d)),
    "phrase_search" -> ((s, d) => phraseSearch(s, d)),
    "phrase_search_indexed" -> ((s, d) => phraseSearchIndexed(s, d)),
    "weighted_sample" -> ((s, d) => weightedSample(s, d)),
    "corpus_splits" -> ((s, d) => corpusSplits(s, d)),
    "bigram_top" -> ((s, d) => bigramTop(s, d)),
    "quality_signals" -> ((s, d) => qualitySignals(s, d)),
    "repetition_signals" -> ((s, d) => repetitionSignals(s, d)),
    "lm_score" -> ((s, d) => lmScore(s, d)),
    "quality_classifier" -> ((s, d) => qualityClassifier(s, d)),
    "stupid_backoff_score" -> ((s, d) => stupidBackoffScore(s, d)),
    "doc_chunks" -> ((s, d) => docChunks(s, d)),
    "corpus_mix" -> ((s, d) => corpusMix(s, d)),
    "corpus_sample" -> ((s, d) => corpusSample(s, d)),
    "corpus_shuffle" -> ((s, d) => corpusShuffle(s, d)),
    "source_stats" -> ((s, d) => sourceStats(s, d)),
    "table_profile" -> ((s, d) => tableProfile(s, d)),
  )

  /** The BM25 scoring pipeline as a DuckDB CTE chain (ends at `scored`:
    * one row per (doc, matched query term) with the term's BM25
    * contribution `s`) — shared by the bm25_topk and hybrid_search
    * oracles. */
  private def bm25Ctes(tok: String): String = {
    val terms = Bm25Query.map(t => s"'$t'").mkString(", ")
    s"""tok AS (
       |  SELECT doc_id, unnest($tok) AS token FROM documents),
       |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
       |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
       |ad AS (SELECT CAST(count(*) AS DOUBLE) / (SELECT n FROM n) AS avgdl FROM tok),
       |qtf AS (
       |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM tok
       |  WHERE token IN ($terms) GROUP BY 1, 2),
       |df AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM qtf GROUP BY 1),
       |scored AS (
       |  SELECT q.doc_id,
       |    ln((n.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
       |      * (CAST(q.tf AS DOUBLE) * ($Bm25K1 + 1.0))
       |      / (CAST(q.tf AS DOUBLE)
       |         + $Bm25K1 * (1.0 - $Bm25B + $Bm25B * CAST(dl.dl AS DOUBLE) / ad.avgdl)) AS s
       |  FROM qtf q
       |  JOIN dl USING (doc_id)
       |  JOIN df ON df.token = q.token, n, ad)""".stripMargin
  }

  /** DuckDB twin of [[bpeLearn]] — the k-iteration trainer loop unrolled
    * into a generated CTE chain (DuckDB has no imperative loop). Iteration
    * i: pair recount over wc_{i-1} → winner by (n_total DESC, expanded
    * pair ASC) → expansion entry exp_i → merge application wc_i via the
    * same greedy left-to-right `replace`. Markers are chr(1)..chr(k),
    * matching the Spark loop byte-for-byte. */
  /** The trainer-loop CTE chain shared by the bpe_learn and
    * bpe_tokens_per_doc oracles — everything up to the last `wc_k`. */
  private def bpeLearnCtes(tok: String, k: Int): String = {
    // expand a marked-symbol fragment through the merge table learned so
    // far: chained replace over the (marker, expansion) entries < i
    def expFn(x: String, i: Int): String =
      (1 until i).foldLeft(x)((acc, j) => s"replace($acc, chr($j), (SELECT e FROM exp$j))")
    // AS MATERIALIZED everywhere a CTE is referenced more than once:
    // DuckDB inlines plain CTEs, and wc_i feeds both p_{i+1} and wc_{i+1}
    // — unmaterialized, the base scan would be inlined 2^k times
    val sb = new StringBuilder
    sb ++= s"""WITH wc0 AS MATERIALIZED (
              |  SELECT w, count(*) AS c
              |  FROM (SELECT unnest($tok) AS w FROM documents) GROUP BY 1)""".stripMargin
    for (i <- 1 to k) {
      sb ++= s""",
                |p$i AS (
                |  SELECT substring(w, CAST(j AS INT), 2) AS pair, c
                |  FROM (SELECT w, c, unnest(range(1, length(w))) AS j
                |        FROM wc${i - 1} WHERE length(w) >= 2)),
                |a$i AS (SELECT pair, CAST(SUM(c) AS BIGINT) AS n_total FROM p$i GROUP BY pair),
                |win$i AS MATERIALIZED (
                |  SELECT pair, n_total,
                |    ${expFn("substring(pair, 1, 1)", i)} || '+' ||
                |    ${expFn("substring(pair, 2, 1)", i)} AS ep
                |  FROM a$i ORDER BY n_total DESC, ep LIMIT 1),
                |exp$i AS MATERIALIZED (SELECT ${expFn("pair", i)} AS e FROM win$i),
                |wc$i AS MATERIALIZED (SELECT replace(w, (SELECT pair FROM win$i), chr($i)) AS w, c FROM wc${i - 1})""".stripMargin
    }
    sb.toString
  }

  private def bpeLearnOracle(tok: String, k: Int): String = {
    val sb = new StringBuilder(bpeLearnCtes(tok, k))
    sb ++= "\nSELECT * FROM (\n"
    sb ++= (1 to k).map { i =>
      s"  SELECT CAST($i AS BIGINT) AS rank, (SELECT ep FROM win$i) AS merge_pair, " +
        s"(SELECT n_total FROM win$i) AS n_total"
    }.mkString(" UNION ALL\n")
    // pair exhaustion before k merges (degenerate corpora): an empty win_i
    // yields NULL scalar subqueries — drop those rows to mirror the Spark
    // loop's early stop, instead of emitting phantom (i, NULL, NULL) rows
    sb ++= "\n) WHERE merge_pair IS NOT NULL ORDER BY rank"
    sb.toString
  }

  /** DuckDB twin of [[bpeTokensPerDoc]]: learn the merges with the same
    * CTE chain, then segment every word instance with the same k greedy
    * replaces and aggregate per doc. An exhausted iteration's winner is
    * NULL — COALESCE it to chr(31) (a needle no token contains) so the
    * replace is a no-op, mirroring the Spark loop's early stop. */
  private def bpeTokensOracle(tok: String, k: Int): String = {
    val seg = (1 to k).foldLeft("w") { (acc, i) =>
      s"replace($acc, COALESCE((SELECT pair FROM win$i), chr(31)), chr($i))"
    }
    s"""${bpeLearnCtes(tok, k)},
       |docw AS (SELECT doc_id, unnest($tok) AS w FROM documents),
       |seg AS (
       |  SELECT doc_id, CAST(length(w) AS BIGINT) AS n_chars,
       |    CAST(length($seg) AS BIGINT) AS n_sym
       |  FROM docw)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(n_sym) AS BIGINT) AS n_bpe_tokens,
       |  CASE WHEN SUM(n_sym) > 0
       |    THEN CAST(SUM(n_chars) AS DOUBLE) / CAST(SUM(n_sym) AS DOUBLE)
       |    ELSE NULL END AS chars_per_token
       |FROM seg GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** The exact-phrase match-count oracle — DuckDB's lambda over the same
    * start-position list both Spark phrase forms count (generate_series
    * yields [] when the doc is shorter than the phrase, so no guard is
    * needed on this side). */
  private def phraseOracleSql(tok: String): String = {
    val conds = PhraseTerms.zipWithIndex.map {
      case (w, 0) => s"t[i] = '$w'"
      case (w, j) => s"t[i+$j] = '$w'"
    }.mkString(" AND ")
    s"""WITH tk AS (SELECT doc_id, $tok AS t FROM documents),
       |m AS (SELECT doc_id,
       |    CAST(len(list_filter(generate_series(1, len(t) - ${PhraseTerms.length - 1}),
       |      i -> $conds)) AS BIGINT) AS n_matches
       |  FROM tk)
       |SELECT doc_id, n_matches FROM m WHERE n_matches > 0
       |ORDER BY doc_id""".stripMargin
  }

  def oracles: Map[String, String] = {
    val tok = """string_split_regex(trim(text), '\s+')"""
    def hitsSql(words: Seq[String]) =
      s"CAST(len(list_filter($tok, x -> x IN (${words.map(w => s"'$w'").mkString(",")}))) AS BIGINT)"
    val langs = StopwordsByLang
    val predSql = {
      // same alphabetical-first argmax as the Spark fold
      val cases = langs.map { case (lang, _) =>
        val others = langs.filter(_._1 != lang)
          .map { case (o, _) => s"hits_$lang >= hits_$o" }.mkString(" AND ")
        s"WHEN $others THEN '$lang'"
      }
      s"CASE ${cases.mkString(" ")} ELSE 'und' END"
    }
    Map(
      "dsir_weights" ->
        s"""WITH tk AS (SELECT doc_id, lang, unnest($tok) AS token FROM documents),
           |b AS (SELECT doc_id, lang, ${graft.OracleSql.md5Long("token")} % $DsirBuckets AS bucket
           |  FROM tk),
           |raw AS (SELECT bucket, count(*) AS cr FROM b GROUP BY 1),
           |tgt AS (SELECT bucket, count(*) AS ct FROM b WHERE lang = '$DsirTargetLang' GROUP BY 1),
           |tot AS (
           |  SELECT (SELECT CAST(sum(cr) AS DOUBLE) FROM raw) AS tr,
           |         (SELECT CAST(sum(ct) AS DOUBLE) FROM tgt) AS tt),
           |lam AS (
           |  SELECT r.bucket,
           |    CAST(ROUND(ln(
           |      (CAST(COALESCE(t.ct, 0) + 1 AS DOUBLE) / (tot.tt + $DsirBuckets.0)) /
           |      (CAST(r.cr + 1 AS DOUBLE) / (tot.tr + $DsirBuckets.0))), 6) AS DECIMAL(18,6)) AS lam
           |  FROM raw r LEFT JOIN tgt t USING (bucket), tot),
           |nb AS (SELECT doc_id, bucket, count(*) AS nb FROM b GROUP BY 1, 2)
           |SELECT nb.doc_id, CAST(SUM(nb.nb) AS BIGINT) AS n_tokens,
           |  CAST(SUM(CAST(nb.nb AS DECIMAL(18,0)) * lam.lam) AS DOUBLE) AS dsir_weight
           |FROM nb JOIN lam USING (bucket)
           |GROUP BY nb.doc_id
           |ORDER BY doc_id""".stripMargin,
      // pure integer arithmetic on a running sum — exact cross-engine by
      // construction (DuckDB's window SUM widens to HUGEINT → cast back)
      "sequence_packing" ->
        s"""WITH t AS (
           |  SELECT doc_id,
           |    ${graft.OracleSql.saltedBucket("doc_id", "pack", PackShards)} AS shard,
           |    CAST(len($tok) AS BIGINT) + 1 AS n_tok
           |  FROM documents),
           |r AS (
           |  SELECT doc_id, shard, n_tok,
           |    CAST(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS running
           |  FROM t)
           |SELECT doc_id, shard, n_tok,
           |  (running - n_tok) // $PackSeqLen AS first_seq,
           |  (running - n_tok) % $PackSeqLen AS seq_offset,
           |  (running - 1) // $PackSeqLen - (running - n_tok) // $PackSeqLen + 1 AS n_seqs_spanned
           |FROM r ORDER BY doc_id""".stripMargin,
      // integer counts end-to-end; coverage is one double division per row
      // over the bounded ≤N post-limit window
      "vocab_coverage" ->
        s"""WITH v AS (
           |  SELECT w, count(*) AS cnt
           |  FROM (SELECT unnest($tok) AS w FROM documents) GROUP BY 1),
           |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM v),
           |top AS (SELECT w, cnt FROM v ORDER BY cnt DESC, w LIMIT $VocabTopN),
           |r AS (
           |  SELECT w, cnt,
           |    row_number() OVER (ORDER BY cnt DESC, w) AS rnk,
           |    CAST(SUM(cnt) OVER (ORDER BY cnt DESC, w) AS BIGINT) AS cum
           |  FROM top)
           |SELECT rnk, w AS token, cnt, CAST(cum AS DOUBLE) / t AS coverage
           |FROM r, tot ORDER BY rnk""".stripMargin,
      // integer pair counts over the vocab; exclusive-stop range(1, len)
      // ≡ Spark's inclusive sequence(1, len-1) on the len>=2 filter
      "bpe_pair_counts" ->
        s"""WITH wcc AS (
           |  SELECT w, count(*) AS c
           |  FROM (SELECT unnest($tok) AS w FROM documents) GROUP BY 1),
           |p AS (
           |  SELECT substring(w, CAST(i AS INT), 2) AS pair, c
           |  FROM (SELECT w, c, unnest(range(1, length(w))) AS i
           |        FROM wcc WHERE length(w) >= 2))
           |SELECT pair, CAST(SUM(c) AS BIGINT) AS n_total
           |FROM p GROUP BY pair
           |ORDER BY n_total DESC, pair LIMIT $BpeTopK""".stripMargin,
      // replace() is greedy left-to-right non-overlapping in both engines
      // — the BPE merge-application contract — so the re-segmentation
      // needs no bespoke segmenter on either side
      "bpe_merge_iter2" ->
        s"""WITH wcc AS (
           |  SELECT w, count(*) AS c
           |  FROM (SELECT unnest($tok) AS w FROM documents) GROUP BY 1),
           |p AS (
           |  SELECT substring(w, CAST(i AS INT), 2) AS pair, c
           |  FROM (SELECT w, c, unnest(range(1, length(w))) AS i
           |        FROM wcc WHERE length(w) >= 2)),
           |top1 AS (
           |  SELECT pair FROM (
           |    SELECT pair, CAST(SUM(c) AS BIGINT) AS n_total FROM p GROUP BY pair)
           |  ORDER BY n_total DESC, pair LIMIT 1),
           |seg AS (
           |  SELECT c, replace(w, (SELECT pair FROM top1), chr(1)) AS w2 FROM wcc),
           |s2 AS (
           |  SELECT c,
           |    substring(w2, CAST(i AS INT), 1) AS sa,
           |    substring(w2, CAST(i AS INT) + 1, 1) AS sb
           |  FROM (SELECT c, w2, unnest(range(1, length(w2))) AS i
           |        FROM seg WHERE length(w2) >= 2))
           |SELECT replace(sa, chr(1), (SELECT pair FROM top1)) || '+' ||
           |    replace(sb, chr(1), (SELECT pair FROM top1)) AS pair2,
           |  CAST(SUM(c) AS BIGINT) AS n_total
           |FROM s2 GROUP BY pair2
           |ORDER BY n_total DESC, pair2 LIMIT $BpeTopK""".stripMargin,
      "bpe_learn" -> bpeLearnOracle(tok, BpeLearnK),
      "bpe_tokens_per_doc" -> bpeTokensOracle(tok, BpeLearnK),
      // total order under the salted hash (+doc_id tie-break) → integer
      // ranks; DuckDB's window replays the same order the range sort +
      // zipWithIndex numbering produces
      "corpus_shuffle" ->
        s"""SELECT doc_id,
           |  CAST(ROW_NUMBER() OVER (ORDER BY k, doc_id) - 1 AS BIGINT) AS shuffle_pos
           |FROM (SELECT doc_id,
           |    ${graft.OracleSql.md5Long(s"(CAST(doc_id AS VARCHAR) || ':$ShuffleSalt')")} AS k
           |  FROM documents)
           |ORDER BY shuffle_pos""".stripMargin,
      "text_stats" ->
        s"""WITH base AS (
           |  SELECT doc_id, text,
           |    CAST(len($tok) AS BIGINT) AS n_tokens,
           |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')) AS BIGINT)
           |      AS n_subtokens,
           |    ${hitsSql(langs.toMap.apply("en"))} AS n_stop,
           |    CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS n_punct
           |  FROM documents)
           |SELECT doc_id, n_tokens, n_subtokens, n_stop,
           |  CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
           |  CAST(n_punct AS DOUBLE) / CAST(length(text) AS BIGINT) AS punct_ratio,
           |  CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / n_tokens AS avg_token_len,
           |  0.5 * (CAST(n_stop AS DOUBLE) / n_tokens)
           |    + 0.3 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
           |    + 0.2 * (1.0 - CAST(n_punct AS DOUBLE) / CAST(length(text) AS BIGINT)) AS quality_score
           |FROM base ORDER BY doc_id""".stripMargin,
      "lang_id" ->
        s"""SELECT doc_id,
           |  ${langs.map { case (l, ws) => s"${hitsSql(ws)} AS hits_$l" }.mkString(",\n  ")},
           |  $predSql AS pred_lang
           |FROM documents ORDER BY doc_id""".stripMargin,
      "doc_fingerprint" ->
        """SELECT doc_id,
          |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
          |FROM documents ORDER BY doc_id""".stripMargin,
      // DuckDB range(1, n) is [1, n): i pairs with t[i+1] ≤ t[len] — the
      // same len−1 bigrams Spark's 1-based inclusive sequence builds
      "repetition_signals" ->
        s"""WITH tok AS (SELECT doc_id, $tok AS t FROM documents),
           |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
           |    i -> t[i] || ' ' || t[i+1])) AS g
           |  FROM tok WHERE len(t) >= 2),
           |bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
           |b AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
           |    count(*) AS d, max(c) AS m FROM bgc GROUP BY doc_id),
           |b2 AS (SELECT doc_id, n_bigrams,
           |    round(1.0 - CAST(d AS DOUBLE) / CAST(n_bigrams AS DOUBLE), 6) AS dup_bigram_frac,
           |    round(CAST(m AS DOUBLE) / CAST(n_bigrams AS DOUBLE), 6) AS top_bigram_share
           |  FROM b),
           |tg AS (SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
           |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
           |  FROM tok WHERE len(t) >= 3),
           |tgc AS (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY doc_id, g),
           |t3 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_trigrams,
           |    count(*) AS d, max(c) AS m FROM tgc GROUP BY doc_id),
           |t32 AS (SELECT doc_id, n_trigrams,
           |    round(1.0 - CAST(d AS DOUBLE) / CAST(n_trigrams AS DOUBLE), 6) AS dup_trigram_frac,
           |    round(CAST(m AS DOUBLE) / CAST(n_trigrams AS DOUBLE), 6) AS top_trigram_share
           |  FROM t3)
           |SELECT b2.doc_id, n_bigrams, dup_bigram_frac, top_bigram_share,
           |  n_trigrams, dup_trigram_frac, top_trigram_share
           |FROM b2 JOIN t32 ON b2.doc_id = t32.doc_id
           |ORDER BY b2.doc_id""".stripMargin,
      // DuckDB range(0, n) is [0, n): same ⌈len/stride⌉ windows; substring
      // is 1-based with clamping in both engines
      "doc_chunks" -> {
        val stride = ChunkSize - ChunkOverlap
        s"""SELECT doc_id,
           |  unnest(range(0, (length(text) - 1) // $stride + 1)) AS chunk_id
           |FROM documents WHERE length(text) > 0""".stripMargin match { case inner =>
          s"""WITH ids AS ($inner)
             |SELECT ids.doc_id, chunk_id, chunk_id * $stride AS start_char,
             |  substring(d.text, CAST(chunk_id * $stride + 1 AS INT), $ChunkSize) AS chunk
             |FROM ids JOIN documents d ON ids.doc_id = d.doc_id
             |ORDER BY ids.doc_id, chunk_id""".stripMargin
        }
      },
      "corpus_mix" ->
        s"""WITH w AS (
           |  SELECT source, doc_id,
           |    CASE WHEN regexp_extract(source, '(\\d+)', 1) = '' THEN 100
           |      ELSE (CAST(regexp_extract(source, '(\\d+)', 1) AS INT) % 4 + 1) * 25
           |    END AS keep_pct
           |  FROM documents),
           |b AS (
           |  SELECT source, keep_pct,
           |    CASE WHEN ${graft.OracleSql.saltedBucket("doc_id", MixSalt, 100)}
           |      < keep_pct THEN 1 ELSE 0 END AS kept
           |  FROM w)
           |SELECT source, keep_pct, count(*) AS n_docs,
           |  CAST(sum(kept) AS BIGINT) AS n_kept
           |FROM b GROUP BY source, keep_pct ORDER BY source""".stripMargin,
      // per-term 6dp round → DECIMAL(18,6) sum: exact integer-scaled
      // addition, immune to accumulation order (OracleSql.sumExact recipe)
      "lm_score" ->
        s"""WITH tok AS (SELECT doc_id, unnest($tok) AS token FROM documents),
           |vocab AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
           |scal AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n_total,
           |    CAST(count(*) AS DOUBLE) AS v FROM vocab),
           |probs AS (SELECT token,
           |    (CAST(cnt AS DOUBLE) + 1.0) / (n_total + v) AS p FROM vocab, scal),
           |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
           |terms AS (SELECT doc_id, tf,
           |    CAST(round(CAST(tf AS DOUBLE) * -ln(p), 6) AS DECIMAL(18,6)) AS term
           |  FROM tf JOIN probs USING (token))
           |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
           |  CAST(sum(term) AS DOUBLE) / CAST(sum(tf) AS DOUBLE) AS lm_score
           |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin,
      // same decimal-sum recipe as lm_score; the weight and prior are
      // deterministic double expressions mirrored op for op
      "quality_classifier" -> {
        val posList = NbPositiveSources.map(s => s"'$s'").mkString(", ")
        s"""WITH tok AS (
           |  SELECT doc_id, source IN ($posList) AS pos, unnest($tok) AS token
           |  FROM documents),
           |vocab AS (SELECT token,
           |    sum(CASE WHEN pos THEN 1 ELSE 0 END) AS cpos,
           |    sum(CASE WHEN pos THEN 0 ELSE 1 END) AS cneg
           |  FROM tok GROUP BY 1),
           |scal AS (SELECT CAST(sum(cpos) AS DOUBLE) AS tpos,
           |    CAST(sum(cneg) AS DOUBLE) AS tneg,
           |    CAST(count(*) AS DOUBLE) AS v FROM vocab),
           |w AS (SELECT token,
           |    ln((CAST(cpos AS DOUBLE) + 1.0) / (tpos + v))
           |      - ln((CAST(cneg AS DOUBLE) + 1.0) / (tneg + v)) AS w
           |  FROM vocab, scal),
           |pr AS (SELECT ln(
           |    CAST(sum(CASE WHEN source IN ($posList) THEN 1 ELSE 0 END) AS DOUBLE)
           |    / CAST(sum(CASE WHEN source IN ($posList) THEN 0 ELSE 1 END) AS DOUBLE))
           |    AS prior FROM documents),
           |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
           |terms AS (SELECT doc_id, tf,
           |    CAST(round(CAST(tf AS DOUBLE) * COALESCE(w,
           |      ln(1.0 / (tpos + v)) - ln(1.0 / (tneg + v))), 6)
           |      AS DECIMAL(18,6)) AS term
           |  FROM tf LEFT JOIN w USING (token), scal)
           |SELECT t.doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
           |  CAST(sum(term) AS DOUBLE) + pr.prior AS nb_score,
           |  CAST(CASE WHEN CAST(sum(term) AS DOUBLE) + pr.prior > 0.0
           |    THEN 1 ELSE 0 END AS BIGINT) AS predicted_pos
           |FROM terms t, pr GROUP BY t.doc_id, pr.prior
           |ORDER BY t.doc_id""".stripMargin
      },
      // same decimal-sum recipe; the CASE mirrors the seen/backoff branch
      // arithmetic parenthesis-for-parenthesis
      "stupid_backoff_score" ->
        s"""WITH tk AS (SELECT doc_id, lang, $tok AS t FROM documents),
           |bg AS (
           |  SELECT doc_id, lang, t[i] AS w1, t[i + 1] AS w2 FROM (
           |    SELECT doc_id, lang, t,
           |      unnest(generate_series(1, len(t) - 1)) AS i
           |    FROM tk)),
           |u AS (SELECT token, count(*) AS c1 FROM (
           |    SELECT unnest(t) AS token FROM tk WHERE lang = '$DsirTargetLang')
           |  GROUP BY 1),
           |b2 AS (SELECT w1, w2, count(*) AS c2 FROM bg
           |  WHERE lang = '$DsirTargetLang' GROUP BY 1, 2),
           |scal AS (SELECT CAST(sum(c1) AS DOUBLE) AS tt,
           |    CAST(count(*) AS DOUBLE) AS v FROM u),
           |terms AS (
           |  SELECT bg.doc_id,
           |    CASE WHEN b2.c2 IS NULL THEN 1 ELSE 0 END AS backoff,
           |    CAST(round(-ln(
           |      CASE WHEN b2.c2 IS NOT NULL
           |        THEN CAST(b2.c2 AS DOUBLE) / CAST(u1.c1 AS DOUBLE)
           |        ELSE $SbAlpha * (CAST(COALESCE(u2.c1, 0) AS DOUBLE) + 1.0)
           |          / (scal.tt + scal.v) END), 6) AS DECIMAL(18,6)) AS term
           |  FROM bg
           |  LEFT JOIN b2 ON bg.w1 = b2.w1 AND bg.w2 = b2.w2
           |  LEFT JOIN u u1 ON bg.w1 = u1.token
           |  LEFT JOIN u u2 ON bg.w2 = u2.token, scal)
           |SELECT doc_id, count(*) AS n_bigrams,
           |  CAST(sum(backoff) AS BIGINT) AS n_backoff,
           |  CAST(sum(term) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS sb_score
           |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin,
      "corpus_splits" ->
        s"""WITH b AS (
           |  SELECT lang,
           |    ${graft.OracleSql.md5Long(s"(CAST(doc_id AS VARCHAR) || ':$SplitSalt')")} % 100 AS bucket
           |  FROM documents),
           |s AS (
           |  SELECT lang, CASE
           |    WHEN bucket < $ValBuckets THEN 'val'
           |    WHEN bucket < ${ValBuckets + TestBuckets} THEN 'test'
           |    ELSE 'train' END AS split
           |  FROM b)
           |SELECT lang, split, count(*) AS n FROM s
           |GROUP BY 1, 2 ORDER BY lang, split""".stripMargin,
      "table_profile" -> {
        val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
        cols.map { c =>
          s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows, COUNT($c) AS n_non_null,
             |  COUNT(*) - COUNT($c) AS n_null, COUNT(DISTINCT $c) AS n_distinct,
             |  CAST(MIN($c) AS VARCHAR) AS min_value, CAST(MAX($c) AS VARCHAR) AS max_value
             |FROM documents""".stripMargin
        }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
      },
      "source_stats" ->
        """WITH base AS (
          |  SELECT doc_id, source, lang, CAST(length(text) AS BIGINT) AS len,
          |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
          |  FROM documents),
          |flagged AS (
          |  SELECT source, lang, len,
          |    CASE WHEN row_number() OVER (PARTITION BY fp ORDER BY doc_id) > 1
          |         THEN 1 ELSE 0 END AS is_dup
          |  FROM base)
          |SELECT source, COUNT(*) AS n_docs,
          |  CAST(SUM(len) AS DOUBLE) / COUNT(*) AS mean_len,
          |  CAST(SUM(is_dup) AS BIGINT) AS n_dups,
          |  COUNT(DISTINCT lang) AS n_langs
          |FROM flagged GROUP BY source ORDER BY source""".stripMargin,
      "quality_signals" ->
        s"""WITH tf AS (
           |  SELECT doc_id, token, count(*) AS c
           |  FROM (SELECT doc_id, unnest($tok) AS token FROM documents)
           |  GROUP BY 1, 2),
           |agg AS (
           |  SELECT doc_id,
           |    CAST(sum(c) AS BIGINT) AS n_tokens,
           |    count(*) AS n_distinct_tokens,
           |    max(c) AS top_c,
           |    CAST(sum(c * length(token)) AS BIGINT) AS char_sum
           |  FROM tf GROUP BY 1)
           |SELECT doc_id, n_tokens, n_distinct_tokens,
           |  CAST(n_distinct_tokens AS DOUBLE) / n_tokens AS distinct_ratio,
           |  CAST(top_c AS DOUBLE) / n_tokens AS top_token_frac,
           |  CAST(char_sum AS DOUBLE) / n_tokens AS mean_word_len
           |FROM agg ORDER BY doc_id""".stripMargin,
      "corpus_sample" ->
        s"""SELECT doc_id, lang, source FROM documents
           |WHERE ${graft.OracleSql.saltedBucket("doc_id", SampleSalt, 100)} < $SampleBuckets
           |ORDER BY doc_id""".stripMargin,
      "bigram_top" ->
        s"""WITH tok AS (SELECT doc_id, $tok AS t FROM documents),
           |bg AS (
           |  SELECT doc_id, unnest(list_distinct(
           |    [t[i] || ' ' || t[i+1] FOR i IN generate_series(1, len(t)-1)]
           |  )) AS bigram FROM tok)
           |SELECT bigram, count(*) AS n_docs FROM bg
           |GROUP BY 1 ORDER BY n_docs DESC, bigram LIMIT $BigramTopK""".stripMargin,
      "tfidf_top_terms" ->
        s"""WITH tok AS (
           |  SELECT doc_id, unnest($tok) AS token FROM documents),
           |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
           |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
           |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
           |scored AS (
           |  SELECT doc_id, token,
           |    round(CAST(tf AS DOUBLE) * ln(n.n / CAST(df.df AS DOUBLE)), 6) AS tfidf
           |  FROM tf JOIN df USING (token) CROSS JOIN n),
           |ranked AS (
           |  SELECT doc_id, token, tfidf,
           |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS BIGINT) AS rank
           |  FROM scored)
           |SELECT doc_id, rank, token, tfidf FROM ranked
           |WHERE rank <= $TfidfTopK
           |ORDER BY doc_id, rank""".stripMargin,
      "pii_scan" -> {
        import graft.functions.TextFunctions.PiiPatterns
        val sums = PiiPatterns.map { case (n, p) =>
          s"CAST(SUM(len(regexp_extract_all(lower(text), '$p'))) AS BIGINT) AS n_$n"
        }.mkString(",\n  ")
        val flagged = PiiPatterns.map { case (_, p) =>
          s"len(regexp_extract_all(lower(text), '$p'))"
        }.mkString(" + ")
        s"""SELECT
           |  $sums,
           |  CAST(SUM(CASE WHEN $flagged > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_flagged
           |FROM documents""".stripMargin
      },
      "bm25_topk" ->
        s"""WITH ${bm25Ctes(tok)}
           |SELECT doc_id, round(sum(s), 6) AS score, count(*) AS n_terms
           |FROM scored GROUP BY doc_id
           |ORDER BY score DESC, doc_id
           |LIMIT $Bm25K""".stripMargin,
      "hybrid_search" ->
        s"""WITH ${bm25Ctes(tok)},
           |bm AS (
           |  SELECT doc_id, round(sum(s), 6) AS score FROM scored GROUP BY doc_id
           |  ORDER BY score DESC, doc_id LIMIT $RrfCandK),
           |bmr AS (
           |  SELECT doc_id,
           |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS brank
           |  FROM bm),
           |qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
           |vt AS (
           |  SELECT e.vec_id AS doc_id, ${graft.OracleSql.cosDist("e.embedding", "qv.qv")} AS dist
           |  FROM embeddings e, qv
           |  ORDER BY dist, doc_id LIMIT $RrfCandK),
           |vr AS (
           |  SELECT doc_id,
           |    CAST(row_number() OVER (ORDER BY dist, doc_id) AS BIGINT) AS vrank
           |  FROM vt)
           |SELECT COALESCE(vr.doc_id, bmr.doc_id) AS doc_id,
           |  COALESCE(1.0 / (CAST($RrfK AS DOUBLE) + vr.vrank), 0.0)
           |    + COALESCE(1.0 / (CAST($RrfK AS DOUBLE) + bmr.brank), 0.0) AS rrf_score,
           |  COALESCE(vr.vrank, 0) AS vrank,
           |  COALESCE(bmr.brank, 0) AS brank
           |FROM vr FULL OUTER JOIN bmr ON vr.doc_id = bmr.doc_id
           |ORDER BY rrf_score DESC, doc_id
           |LIMIT $RrfTopK""".stripMargin,
      // one shared phrase oracle: the scan and index forms are row-identical
      "phrase_search" -> phraseOracleSql(tok),
      "phrase_search_indexed" -> phraseOracleSql(tok),
      "weighted_sample" ->
        s"""WITH s AS (
           |  SELECT doc_id, n_chars,
           |    (-ln((CAST(${graft.OracleSql.saltedBucket("doc_id", WsSalt, WsMod)} + 1 AS DOUBLE)) / ${WsMod.toDouble}))
           |      / CAST(n_chars AS DOUBLE) AS sample_key
           |  FROM documents WHERE n_chars > 0)
           |SELECT doc_id, n_chars, sample_key FROM s
           |ORDER BY sample_key, doc_id
           |LIMIT $WsK""".stripMargin,
      "quality_filter" ->
        s"""WITH base AS (
           |  SELECT
           |    CAST(len($tok) AS BIGINT) AS n_tokens,
           |    ${hitsSql(langs.toMap.apply("en"))} AS n_stop,
           |    CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
           |    CAST(length(text) AS BIGINT) AS n_chars
           |  FROM documents),
           |r AS (
           |  SELECT CASE
           |    WHEN n_tokens < $MinTokens THEN 'too_short'
           |    WHEN CAST(n_stop AS DOUBLE) / n_tokens < $MinStopRatio THEN 'low_stopword'
           |    WHEN CAST(n_punct AS DOUBLE) / n_chars > $MaxPunctRatio THEN 'high_punct'
           |    ELSE 'retained' END AS reason
           |  FROM base)
           |SELECT reason, COUNT(*) AS n FROM r GROUP BY reason ORDER BY reason""".stripMargin,
    )
  }
}
