package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** Corpus-level diagnostics for training-data curation — the passes a
  * pipeline runs BETWEEN per-doc quality scoring and the final mix: global
  * vocabulary heavy hitters (sketch + exact verify), per-doc novelty
  * against the corpus boilerplate vocabulary, and the temperature-weighted
  * source mixing plan (builder brief; SURVEY.md §7.1.8).
  *
  * Cross-engine exactness follows the house recipes: integer counts and
  * single double divisions; order-free DECIMAL sums for anything float
  * that crosses an aggregation; sqrt only (IEEE-exact in both engines,
  * unlike pow).
  */
object CorpusDiagnostics {

  /** A bigram is "familiar" when ≥ [[NoveltyDf]] documents contain it —
    * the boilerplate threshold. */
  val NoveltyDf = 3

  /** Per-document novelty against the corpus's frequent-bigram vocabulary —
    * the template/boilerplate complement of pair dedup: docs whose bigrams
    * are mostly corpus-frequent are templated or derivative, docs with a
    * low familiar ratio carry novel text worth keeping.
    *
    * Scale shape: one document-frequency agg over distinct per-doc bigrams
    * (hash agg, map-side combined), the frequent set joined back WITHOUT a
    * broadcast hint: at 100 TB a df ≥ [[NoveltyDf]] cut is NOT selective,
    * so the join must not assume the frequent set fits an executor. AQE
    * size-gates it at runtime — small measured frequent sets downgrade to
    * a broadcast-hash join, large ones stay a shuffled join (the fallback
    * is the planner's measured-bytes decision, not prose; spec pins both
    * paths row-identical). Then one per-doc count agg. No windows, no
    * self-joins.
    *
    * Exactness: pure integer counts; the ratio is one unrounded double
    * division (bit-identical by construction — int/int quotients CAN
    * reach 6dp midpoints where engine round()s diverge). Docs with fewer
    * than two tokens have no bigrams and do not appear (mirrored by the
    * oracle's inner unnest). */
  def bigramNovelty(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    val bigrams = ColumnBridge.column(graft.functions.Shingles(
      ColumnBridge.expression(tokens(col("text"))), 2))
    val docBg = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(bigrams).as("bigram"))
    val frequent = docBg.groupBy("bigram").agg(count(lit(1)).as("df"))
      .filter(col("df") >= NoveltyDf)
      .select(col("bigram"), lit(1L).as("fam"))
    docBg.join(frequent, Seq("bigram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("fam"), lit(0L))).as("n_familiar"))
      .select(col("doc_id"), col("n_bigrams"), col("n_familiar"),
        // unrounded: int/int quotients reach 6dp midpoints (the
        // stupidBackoffScore hazard); the raw division is bit-identical
        (col("n_familiar").cast("double") / col("n_bigrams").cast("double"))
          .as("familiar_ratio"))
      .orderBy("doc_id")
  }

  /** Result size of [[heavyHitters]]. */
  val HeavyK = 20

  /** Misra-Gries summary capacity per partition: every token with global
    * count > N/[[MgCapacity]] is guaranteed to survive in at least one
    * partition's summary (pigeonhole over partition-local guarantees). */
  val MgCapacity = 512

  /** Exact corpus top-[[HeavyK]] tokens by occurrence via the two-pass
    * sketch-then-verify shape — the 100 TB pattern for "top terms" where a
    * full token→count shuffle is the dominant cost: pass 1 runs a
    * Misra-Gries summary per partition (driver merges only candidate
    * TOKENS, ≤ [[MgCapacity]]·partitions rows); pass 2 recounts ONLY the
    * candidate set (broadcast semi-join, hash agg over ≤ that many
    * groups) and takes the exact top-k.
    *
    * Correctness does not depend on the sketch: the MG union is a superset
    * of every token with count > N/[[MgCapacity]], so as long as the k-th
    * exact candidate count clears that bar the top-k over candidates IS the
    * global top-k; the guard re-checks the bar at runtime and falls back to
    * the full exact aggregation on pathological (near-uniform) frequency
    * distributions. Output is exact and partitioning-independent either
    * way. Ref: Misra & Gries 1982; reference surface has no sketch ops —
    * this is the scale path the builder brief asks for. */
  /** Misra-Gries summary of one token stream: the surviving candidate set
    * (≤ capacity entries) and the stream length. Invariant (the property
    * spec pins it): every token with count > n/capacity survives. */
  private[operators] def mgSummarize(it: Iterator[String],
                                     capacity: Int): (Seq[String], Long) = {
    val counts = new scala.collection.mutable.HashMap[String, Long]
    var n = 0L
    it.foreach { t =>
      n += 1
      counts.get(t) match {
        case Some(c) => counts.update(t, c + 1)
        case None if counts.size < capacity => counts.update(t, 1L)
        case None =>
          val dead = List.newBuilder[String]
          counts.mapValuesInPlace((_, c) => c - 1)
          counts.foreach { case (k, c) => if (c == 0) dead += k }
          dead.result().foreach(counts.remove)
      }
    }
    (counts.keys.toSeq, n)
  }

  def heavyHitters(spark: SparkSession, sfDir: String,
                   capacity: Int = MgCapacity): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, sfDir)
      .transform(Tables.rowParallel) // fan-out parallelism from rows, not splits
      .select(explode(tokens(col("text"))).as("token"))
    // pass 1: per-partition MG summaries; each partition also emits one
    // (null, n) row so the guard's N needs no second corpus pass
    val summary = toks.as[String].mapPartitions { it =>
      val (cands, n) = mgSummarize(it, capacity)
      cands.iterator.map(t => (t, 0L)) ++ Iterator.single((null: String, n))
    }.toDF("token", "n_part")
    summary.persist()
    try {
      val totalN = summary.filter(col("token").isNull)
        .agg(sum(col("n_part"))).head.getLong(0)
      val cands = summary.filter(col("token").isNotNull).select("token").distinct()
      val exact = toks.join(broadcast(cands), Seq("token"), "left_semi")
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(HeavyK)
        .collect() // K rows
      val safe = exact.length == HeavyK &&
        exact.last.getLong(1) > totalN / capacity
      val rows =
        if (safe) exact.toIndexedSeq
        else // pathological distribution: the bar isn't cleared — full exact agg
          toks.groupBy("token").agg(count(lit(1)).as("n"))
            .orderBy(col("n").desc, col("token").asc)
            .limit(HeavyK).collect().toIndexedSeq
      spark.createDataFrame(rows.map(r => (r.getString(0), r.getLong(1))))
        .toDF("token", "n")
    } finally summary.unpersist()
  }

  /** Sqrt-temperature mixing exponent note: α = 0.5 (multilingual-BERT /
    * XLM-style temperature sampling with T = 2). sqrt is the one power
    * IEEE-754 requires correctly rounded — `pow(x, 0.7)` is NOT bit-pinned
    * across engines, sqrt is. */
  val MixKeepDivisor = 2

  /** Temperature-weighted source mixing plan — the pass that turns raw
    * per-source corpus mass into training-mix target counts: source weight
    * ∝ sqrt(char mass) (temperature sampling flattens the head so
    * low-resource sources aren't drowned; Conneau & Lample 2019, public),
    * normalized into shares, then integer per-source document targets for
    * a corpus budget of total/[[MixKeepDivisor]] docs. Feed the targets to
    * the salted-hash pickers ([[TextAnalysis.corpusMix]] /
    * [[SimilarityQueries.clusterSample]]) to materialize the mix.
    *
    * Scale shape: one |sources|-group hash agg + one broadcast of the
    * 1-row total — nothing corpus-sized moves.
    *
    * Exactness: char masses are exact BIGINT sums; sqrt is IEEE-exact;
    * the 9dp-rounded weights sum as DECIMAL (order-free); share is one
    * unrounded double division (bit-identical by construction); targets
    * are floor over identical doubles. */
  def temperatureMix(spark: SparkSession, sfDir: String): DataFrame = {
    val m = Tables.documents(spark, sfDir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("char_mass"))
      .select(col("source"), col("n_docs"), col("char_mass"),
        round(sqrt(col("char_mass").cast("double")), 9).as("w"))
    val tot = m.agg(
      sum(col("w").cast("decimal(28,9)")).cast("double").as("tw"),
      sum(col("n_docs")).as("nd"))
    m.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("char_mass"),
        // share stays UNROUNDED: w and tw are identical doubles on both
        // engines, so the single division is bit-identical — while
        // round(w/tw, 6) could diverge at a reachable decimal midpoint
        // and flip the discrete floor() below (see stupidBackoffScore)
        (col("w") / col("tw")).as("share"),
        floor((col("w") / col("tw")) *
          floor(col("nd") / MixKeepDivisor)).cast("long").as("target_docs"))
      .orderBy("source")
  }

  /** Per-source KL divergence against the whole-corpus unigram
    * distribution — the domain-drift / mixture-health diagnostic run
    * before re-weighting sources (the distribution-shift counterpart of
    * [[graft.operators.TextAnalysis.dsirWeights]], and the monitoring pass
    * that catches a crawl source going off-distribution between dumps):
    * KL(P_src ‖ P_corpus) = Σ_b p_sb·ln(p_sb/q_b) over the same
    * [[TextAnalysis.DsirBuckets]] hashed-unigram buckets DSIR uses, with
    * add-one smoothing on both sides so empty buckets stay finite.
    *
    * Scale shape: corpus-sized work is ONE tokenize+bucket pass feeding
    * ONE (source × bucket) hash agg (map-side combined); the per-bucket /
    * per-source / grand-total rollups are WINDOW sums over that densified
    * |sources|·B-row grid, so NOTHING source-cardinality-sized ever
    * reaches the driver — a URL- or domain-level source column stays a
    * distributed relation end to end (unlike the fixed-size centroid/
    * codebook collects the bounded-collect contract covers). Exactness:
    * integer counts, each term is p·ln(p/q) in fixed op order,
    * 9dp-rounded into order-free DECIMAL sums. */
  def sourceDivergence(spark: SparkSession, sfDir: String): DataFrame = {
    import TextAnalysis.DsirBuckets
    val bucketed = Tables.documents(spark, sfDir)
      .transform(Tables.rowParallel)
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .select(col("source"),
        (graft.functions.md5_long(col("token")) % DsirBuckets).as("bucket"))
    val perSrcB = bucketed.groupBy("source", "bucket").agg(count(lit(1)).as("csb"))
    // densify to the full source × bucket grid (add-one smoothing needs
    // the EMPTY cells); the source list comes from a column-pruned
    // documents scan, never a second tokenize pass
    val srcs = Tables.documents(spark, sfDir).select("source").distinct()
    val grid = srcs
      .crossJoin(spark.range(DsirBuckets).select(col("id").as("bucket")))
      .join(perSrcB, Seq("source", "bucket"), "left").na.fill(0L, Seq("csb"))
    // rollups as window sums over the grid: perSrcB appears ONCE in the
    // plan, so the corpus is tokenized exactly once (the naive
    // three-agg form re-planned the scan per rollup; the old driver
    // rebuild fixed that at the cost of a |sources|·B driver collect).
    // The empty-frame total window funnels the grid through one
    // partition — |sources|·B rows, executor-side and spill-safe, the
    // same volume the driver previously held in memory
    val wAll = Window.partitionBy()
    val counted = grid.select(col("source"), col("csb"),
      sum(col("csb")).over(Window.partitionBy("bucket")).as("cb"),
      sum(col("csb")).over(Window.partitionBy("source")).as("ts"),
      sum(col("csb")).over(wAll).cast("double").as("t"))
    val b = lit(DsirBuckets.toDouble)
    val p = (col("csb") + lit(1L)).cast("double") / (col("ts").cast("double") + b)
    val q = (col("cb") + lit(1L)).cast("double") / (col("t") + b)
    counted
      // the source universe is TOKEN-derived (matching the oracle's
      // rollup over tokenized rows): a source whose docs yield zero
      // tokens contributes no distribution to diverge
      .filter(col("ts") > 0L)
      .select(col("source"), col("ts"),
        round(p * log(p / q), 9).cast("decimal(28,9)").as("term"))
      .groupBy("source", "ts")
      .agg(sum(col("term")).as("klsum"))
      .select(col("source"), col("ts").as("n_tokens"),
        col("klsum").cast("double").as("kl"))
      .orderBy("source")
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bigram_novelty" -> ((s, d) => bigramNovelty(s, d)),
    "heavy_hitters" -> ((s, d) => heavyHitters(s, d)),
    "source_divergence" -> ((s, d) => sourceDivergence(s, d)),
    "temperature_mix" -> ((s, d) => temperatureMix(s, d)))

  def oracles: Map[String, String] = {
    val tok = """string_split_regex(trim(text), '\s+')"""
    val B = TextAnalysis.DsirBuckets
    val pExpr = s"((CAST(COALESCE(ps.csb, 0) + 1 AS DOUBLE)) / (CAST(g.ts AS DOUBLE) + $B.0))"
    val qExpr = s"((CAST(COALESCE(pb.cb, 0) + 1 AS DOUBLE)) / (t.t + $B.0))"
    Map(
      "source_divergence" ->
        s"""WITH tk AS (
           |  SELECT source, ${graft.OracleSql.md5Long("token")} % $B AS bucket
           |  FROM (SELECT source, unnest($tok) AS token FROM documents)),
           |ps AS (SELECT source, bucket, count(*) AS csb FROM tk GROUP BY 1, 2),
           |pb AS (SELECT bucket, count(*) AS cb FROM tk GROUP BY 1),
           |st AS (SELECT source, count(*) AS ts FROM tk GROUP BY 1),
           |t AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM tk),
           |g AS (SELECT st.source, st.ts, gs.b AS bucket
           |  FROM st, (SELECT unnest(generate_series(0, ${B - 1})) AS b) gs),
           |terms AS (
           |  SELECT g.source, g.ts,
           |    CAST(round($pExpr * ln($pExpr / $qExpr), 9) AS DECIMAL(28,9)) AS term
           |  FROM g
           |  LEFT JOIN ps ON g.source = ps.source AND g.bucket = ps.bucket
           |  LEFT JOIN pb ON g.bucket = pb.bucket, t)
           |SELECT source, ts AS n_tokens, CAST(sum(term) AS DOUBLE) AS kl
           |FROM terms GROUP BY source, ts
           |ORDER BY source""".stripMargin,
      "bigram_novelty" ->
        s"""WITH tk AS (SELECT doc_id, $tok AS t FROM documents),
           |bg AS (
           |  SELECT doc_id, unnest(list_distinct(
           |    [t[i] || ' ' || t[i+1] FOR i IN generate_series(1, len(t)-1)]
           |  )) AS bigram FROM tk),
           |freq AS (
           |  SELECT bigram FROM bg GROUP BY 1 HAVING count(*) >= $NoveltyDf)
           |SELECT bg.doc_id,
           |  count(*) AS n_bigrams,
           |  CAST(sum(CASE WHEN f.bigram IS NULL THEN 0 ELSE 1 END) AS BIGINT)
           |    AS n_familiar,
           |  CAST(sum(CASE WHEN f.bigram IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
           |    / count(*) AS familiar_ratio
           |FROM bg LEFT JOIN freq f ON bg.bigram = f.bigram
           |GROUP BY 1 ORDER BY 1""".stripMargin,
      // the sketch is a candidate generator only — the answer is the exact
      // top-k, which the oracle states directly
      "heavy_hitters" ->
        s"""SELECT token, count(*) AS n
           |FROM (SELECT unnest($tok) AS token FROM documents)
           |GROUP BY 1 ORDER BY n DESC, token LIMIT $HeavyK""".stripMargin,
      "temperature_mix" ->
        s"""WITH m AS (
           |  SELECT source, count(*) AS n_docs,
           |    CAST(sum(n_chars) AS BIGINT) AS char_mass
           |  FROM documents GROUP BY 1),
           |w AS (SELECT *, round(sqrt(CAST(char_mass AS DOUBLE)), 9) AS w FROM m),
           |t AS (SELECT CAST(SUM(CAST(w AS DECIMAL(28,9))) AS DOUBLE) AS tw,
           |  CAST(SUM(n_docs) AS BIGINT) AS nd FROM w)
           |SELECT source, n_docs, char_mass,
           |  w / tw AS share,
           |  CAST(floor(w / tw * floor(nd / $MixKeepDivisor)) AS BIGINT)
           |    AS target_docs
           |FROM w, t ORDER BY source""".stripMargin)
  }
}
