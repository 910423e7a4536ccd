package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.util.Timing.timeIt

/** Index-time BM25 corpus statistics — the sidecar the inline
  * [[graft.operators.TextAnalysis.bm25TopK]] scan family promotes to, so a
  * query stops re-scanning the corpus for doc lengths / df / avgdl (the
  * posting-list layout every lexical engine builds once and serves many
  * times; same lifecycle as the IVF sidecars: build → mtime fingerprint →
  * rebuild on staleness).
  *
  * Layout at `indexPath/`:
  *  - `postings/` — (token, doc_id, tf, dl), Hive-partitioned on
  *    `bucket = pmod(xxhash64(token), Buckets)`: a query's terms hash to
  *    ≤ |terms| buckets, so the read prunes to those directories and the
  *    token equality predicate pushes into parquet. `dl` is DENORMALIZED
  *    into the posting row at build time — the one corpus-sized join
  *    (postings ⋈ doclen) happens once here, never per query.
  *  - `df/` — (token, df), same bucket partitioning.
  *  - `doclen/` — (doc_id, dl), kept for reuse/inspection.
  *  - `stats/` — one row (n, ntok, avgdl).
  *
  * Scoring arithmetic is kept IDENTICAL to the inline form (and hence the
  * DuckDB oracle): integer tf/dl/df counts, one `log`, left-associated
  * double ops, 6dp-rounded sum.
  */
object Bm25Index {

  /** Posting-partition fanout. 32 keeps directory counts trivial while a
    * query still prunes to ≤ |query terms| directories. */
  val Buckets = 32

  private def bucketOf(tokenCol: org.apache.spark.sql.Column) =
    pmod(xxhash64(tokenCol), lit(Buckets)).cast("int")

  // explicit read schemas: an EMPTY partitioned sidecar (index built before
  // any data arrived, e.g. under streaming maintenance) has no files to
  // infer from — schema-less reads would throw
  import org.apache.spark.sql.types._
  private val PostingsSchema = StructType(Seq(
    StructField("token", StringType), StructField("doc_id", LongType),
    StructField("tf", LongType), StructField("dl", LongType),
    StructField("bucket", IntegerType)))
  private val DfSchema = StructType(Seq(
    StructField("token", StringType), StructField("df", DoubleType),
    StructField("bucket", IntegerType)))
  private val PositionsSchema = StructType(Seq(
    StructField("token", StringType), StructField("doc_id", LongType),
    StructField("pos", LongType), StructField("bucket", IntegerType)))

  /** One corpus scan → all five sidecars (positions included: phrase
    * queries are index consumers too — see [[phraseSearch]]). */
  def build(docs: DataFrame, indexPath: String, idCol: String = "doc_id",
            textCol: String = "text"): Unit = timeIt("bm25_build") {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).as("doc_id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "token")))
      .select(col("token"), col("doc_id"), col("pos").cast("long").as("pos"))
      .withColumn("bucket", bucketOf(col("token")))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$indexPath/positions")
    // ONE corpus tokenize: doclen and postings re-derive from the
    // just-written positions sidecar (the dlStored read-back pattern)
    // instead of re-running the explode+split per consumer
    val tok = spark.read.schema(PositionsSchema).parquet(s"$indexPath/positions")
      .select(col("doc_id"), col("token"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    dl.write.mode("overwrite").parquet(s"$indexPath/doclen")
    val dlStored = spark.read.parquet(s"$indexPath/doclen")
    val postings = tok.groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
      .join(dlStored, "doc_id") // denormalize dl once, at build time
      .withColumn("bucket", bucketOf(col("token")))
      .persist() // one tokenize pass serves the postings write AND df
    try {
      postings.write.mode("overwrite").partitionBy("bucket").parquet(s"$indexPath/postings")
      postings.groupBy("token").agg(count(lit(1)).cast("double").as("df"))
        .withColumn("bucket", bucketOf(col("token")))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$indexPath/df")
    } finally postings.unpersist()
    // n counts ALL docs (BM25's idf numerator), including null/empty-text
    // rows that produce no doclen entry — same as the oracle's COUNT(*).
    // Null-safe sum: an empty corpus (index created before data arrives,
    // as under streaming maintenance) must build, not NPE like a sum over
    // zero rows would.
    val nDocs = docs.count().toDouble
    val nTok = Option(dlStored.agg(sum(col("dl"))).head().get(0))
      .map(_.asInstanceOf[Long].toDouble).getOrElse(0.0)
    writeStats(spark, indexPath, nDocs, nTok)
  }

  private def writeStats(spark: SparkSession, indexPath: String,
                         nDocs: Double, nTok: Double): Unit = {
    import spark.implicits._
    // stash→publish swap, not overwrite-in-place: append() rewrites stats
    // per micro-batch under streaming maintenance, and a racing topK must
    // never observe a missing/partial stats row
    graft.util.FsOps.swapDir(spark.sessionState.newHadoopConf(),
      new org.apache.hadoop.fs.Path(s"$indexPath/stats")) { (_, staging) =>
      Seq((nDocs, nTok, if (nDocs == 0.0) 0.0 else nTok / nDocs))
        .toDF("n", "ntok", "avgdl")
        .coalesce(1).write.parquet(staging)
    }
  }

  /** Incremental maintenance — the batch analog of new documents arriving
    * after `CREATE INDEX` (mirrors [[IvfIndex.append]]): tokenize ONLY the
    * new docs, append their doclen + posting rows, then rebuild the two
    * DERIVED sidecars (df, stats) from the postings/doclen datasets —
    * index-sized inputs, never the corpus. Caller must not reuse doc_ids
    * (same contract as the ANN appends). avgdl legitimately shifts: BM25
    * normalizes against the CURRENT corpus, so post-append scores equal a
    * full rebuild's — pinned bit-exact in Bm25IndexSpec. */
  def append(newDocs: DataFrame, indexPath: String, idCol: String = "doc_id",
             textCol: String = "text"): Unit = timeIt("bm25_append") {
    val spark = newDocs.sparkSession
    import spark.implicits._
    val tokP = newDocs.select(col(idCol).as("doc_id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "token")))
    // only extend a positions sidecar that EXISTS: appending to a
    // pre-positions (catalog-restored) index would create a partial
    // positions/ that flips hasPositions and silently defeats the
    // phrase-search scan fallback with match counts missing every
    // pre-restore doc
    if (hasPositions(spark, indexPath)) {
      tokP.select(col("token"), col("doc_id"), col("pos").cast("long").as("pos"))
        .withColumn("bucket", bucketOf(col("token")))
        .write.mode("append").partitionBy("bucket").parquet(s"$indexPath/positions")
    }
    val tok = tokP.select(col("doc_id"), col("token"))
    val dlNew = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      .persist() // one execution across the two appends
    val addTok =
      try {
        dlNew.write.mode("append").parquet(s"$indexPath/doclen")
        tok.groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
          .join(dlNew, "doc_id")
          .withColumn("bucket", bucketOf(col("token")))
          .write.mode("append").partitionBy("bucket").parquet(s"$indexPath/postings")
        Option(dlNew.agg(sum(col("dl"))).head().get(0))
          .map(_.asInstanceOf[Long].toDouble).getOrElse(0.0)
      } finally dlNew.unpersist()
    // df recomputed from the postings dataset (index-sized, not corpus-
    // sized), published via the atomic swap so a concurrent topK never
    // reads a half-written df sidecar mid-append
    graft.util.FsOps.swapDir(spark.sessionState.newHadoopConf(),
      new org.apache.hadoop.fs.Path(s"$indexPath/df")) { (_, staging) =>
      spark.read.schema(PostingsSchema).parquet(s"$indexPath/postings")
        .groupBy("token").agg(count(lit(1)).cast("double").as("df"))
        .withColumn("bucket", bucketOf(col("token")))
        .write.partitionBy("bucket").parquet(staging)
    }
    // stats INCREMENT from the stored values: n must keep counting ALL
    // docs (build counts null-text rows that have no doclen entry, and so
    // must append — recounting doclen would silently shrink n and drift
    // idf/avgdl away from a full rebuild's); integer-valued doubles add
    // exactly, so post-append stats stay bit-equal to a rebuild
    val old = spark.read.parquet(s"$indexPath/stats").head()
    writeStats(spark, indexPath,
      old.getAs[Double]("n") + newDocs.count().toDouble,
      old.getAs[Double]("ntok") + addTok)
  }

  /** Small-file maintenance — [[IvfIndex.compact]]'s lexical counterpart:
    * streamed appends fragment the posting buckets and doclen; rewrite
    * both coalesced (one file per bucket / capped doclen files) with the
    * same atomic stash → publish → delete swap. df/stats are tiny
    * already-coalesced rewrites. Returns (files before, files after) over
    * postings + doclen. */
  def compact(spark: SparkSession, indexPath: String): (Int, Int) =
    timeIt("bm25_compact") {
      import graft.util.FsOps
      val conf = spark.sessionState.newHadoopConf()
      val postings = new org.apache.hadoop.fs.Path(s"$indexPath/postings")
      val doclen = new org.apache.hadoop.fs.Path(s"$indexPath/doclen")
      val positions = new org.apache.hadoop.fs.Path(s"$indexPath/positions")
      val withPos = hasPositions(spark, indexPath)
      def files() = FsOps.countParquetFiles(conf, postings) +
        FsOps.countParquetFiles(conf, doclen) +
        (if (withPos) FsOps.countParquetFiles(conf, positions) else 0)
      val nBefore = files()
      FsOps.swapDir(conf, postings) { (live, staging) =>
        spark.read.schema(PostingsSchema).parquet(live)
          .repartition(col("bucket"))
          .write.partitionBy("bucket").parquet(staging)
      }
      FsOps.swapDir(conf, doclen) { (live, staging) =>
        spark.read.parquet(live).coalesce(4).write.parquet(staging)
      }
      // positions fragments FASTEST under streamed appends (one file-set
      // per trigger per bucket) and is the largest sidecar — same
      // one-file-per-bucket rewrite as postings
      if (withPos) FsOps.swapDir(conf, positions) { (live, staging) =>
        spark.read.schema(PositionsSchema).parquet(live)
          .repartition(col("bucket"))
          .write.partitionBy("bucket").parquet(staging)
      }
      (nBefore, files())
    }

  /** BM25 top-k over the sidecar: reads ONLY the query terms' posting
    * buckets + the one-row stats — never the corpus. Bit-exact with the
    * inline scan form (same counts, same expression tree). */
  /** The per-(doc, matched term) BM25 contribution relation for a term
    * set — the stage [[topK]] and [[topKMany]] share: bucket-pruned
    * postings + df reads, broadcast df, one codegen'd score expression. */
  private def scoredTerms(spark: SparkSession, indexPath: String,
                          terms: Seq[String], k1: Double, b: Double): DataFrame = {
    import spark.implicits._
    // bucket ids for the query terms — computed with the SAME xxhash64 the
    // build used, via a tiny local job (driver-side reimplementation would
    // risk drifting from Spark's seed/byte order)
    val buckets = terms.toDS()
      .select(bucketOf(col("value"))).as[Int].collect().distinct.toIndexedSeq
    val stats = spark.read.parquet(s"$indexPath/stats").head()
    val n = stats.getAs[Double]("n")
    val avgdl = stats.getAs[Double]("avgdl")
    val dfTab = spark.read.schema(DfSchema).parquet(s"$indexPath/df")
      .filter(col("bucket").isin(buckets: _*) && col("token").isin(terms: _*))
      .select("token", "df")
    val postings = spark.read.schema(PostingsSchema).parquet(s"$indexPath/postings")
      .filter(col("bucket").isin(buckets: _*) && col("token").isin(terms: _*))
    val idf = log((lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val tfD = col("tf").cast("double")
    val dlD = col("dl").cast("double")
    val termScore = idf * (tfD * (lit(k1) + lit(1.0))) /
      (tfD + lit(k1) * (lit(1.0) - lit(b) + lit(b) * dlD / lit(avgdl)))
    postings.join(broadcast(dfTab), "token")
      .select(col("doc_id"), col("token"), termScore.as("s"))
  }

  def topK(spark: SparkSession, indexPath: String, query: Seq[String],
           k: Int, k1: Double, b: Double): DataFrame =
    scoredTerms(spark, indexPath, query, k1, b)
      .groupBy("doc_id")
      .agg(round(sum(col("s")), 6).as("score"), count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)

  /** Many-query BM25 in one distributed pass — the serving form
    * ([[graft.streaming.StreamingIngest.startBm25Serving]]): the batch's
    * distinct term set prunes ONE postings read (batch-sized collect —
    * query strings, never corpus), each query's terms join the shared
    * contribution relation, and the per-query top-k comes out of the
    * bounded-heap [[graft.functions.top_k_by_distance]] aggregate (score
    * negated into the ascending heap) — ≤ k·|partitions| rows per query
    * shuffle, never a corpus-sized window. Ranking matches [[topK]]:
    * 6dp-rounded score DESC, doc_id tie-break. */
  def topKMany(spark: SparkSession, indexPath: String, queries: DataFrame,
               qidCol: String, textCol: String, k: Int,
               k1: Double, b: Double): DataFrame = {
    import spark.implicits._
    // distinct on (qid, token), not just per-row: a qid appearing on
    // several input rows must score the UNION of its terms once each —
    // duplicate pairs would silently double term contributions
    val qt = queries.select(col(qidCol).as("qid"),
      explode(array_distinct(tokens(col(textCol)))).as("token"))
      .distinct()
    val terms = qt.select("token").distinct().as[String].collect().toSeq
    qt.join(scoredTerms(spark, indexPath, terms, k1, b), "token")
      .groupBy("qid", "doc_id")
      .agg(round(sum(col("s")), 6).as("score"))
      .groupBy("qid")
      .agg(graft.functions.top_k_by_distance(-col("score"), col("doc_id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rank"),
        col("t.vec_id").as("doc_id"), (-col("t.dist")).as("score"))
      .orderBy("qid", "rank")
  }

  /** True iff this index carries the positional sidecar (indexes restored
    * from a pre-positions catalog may not; callers fall back to the scan
    * path). */
  def hasPositions(spark: SparkSession, indexPath: String): Boolean = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(s"$indexPath/positions")
    // at least one COMMITTED parquet file, not bare path existence: a
    // directory left empty/partial by a failed build or compact would
    // otherwise flip phrase queries onto the index path and silently
    // return zero matches instead of falling back to the exact scan form
    // (first-hit listing — this runs per phrase query)
    graft.util.FsOps.hasParquetFile(conf, p)
  }

  /** Exact-phrase match counts from the positional sidecar — the index
    * path of [[graft.operators.TextAnalysis.phraseSearch]]: the read
    * prunes to the phrase terms' bucket directories (same directory-
    * pruning economics as [[topK]] — each term's postings are Zipf-
    * bounded, never the corpus), each term's (doc_id, pos) stream is
    * re-based by its offset in the phrase, and an equi-join chain on
    * (doc_id, base) leaves exactly one row per full match start. */
  def phraseSearch(spark: SparkSession, indexPath: String,
                   phrase: Seq[String]): DataFrame = {
    import spark.implicits._
    require(phrase.nonEmpty, "phrase must have at least one term")
    val terms = phrase.distinct
    val buckets = terms.toDS()
      .select(bucketOf(col("value"))).as[Int].collect().distinct.toIndexedSeq
    val pos = spark.read.schema(PositionsSchema).parquet(s"$indexPath/positions")
      .filter(col("bucket").isin(buckets: _*) && col("token").isin(terms: _*))
    val parts = phrase.zipWithIndex.map { case (w, j) =>
      pos.filter(col("token") === w).select(col("doc_id"), (col("pos") - lit(j.toLong)).as("base"))
    }
    parts.reduce((a, b) => a.join(b, Seq("doc_id", "base")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_matches"))
      .orderBy("doc_id")
  }
}
