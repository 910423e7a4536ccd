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

  /** One corpus scan → all four sidecars. */
  def build(docs: DataFrame, indexPath: String, idCol: String = "doc_id",
            textCol: String = "text"): Unit = timeIt("bm25_build") {
    val spark = docs.sparkSession
    import spark.implicits._
    val tok = docs.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("token"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    dl.write.mode("overwrite").parquet(s"$indexPath/doclen")
    val dlStored = spark.read.parquet(s"$indexPath/doclen")
    tok.groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
      .join(dlStored, "doc_id") // denormalize dl once, at build time
      .withColumn("bucket", bucketOf(col("token")))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$indexPath/postings")
    spark.read.parquet(s"$indexPath/postings")
      .groupBy("token").agg(count(lit(1)).cast("double").as("df"))
      .withColumn("bucket", bucketOf(col("token")))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$indexPath/df")
    val nDocs = docs.count().toDouble
    val nTok = dlStored.agg(sum(col("dl"))).head().getLong(0).toDouble
    Seq((nDocs, nTok, nTok / nDocs)).toDF("n", "ntok", "avgdl")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/stats")
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
    val tok = newDocs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("token"))
    val dlNew = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      .persist() // one execution across the two appends
    try {
      dlNew.write.mode("append").parquet(s"$indexPath/doclen")
      tok.groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
        .join(dlNew, "doc_id")
        .withColumn("bucket", bucketOf(col("token")))
        .write.mode("append").partitionBy("bucket").parquet(s"$indexPath/postings")
    } finally dlNew.unpersist()
    // derived sidecars: recomputed from the index datasets (reads postings/
    // doclen, writes df/stats — distinct paths, safe to overwrite)
    spark.read.parquet(s"$indexPath/postings")
      .groupBy("token").agg(count(lit(1)).cast("double").as("df"))
      .withColumn("bucket", bucketOf(col("token")))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$indexPath/df")
    val dl = spark.read.parquet(s"$indexPath/doclen")
      .agg(count(lit(1)).cast("double"), sum(col("dl")).cast("double")).head()
    val (nDocs, nTok) = (dl.getDouble(0), dl.getDouble(1))
    Seq((nDocs, nTok, nTok / nDocs)).toDF("n", "ntok", "avgdl")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/stats")
  }

  /** BM25 top-k over the sidecar: reads ONLY the query terms' posting
    * buckets + the one-row stats — never the corpus. Bit-exact with the
    * inline scan form (same counts, same expression tree). */
  def topK(spark: SparkSession, indexPath: String, query: Seq[String],
           k: Int, k1: Double, b: Double): DataFrame = {
    import spark.implicits._
    // bucket ids for the query terms — computed with the SAME xxhash64 the
    // build used, via a tiny local job (driver-side reimplementation would
    // risk drifting from Spark's seed/byte order)
    val buckets = query.toDS()
      .select(bucketOf(col("value"))).as[Int].collect().distinct.toIndexedSeq
    val stats = spark.read.parquet(s"$indexPath/stats").head()
    val n = stats.getAs[Double]("n")
    val avgdl = stats.getAs[Double]("avgdl")
    val dfTab = spark.read.parquet(s"$indexPath/df")
      .filter(col("bucket").isin(buckets: _*) && col("token").isin(query: _*))
      .select("token", "df")
    val postings = spark.read.parquet(s"$indexPath/postings")
      .filter(col("bucket").isin(buckets: _*) && col("token").isin(query: _*))
    val idf = log((lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val tfD = col("tf").cast("double")
    val dlD = col("dl").cast("double")
    val termScore = idf * (tfD * (lit(k1) + lit(1.0))) /
      (tfD + lit(k1) * (lit(1.0) - lit(b) + lit(b) * dlD / lit(avgdl)))
    postings.join(broadcast(dfTab), "token")
      .select(col("doc_id"), termScore.as("s"))
      .groupBy("doc_id")
      .agg(round(sum(col("s")), 6).as("score"), count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
