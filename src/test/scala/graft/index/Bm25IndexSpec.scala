package graft.index

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions.tokens
import graft.operators.TextAnalysis

class Bm25IndexSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-sidecar inline scan form — the reference implementation the
    * sidecar must reproduce bit-for-bit. */
  private def inlineBm25(sfDir: String, k: Int): Seq[(Long, Double, Long)] = {
    val docs = graft.Tables.documents(spark, sfDir)
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val n = docs.agg(count(lit(1)).cast("double").as("n"))
    val avgdl = tok.agg(count(lit(1)).cast("double").as("ntok")).crossJoin(n)
      .select((col("ntok") / col("n")).as("avgdl"), col("n"))
    val qtf = tok.filter(col("token").isin(TextAnalysis.Bm25Query: _*))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = qtf.groupBy("token").agg(count(lit(1)).cast("double").as("df"))
    val idf = log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val tfD = col("tf").cast("double")
    val dlD = col("dl").cast("double")
    val termScore = idf * (tfD * (lit(TextAnalysis.Bm25K1) + lit(1.0))) /
      (tfD + lit(TextAnalysis.Bm25K1) *
        (lit(1.0) - lit(TextAnalysis.Bm25B) + lit(TextAnalysis.Bm25B) * dlD / col("avgdl")))
    qtf.join(dl, "doc_id").join(broadcast(df), "token").crossJoin(broadcast(avgdl))
      .select(col("doc_id"), termScore.as("s"))
      .groupBy("doc_id")
      .agg(round(sum(col("s")), 6).as("score"), count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
  }

  test("sidecar BM25 equals the inline scan form bit-for-bit") {
    val got = TextAnalysis.bm25TopK(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got === inlineBm25(Sf001, TextAnalysis.Bm25K))
  }

  test("query reads only the query terms' posting buckets (partition pruning)") {
    val idxPath = TextAnalysis.bm25IndexFor(spark, Sf001)
    val df = Bm25Index.topK(spark, idxPath, TextAnalysis.Bm25Query,
      10, TextAnalysis.Bm25K1, TextAnalysis.Bm25B)
    val scans = fileScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty)
    val postingsScan = scans.find(_.relation.location.rootPaths.exists(
      _.toString.contains("postings"))).get
    // ≤ 3 query terms → ≤ 3 of the 32 bucket directories read
    val parts = postingsScan.relation.location
      .listFiles(postingsScan.partitionFilters, postingsScan.dataFilters)
    assert(parts.length <= TextAnalysis.Bm25Query.length,
      s"expected ≤${TextAnalysis.Bm25Query.length} posting buckets, " +
        s"got ${parts.length}")
  }

  test("positional phrase search: pruned to the phrase's buckets, equals scan form") {
    val idxPath = TextAnalysis.bm25IndexFor(spark, Sf001)
    assert(Bm25Index.hasPositions(spark, idxPath))
    val df = Bm25Index.phraseSearch(spark, idxPath, TextAnalysis.PhraseTerms)
    val scans = fileScans(df.queryExecution.executedPlan)
    val posScans = scans.filter(_.relation.location.rootPaths.exists(
      _.toString.contains("positions")))
    assert(posScans.nonEmpty, "phrase search must read the positional sidecar")
    posScans.foreach { s =>
      val parts = s.relation.location.listFiles(s.partitionFilters, s.dataFilters)
      assert(parts.length <= TextAnalysis.PhraseTerms.distinct.length,
        s"expected ≤${TextAnalysis.PhraseTerms.distinct.length} position buckets, " +
          s"got ${parts.length}")
    }
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val scan = TextAnalysis.phraseSearch(spark, Sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.nonEmpty && got === scan)
  }

  test("append equals full rebuild bit-for-bit (postings, stats, scores)") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, Sf0001).select("doc_id", "text")
    val incremental = graft.util.TempDirs
      .create("graft_bm25_inc").resolve("idx").toString
    val full = graft.util.TempDirs
      .create("graft_bm25_full").resolve("idx").toString
    Bm25Index.build(docs.filter(col("doc_id") < 250), incremental)
    Bm25Index.append(docs.filter(col("doc_id") >= 250), incremental)
    Bm25Index.build(docs, full)
    def top(p: String) = Bm25Index.topK(spark, p, TextAnalysis.Bm25Query,
        10, TextAnalysis.Bm25K1, TextAnalysis.Bm25B)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(top(incremental) === top(full),
      "post-append scores must equal a full rebuild (BM25 normalizes " +
        "against the CURRENT corpus stats)")
    def stats(p: String) = spark.read.parquet(s"$p/stats")
      .head() match { case r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)) }
    assert(stats(incremental) === stats(full))
    def postings(p: String) = spark.read.parquet(s"$p/postings")
      .orderBy("token", "doc_id")
      .collect().map(r => (r.getAs[String]("token"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("tf"), r.getAs[Long]("dl"))).toSeq
    assert(postings(incremental) === postings(full))
    // the fifth sidecar appends too: positional rows and the phrase
    // query they serve must equal a full rebuild's
    def positions(p: String) = spark.read.parquet(s"$p/positions")
      .orderBy("token", "doc_id", "pos")
      .collect().map(r => (r.getAs[String]("token"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("pos"))).toSeq
    assert(positions(incremental) === positions(full))
    def phrase(p: String) = Bm25Index.phraseSearch(spark, p, TextAnalysis.PhraseTerms)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val ph = phrase(incremental)
    assert(ph.nonEmpty && ph === phrase(full))
  }

  test("topKMany equals per-query topK; streaming BM25 serving resolves a query batch") {
    import org.apache.spark.sql.functions._
    import graft.streaming.StreamingIngest
    val spark2 = spark; import spark2.implicits._
    val idxPath = TextAnalysis.bm25IndexFor(spark, Sf001)
    val queries = Seq(
      (0L, TextAnalysis.Bm25Query.mkString(" ")),
      (1L, "table scan fast")).toDF("qid", "qtext")
    val many = Bm25Index.topKMany(spark, idxPath, queries, "qid", "qtext",
        10, TextAnalysis.Bm25K1, TextAnalysis.Bm25B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // each qid's ranking equals the single-query form's (score, doc_id)
    for ((qid, text) <- Seq((0L, TextAnalysis.Bm25Query), (1L, Seq("table", "scan", "fast")))) {
      val single = Bm25Index.topK(spark, idxPath, text, 10,
          TextAnalysis.Bm25K1, TextAnalysis.Bm25B)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val got = many.filter(_._1 == qid).sortBy(_._2).map(t => (t._3, t._4)).toSeq
      assert(got === single, s"qid $qid diverged")
    }
    // e2e: the same batch through the streaming serving path
    val src = graft.util.TempDirs.create("bm25_src").resolve("q").toString
    val out = graft.util.TempDirs.create("bm25_out").resolve("r").toString
    queries.coalesce(1).write.parquet(src)
    val q = StreamingIngest.startBm25Serving(spark, src, queries.schema,
      idxPath, out, 10, TextAnalysis.Bm25K1, TextAnalysis.Bm25B)
    q.awaitTermination(120000)
    val served = spark.read.parquet(out)
      .select("qid", "rank", "doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted
    assert(served.toSeq === many.sorted.toSeq)
  }

  test("append onto a pre-positions index skips positions; phrase falls back to scan") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, Sf0001).select("doc_id", "text")
    val idx = graft.util.TempDirs
      .create("graft_bm25_nopos").resolve("idx").toString
    Bm25Index.build(docs.filter(col("doc_id") < 250), idx)
    // simulate a catalog-restored pre-positions sidecar
    val conf = spark.sessionState.newHadoopConf()
    val posPath = new org.apache.hadoop.fs.Path(s"$idx/positions")
    posPath.getFileSystem(conf).delete(posPath, true)
    assert(!Bm25Index.hasPositions(spark, idx))
    Bm25Index.append(docs.filter(col("doc_id") >= 250), idx)
    // a partial positions dir would flip hasPositions and serve phrase
    // counts missing every pre-restore doc — append must NOT create one
    assert(!Bm25Index.hasPositions(spark, idx))
  }

  test("null-text docs: append still equals full rebuild (n counts ALL docs)") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (0L, "vector hash join"), (1L, null.asInstanceOf[String]),
      (2L, "hash table scan"), (3L, null.asInstanceOf[String]),
      (4L, "join vector vector"))
      .toDF("doc_id", "text")
    val inc = graft.util.TempDirs
      .create("graft_bm25_null_inc").resolve("idx").toString
    val full = graft.util.TempDirs
      .create("graft_bm25_null_full").resolve("idx").toString
    Bm25Index.build(docs.filter(col("doc_id") < 2), inc)
    Bm25Index.append(docs.filter(col("doc_id") >= 2), inc)
    Bm25Index.build(docs, full)
    def stats(p: String) = spark.read.parquet(s"$p/stats").head() match {
      case r => (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    }
    assert(stats(inc) === stats(full),
      "n must count null-text docs identically on both paths")
    assert(stats(full)._1 === 5.0)
    def top(p: String) = Bm25Index.topK(spark, p, Seq("vector", "hash", "join"),
      10, 1.2, 0.75).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top(inc) === top(full))
  }

  test("empty-corpus build works; streamed appends populate it") {
    import org.apache.spark.sql.functions._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val idx = graft.util.TempDirs
      .create("graft_bm25_empty").resolve("idx").toString
    Bm25Index.build(empty, idx) // must not NPE (index created before data)
    val s0 = spark.read.parquet(s"$idx/stats").head()
    assert(s0.getDouble(0) === 0.0 && s0.getDouble(2) === 0.0)
    val docs = graft.Tables.documents(spark, Sf0001)
      .select("doc_id", "text").filter(col("doc_id") < 100)
    Bm25Index.append(docs, idx)
    val full = graft.util.TempDirs
      .create("graft_bm25_empty_full").resolve("idx").toString
    Bm25Index.build(docs, full)
    def top(p: String) = Bm25Index.topK(spark, p, TextAnalysis.Bm25Query,
        10, TextAnalysis.Bm25K1, TextAnalysis.Bm25B)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(top(idx) === top(full))
  }

  test("compact merges append fragments; scores unchanged") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, Sf0001).select("doc_id", "text")
    val idx = graft.util.TempDirs
      .create("graft_bm25_compact").resolve("idx").toString
    Bm25Index.build(docs.filter(col("doc_id") < 200), idx)
    for (lo <- 200L until 500L by 100L)
      Bm25Index.append(docs.filter(col("doc_id") >= lo && col("doc_id") < lo + 100L), idx)
    def top() = Bm25Index.topK(spark, idx, TextAnalysis.Bm25Query,
        10, TextAnalysis.Bm25K1, TextAnalysis.Bm25B)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val before = top()
    val (nBefore, nAfter) = Bm25Index.compact(spark, idx)
    assert(nAfter < nBefore, s"compaction must shrink file count ($nBefore → $nAfter)")
    assert(top() === before, "scores must be identical after compaction")
  }

  test("mtime staleness: corpus rewrite triggers sidecar rebuild") {
    val dir = graft.util.TempDirs.create("graft_bm25_stale").toString
    Seq((0L, "vector hash join"), (1L, "hash hash hash"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val idx1 = TextAnalysis.bm25IndexFor(spark, dir)
    assert(TextAnalysis.bm25IndexFor(spark, dir) === idx1, "fresh corpus: cached")
    Thread.sleep(1100) // mtime granularity
    Seq((0L, "vector vector vector"), (1L, "join join"), (2L, "hash"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val idx2 = TextAnalysis.bm25IndexFor(spark, dir)
    assert(idx2 !== idx1, "rewritten corpus must rebuild the sidecar")
    // and the rebuilt sidecar reflects the NEW corpus
    val n = spark.read.parquet(s"$idx2/stats").head().getAs[Double]("n")
    assert(n === 3.0)
  }
}
