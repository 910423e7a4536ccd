package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.index.Bm25Index

/** End-state parity for the chained streaming curation pipeline
  * (gate → corpus append → BM25 maintenance → serving): after the stream
  * drains, the curated corpus must equal the batch LSH gate's keep set,
  * and the incrementally maintained index must serve BIT-IDENTICAL
  * scores to an index rebuilt from scratch over that corpus — the same
  * append-≡-rebuild contract Bm25IndexSpec pins per piece, here proven
  * for the whole chain on one stream. */
class StreamingPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = graft.util.TempDirs.create(p).resolve("d").toString

  test("curation pipeline: gate → append → maintain → serve, end-state ≡ batch") {
    val srcDir = tmp("cur_src")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val store = tmp("cur_store")
    val corpus = tmp("cur_corpus")
    val index = tmp("cur_idx")
    val queriesPath = tmp("cur_q")
    val results = tmp("cur_res")
    val textA = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val textA2 = ((1 to 29).map(i => s"alpha$i") :+ "CHANGED").mkString(" ")
    val textB = (1 to 30).map(i => s"beta$i").mkString(" ")
    val textC = (1 to 30).map(i => s"gamma$i").mkString(" ")
    // the fixture must LSH-collide A with its variant (shared bandsOf
    // definition — same guard as StreamingDedupSpec)
    val gt = graft.operators.Dedup.bandsOf(
      graft.operators.Dedup.hashedShingleRelOf(
        Seq((1L, textA), (3L, textA2)).toDF("doc_id", "text")))
    assert(gt.as("x").join(gt.as("y"),
      col("x.band") === col("y.band") && col("x.band_sig") === col("y.band_sig") &&
        col("x.doc_id") < col("y.doc_id")).count() > 0L)
    // standing serving queries: one aimed at A's vocabulary, one at C's
    Seq((10L, "alpha3 alpha7 alpha11"), (20L, "gamma2 gamma9"))
      .toDF("qid", "qtext").coalesce(1).write.parquet(queriesPath)
    val schema = Seq((1L, "")).toDF("doc_id", "text").schema
    def run(): Unit = {
      val q = StreamingIngest.startCurationPipeline(spark, srcDir, schema,
        store, corpus, index, queriesPath, results, k = 3, k1 = 1.2, b = 0.75)
      q.awaitTermination(120000)
    }
    // batch 1: two distinct docs — both pass the gate, index bootstraps
    Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    run()
    // batch 2: a near-dup of stored A (dropped at the gate) + a fresh doc
    Seq((3L, textA2), (4L, textC)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    run()

    // 1. corpus end-state = the batch gate's keep set
    val keptIds = spark.read.parquet(corpus)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(keptIds === Seq(1L, 2L, 4L), s"got ${keptIds.mkString(",")}")

    // 2. maintained index ≡ index rebuilt from the curated corpus:
    //    bit-identical serving scores for the standing query set
    val rebuilt = tmp("cur_idx_rebuilt")
    Bm25Index.build(spark.read.parquet(corpus), rebuilt)
    def serve(idx: String) =
      Bm25Index.topKMany(spark, idx, spark.read.parquet(queriesPath),
          "qid", "qtext", 3, 1.2, 0.75)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
    assert(serve(index) === serve(rebuilt),
      "maintained index must serve scores bit-identical to a fresh rebuild")

    // 3. serving ran once per batch against the index AS OF that batch:
    //    batch 0 results predate docs 3/4, so the gamma query has no hits
    //    there and every batch-0 hit references a batch-0 doc
    val res = spark.read.parquet(results)
      .select("batch_id", "qid", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val batchIds = res.map(_._1).distinct.sorted
    assert(batchIds.length === 2, s"expected 2 serving rounds, got ${batchIds.toSeq}")
    val first = res.filter(_._1 == batchIds.head)
    assert(first.nonEmpty && first.forall(t => t._3 == 1L || t._3 == 2L))
    assert(!first.exists(_._2 == 20L), "gamma query must have no batch-0 hits")
    val second = res.filter(_._1 == batchIds.last)
    assert(second.exists(t => t._2 == 20L && t._3 == 4L),
      "after batch 1 the gamma query must surface doc 4")
  }

  test("curation pipeline with ANN arm: embed → maintain IVF → serve; probe-all ≡ rebuild") {
    import graft.index.IvfIndex
    val srcDir = tmp("curv_src")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val store = tmp("curv_store")
    val corpus = tmp("curv_corpus")
    val index = tmp("curv_idx")
    val queriesPath = tmp("curv_q")
    val results = tmp("curv_res")
    val vecPath = tmp("curv_vec")
    val ivfPath = tmp("curv_ivf")
    val vqPath = tmp("curv_vq")
    val vres = tmp("curv_vres")
    val embedder = graft.embed.HashingSentenceEmbedder(dim = 32)
    val textA = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val textA2 = ((1 to 29).map(i => s"alpha$i") :+ "CHANGED").mkString(" ")
    val textB = (1 to 30).map(i => s"beta$i").mkString(" ")
    val textC = (1 to 30).map(i => s"gamma$i").mkString(" ")
    // lexical standing queries (the BM25 arm still runs)
    Seq((10L, "alpha3 alpha7")).toDF("qid", "qtext").coalesce(1).write.parquet(queriesPath)
    // vector standing queries: doc B's own embedding must find doc 2 at
    // rank 1, dist ~0, in EVERY serving round after batch 0
    Seq((100L, textB)).toDF("qid", "text")
      .select(col("qid"), embedder.embedColumn(col("text")).as("qv"))
      .coalesce(1).write.parquet(vqPath)
    val schema = Seq((1L, "")).toDF("doc_id", "text").schema
    val arm = StreamingIngest.VecArm(embedder, vecPath, ivfPath, vqPath, vres,
      k = 3, nprobe = 2, lists = 4)
    def run(): Unit = {
      val q = StreamingIngest.startCurationPipeline(spark, srcDir, schema,
        store, corpus, index, queriesPath, results, k = 3, k1 = 1.2, b = 0.75,
        maxFilesPerTrigger = 1, vecArm = Some(arm))
      q.awaitTermination(120000)
    }
    Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    run()
    Seq((3L, textA2), (4L, textC)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    run()

    // 1. the embedded corpus covers exactly the gate's keep set
    val vecIds = spark.read.parquet(vecPath)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(vecIds === Seq(1L, 2L, 4L), s"got ${vecIds.mkString(",")}")
    // ... and the maintained index indexes exactly those rows, once each
    val indexed = spark.read.parquet(s"$ivfPath/lists")
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(indexed === Seq(1L, 2L, 4L))

    // 2. maintained index ≡ rebuild from the gated corpus: PROBE-ALL
    //    (exact for any centroid history) must answer bit-identically
    val rebuilt = tmp("curv_ivf_rebuilt")
    IvfIndex.build(spark.read.parquet(vecPath), rebuilt, lists = 2)
    val qv = spark.read.parquet(vqPath).head().getAs[collection.Seq[Float]]("qv").toArray
    def probeAll(idx: String) = {
      val nLists = spark.read.parquet(s"$idx/centroids").count().toInt
      IvfIndex.probe(spark, idx, qv, 3, nprobe = nLists)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    assert(probeAll(ivfPath) === probeAll(rebuilt),
      "maintained IVF probe-all must equal a fresh rebuild bit-exactly")

    // 3. vector serving ran per batch against the index AS OF that batch:
    //    doc 2 (textB's own vector) at rank 1, dist ~0 in both rounds
    val vr = spark.read.parquet(vres)
      .select("batch_id", "qid", "rank", "vec_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(vr.map(_._1).distinct.length === 2,
      s"expected 2 vector serving rounds, got ${vr.map(_._1).distinct.toSeq}")
    vr.map(_._1).distinct.foreach { bid =>
      val r1 = vr.filter(t => t._1 == bid && t._3 == 1L)
      assert(r1.length === 1 && r1.head._4 === 2L && r1.head._5 < 1e-12,
        s"batch $bid: doc 2 must be the rank-1 hit for its own vector")
    }
    // batch-0 serving predates docs 3/4 — no hit may reference doc 4
    val firstBatch = vr.filter(_._1 == vr.map(_._1).min)
    assert(firstBatch.forall(t => t._4 == 1L || t._4 == 2L),
      "batch-0 vector serving must only surface batch-0 docs")
  }

  test("ANN arm poison-batch guard: an all-null-text first batch defers IVF bootstrap") {
    import graft.index.IvfIndex
    val srcDir = tmp("curp_src")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val store = tmp("curp_store")
    val corpus = tmp("curp_corpus")
    val index = tmp("curp_idx")
    val queriesPath = tmp("curp_q")
    val results = tmp("curp_res")
    val vecPath = tmp("curp_vec")
    val ivfPath = tmp("curp_ivf")
    val vqPath = tmp("curp_vq")
    val vres = tmp("curp_vres")
    val embedder = graft.embed.HashingSentenceEmbedder(dim = 32)
    val textB = (1 to 30).map(i => s"beta$i").mkString(" ")
    val textC = (1 to 30).map(i => s"gamma$i").mkString(" ")
    Seq((10L, "beta3 beta7")).toDF("qid", "qtext").coalesce(1).write.parquet(queriesPath)
    Seq((100L, textB)).toDF("qid", "text")
      .select(col("qid"), embedder.embedColumn(col("text")).as("qv"))
      .coalesce(1).write.parquet(vqPath)
    val schema = Seq((1L, "")).toDF("doc_id", "text").schema
    val arm = StreamingIngest.VecArm(embedder, vecPath, ivfPath, vqPath, vres,
      k = 2, nprobe = 1, lists = 2)
    def run(): Unit = {
      val q = StreamingIngest.startCurationPipeline(spark, srcDir, schema,
        store, corpus, index, queriesPath, results, k = 3, k1 = 1.2, b = 0.75,
        maxFilesPerTrigger = 1, vecArm = Some(arm))
      q.awaitTermination(120000)
    }
    // batch 1: docs with NULL text — the gate keeps them (no shingles, no
    // collisions), BM25 builds (null-text rows are legal, build scaladoc),
    // but the embed stage yields ZERO rows. Without the guard IvfIndex
    // .build would KMeans an empty vecPath, throw, and replay forever
    // under the checkpoint.
    Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(srcDir)
    run() // must complete, not throw
    val hc = spark.sessionState.newHadoopConf()
    def ivfUp = new org.apache.hadoop.fs.Path(s"$ivfPath/meta")
      .getFileSystem(hc).exists(new org.apache.hadoop.fs.Path(s"$ivfPath/meta"))
    assert(spark.read.parquet(corpus).count() === 2L,
      "null-text docs still pass the gate into the corpus")
    assert(!ivfUp, "IVF bootstrap must be deferred on a zero-embedding batch")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(vres)),
      "vector serving must not run before the index exists")
    // batch 2: real texts — bootstrap fires from the embedded corpus (the
    // batch-2 vectors; batch-1 nulls never embed), serving runs
    Seq((3L, textB), (4L, textC))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(srcDir)
    run()
    assert(ivfUp, "the first embedding-producing batch must bootstrap the index")
    val indexed = spark.read.parquet(s"$ivfPath/lists")
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(indexed === Seq(3L, 4L))
    val vr = spark.read.parquet(vres)
      .select("qid", "rank", "vec_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(vr.exists(t => t._1 == 100L && t._2 == 1L && t._3 == 3L && t._4 < 1e-12),
      "doc 3 (textB) must be the rank-1 hit for its own vector")
  }
}
