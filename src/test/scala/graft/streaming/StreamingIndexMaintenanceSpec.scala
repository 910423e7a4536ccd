package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.index.{Bm25Index, IvfIndex}
import graft.operators.TextAnalysis

/** Continuous index maintenance: streamed appends must leave each index
  * equivalent to one built over the full data. */
class StreamingIndexMaintenanceSpec extends SparkSpec {

  private def tmp(p: String) = graft.util.TempDirs.create(p).resolve("d").toString

  test("streamed IVF appends: probe-all equals exact over old+new vectors") {
    val e = graft.Tables.embeddings(spark, Sf0001)
    val idx = tmp("ivf_maint_idx")
    IvfIndex.build(e.filter(col("vec_id") < 300), idx, lists = 8)
    // two files appear → two micro-batch appends
    val src = tmp("ivf_maint_src")
    e.filter(col("vec_id") >= 300 && col("vec_id") < 400)
      .write.mode("append").parquet(src)
    e.filter(col("vec_id") >= 400).write.mode("append").parquet(src)
    val q = StreamingIngest.startIvfMaintenance(spark, src, e.schema, idx)
    q.awaitTermination(120000)
    val lists = spark.read.parquet(s"$idx/lists")
    assert(lists.count() === 500L)
    assert(lists.select("vec_id").distinct().count() === 500L)
    // a streamed-in vector is findable; probe-all equals exact search
    val qv = e.filter(col("vec_id") === 450)
      .head().getAs[collection.Seq[Float]]("embedding").toArray
    val got = IvfIndex.probe(spark, idx, qv, 10, nprobe = 8)
      .collect().map(_.getLong(0)).toSeq
    val exact = e.select(col("vec_id"),
        graft.functions.cosine_distance(col("embedding"),
          graft.functions.vector_lit(qv)).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSeq
    assert(got === exact)
    assert(got.head === 450L)
    // the covering-radius sidecar survived the streamed appends → the
    // filtered probe's bound stays sound (exactness = the soundness gate)
    val pred = col("label") === 3
    val gotF = IvfIndex.filteredKnn(spark, idx, qv, 5, pred)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exactF = e.filter(pred).select(col("vec_id"),
        graft.functions.cosine_distance(col("embedding"),
          graft.functions.vector_lit(qv)).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(gotF === exactF)
  }

  test("streamed BM25 appends: scores equal a full rebuild") {
    val docs = graft.Tables.documents(spark, Sf0001).select("doc_id", "text")
    val idx = tmp("bm25_maint_idx")
    Bm25Index.build(docs.filter(col("doc_id") < 300), idx)
    val src = tmp("bm25_maint_src")
    docs.filter(col("doc_id") >= 300).write.mode("append").parquet(src)
    val q = StreamingIngest.startBm25Maintenance(spark, src, docs.schema, idx)
    q.awaitTermination(120000)
    val full = tmp("bm25_maint_full")
    Bm25Index.build(docs, full)
    def top(p: String) = Bm25Index.topK(spark, p, TextAnalysis.Bm25Query,
        10, TextAnalysis.Bm25K1, TextAnalysis.Bm25B)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(top(idx) === top(full))
  }
}
