package graft.embed

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The non-hashing, weights-loading embedder slot (VERDICT r3 item 4):
  * prove M3 mean-pool/normalize semantics and the M4/M5 contracts hold for
  * a real-model-shaped implementation, and that BOTH embedders run the same
  * downstream pipeline. */
class LinearModelEmbedderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val modelDir: String = {
    // M5 path mangling: "org/model" → "org-model" cache dir
    val base = graft.util.TempDirs.create("graft_models").toString
    val dir = EmbedderRegistry.resolveModelDir("fixture/linear-64", base)
    assert(dir.endsWith("fixture-linear-64"))
    LinearModelEmbedder.writeFixture(dir, vocabBuckets = 512, dim = 64)
    dir
  }

  test("M4 dispatch: modelDir routes sentence modes to the weights-backed embedder") {
    val e = EmbedderRegistry.forType("sentence_transformer", 64, Some(modelDir))
    assert(e.isInstanceOf[LinearModelEmbedder])
    assert(e.dim === 64)
    // no modelDir → hashing stand-in; bad type still raises the reference error
    assert(EmbedderRegistry.forType("huggingface", 64, None)
      .isInstanceOf[HashingSentenceEmbedder])
    val err = intercept[IllegalArgumentException] {
      EmbedderRegistry.forType("word2vec", 64, Some(modelDir))
    }
    assert(err.getMessage.contains("Invalid model_type"))
  }

  test("mean-pool + L2-normalize semantics (M3)") {
    val e = LinearModelEmbedder(modelDir)
    val Seq(a, ab, ba, aa) = e.embedBatch(Seq("alpha", "alpha beta", "beta alpha", "alpha alpha"))
    // mean of identical tokens = the token vector (normalized): "a a" == "a"
    assert(aa === a)
    // mean is order-invariant
    assert(ab === ba)
    // unit norm for non-empty text
    def norm(v: Array[Float]) = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm(a) - 1.0) < 1e-6)
    assert(math.abs(norm(ab) - 1.0) < 1e-6)
    // empty text → zero vector, not NaN
    assert(e.embedBatch(Seq("")).head.forall(_ == 0.0f))
    // deterministic across instances (weights re-loaded from disk)
    assert(LinearModelEmbedder(modelDir).embedBatch(Seq("alpha")).head === a)
  }

  test("both embedders run the same frame pipeline; dims + batching hold") {
    val docs = graft.Tables.documents(spark, Sf0001).select("doc_id", "text")
    val hashing = HashingSentenceEmbedder(dim = 64)
    val linear = LinearModelEmbedder(modelDir, batchSize = 7)
    for (e <- Seq[Embedder](hashing, linear)) {
      val out = e.embedFrame(docs)
      assert(out.columns.toSeq === Seq("doc_id", "text", "embedding"))
      val dims = out.select(size(col("embedding"))).distinct()
        .collect().map(_.getInt(0)).toSeq
      assert(dims === Seq(64), s"${e.name}: all embeddings must be dim 64")
    }
    // batch chunking (M6) must not change results: batch of 7 == batch of 1000
    val b7 = linear.embedFrame(docs).orderBy("doc_id")
      .collect().map(_.getAs[collection.Seq[Float]]("embedding"))
    val b1000 = LinearModelEmbedder(modelDir, batchSize = 1000)
      .embedFrame(docs).orderBy("doc_id")
      .collect().map(_.getAs[collection.Seq[Float]]("embedding"))
    assert(b7 === b1000)
    // and the column-level path agrees with the frame-level path
    val viaCol = docs.withColumn("embedding", linear.embedColumn(col("text")))
      .orderBy("doc_id").collect().map(_.getAs[collection.Seq[Float]]("embedding"))
    assert(viaCol === b7)
  }

  test("weights-backed embeddings drive the downstream kNN pipeline") {
    val linear = LinearModelEmbedder(modelDir)
    val docs = graft.Tables.documents(spark, Sf0001).select("doc_id", "text")
    val emb = linear.embedFrame(docs).cache()
    val q = emb.filter(col("doc_id") === 0)
      .head().getAs[collection.Seq[Float]]("embedding").toArray
    val top = emb.select(col("doc_id"),
        graft.functions.cosine_distance(col("embedding"),
          graft.functions.vector_lit(q)).as("dist"))
      .orderBy(col("dist"), col("doc_id")).limit(5).collect()
    assert(top.length === 5)
    assert(top.head.getLong(0) === 0L, "self must rank first")
    assert(top.head.getDouble(1) < 1e-9)
    emb.unpersist()
  }
}
