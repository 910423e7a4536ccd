package graft.embed

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.HashEmbed

/** Shape/type invariants ported from tests/test_generate_embeddings.py
  * (FIXTURES.md §1.4): (n, d) preservation, determinism, normalization. */
class EmbedderSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq("hello world", "spark native engine", "hello world")

  test("sentence embedder preserves n and emits fixed dim (shape invariant)") {
    val out = HashingSentenceEmbedder(64).embedFrame(texts.toDF("text")).collect()
    assert(out.length === 3)
    assert(out.forall(_.getAs[Seq[Float]]("embedding").length === 64))
  }

  test("deterministic: same text ⇒ identical vector; L2 norm ≈ 1") {
    val vecs = HashingSentenceEmbedder(64).embedFrame(texts.toDF("text"))
      .collect().map(_.getAs[Seq[Float]]("embedding").toArray)
    assert(vecs(0).toSeq === vecs(2).toSeq)
    assert(vecs(0).toSeq !== vecs(1).toSeq)
    val norm = math.sqrt(vecs(1).map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("interpreted and driver-side paths agree with the expression") {
    val direct = HashEmbed.embedToFloats("hello world", 64)
    val viaSpark = HashingSentenceEmbedder(64)
      .embedFrame(Seq("hello world").toDF("text")).head()
      .getAs[Seq[Float]]("embedding").toArray
    assert(direct.toSeq === viaSpark.toSeq)
  }

  test("empty/whitespace text yields the zero vector, not NaN") {
    val v = HashingSentenceEmbedder(8).embedFrame(Seq("   ").toDF("text"))
      .head().getAs[collection.Seq[Float]]("embedding")
    assert(v.forall(_ == 0.0f))
  }

  test("token mode emits ids within vocab; registry dispatch contract") {
    val tok = HashingTokenizer(100)
    val ids = Seq("a b c").toDF("text")
      .select(tok.tokenIds(col("text")).as("ids")).head().getAs[collection.Seq[Int]]("ids")
    assert(ids.length === 3 && ids.forall(i => i >= 0 && i < 100))
    assert(EmbedderRegistry.forType("sentence_transformer").isInstanceOf[HashingSentenceEmbedder])
    assert(EmbedderRegistry.forType("token").isInstanceOf[HashingTokenizer])
    val ex = intercept[IllegalArgumentException](EmbedderRegistry.forType("bogus"))
    assert(ex.getMessage.contains("Invalid model_type"))
  }

  test("resolveModelDir mangles / to - (utils.py path contract)") {
    val dir = EmbedderRegistry.resolveModelDir(
      "sentence-transformers/all-MiniLM-L6-v2",
      graft.util.TempDirs.create("models").toString)
    assert(dir.endsWith("sentence-transformers-all-MiniLM-L6-v2"))
    assert(new java.io.File(dir).isDirectory)
  }
}
