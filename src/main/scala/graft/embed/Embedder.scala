package graft.embed

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge

import graft.functions.HashEmbed

/** Embedding pipeline — Spark-native analog of the reference's
  * `EmbeddingGenerator` (/root/reference/src/pgvector_db/generate_embeddings.py).
  *
  * The reference dispatches on `model_type` ∈ {sentence_transformer,
  * huggingface, token} (generate_embeddings.py:41-65) and raises ValueError
  * on anything else; this registry preserves that contract with
  * IllegalArgumentException. The zero-egress build ships deterministic
  * hashing embedders (SURVEY.md §7.0); a real model slots in by
  * implementing [[Embedder]] with a mapPartitions batch call.
  */
trait Embedder extends Serializable {
  def name: String
  def dim: Int
  /** Column-level embedding: text column → array<float> column. */
  def embedColumn(text: Column): Column
  /** Frame-level convenience mirroring `generate_embeddings(texts)`. */
  def embedFrame(df: DataFrame, textCol: String = "text",
                 outCol: String = "embedding"): DataFrame =
    df.withColumn(outCol, embedColumn(col(textCol)))
}

/** Sentence mode (M1/M3): feature-hashed mean-pooled L2-normalized vector,
  * via the codegen'd [[graft.functions.HashEmbed]] expression. */
final case class HashingSentenceEmbedder(dim: Int = 384) extends Embedder {
  val name = "hashing-sentence"
  def embedColumn(text: Column): Column =
    ColumnBridge.column(HashEmbed(ColumnBridge.expression(text), dim))
}

/** Token mode (M2, generate_embeddings.py:93-98): per-text token-id list —
  * murmur3 feature ids over a fixed vocab size. */
final case class HashingTokenizer(vocabSize: Int = 30000) extends Embedder {
  val name = "hashing-token"
  val dim: Int = vocabSize
  // tokens() = the byte-scanning ws_tokens expression (byte-exact with
  // split(trim, "\\s+") — see WhitespaceTokensExpression)
  def embedColumn(text: Column): Column =
    transform(graft.functions.TextFunctions.tokens(text),
      t => pmod(hash(t), lit(vocabSize)).cast("float"))
  /** Token ids as ints (the actual M2 output shape). */
  def tokenIds(text: Column): Column =
    transform(graft.functions.TextFunctions.tokens(text), t => pmod(hash(t), lit(vocabSize)))
}

/** Real-model-shaped embedder: a deterministic linear "model" whose weights
  * load from a params directory (the shape `download_llm` + from_pretrained
  * produce, /root/reference/src/pgvector_db/utils.py:83-123) — token
  * embedding-matrix lookup, MEAN-POOL over tokens, L2-normalize: the
  * sentence-transformers pooling contract (generate_embeddings.py:100-107)
  * minus the transformer. Exists to prove the [[Embedder]] slot holds for a
  * weights-loading batched implementation, not only hashing expressions:
  * same trait, same pipeline, but inference runs as batched mapPartitions
  * (`batchSize` texts per "forward pass" — the M6 chunking shape). */
final case class LinearModelEmbedder(modelDir: String, batchSize: Int = 32)
    extends Embedder {
  val name = "linear-fixture"
  private val params = LinearModelEmbedder.load(modelDir)
  val dim: Int = params.dim

  /** One "forward pass" over a batch of texts. */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
    val toks = t.trim.split("\\s+").filter(_.nonEmpty)
    val acc = new Array[Double](dim)
    toks.foreach { tok =>
      val id = math.floorMod(
        scala.util.hashing.MurmurHash3.stringHash(tok), params.vocabBuckets)
      val row = params.weights(id)
      var j = 0; while (j < dim) { acc(j) += row(j); j += 1 }
    }
    if (toks.nonEmpty) { // mean-pool
      var j = 0; while (j < dim) { acc(j) /= toks.length; j += 1 }
    }
    var nsq = 0.0
    var jj = 0
    while (jj < dim) { nsq += acc(jj) * acc(jj); jj += 1 }
    val norm = math.sqrt(nsq)
    val out = new Array[Float](dim)
    if (norm > 0.0) { // L2-normalize
      var j = 0; while (j < dim) { out(j) = (acc(j) / norm).toFloat; j += 1 }
    }
    out
  }

  def embedColumn(text: Column): Column = {
    val f = udf((t: String) => embedBatch(Seq(Option(t).getOrElse(""))).head)
    f(text)
  }

  /** The real-model frame path: batched mapPartitions — `batchSize` rows
    * per model call, order preserved, all source columns kept. */
  override def embedFrame(df: DataFrame, textCol: String = "text",
                          outCol: String = "embedding"): DataFrame = {
    val schema = df.schema.add(outCol,
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = false))
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val vecs = embedBatch(batch.map(r =>
          Option(r.getString(idx)).getOrElse("")))
        batch.lazyZip(vecs).map { (r, v) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ v)
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}

object LinearModelEmbedder {
  final case class Params(vocabBuckets: Int, dim: Int,
                          weights: Array[Array[Float]])

  /** Materialize a deterministic fixture params dir — the offline stand-in
    * for `download_llm` fetching weights (utils.py:83-123). Layout: one
    * `weights.bin` = two ints (vocabBuckets, dim) + vocabBuckets·dim
    * big-endian floats from a seeded PRNG. */
  def writeFixture(modelDir: String, vocabBuckets: Int = 512, dim: Int = 64,
                   seed: Long = 42L): Unit = {
    val rnd = new java.util.Random(seed)
    val f = Paths.get(modelDir, "weights.bin")
    Files.createDirectories(f.getParent)
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      Files.newOutputStream(f)))
    try {
      out.writeInt(vocabBuckets); out.writeInt(dim)
      var i = 0
      while (i < vocabBuckets * dim) {
        out.writeFloat(rnd.nextFloat() * 2f - 1f); i += 1
      }
    } finally out.close()
  }

  def load(modelDir: String): Params = {
    val f = Paths.get(modelDir, "weights.bin")
    require(Files.exists(f), s"no weights.bin under $modelDir — not a model dir")
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      Files.newInputStream(f)))
    try {
      val vocab = in.readInt(); val dim = in.readInt()
      Params(vocab, dim, Array.fill(vocab)(Array.fill(dim)(in.readFloat())))
    } finally in.close()
  }
}

object EmbedderRegistry {
  /** `model_type` dispatch with the reference's error contract
    * (generate_embeddings.py:59-65). */
  def forType(modelType: String, dim: Int = 384): Embedder =
    forType(modelType, dim, modelDir = None)

  /** Dispatch with an optional local model dir: when given, sentence modes
    * load the weights-backed [[LinearModelEmbedder]] (the from_pretrained
    * shape) instead of the hashing stand-in — same dispatch contract. */
  def forType(modelType: String, dim: Int, modelDir: Option[String]): Embedder =
    modelType match {
      case "sentence_transformer" | "huggingface" =>
        modelDir.map(LinearModelEmbedder(_)).getOrElse(HashingSentenceEmbedder(dim))
      case "token" => HashingTokenizer()
      case other => throw new IllegalArgumentException(
        s"Invalid model_type: $other. Choose 'sentence_transformer', 'huggingface', or 'token'.")
    }

  /** Analog of `download_llm(name, save_path)` (utils.py:83-123): resolves a
    * local cache dir for a model name, preserving the `/`→`-` path-mangling
    * contract; offline build just materializes the marker directory. */
  def resolveModelDir(modelName: String, savePath: String): String = {
    val mangled = modelName.replace("/", "-")
    val dir = Paths.get(savePath, mangled)
    Files.createDirectories(dir)
    dir.toString
  }
}
