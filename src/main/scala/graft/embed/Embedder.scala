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
  def embedColumn(text: Column): Column =
    transform(split(trim(text), "\\s+"),
      t => pmod(hash(t), lit(vocabSize)).cast("float"))
  /** Token ids as ints (the actual M2 output shape). */
  def tokenIds(text: Column): Column =
    transform(split(trim(text), "\\s+"), t => pmod(hash(t), lit(vocabSize)))
}

object EmbedderRegistry {
  /** `model_type` dispatch with the reference's error contract
    * (generate_embeddings.py:59-65). */
  def forType(modelType: String, dim: Int = 384): Embedder = modelType match {
    case "sentence_transformer" | "huggingface" => HashingSentenceEmbedder(dim)
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
