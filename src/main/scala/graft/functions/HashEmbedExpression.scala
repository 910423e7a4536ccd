package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** `hash_embed(text, dim)`: deterministic feature-hashing sentence embedding
  * — the engine's offline default for the reference's
  * `EmbeddingGenerator.generate_embeddings`
  * (/root/reference/src/pgvector_db/generate_embeddings.py:69-92; model
  * downloads are impossible in this zero-egress build, SURVEY.md §7.0).
  *
  * Semantics preserved from the reference's M1/M3 operators:
  * tokenize → per-token feature vector (signed murmur3 feature hashing, the
  * `HashingTF`-style trick) → MEAN POOL over tokens (the HF mean-pooling
  * path, generate_embeddings.py:100-107) → L2 normalize (sentence-
  * transformers' default). Same text ⇒ same vector, any engine, any day.
  *
  * A real model embedder can replace this behind [[graft.embed.Embedder]];
  * the expression keeps the hot batch/streaming path inside codegen.
  */
case class HashEmbed(child: Expression, dim: Int) extends UnaryExpression {
  require(dim >= 1, "embedding dim must be >= 1")

  override def prettyName: String = "hash_embed"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    HashEmbed.embed(input.asInstanceOf[UTF8String], dim)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashEmbed.embed($c, $dim);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashEmbed {
  val Seed = 42

  /** Shared by interpreted eval and generated code. */
  def embed(text: UTF8String, dim: Int): ArrayData =
    new GenericArrayData(embedToFloats(text.toString, dim))

  def embedToFloats(text: String, dim: Int): Array[Float] = {
    val acc = new Array[Double](dim)
    var nTokens = 0
    var start = 0
    val s = text
    val len = s.length
    var i = 0
    // whitespace tokenization matching split(trim(text), "\s+")
    while (i <= len) {
      if (i == len || Character.isWhitespace(s.charAt(i))) {
        if (i > start) {
          val tok = UTF8String.fromString(s.substring(start, i))
          val h = Murmur3_x86_32.hashUnsafeBytes(
            tok.getBaseObject, tok.getBaseOffset, tok.numBytes(), Seed)
          val idx = java.lang.Math.floorMod(h, dim)
          val sign = if ((h & 0x80000000) != 0) -1.0 else 1.0
          acc(idx) += sign
          nTokens += 1
        }
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Float](dim)
    if (nTokens == 0) return out // zero vector for empty text
    // mean pool
    var j = 0
    var norm = 0.0
    while (j < dim) {
      val v = acc(j) / nTokens
      acc(j) = v
      norm += v * v
      j += 1
    }
    // L2 normalize (skip if degenerate)
    val inv = if (norm > 0.0) 1.0 / math.sqrt(norm) else 0.0
    j = 0
    while (j < dim) {
      out(j) = (acc(j) * inv).toFloat
      j += 1
    }
    out
  }
}
