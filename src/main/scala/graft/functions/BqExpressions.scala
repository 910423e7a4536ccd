package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `bq_pack(v)`: 1-bit binary quantization of a float vector — bit i of
  * word ⌊i/64⌋ is set iff v(i) ≥ 0. A 384-dim float vector (1536 B)
  * becomes 6 longs (48 B): 32× less scan bandwidth for the candidate
  * stage of a quantized kNN (the BQ step of multi-stage ANN pipelines;
  * Hamming distance on sign bits approximates angular distance).
  *
  * The final word's padding bits are zero on every row, so they XOR away
  * in [[BqHamming]].
  */
case class BqPack(child: Expression) extends UnaryExpression {

  override def prettyName: String = "bq_pack"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = BqPack.compute(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = graft.functions.BqPack.compute($v);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object BqPack {
  /** Shared by interpreted eval and generated code. */
  def compute(v: ArrayData): GenericArrayData = {
    val n = v.numElements()
    val words = new Array[Long]((n + 63) >>> 6)
    var i = 0
    while (i < n) {
      if (v.getFloat(i) >= 0f) words(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    new GenericArrayData(words)
  }
}

/** `bq_hamming(a, b)`: Hamming distance between two [[BqPack]] signatures —
  * XOR + popcount per 64-bit word, ~d/64 instructions versus d FMAs for the
  * float distance. Equals the number of dimensions whose signs differ, which
  * is what the DuckDB oracle counts directly over the float arrays.
  */
case class BqHamming(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "bq_hamming"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), got " +
          s"(${a.catalogString}, ${b.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    BqHamming.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BqHamming.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

object BqHamming {
  /** Shared by interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (n != b.numElements()) {
      throw new IllegalArgumentException(
        s"signature length mismatch: $n vs ${b.numElements()}")
    }
    var h = 0L
    var i = 0
    while (i < n) {
      h += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    h
  }
}

/** `bq_jaccard(a, b)`: Jaccard distance between two [[BqPack]] signatures —
  * pgvector's `jaccard_distance(bit, bit)` / `<%>` operator
  * (reference pgvector 0.7+ bit opclass), computed as
  * 1 − popcount(a∧b)/popcount(a∨b) per 64-bit word. Padding bits are zero
  * on both sides so they drop out of both counts. Two identical all-zero
  * signatures have Jaccard distance 0 by the empty-sets-are-identical
  * convention (union = 0 → 0.0). The intersection/union counts are exact
  * integers and the one IEEE division is engine-identical, so the result
  * is oracle-exact.
  */
case class BqJaccard(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "bq_jaccard"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), got " +
          s"(${a.catalogString}, ${b.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    BqJaccard.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BqJaccard.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

object BqJaccard {
  /** Shared by interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements()) {
      throw new IllegalArgumentException(
        s"signature length mismatch: $n vs ${b.numElements()}")
    }
    var inter = 0L
    var union = 0L
    var i = 0
    while (i < n) {
      val aw = a.getLong(i)
      val bw = b.getLong(i)
      inter += java.lang.Long.bitCount(aw & bw)
      union += java.lang.Long.bitCount(aw | bw)
      i += 1
    }
    if (union == 0L) 0.0 else 1.0 - inter.toDouble / union.toDouble
  }
}
