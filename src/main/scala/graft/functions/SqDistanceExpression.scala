package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `sq_cosine_distance(codes, scale, q)`: cosine distance between an SQ8
  * scalar-quantized vector (int8 codes + per-vector float scale, value =
  * code·scale/127) and a float query — computed WITHOUT materializing the
  * dequantized array.
  *
  * SQ8 cuts vector storage/scan bandwidth 4× (the 100 TB lever: embedding
  * columns dominate corpus bytes); distances are approximate within
  * quantization error. Ranking error is bounded by ‖Δ‖ ≤ scale·√d/254.
  */
case class SqCosineDistance(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def prettyName: String = "sq_cosine_distance"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(ByteType, _), FloatType, ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<tinyint>, float, array<float>), got " +
          s"(${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  override def nullSafeEval(codes: Any, scale: Any, q: Any): Any =
    SqCosineDistance.compute(
      codes.asInstanceOf[ArrayData], scale.asInstanceOf[Float], q.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, s, q) =>
      s"${ev.value} = graft.functions.SqCosineDistance.compute($c, $s, $q);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

object SqCosineDistance {
  /** Shared by interpreted eval and generated code. */
  def compute(codes: ArrayData, scale: Float, q: ArrayData): Double = {
    val n = codes.numElements()
    if (n != q.numElements()) {
      throw new IllegalArgumentException(
        s"vector dimension mismatch: $n vs ${q.numElements()}")
    }
    val f = scale.toDouble / 127.0
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = codes.getByte(i) * f
      val y = q.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 1.0
    else 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
