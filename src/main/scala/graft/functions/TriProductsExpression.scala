package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `tri_products(vec)`: the row-major upper-triangle outer-product terms
  * xᵢ·xⱼ (i ≤ j) of a float vector, as array<double> of length d(d+1)/2 —
  * the per-row contribution to a covariance/Gram matrix
  * ([[graft.operators.SimilarityQueries.embeddingCovariance]]).
  *
  * Exists because the composable form (nested `transform` over `sequence`
  * building structs) is CodegenFallback — interpreted lambda dispatch per
  * element, measured ~5ms/row at d=64. This expression is one tight
  * generated loop over the primitive float array and stays inside
  * WholeStageCodegen. Each product of two float32 values is EXACT in double
  * (24+24 mantissa bits < 53), which is what makes the downstream
  * decimal-sum oracle recipe bit-exact.
  */
case class TriProducts(child: Expression, withMoments: Boolean = false)
    extends UnaryExpression {

  override def prettyName: String = "tri_products"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    TriProducts.build(input.asInstanceOf[ArrayData], withMoments)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TriProducts.build($c, $withMoments);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TriProducts {
  /** Shared by interpreted eval and generated code. With `withMoments` the
    * d raw components (widened to double) are appended after the d(d+1)/2
    * products, so ONE explode+aggregate pass yields both the second-moment
    * product sums and the first-moment component sums — the fused form
    * that lets covariance+means run in a single corpus scan. */
  def build(vec: ArrayData): ArrayData = build(vec, withMoments = false)

  def build(vec: ArrayData, withMoments: Boolean): ArrayData = {
    val x = vec.toFloatArray()
    val d = x.length
    val t = d * (d + 1) / 2
    val out = new Array[Double](if (withMoments) t + d else t)
    var idx = 0
    var i = 0
    while (i < d) {
      val xi = x(i).toDouble
      var j = i
      while (j < d) {
        out(idx) = xi * x(j).toDouble
        idx += 1
        j += 1
      }
      i += 1
    }
    if (withMoments) {
      var k = 0
      while (k < d) {
        out(t + k) = x(k).toDouble
        k += 1
      }
    }
    new GenericArrayData(out)
  }
}
