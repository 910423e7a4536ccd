package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `vector_norm(v)`: Euclidean norm of a float vector — pgvector 0.8's SQL
  * function of the same name (pgvector README, "vector functions"). Numeric
  * contract matches the house distance expressions: widen each element to
  * double, ONE sequential accumulation loop, then sqrt — so the DuckDB
  * oracle twin `sqrt(list_sum(list_transform(v, x -> CAST(x AS DOUBLE) *
  * CAST(x AS DOUBLE))))` is bit-exact.
  */
case class VectorNorm(child: Expression) extends UnaryExpression {

  override def prettyName: String = "vector_norm"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = VectorNorm.compute(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = graft.functions.VectorNorm.compute($v);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object VectorNorm {
  /** Shared by interpreted eval and generated code. */
  def compute(v: ArrayData): Double = {
    val n = v.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      s += x * x
      i += 1
    }
    math.sqrt(s)
  }
}

/** `l2_normalize(v)`: v/‖v‖ as float — pgvector 0.8's SQL function. The
  * zero vector passes through unchanged (pgvector's error-free norm-0
  * behavior for halfvec/sparsevec; also keeps NaN out of downstream codes).
  * Division happens in double (x/‖v‖) then rounds once to float — the same
  * one-rounding contract the oracle twin reproduces with
  * `CAST(CAST(x AS DOUBLE) / norm AS FLOAT)`.
  */
case class L2Normalize(child: Expression) extends UnaryExpression {

  override def prettyName: String = "l2_normalize"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = L2Normalize.compute(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = graft.functions.L2Normalize.compute($v);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object L2Normalize {
  /** Shared by interpreted eval and generated code. */
  def compute(v: ArrayData): ArrayData = {
    val norm = VectorNorm.compute(v)
    if (norm == 0.0) v
    else {
      val n = v.numElements()
      val out = new Array[Float](n)
      var i = 0
      while (i < n) {
        out(i) = (v.getFloat(i).toDouble / norm).toFloat
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}
