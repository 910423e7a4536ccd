package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** SQ8 scalar quantization, codegen'd single pass: array<float> →
  * struct(scale float, codes array<tinyint>) with value ≈ code·scale/127.
  *
  * Numerically identical to the composable HOF form
  * `struct(array_max(transform(v, abs)), transform(v, x -> cast(round(x /
  * scale * 127) as tinyint)))` — per element the double arithmetic is
  * (double)x / (double)scale * 127.0 rounded HALF_UP (Spark's Round and
  * DuckDB's round() both round half away from zero) — but in ONE loop with
  * no interpreted lambda dispatch per element (transform/aggregate are
  * CodegenFallback in Spark 4). An all-zero vector has scale 0 and emits
  * zero codes ([[SqCosineDistance]] defines its distance as 1.0).
  *
  * DuckDB oracle twin: the `sq` CTE in the `sq_knn_topk` oracle
  * (operators/SimilarityQueries.scala).
  */
case class SqQuantize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "sq_quantize"
  override def nullIntolerant: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("scale", FloatType, nullable = false),
    StructField("codes", ArrayType(ByteType, containsNull = false), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = SqQuantize.compute(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SqQuantize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}

object SqQuantize {
  /** Shared by interpreted eval and generated code. */
  def compute(v: ArrayData): InternalRow = {
    val n = v.numElements()
    var scale = 0.0f
    var i = 0
    while (i < n) {
      // Math.max propagates NaN like array_max's NaN-greatest ordering
      scale = Math.max(scale, Math.abs(v.getFloat(i)))
      i += 1
    }
    val codes = new Array[Byte](n)
    // Non-finite scale means some element was NaN/±Inf (Math.max propagated
    // it): emit zero codes instead of letting BigDecimal.valueOf(NaN) throw
    // — a dirty embedding must degrade, not fail the whole query. The NaN/Inf
    // scale itself is kept, so downstream distances flag the row as garbage
    // the same way the HOF round()/cast form does.
    if (scale != 0.0f && java.lang.Float.isFinite(scale)) {
      val s = scale.toDouble
      i = 0
      while (i < n) {
        val x = v.getFloat(i).toDouble / s * 127.0
        // BigDecimal HALF_UP — bit-compatible with Spark's Round(double)
        // and DuckDB's round(), incl. the ties floor(x+0.5) gets wrong.
        // Double fast path when provably identical (|x| ≤ 127 by
        // construction, so the only hazard is the shortest-string-vs-binary
        // ½-ulp gap near a .5 tie — BigDecimal.valueOf rounds
        // Double.toString's value): per-element BigDecimal stringification
        // was the scan's allocation wall at corpus scale, the same disease
        // CovMomentsBuffer.term9FastOr cures at scale 9. Ties and
        // near-ties take the exact slow path; SqKernelSpec sweeps the
        // guard.
        val fl = math.floor(x)
        val frac = x - fl
        codes(i) =
          (if (math.abs(frac - 0.5) > math.ulp(x) * 2.0 + 4.9e-324)
            fl.toLong + (if (frac > 0.5) 1L else 0L)
          else JBigDecimal.valueOf(x).setScale(0, RoundingMode.HALF_UP)
            .doubleValue().toLong).toByte
        i += 1
      }
    }
    InternalRow(scale, new GenericArrayData(codes))
  }
}
