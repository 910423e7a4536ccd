package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Pairwise float-vector → double distance/similarity expressions.
  *
  * These are the Spark-native analogs of the pgvector scalar operators the
  * reference emits in SQL (`<=>` cosine distance, `<->` L2, `<#>` negative
  * inner product — /root/reference/README.md:9 pgvector 0.8.1;
  * /root/reference/demo/similarity_search_demo.py:90 uses `1 - (a <=> b)`).
  *
  * Numeric contract (drives the DuckDB oracle bit-exactness):
  *  - each float element is widened to double BEFORE any arithmetic;
  *  - accumulation is a single sequential left-to-right loop;
  *  - cosine similarity is `dot / (sqrt(na) * sqrt(nb))` in exactly that
  *    association. The oracle SQL mirrors this with
  *    `list_sum(list_transform(list_zip(a,b), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))`
  *    which DuckDB also folds sequentially, so both engines produce the same
  *    IEEE-754 doubles bit for bit.
  *
  * Dimension mismatch throws (pgvector errors on mismatched dims —
  * "different vector dimensions" — rather than returning NULL).
  * Arrays are assumed element-non-null (pgvector vectors cannot hold NULLs).
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  // ExpectsInputTypes is private[sql]; enforce array<float> inputs manually.
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<float>) arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  protected def compute(a: ArrayData, b: ArrayData, n: Int): Double

  /** Emit the loop body; must assign the final double to `result`. */
  protected def genLoop(ctx: CodegenContext, a: String, b: String, n: String, result: String): String

  @inline protected final def checkDims(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    if (n != m) {
      throw new IllegalArgumentException(s"vector dimension mismatch: $n vs $m")
    }
    n
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    compute(av, bv, checkDims(av, bv))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "vector dimension mismatch: " + $n + " vs " + $b.numElements());
         |}
         |${genLoop(ctx, a, b, n, ev.value)}
       """.stripMargin
    })
}

/** `cosine_distance(a, b) = 1 - dot(a,b) / (‖a‖ * ‖b‖)` — pgvector `<=>`.
  * Ref: /root/reference/demo/aws_rds_similarity_search_demo.py:170-180. */
case class CosineDistance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_distance"

  override protected def compute(a: ArrayData, b: ArrayData, n: Int): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def genLoop(ctx: CodegenContext, a: String, b: String, n: String, result: String): String = {
    val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
    val i = ctx.freshName("i"); val x = ctx.freshName("x"); val y = ctx.freshName("y")
    s"""
       |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  final double $x = (double) $a.getFloat($i);
       |  final double $y = (double) $b.getFloat($i);
       |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
       |}
       |$result = 1.0 - $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
     """.stripMargin
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** `cosine_similarity(a, b) = dot(a,b) / (‖a‖ * ‖b‖)` — the `1 - <=>`
  * projection the reference's queries emit (similarity_search_demo.py:90). */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_similarity"

  override protected def compute(a: ArrayData, b: ArrayData, n: Int): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def genLoop(ctx: CodegenContext, a: String, b: String, n: String, result: String): String = {
    val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
    val i = ctx.freshName("i"); val x = ctx.freshName("x"); val y = ctx.freshName("y")
    s"""
       |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  final double $x = (double) $a.getFloat($i);
       |  final double $y = (double) $b.getFloat($i);
       |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
       |}
       |$result = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
     """.stripMargin
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** `l2_distance(a, b) = sqrt(Σ (aᵢ - bᵢ)²)` — pgvector `<->`. */
case class L2Distance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "l2_distance"

  override protected def compute(a: ArrayData, b: ArrayData, n: Int): Double = {
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def genLoop(ctx: CodegenContext, a: String, b: String, n: String, result: String): String = {
    val acc = ctx.freshName("acc"); val i = ctx.freshName("i"); val d = ctx.freshName("d")
    s"""
       |double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  final double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
       |  $acc += $d * $d;
       |}
       |$result = java.lang.Math.sqrt($acc);
     """.stripMargin
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** `l1_distance(a, b) = Σ |aᵢ − bᵢ|` — pgvector 0.7's taxicab operator
  * `<+>` (/root/reference uses cosine ops only; L1 completes the distance
  * family the extension ships). Same sequential double accumulation as
  * the rest, so the DuckDB oracle matches bit-for-bit. */
case class L1Distance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "l1_distance"

  override protected def compute(a: ArrayData, b: ArrayData, n: Int): Double = {
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += math.abs(a.getFloat(i).toDouble - b.getFloat(i).toDouble)
      i += 1
    }
    acc
  }

  override protected def genLoop(ctx: CodegenContext, a: String, b: String, n: String, result: String): String = {
    val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
    s"""
       |double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  $acc += java.lang.Math.abs((double) $a.getFloat($i) - (double) $b.getFloat($i));
       |}
       |$result = $acc;
     """.stripMargin
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** `inner_product(a, b) = Σ aᵢ·bᵢ`. pgvector's `<#>` is the NEGATIVE inner
  * product (so ORDER BY ascending = max-IP search); negate at the call site. */
case class InnerProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "inner_product"

  override protected def compute(a: ArrayData, b: ArrayData, n: Int): Double = {
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override protected def genLoop(ctx: CodegenContext, a: String, b: String, n: String, result: String): String = {
    val dot = ctx.freshName("dot"); val i = ctx.freshName("i")
    s"""
       |double $dot = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
       |}
       |$result = $dot;
     """.stripMargin
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}
