package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Sparse vector type + distances — the pgvector 0.7 `sparsevec` analog
  * (pgvector docs: `sparsevec` stores `{index:value,…}/dim`, supports
  * `<=>`/`<->`/`<#>`). Spark mapping: a struct column
  * `struct<dim int, indices array<int>, values array<float>>` with
  * 0-based strictly-ascending indices and non-zero values.
  *
  * Distances merge-walk the two index arrays, so the work per pair is
  * O(nnz_a + nnz_b) instead of O(dim) — the point of sparse vectors at
  * 10k+ dims (lexical/TF embeddings where <1% of dims are non-zero).
  *
  * Numeric contract: accumulation visits indices in ascending order,
  * widening each float to double — EXACTLY the sequence the dense
  * expressions produce on the zero-filled dense form (a zero element
  * contributes +0.0 to every accumulator, which is an IEEE identity), so
  * `sparse_cosine_distance(sparsify(a), sparsify(b))` is bit-equal to
  * `cosine_distance(dense_masked(a), dense_masked(b))` and the DuckDB
  * oracle can mirror it with a CASE-masked dense recompute
  * (SparseVectorSpec pins the bit-equality).
  */
object SparseVec {
  val Schema: StructType = StructType(Seq(
    StructField("dim", IntegerType, nullable = false),
    StructField("indices", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("values", ArrayType(FloatType, containsNull = false), nullable = false)))

  def isSparse(dt: DataType): Boolean = dt match {
    case s: StructType =>
      s.length == 3 &&
        s.fieldNames.sameElements(Array("dim", "indices", "values")) &&
        s(0).dataType == IntegerType &&
        (s(1).dataType match { case ArrayType(IntegerType, _) => true; case _ => false }) &&
        (s(2).dataType match { case ArrayType(FloatType, _) => true; case _ => false })
    case _ => false
  }

  @inline private[functions] def checkDims(a: InternalRow, b: InternalRow): Unit = {
    val da = a.getInt(0); val db = b.getInt(0)
    if (da != db) {
      throw new IllegalArgumentException(s"sparse vector dimension mismatch: $da vs $db")
    }
  }
}

/** dense array<float> → sparsevec keeping elements with |x| > eps. */
case class SparseVectorize(child: Expression, eps: Double) extends UnaryExpression {
  override def prettyName: String = "sparse_vectorize"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = SparseVec.Schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    SparseVectorize.compute(v.asInstanceOf[ArrayData], eps)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SparseVectorize.compute($c, $eps)")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}

object SparseVectorize {
  def compute(v: ArrayData, eps: Double): InternalRow = {
    val n = v.numElements()
    var nnz = 0
    var i = 0
    while (i < n) {
      if (Math.abs(v.getFloat(i)) > eps) nnz += 1
      i += 1
    }
    val idx = new Array[Int](nnz)
    val vals = new Array[Float](nnz)
    var j = 0
    i = 0
    while (i < n) {
      val x = v.getFloat(i)
      if (Math.abs(x) > eps) { idx(j) = i; vals(j) = x; j += 1 }
      i += 1
    }
    InternalRow(n, new GenericArrayData(idx), new GenericArrayData(vals))
  }
}

/** sparsevec → dense array<float> (zeros at absent indices). */
case class SparseToDense(child: Expression) extends UnaryExpression {
  override def prettyName: String = "sparse_to_dense"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (SparseVec.isSparse(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires sparsevec struct, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    SparseToDense.compute(v.asInstanceOf[InternalRow])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SparseToDense.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}

object SparseToDense {
  def compute(s: InternalRow): ArrayData = {
    val dim = s.getInt(0)
    val idx = s.getArray(1)
    val vals = s.getArray(2)
    val out = new Array[Float](dim)
    var j = 0
    val m = idx.numElements()
    while (j < m) { out(idx.getInt(j)) = vals.getFloat(j); j += 1 }
    new GenericArrayData(out)
  }
}

abstract class SparseBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (SparseVec.isSparse(left.dataType) && SparseVec.isSparse(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (sparsevec, sparsevec), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
}

/** `sparse_inner_product(a, b) = Σ aᵢ·bᵢ` over the index intersection. */
case class SparseInnerProduct(left: Expression, right: Expression)
  extends SparseBinaryExpression {
  override def prettyName: String = "sparse_inner_product"

  override def nullSafeEval(a: Any, b: Any): Any =
    SparseInnerProduct.compute(a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SparseInnerProduct.compute($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

object SparseInnerProduct {
  def compute(a: InternalRow, b: InternalRow): Double = {
    SparseVec.checkDims(a, b)
    val ai = a.getArray(1); val av = a.getArray(2)
    val bi = b.getArray(1); val bv = b.getArray(2)
    val na = ai.numElements(); val nb = bi.numElements()
    var dot = 0.0
    var p = 0; var q = 0
    while (p < na && q < nb) {
      val ia = ai.getInt(p); val ib = bi.getInt(q)
      if (ia == ib) {
        dot += av.getFloat(p).toDouble * bv.getFloat(q).toDouble
        p += 1; q += 1
      } else if (ia < ib) p += 1
      else q += 1
    }
    dot
  }
}

/** `sparse_cosine_distance(a, b)` — pgvector `sparsevec <=> sparsevec`.
  * Bit-equal to [[CosineDistance]] on the zero-filled dense forms
  * (NaN when either side has no non-zeros, like dense on a zero vector). */
case class SparseCosineDistance(left: Expression, right: Expression)
  extends SparseBinaryExpression {
  override def prettyName: String = "sparse_cosine_distance"

  override def nullSafeEval(a: Any, b: Any): Any =
    SparseCosineDistance.compute(a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SparseCosineDistance.compute($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** `sparse_l2_distance(a, b)` — pgvector `sparsevec <-> sparsevec`.
  * Bit-equal to [[L2Distance]] on the zero-filled dense forms: the
  * merge-walk visits indices ascending like the dense loop; a both-zero
  * position adds (0−0)² = +0.0 (IEEE identity), an only-a position adds
  * (x−0)² = x·x and an only-b position (0−y)² = y·y — all bit-identical
  * to the dense terms. */
case class SparseL2Distance(left: Expression, right: Expression)
  extends SparseBinaryExpression {
  override def prettyName: String = "sparse_l2_distance"

  override def nullSafeEval(a: Any, b: Any): Any =
    SparseL2Distance.compute(a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SparseL2Distance.compute($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

object SparseL2Distance {
  def compute(a: InternalRow, b: InternalRow): Double = {
    SparseVec.checkDims(a, b)
    val ai = a.getArray(1); val av = a.getArray(2)
    val bi = b.getArray(1); val bv = b.getArray(2)
    val na = ai.numElements(); val nb = bi.numElements()
    var acc = 0.0
    var p = 0; var q = 0
    while (p < na || q < nb) {
      val ia = if (p < na) ai.getInt(p) else Int.MaxValue
      val ib = if (q < nb) bi.getInt(q) else Int.MaxValue
      if (ia == ib) {
        val d = av.getFloat(p).toDouble - bv.getFloat(q).toDouble
        acc += d * d
        p += 1; q += 1
      } else if (ia < ib) {
        val x = av.getFloat(p).toDouble
        acc += x * x
        p += 1
      } else {
        val y = bv.getFloat(q).toDouble
        acc += y * y
        q += 1
      }
    }
    math.sqrt(acc)
  }
}

/** `sparse_l1_distance(a, b)` — pgvector `sparsevec <+>` (taxicab, 0.8).
  * Bit-equal to [[L1Distance]] on the zero-filled dense forms by the
  * [[SparseL2Distance]] argument (|x−0| = |x|, |0−y| = |y|). */
case class SparseL1Distance(left: Expression, right: Expression)
  extends SparseBinaryExpression {
  override def prettyName: String = "sparse_l1_distance"

  override def nullSafeEval(a: Any, b: Any): Any =
    SparseL1Distance.compute(a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SparseL1Distance.compute($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

object SparseL1Distance {
  def compute(a: InternalRow, b: InternalRow): Double = {
    SparseVec.checkDims(a, b)
    val ai = a.getArray(1); val av = a.getArray(2)
    val bi = b.getArray(1); val bv = b.getArray(2)
    val na = ai.numElements(); val nb = bi.numElements()
    var acc = 0.0
    var p = 0; var q = 0
    while (p < na || q < nb) {
      val ia = if (p < na) ai.getInt(p) else Int.MaxValue
      val ib = if (q < nb) bi.getInt(q) else Int.MaxValue
      if (ia == ib) {
        acc += math.abs(av.getFloat(p).toDouble - bv.getFloat(q).toDouble)
        p += 1; q += 1
      } else if (ia < ib) {
        acc += math.abs(av.getFloat(p).toDouble)
        p += 1
      } else {
        acc += math.abs(bv.getFloat(q).toDouble)
        q += 1
      }
    }
    acc
  }
}

object SparseCosineDistance {
  def compute(a: InternalRow, b: InternalRow): Double = {
    SparseVec.checkDims(a, b)
    val ai = a.getArray(1); val av = a.getArray(2)
    val bi = b.getArray(1); val bv = b.getArray(2)
    val na = ai.numElements(); val nb = bi.numElements()
    var dot = 0.0; var nna = 0.0; var nnb = 0.0
    var p = 0; var q = 0
    // merge-walk in ascending index order: per accumulator this is the
    // same visit sequence as the dense loop (zeros are +0.0 identities)
    while (p < na || q < nb) {
      val ia = if (p < na) ai.getInt(p) else Int.MaxValue
      val ib = if (q < nb) bi.getInt(q) else Int.MaxValue
      if (ia == ib) {
        val x = av.getFloat(p).toDouble; val y = bv.getFloat(q).toDouble
        dot += x * y; nna += x * x; nnb += y * y
        p += 1; q += 1
      } else if (ia < ib) {
        val x = av.getFloat(p).toDouble
        nna += x * x
        p += 1
      } else {
        val y = bv.getFloat(q).toDouble
        nnb += y * y
        q += 1
      }
    }
    1.0 - dot / (math.sqrt(nna) * math.sqrt(nnb))
  }
}
