package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Half-precision vectors — the pgvector 0.7 `halfvec` analog (pgvector
  * docs: 2-byte float elements, same operator family). Spark has no
  * float16 type, so a halfvec is a BINARY column of little-endian IEEE
  * 754 binary16 words ([[HalfPack]]), 2× smaller than float32 — at 100 TB
  * the win is scan bandwidth, exactly like the SQ8/BQ sidecars.
  *
  * float32 → float16 rounds to nearest-even (the IEEE default, what
  * pgvector's `::halfvec` cast does via hardware F16C); float16 → float32
  * is exact. Both directions are pure bit arithmetic on this JVM (no
  * Float.float16ToFloat before Java 20) and are pinned in HalfVecSpec by
  * an exhaustive all-65536-bit-patterns roundtrip.
  *
  * [[HalfCosineDistance]] unpacks on the fly inside the same sequential
  * double accumulation as [[CosineDistance]] — bit-equal to dense cosine
  * over the unpacked arrays, spec-pinned against the dense expression AND
  * hash-oracled end-to-end: binary16 RNE is expressible exactly in DuckDB
  * SQL ([[graft.OracleSql.halfRne]]), so `halfvec_knn` carries a full
  * oracle like the float32 kNN family.
  */
object HalfFloat {

  /** float32 → binary16 bits, round-to-nearest-even. */
  def toHalf(v: Float): Short = {
    val bits = java.lang.Float.floatToIntBits(v)
    val sign = (bits >>> 16) & 0x8000
    val e = (bits >>> 23) & 0xff
    val m = bits & 0x7fffff
    if (e == 0xff) { // inf / nan
      return (sign | 0x7c00 | (if (m != 0) 0x200 else 0)).toShort
    }
    val newExp = e - 127 + 15
    if (newExp >= 31) return (sign | 0x7c00).toShort // overflow → ±inf
    if (newExp <= 0) {
      if (newExp < -10) return sign.toShort // underflow → ±0
      // subnormal half: implicit-1 mantissa shifted down, RNE
      val full = m | 0x800000
      val shift = 14 - newExp
      var mant = full >>> shift
      val rem = full & ((1 << shift) - 1)
      val half = 1 << (shift - 1)
      if (rem > half || (rem == half && (mant & 1) == 1)) mant += 1
      // a carry out of the 10-bit mantissa lands on exp=1 encoding — correct
      return (sign | mant).toShort
    }
    var mant = m >>> 13
    var ex = newExp
    val rem = m & 0x1fff
    if (rem > 0x1000 || (rem == 0x1000 && (mant & 1) == 1)) {
      mant += 1
      if (mant == 0x400) { mant = 0; ex += 1; if (ex >= 31) return (sign | 0x7c00).toShort }
    }
    (sign | (ex << 10) | mant).toShort
  }

  /** binary16 bits → float32 (exact). */
  def fromHalf(h: Short): Float = {
    val bits = h & 0xffff
    val sign = (bits & 0x8000) << 16
    val e = (bits >>> 10) & 0x1f
    val m = bits & 0x3ff
    if (e == 0) {
      if (m == 0) java.lang.Float.intBitsToFloat(sign)
      else {
        val v = java.lang.Math.scalb(m.toFloat, -24) // subnormal: m·2⁻²⁴, exact
        if (sign != 0) -v else v
      }
    } else if (e == 31) {
      if (m == 0) { if (sign != 0) Float.NegativeInfinity else Float.PositiveInfinity }
      else Float.NaN
    } else {
      java.lang.Float.intBitsToFloat(sign | ((e - 15 + 127) << 23) | (m << 13))
    }
  }

  def pack(v: ArrayData): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](2 * n)
    var i = 0
    while (i < n) {
      val h = toHalf(v.getFloat(i))
      out(2 * i) = (h & 0xff).toByte
      out(2 * i + 1) = ((h >>> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  @inline def halfAt(b: Array[Byte], i: Int): Float =
    fromHalf((((b(2 * i + 1) & 0xff) << 8) | (b(2 * i) & 0xff)).toShort)

  def unpack(b: Array[Byte]): ArrayData = {
    val n = b.length / 2
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = halfAt(b, i); i += 1 }
    new GenericArrayData(out)
  }

  /** Same accumulation sequence as [[CosineDistance.compute]] over the
    * unpacked float values. */
  def cosineDistance(a: Array[Byte], b: Array[Byte]): Double = {
    val n = a.length / 2
    if (b.length != a.length) {
      throw new IllegalArgumentException(
        s"halfvec dimension mismatch: $n vs ${b.length / 2}")
    }
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = halfAt(a, i).toDouble
      val y = halfAt(b, i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** array<float> → halfvec BINARY (2 bytes/element, little-endian). */
case class HalfPack(child: Expression) extends UnaryExpression {
  override def prettyName: String = "half_pack"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    HalfFloat.pack(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HalfFloat.pack($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}

/** halfvec BINARY → array<float> (exact widening). */
case class HalfUnpack(child: Expression) extends UnaryExpression {
  override def prettyName: String = "half_unpack"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    HalfFloat.unpack(v.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HalfFloat.unpack($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}

/** Cosine distance between two halfvec BINARYs — pgvector
  * `halfvec <=> halfvec`; unpacks on the fly, no array materialization. */
case class HalfCosineDistance(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "half_cosine_distance"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, binary), got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    HalfFloat.cosineDistance(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HalfFloat.cosineDistance($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}
