package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.{BigDecimal => JBD, BigInteger, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Single-buffer covariance-moment aggregate: for an `array<float>` column
  * of dimension d, accumulates the d(d+1)/2 upper-triangle second-moment
  * sums Σ round(xᵢ·xⱼ, 9), the d first-moment sums Σ round(xᵢ, 9) and the
  * row count n — the exact-DECIMAL recipe behind
  * [[graft.operators.SimilarityQueries.embeddingCovariance]], in ONE pass
  * with ZERO per-term row materialization.
  *
  * This replaces the posexplode([[TriProducts]]) + groupBy(pos) formulation,
  * which emitted d(d+1)/2 + d rows PER INPUT ROW into a hash agg — ~2.1k
  * rows/row at d=64 but ~74k at the reference's default 384 dims
  * (README.md:38), where the explode dominated the plan (worst 100× bench
  * ratio). Here the same partial sums live in one map-side buffer per
  * partition (the [[TopKByDistance]] pattern), so the shuffle carries ONE
  * buffer per partition regardless of d or corpus size, and d is learned
  * from the data instead of being compile-time bound.
  *
  * Arithmetic is replicated from the Catalyst expressions it replaces, term
  * for term, so the DuckDB oracle stays bit-green:
  *   - `round(p, 9)` (Round on DoubleType): shortest-string BigDecimal of
  *     the double, setScale(9, HALF_UP), back to double. A dyadic rational
  *     can never tie at a decimal midpoint, so HALF_UP is unambiguous.
  *   - `cast(… as decimal(28,9))`: shortest-string BigDecimal again,
  *     setScale(9, HALF_UP) — the scale-9 unscaled integer we sum.
  *   - `sum(decimal)`: exact integer arithmetic, order-free. The buffer
  *     keeps a long fast path per slot and escalates that slot to
  *     BigInteger on overflow, so the sum stays EXACT at any corpus size
  *     (no DECIMAL(38) ceiling).
  *   - NaN/±Inf terms become NULL under the double→decimal cast and are
  *     skipped by sum — mirrored by skipping the term here.
  *
  * Result: `struct<sums: array<decimal(38,9)>, n: bigint>` with sums laid
  * out as the row-major upper triangle followed by the d first moments —
  * the layout [[graft.operators.SimilarityQueries.collectMoments]] decodes.
  * A ragged corpus (mixed dims) fails loud, like the per-pos count check
  * it replaces.
  */
case class CovMomentSums(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CovMomentsBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("sums", ArrayType(DecimalType(38, 9), containsNull = false),
      nullable = false),
    StructField("n", LongType, nullable = false)))
  override def prettyName: String = "cov_moment_sums"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): CovMomentsBuffer = new CovMomentsBuffer

  override def update(buf: CovMomentsBuffer, input: InternalRow): CovMomentsBuffer = {
    val v = child.eval(input)
    if (v != null) buf.addRow(v.asInstanceOf[ArrayData].toFloatArray())
    buf
  }

  override def merge(a: CovMomentsBuffer, b: CovMomentsBuffer): CovMomentsBuffer = {
    a.mergeFrom(b); a
  }

  override def eval(buf: CovMomentsBuffer): Any = {
    require(buf.dims > 0,
      s"$prettyName: no input rows — covariance/PCA over an empty corpus " +
        "(every embedding was null or the input relation is empty)")
    val decs = buf.totals.map { u =>
      // throws if a sum ever outgrew 38 digits — fail loud, never truncate
      Decimal(new JBD(u, 9), 38, 9)
    }
    InternalRow(new GenericArrayData(decs.asInstanceOf[Array[Any]]), buf.rows)
  }

  override def serialize(buf: CovMomentsBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): CovMomentsBuffer =
    CovMomentsBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CovMomentSums =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CovMomentSums =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

/** Mutable moment-sum buffer: one scale-9 unscaled LONG per slot as the
  * fast path, escalated per-slot to BigInteger on overflow (a slot needs
  * ~2⁶³/10⁹ ≈ 9·10⁹ in summed magnitude before spilling — raw embedding
  * coordinates never get there; enormous corpora or large-magnitude
  * features do, exactly once per ~9·10⁹ accumulated units). */
final class CovMomentsBuffer {
  private[functions] var d: Int = -1
  private[functions] var n: Long = 0L
  private[functions] var lo: Array[Long] = null
  private[functions] var hi: Array[BigInteger] = null // null entries = 0

  def dims: Int = d
  def rows: Long = n

  private def init(dim: Int): Unit = {
    d = dim
    val slots = dim * (dim + 1) / 2 + dim
    lo = new Array[Long](slots)
    hi = new Array[BigInteger](slots)
  }

  /** Scale-9 unscaled value of Spark's `cast(round(p, 9) as decimal(28,9))`,
    * or null for the NaN/Inf → NULL path. */
  private[graft] def term9(p: Double): BigInteger = {
    if (java.lang.Double.isNaN(p) || java.lang.Double.isInfinite(p)) return null
    // Round(double, 9): shortest-string decimal, HALF_UP, back to double
    val r9 = JBD.valueOf(p).setScale(9, RoundingMode.HALF_UP).doubleValue
    // Cast(double, decimal(28,9)): shortest-string decimal, HALF_UP setScale
    JBD.valueOf(r9).setScale(9, RoundingMode.HALF_UP).unscaledValue()
  }

  /** Double-arithmetic fast path for [[term9]], or [[CovMomentsBuffer.NoFast]]
    * to demand the exact BigDecimal route. `BigDecimal.valueOf` stringifies
    * the double per call — ~2.1k terms/row at d=64 made the aggregate
    * allocation-bound at corpus scale (measured: the 300× scale bench sat
    * in term9 for 20+ minutes). The fast value is returned ONLY when it is
    * PROVABLY the term9 value:
    *
    *   - |p| < 2²⁰, so the scale-9 unscaled value |p·10⁹| < 2⁵⁰ is exact in
    *     double AND the intermediate r9 (the 9-rounded double term9 routes
    *     through) round-trips: |r9 − u·10⁻⁹| ≤ ½ulp(r9) < ½·10⁻⁹, so the
    *     second HALF_UP setScale lands on the same u; and
    *   - the fractional part of p·10⁹ sits further than 4 ulp from the ½
    *     rounding boundary, covering the ×10⁹ multiplication error and the
    *     shortest-string-vs-binary gap (BigDecimal.valueOf sees
    *     Double.toString's value, within ½ulp of binary p). Away from the
    *     boundary, floor+(frac>½) equals HALF_UP for either sign; exact
    *     halves (where HALF_UP's away-from-zero tie matters) always fall
    *     inside the guard and take the slow path.
    *
    * Boundary/NaN/huge inputs all fall back — CovMomentsAggregateSpec
    * sweeps the guard with exact-half and near-half grids. */
  private[graft] def term9FastOr(p: Double): Long = {
    if (p > -1048576.0 && p < 1048576.0) { // NaN-safe: NaN fails both
      val scaled = p * 1e9
      val fl = math.floor(scaled)
      val frac = scaled - fl
      if (math.abs(frac - 0.5) > math.ulp(scaled) * 4.0 + 4.9e-324)
        return fl.toLong + (if (frac > 0.5) 1L else 0L)
    }
    CovMomentsBuffer.NoFast
  }

  @inline private def addLong(slot: Int, l: Long): Unit = {
    val s = lo(slot) + l
    if (((lo(slot) ^ s) & (l ^ s)) < 0L) { // two's-complement overflow
      hi(slot) = orZero(hi(slot)).add(BigInteger.valueOf(lo(slot)))
      lo(slot) = l
    } else lo(slot) = s
  }

  @inline private def add(slot: Int, u: BigInteger): Unit = {
    if (u == null) return // NULL term: sum() skips it
    if (u.bitLength <= 62) addLong(slot, u.longValue())
    else hi(slot) = orZero(hi(slot)).add(u)
  }

  /** One product/moment term: fast integer path when provably identical,
    * exact BigDecimal path otherwise. */
  @inline private def addTerm(slot: Int, p: Double): Unit = {
    val f = term9FastOr(p)
    if (f != CovMomentsBuffer.NoFast) addLong(slot, f)
    else add(slot, term9(p))
  }

  @inline private def orZero(b: BigInteger): BigInteger =
    if (b == null) BigInteger.ZERO else b

  def addRow(x: Array[Float]): Unit = {
    if (d == -1) init(x.length)
    else require(x.length == d,
      s"cov_moment_sums: ragged embedding dims (saw ${x.length}, expected $d)")
    var slot = 0
    var i = 0
    while (i < d) {
      val xi = x(i).toDouble
      var j = i
      while (j < d) {
        addTerm(slot, xi * x(j).toDouble) // float·float exact in double
        slot += 1
        j += 1
      }
      i += 1
    }
    var k = 0
    while (k < d) {
      addTerm(slot + k, x(k).toDouble)
      k += 1
    }
    n += 1
  }

  def mergeFrom(other: CovMomentsBuffer): Unit = {
    if (other.d == -1) return
    if (d == -1) init(other.d)
    else require(other.d == d,
      s"cov_moment_sums: ragged embedding dims across partitions (${other.d} vs $d)")
    var s = 0
    while (s < lo.length) {
      add(s, BigInteger.valueOf(other.lo(s)))
      if (other.hi(s) != null) add(s, other.hi(s))
      s += 1
    }
    n += other.n
  }

  /** Exact per-slot totals (long fast path + spill), as unscaled scale-9. */
  def totals: Array[BigInteger] = Array.tabulate(lo.length) { s =>
    orZero(hi(s)).add(BigInteger.valueOf(lo(s)))
  }

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(d)
    out.writeLong(n)
    if (d != -1) {
      var s = 0
      while (s < lo.length) {
        out.writeLong(lo(s))
        val h = hi(s)
        if (h == null) out.writeInt(0)
        else {
          val bytes = h.toByteArray
          out.writeInt(bytes.length)
          out.write(bytes)
        }
        s += 1
      }
    }
    out.flush()
    bos.toByteArray
  }
}

object CovMomentsBuffer {
  /** [[CovMomentsBuffer.term9FastOr]]'s "no provable fast value" sentinel —
    * unreachable as a real fast value (those satisfy |u| < 2⁵⁰). */
  private[graft] val NoFast: Long = Long.MinValue

  def fromBytes(bytes: Array[Byte]): CovMomentsBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new CovMomentsBuffer
    val dim = in.readInt()
    val n = in.readLong()
    if (dim != -1) {
      buf.d = dim
      val slots = dim * (dim + 1) / 2 + dim
      buf.lo = new Array[Long](slots)
      buf.hi = new Array[BigInteger](slots)
      var s = 0
      while (s < slots) {
        buf.lo(s) = in.readLong()
        val len = in.readInt()
        if (len > 0) {
          val hb = new Array[Byte](len)
          in.readFully(hb)
          buf.hi(s) = new BigInteger(hb)
        }
        s += 1
      }
    }
    buf.n = n
    buf
  }
}
