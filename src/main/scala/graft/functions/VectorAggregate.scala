package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** pgvector's vector aggregates — `SUM(vector)` / `AVG(vector)` (pgvector
  * README "Aggregates": vector_add-based sum, avg(vector)) — as ONE
  * element-wise accumulator per (group × partition).
  *
  * The explode-then-groupBy(dim) formulation multiplies the pre-aggregation
  * row count by the dimension (384× for the reference's MiniLM vectors) and
  * shuffles |groups|·dim rows; this TypedImperativeAggregate keeps a single
  * double[] per group and shuffles one array per (group × partition) —
  * partial aggregation stays intact, so the 100 TB shuffle is
  * |groups|·|partitions| arrays regardless of row count.
  *
  * Accumulation is sequential double addition per element (same as
  * [[InnerProduct]]); cross-engine float-sum order still differs, so
  * oracle-gated outputs round to 6dp like every multi-row double sum here.
  *
  * Dimension mismatches throw (pgvector: "expected N dimensions, not M");
  * null vectors are skipped like SQL aggregates; an all-null/empty group
  * evaluates to SQL NULL.
  */
case class VectorSumAvg(
    child: Expression, returnAvg: Boolean,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecAccBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = if (returnAvg) "vector_avg" else "vector_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): VecAccBuffer = new VecAccBuffer

  override def update(buf: VecAccBuffer, input: InternalRow): VecAccBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(a: VecAccBuffer, b: VecAccBuffer): VecAccBuffer = { a.mergeFrom(b); a }

  override def eval(buf: VecAccBuffer): Any =
    if (buf.count == 0L) null
    else {
      val s = buf.sums
      val out = if (returnAvg) {
        val n = buf.count.toDouble
        Array.tabulate(s.length)(i => s(i) / n)
      } else s.clone()
      new GenericArrayData(out)
    }

  override def serialize(buf: VecAccBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): VecAccBuffer = VecAccBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): VectorSumAvg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSumAvg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

/** Element-wise running sums + row count; dimension fixed by the first
  * vector seen (mismatch throws, like pgvector's typed VECTOR(n) column). */
final class VecAccBuffer {
  var sums: Array[Double] = null
  var count: Long = 0L

  def add(v: ArrayData): Unit = {
    val d = v.numElements()
    if (sums == null) sums = new Array[Double](d)
    else require(sums.length == d,
      s"vector dimension mismatch in aggregate: expected ${sums.length}, got $d")
    var i = 0
    while (i < d) { sums(i) += v.getFloat(i).toDouble; i += 1 }
    count += 1L
  }

  def mergeFrom(other: VecAccBuffer): Unit = {
    if (other.sums == null) return
    if (sums == null) { sums = other.sums.clone(); count = other.count; return }
    require(sums.length == other.sums.length,
      s"vector dimension mismatch in merge: ${sums.length} vs ${other.sums.length}")
    var i = 0
    while (i < sums.length) { sums(i) += other.sums(i); i += 1 }
    count += other.count
  }

  def toBytes: Array[Byte] = {
    val d = if (sums == null) 0 else sums.length
    val bb = ByteBuffer.allocate(8 + 4 + 8 * d)
    bb.putLong(count).putInt(d)
    var i = 0
    while (i < d) { bb.putDouble(sums(i)); i += 1 }
    bb.array()
  }
}

object VecAccBuffer {
  def fromBytes(bytes: Array[Byte]): VecAccBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new VecAccBuffer
    buf.count = bb.getLong
    val d = bb.getInt
    if (d > 0 || buf.count > 0) {
      buf.sums = new Array[Double](d)
      var i = 0
      while (i < d) { buf.sums(i) = bb.getDouble; i += 1 }
    }
    buf
  }
}
