package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Signature aggregates for dedup at scale.
  *
  * The composable formulation explodes every (doc, token-hash) row into 64
  * permutation/bit rows before aggregating — a 64× shuffle amplification
  * (~16M intermediate rows at sf0.1). These TypedImperativeAggregates fold
  * the 64 lanes into one pass over the input with a fixed-size buffer, so
  * the shuffle carries one partial buffer per (group × partition).
  */

/** MinHash signature: per group, `sig[i] = min over rows of hᵢ(x)` with
  * hᵢ(x) = ((i·2654435761 | 1) mod P · x + i·40503 + 7) mod P.
  * Input MUST already be reduced into [0, P) (pmod(md5_long, P)) so the
  * products stay below 2⁶³ (P² < 2⁶³). */
case class MinhashSignature(
    child: Expression, numPerms: Int, prime: Long,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(s"$prettyName requires bigint, got ${o.catalogString}")
  }

  private val permA: Array[Long] =
    Array.tabulate(numPerms)(i => ((i.toLong * 2654435761L) | 1L) % prime)
  private val permB: Array[Long] =
    Array.tabulate(numPerms)(i => i.toLong * 40503L + 7L)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numPerms) {
        val hv = (permA(i) * h + permB(i)) % prime
        if (hv < buf(i)) buf(i) = hv
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerms) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numPerms)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numPerms)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinhashSignature =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinhashSignature =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** 64-bit SimHash: per group, bit i of the result is set iff the count of
  * inputs with bit i set exceeds the count with it clear. */
case class SimhashSignature(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(s"$prettyName requires bigint, got ${o.catalogString}")
  }

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) buf(i) += 1 else buf(i) -= 1
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var i = 0
    while (i < 64) { if (buf(i) >= 0) sig |= (1L << i); i += 1 }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * 64)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(o: Int): SimhashSignature =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimhashSignature =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}
