package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k by (distance ASC, id ASC): the two-phase distributed top-k
  * primitive for batch similarity search.
  *
  * The single-window formulation (`row_number over (partition by qid order
  * by dist)`) funnels |base|×|queries| scored rows into |queries| reducers —
  * one giant skewed shuffle at scale. This TypedImperativeAggregate instead
  * keeps a SIZE-k HEAP per (group × partition) on the map side (partial
  * aggregation), so the shuffle carries at most k rows per group per
  * partition, and the final merge is a k-way heap union — the same
  * two-phase shape `TakeOrderedAndProject` uses for global top-k, applied
  * per group.
  *
  * Result: `array<struct<vec_id: long, dist: double>>` sorted by
  * (dist ASC, vec_id ASC) — posexplode for (rank, id, dist) rows.
  */
case class TopKByDistance(
    distChild: Expression, idChild: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"top_k_by_distance requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(distChild, idChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("dist", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "top_k_by_distance"

  override def checkInputDataTypes(): TypeCheckResult =
    (distChild.dataType, idChild.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (d, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint), got (${d.catalogString}, ${i.catalogString})")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val d = distChild.eval(input)
    val id = idChild.eval(input)
    if (d != null && id != null) buf.offer(d.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = { a.mergeFrom(b); a }

  override def eval(buf: TopKBuffer): Any = {
    val sorted = buf.sorted
    new GenericArrayData(sorted.map { case (d, id) =>
      InternalRow(id, d)
    })
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer = TopKBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKByDistance =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByDistance =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(distChild = c(0), idChild = c(1))
}

/** Size-bounded max-heap on (dist, id): the root is the WORST retained
  * entry, so an incoming candidate replaces it iff strictly better under
  * (dist ASC, id ASC) — ties broken by id for cross-engine determinism.
  *
  * ID-DISTINCT: a candidate whose id is already retained replaces the
  * retained entry iff its distance is better, instead of occupying a
  * second slot. Exact top-k inputs never repeat an id (a member belongs
  * to exactly one IVF list; cross-join pairs are distinct), so this only
  * engages for SYMMETRIC co-probe candidate streams
  * ([[graft.operators.SimilarityQueries.knnGraphIvf]] scores each pair
  * from both directions), where a duplicate would otherwise burn a slot
  * of every heap it reaches — including across partial buffers at merge
  * time, which no pre-aggregation distinct can see. The membership scan
  * is O(k) per offer with k ≤ tens everywhere in this engine. */
final class TopKBuffer(k: Int) {
  // parallel arrays, heap-ordered; size ≤ k
  private val ds = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var n = 0

  // true if (d1, id1) orders AFTER (d2, id2) — i.e. is worse
  @inline private def worse(d1: Double, id1: Long, d2: Double, id2: Long): Boolean =
    d1 > d2 || (d1 == d2 && id1 > id2)

  def offer(d: Double, id: Long): Unit = {
    // NaN never enters the heap: `worse` is false for every NaN comparison,
    // so a NaN that got in could never be evicted and would break the heap
    // invariant (the window formulation this replaces sorted NaN last;
    // cosine_distance yields NaN for a zero-norm vector)
    if (java.lang.Double.isNaN(d)) return
    // id-distinct (see class doc): an already-retained id improves in
    // place or is ignored — improving shrinks the key, which in a
    // worst-at-root heap can only violate the invariant toward the
    // leaves, so siftDown restores it
    var j = 0
    while (j < n) {
      if (ids(j) == id) {
        if (worse(ds(j), ids(j), d, id)) { ds(j) = d; siftDown(j) }
        return
      }
      j += 1
    }
    if (n < k) {
      ds(n) = d; ids(n) = id; n += 1
      siftUp(n - 1)
    } else if (worse(ds(0), ids(0), d, id)) {
      ds(0) = d; ids(0) = id
      siftDown(0)
    }
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(ds(i), ids(i), ds(p), ids(p))) {
        val td = ds(i); ds(i) = ds(p); ds(p) = td
        val ti = ids(i); ids(i) = ids(p); ids(p) = ti
        i = p
      } else return
    }
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var m = i
      if (l < n && worse(ds(l), ids(l), ds(m), ids(m))) m = l
      if (r < n && worse(ds(r), ids(r), ds(m), ids(m))) m = r
      if (m == i) return
      val td = ds(i); ds(i) = ds(m); ds(m) = td
      val ti = ids(i); ids(i) = ids(m); ids(m) = ti
      i = m
    }
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { offer(other.ds(i), other.ids(i)); i += 1 }
  }

  /** Retained entries ordered by (dist ASC, id ASC). */
  def sorted: Array[(Double, Long)] = {
    val out = Array.tabulate(n)(i => (ds(i), ids(i)))
    out.sortInPlace()(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
    out
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(ds(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val m = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < m) { buf.offer(bb.getDouble, bb.getLong); i += 1 }
    buf
  }
}
