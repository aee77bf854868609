package graft.expressions

import java.nio.ByteBuffer
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded, deterministic replacement for `array_sort(collect_list(e))` in
  * the GROUP-BY-bucket pair generators (q18/q37/q32): keeps only the k
  * SMALLEST elements of the group in a fixed-size heap, returned sorted
  * ascending. `bounded_sorted_list(k, e)` → array<typeof(e)>.
  *
  * Why it exists: `collect_list` buffers the ENTIRE group. Banding keeps
  * LSH buckets tiny on real corpora, but a degenerate corpus — millions of
  * identical documents, the normal shape of a duplicate flood at 100 TB —
  * concentrates one bucket in one aggregation buffer and OOMs the task.
  * This aggregate caps the buffer at O(k) per bucket regardless of bucket
  * size, map-side partials included, and "k smallest, ascending" is
  * deterministic under any partitioning / merge order (what makes the
  * capped query still oracle-checkable). A capped bucket degrades
  * gracefully for near-dup DEDUP semantics: the flood's surviving
  * representative (the minimum id) is always kept; only redundant
  * flood-internal pairs are dropped.
  *
  * Works for any orderable element type (ids, structs); structs order
  * field-by-field, matching `array_sort`.
  */
case class BoundedSortedList(
    kExpr: Expression,
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Any]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType).asInstanceOf[Ordering[Any]]

  override def children: Seq[Expression] = Seq(kExpr, child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable) TypeCheckResult.TypeCheckFailure("k must be a literal")
    else if (!Seq(ByteType, ShortType, IntegerType, LongType).contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure(s"k must be an integral literal, got ${kExpr.dataType.sql}")
    else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Number].longValue() < 1)
      TypeCheckResult.TypeCheckFailure(s"k must be >= 1, got ${kExpr.eval()}")
    else if (!org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(child.dataType))
      TypeCheckResult.TypeCheckFailure(s"${child.dataType.sql} is not orderable")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  // Max-heap under the natural ordering: the head is the LARGEST kept
  // element, evicted when a smaller candidate arrives.
  override def createAggregationBuffer(): mutable.PriorityQueue[Any] =
    mutable.PriorityQueue.empty(ord)

  private def offer(buf: mutable.PriorityQueue[Any], v: Any): Unit =
    if (buf.size < k) buf.enqueue(v)
    else if (ord.compare(v, buf.head) < 0) { buf.dequeue(); buf.enqueue(v) }

  override def update(buf: mutable.PriorityQueue[Any], input: InternalRow): mutable.PriorityQueue[Any] = {
    val v = child.eval(input)
    // copyValue: eval may return a reused mutable row/UTF8String backed by
    // the input buffer — buffered elements must own their storage.
    if (v != null) offer(buf, InternalRow.copyValue(v))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[Any], other: mutable.PriorityQueue[Any]): mutable.PriorityQueue[Any] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(buf.toArray.sorted(ord))

  // Generic serialization via UnsafeProjection over a single-field row —
  // the same trick Spark's own Collect aggregates use.
  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))
  @transient private lazy val holder = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)

  override def serialize(buf: mutable.PriorityQueue[Any]): Array[Byte] = {
    val records = buf.toArray.map { v =>
      holder.update(0, v)
      // copy(): the projection reuses its result row — getBytes on it would
      // alias every record to the last element's storage
      proj(holder).copy().getBytes
    }
    val bb = ByteBuffer.allocate(4 + records.map(_.length + 4).sum)
    bb.putInt(records.length)
    records.foreach { r => bb.putInt(r.length); bb.put(r) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Any] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    val row = new UnsafeRow(1)
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val rec = new Array[Byte](len)
      bb.get(rec)
      row.pointTo(rec, len)
      buf.enqueue(InternalRow.copyValue(row.get(0, child.dataType)))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedSortedList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedSortedList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BoundedSortedList =
    copy(kExpr = newChildren(0), child = newChildren(1))

  override def prettyName: String = "bounded_sorted_list"
}
