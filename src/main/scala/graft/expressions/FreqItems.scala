package graft.expressions

import java.nio.ByteBuffer
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra-Gries heavy-hitters sketch as a mergeable aggregate:
  * `freq_items(k, e)` → array<typeof(e)> of at most k candidate items,
  * with the classic GUARANTEE that every item whose true frequency
  * exceeds n/(k+1) is in the result — O(k) state per partial regardless
  * of input size or cardinality, which is what makes corpus-wide
  * heavy-hitter mining (hot domains, hot tokens, hot keys for salting
  * decisions) a single one-shuffle aggregation at 100 TB where an exact
  * GROUP BY would shuffle the full key space.
  *
  * The candidate SET beyond the guaranteed items depends on merge order
  * (as with any MG summary), so the output is an approximate SUPERSET,
  * not a deterministic value: consume it as a pruning set and confirm
  * with exact counts of the <= k candidates (q73's shape) — the
  * confirmed set equals the true heavy-hitter set under any
  * partitioning. Output items are sorted (natural order) for stability
  * of presentation only. Nulls are ignored.
  *
  * update: counter present → +1; spare slot → insert; else decrement
  * all (the classic k-counter step). merge: sum counters, then subtract
  * the (k+1)-th largest count and drop non-positives (Agarwal et al.'s
  * mergeable-summaries reduction, preserving the undercount bound).
  */
case class FreqItems(
    kExpr: Expression,
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Any, Long]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  @transient private lazy val ord: Ordering[Any] =
    org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(child.dataType).asInstanceOf[Ordering[Any]]

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

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Any, Long], input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.get(v) match {
        case Some(c) => buf.update(v, c + 1)
        case None if buf.size < k => buf.update(InternalRow.copyValue(v), 1L)
        case None => // decrement-all: amortized O(1) per input
          val dead = buf.iterator.filter(_._2 == 1L).map(_._1).toList
          buf.mapValuesInPlace((_, c) => c - 1)
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[Any, Long], other: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    other.foreach { case (v, c) =>
      buf.update(v, buf.getOrElse(v, 0L) + c)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count; strictly larger survive
      val d = buf.valuesIterator.toArray.sortInPlaceWith(_ > _).apply(k)
      val dead = buf.iterator.filter(_._2 <= d).map(_._1).toList
      buf.mapValuesInPlace((_, c) => c - d)
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[Any, Long]): Any =
    new GenericArrayData(buf.keysIterator.toArray.sorted(ord))

  // Generic (value, count) record serialization via UnsafeProjection —
  // the same shape BoundedSortedList uses for arbitrary element types.
  @transient private lazy val proj =
    UnsafeProjection.create(Array(child.dataType, LongType))
  @transient private lazy val holder =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val records = buf.toArray.map { case (v, c) =>
      holder.update(0, v)
      holder.update(1, c)
      proj(holder).copy().getBytes
    }
    val bb = ByteBuffer.allocate(4 + records.map(_.length + 4).sum)
    bb.putInt(records.length)
    records.foreach { r => bb.putInt(r.length); bb.put(r) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    val row = new UnsafeRow(2)
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val rec = new Array[Byte](len)
      bb.get(rec)
      row.pointTo(rec, len)
      buf.update(InternalRow.copyValue(row.get(0, child.dataType)), row.getLong(1))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqItems =
    copy(kExpr = newChildren(0), child = newChildren(1))

  override def prettyName: String = "freq_items"
}
