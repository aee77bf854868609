package graft.expressions

import java.nio.ByteBuffer
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k (score, id) pairs with the highest
  * score (ties broken by lower id) in a fixed-size heap.
  *
  * This is the scale path for per-query KNN: `row_number() OVER
  * (PARTITION BY q ORDER BY sim DESC)` must shuffle and SORT every
  * candidate row per query; this aggregate reduces map-side to k entries
  * per (query, partition) before the exchange — state is O(k) regardless
  * of candidate count, and partials merge associatively. Usage:
  * `topk_pairs(k, score, id)` → array<struct<score double, id bigint>>
  * sorted score-desc.
  */
case class TopKPairs(
    kExpr: Expression,
    score: Expression,
    id: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(kExpr, score, id)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable) TypeCheckResult.TypeCheckFailure("k must be a literal")
    else if (!Seq(ByteType, ShortType, IntegerType, LongType).contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure(s"k must be an integral literal, got ${kExpr.dataType.sql}")
    else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Number].longValue() < 1)
      TypeCheckResult.TypeCheckFailure(s"k must be >= 1, got ${kExpr.eval()}")
    else if (score.dataType != DoubleType) TypeCheckResult.TypeCheckFailure("score must be double")
    else if (id.dataType != LongType) TypeCheckResult.TypeCheckFailure("id must be bigint")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def nullable: Boolean = false

  // min-heap on (score asc, id desc): the head is the WORST kept entry,
  // evicted when a better candidate arrives.
  private val heapOrder: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(heapOrder)

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)], e: (Double, Long)): Unit =
    if (buf.size < k) buf.enqueue(e)
    else if (better(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)], input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) offer(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortWith(better)
    new GenericArrayData(sorted.map { case (s, i) => InternalRow(s, i) }.toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((bb.getDouble, bb.getLong)))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(kExpr = newChildren(0), score = newChildren(1), id = newChildren(2))

  override def prettyName: String = "topk_pairs"
}
