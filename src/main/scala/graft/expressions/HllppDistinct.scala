package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper
import org.apache.spark.sql.types._

/** `hllpp_distinct(e, rsd)` — Spark's `approx_count_distinct` (HLL++)
  * re-hosted as a TypedImperativeAggregate with ONE binary buffer column,
  * returning the BIT-IDENTICAL estimate (it delegates update/merge/query
  * to Spark's own [[HyperLogLogPlusPlusHelper]], the exact math and
  * XxHash64 path the built-in uses — HllppDistinctSpec pins equality on
  * every input type the queries touch).
  *
  * Why it exists (round-18 profile, guide §1/§4): the built-in
  * `HyperLogLogPlusPlus` models its m/6 register words as SEPARATE LONG
  * AGGREGATION-BUFFER ATTRIBUTES — 2,731 of them at rsd = 0.01 — and
  * every task of every stage touching that aggregate then rebuilds
  * projections over the 2,731-field buffer schema. jstack sampling under
  * the q30 production sketch put the hot frames in
  * `MutableProjection.createCodeGeneratedObject` /
  * `AggregationIterator.<init>` — O(buffer-width) codegen SOURCE
  * generation per task, ~0.3 s apiece at rsd = 0.01, which dominated the
  * whole query at sf0.1 (1.9 s for a 600 k-row aggregate) and is pure
  * per-task fixed cost at any scale (hundreds of tasks at sf100). As a
  * typed aggregate the buffer is one opaque `Array[Long]` (binary on the
  * wire): no wide schema, no per-task codegen over it, same registers,
  * same estimate.
  *
  * Size note: the serialized partial is the same m/6 longs the built-in
  * shuffles (byte-packed instead of field-packed), so exchange bytes are
  * unchanged. Nulls are ignored, matching the built-in.
  */
case class HllppDistinct(
    child: Expression,
    rsdExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val rsd: Double = rsdExpr.eval().asInstanceOf[Number].doubleValue()

  @transient private lazy val helper = new HyperLogLogPlusPlusHelper(rsd)

  override def children: Seq[Expression] = Seq(child, rsdExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!rsdExpr.foldable)
      TypeCheckResult.TypeCheckFailure("rsd must be a literal")
    else if (!rsdExpr.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(
        s"rsd must be a numeric literal, got ${rsdExpr.dataType.sql}")
    else if (rsdExpr.eval() == null ||
      rsdExpr.eval().asInstanceOf[Number].doubleValue() <= 0.0)
      TypeCheckResult.TypeCheckFailure(s"rsd must be > 0, got ${rsdExpr.eval()}")
    else child.dataType match {
      case _: MapType => TypeCheckResult.TypeCheckFailure(
        "hllpp_distinct cannot aggregate map-typed input (same contract as approx_count_distinct)")
      case _ => TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  /** Minimal mutable InternalRow over the word array — the only methods
    * [[HyperLogLogPlusPlusHelper]] touches are getLong/setLong.
    */
  private final class WordsRow(val words: Array[Long]) extends InternalRow {
    override def numFields: Int = words.length
    override def getLong(i: Int): Long = words(i)
    override def setLong(i: Int, v: Long): Unit = words(i) = v
    override def update(i: Int, value: Any): Unit =
      words(i) = value.asInstanceOf[Long]
    override def setNullAt(i: Int): Unit =
      throw new UnsupportedOperationException
    override def copy(): InternalRow = new WordsRow(words.clone())
    override def isNullAt(i: Int): Boolean = false
    override def getBoolean(i: Int): Boolean = throw new UnsupportedOperationException
    override def getByte(i: Int): Byte = throw new UnsupportedOperationException
    override def getShort(i: Int): Short = throw new UnsupportedOperationException
    override def getInt(i: Int): Int = throw new UnsupportedOperationException
    override def getFloat(i: Int): Float = throw new UnsupportedOperationException
    override def getDouble(i: Int): Double = throw new UnsupportedOperationException
    override def getDecimal(i: Int, p: Int, s: Int): org.apache.spark.sql.types.Decimal =
      throw new UnsupportedOperationException
    override def getUTF8String(i: Int): org.apache.spark.unsafe.types.UTF8String =
      throw new UnsupportedOperationException
    override def getBinary(i: Int): Array[Byte] = throw new UnsupportedOperationException
    override def getInterval(i: Int): org.apache.spark.unsafe.types.CalendarInterval =
      throw new UnsupportedOperationException
    override def getVariant(i: Int): org.apache.spark.unsafe.types.VariantVal =
      throw new UnsupportedOperationException
    override def getGeography(i: Int): org.apache.spark.unsafe.types.GeographyVal =
      throw new UnsupportedOperationException
    override def getGeometry(i: Int): org.apache.spark.unsafe.types.GeometryVal =
      throw new UnsupportedOperationException
    override def getStruct(i: Int, n: Int): InternalRow =
      throw new UnsupportedOperationException
    override def getArray(i: Int): org.apache.spark.sql.catalyst.util.ArrayData =
      throw new UnsupportedOperationException
    override def getMap(i: Int): org.apache.spark.sql.catalyst.util.MapData =
      throw new UnsupportedOperationException
    override def get(i: Int, dt: DataType): AnyRef =
      throw new UnsupportedOperationException
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](helper.numWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) helper.update(new WordsRow(buf), 0, v, child.dataType)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    helper.merge(new WordsRow(buf), new WordsRow(other), 0, 0)
    buf
  }

  override def eval(buf: Array[Long]): Any =
    helper.query(new WordsRow(buf), 0)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllppDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllppDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllppDistinct =
    copy(child = newChildren(0), rsdExpr = newChildren(1))

  override def prettyName: String = "hllpp_distinct"
}
