package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_agg(expectedItems, e[, fpp])` → binary: a Bloom filter over
  * every non-null value of `e`, built as a mergeable aggregate (partials
  * OR their bit arrays, so the result is identical under any
  * partitioning).
  *
  * This is the join-pruning summary for the 100 TB shape where the
  * filtered build side's KEY SET is too large for a broadcast-hash join
  * (10⁹ keys ≈ tens of GB as a hash table) but its Bloom image is not
  * (~1.2 GB at 1 % fpp, ~9.6 bits/key — and a few MB at the 10⁶-key
  * scale): broadcast the filter, drop non-matching probe rows BEFORE the
  * join shuffle, then confirm with the exact join. False positives only
  * cost wasted shuffle bytes; false negatives cannot occur, so
  * prefilter + exact join ≡ exact join (q79's oracle checks exactly
  * that). Spark's own runtime row-level filtering
  * (`spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`) automates
  * the same pattern for equi-joins; this operator makes it available
  * explicitly — across separate jobs (persist the filter), against
  * non-equi confirm logic, or under a planner that didn't fire.
  *
  * The optional `fpp` literal (default: the sketch library's 3 %) sets
  * the design false-positive rate — the knob a deployment turns
  * explicitly, because it IS the cost model: image bits/key ≈
  * −1.44·log₂(fpp) (3 % → ~7.3, 1 % → ~9.6), while probe-side wasted
  * shuffle scales linearly with the achieved fpp. Pruning a 100 TB scan
  * usually earns a point or two of extra image size.
  *
  * Uses Spark's public `org.apache.spark.util.sketch.BloomFilter`
  * (fixed-seed Murmur3), so the bit image is deterministic for a given
  * (value set, expected, fpp). Supported key types: integral (hashed as
  * long) and string (hashed as UTF-8 bytes) — the two real-world
  * join-key shapes.
  */
case class BloomFilterAgg(
    expectedExpr: Expression,
    child: Expression,
    fppExpr: Option[Expression] = None,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  private lazy val expected: Long = expectedExpr.eval().asInstanceOf[Number].longValue()
  private lazy val fpp: Option[Double] = fppExpr.map(f => BloomFilterAgg.toDouble(f.eval()))

  override def children: Seq[Expression] = Seq(expectedExpr, child) ++ fppExpr

  override def checkInputDataTypes(): TypeCheckResult =
    if (!expectedExpr.foldable)
      TypeCheckResult.TypeCheckFailure("expectedItems must be a literal")
    else if (!Seq(ByteType, ShortType, IntegerType, LongType).contains(expectedExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"expectedItems must be an integral literal, got ${expectedExpr.dataType.sql}")
    else if (expectedExpr.eval() == null ||
      expectedExpr.eval().asInstanceOf[Number].longValue() < 1)
      TypeCheckResult.TypeCheckFailure(s"expectedItems must be >= 1, got ${expectedExpr.eval()}")
    // A bare SQL literal like 0.01 parses as DECIMAL(2,2), not DOUBLE —
    // accept it, or the natural spelling bloom_agg(n, k, 0.01) errors.
    else if (fppExpr.exists(f => !f.foldable ||
      !(f.dataType == FloatType || f.dataType == DoubleType ||
        f.dataType.isInstanceOf[DecimalType])))
      TypeCheckResult.TypeCheckFailure("fpp must be a numeric literal")
    else if (fppExpr.exists { f =>
      val v = f.eval(); v == null || {
        val d = BloomFilterAgg.toDouble(v); d <= 0d || d >= 1d
      }
    })
      TypeCheckResult.TypeCheckFailure(s"fpp must be in (0, 1), got ${fppExpr.get.eval()}")
    else child.dataType match {
      case ByteType | ShortType | IntegerType | LongType | StringType =>
        TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"bloom_agg supports integral and string keys, got ${dt.sql}")
    }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): BloomFilter = fpp match {
    case Some(p) => BloomFilter.create(expected, p)
    case None => BloomFilter.create(expected)
  }

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case StringType => buf.putBinary(v.asInstanceOf[UTF8String].getBytes)
      case _ => buf.putLong(v.asInstanceOf[Number].longValue())
    }
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
    buf.mergeInPlace(other)
    buf
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomFilterAgg =
    copy(expectedExpr = newChildren(0), child = newChildren(1),
      fppExpr = if (newChildren.length > 2) Some(newChildren(2)) else None)

  override def prettyName: String = "bloom_agg"
}

object BloomFilterAgg {
  private def toDouble(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number => n.doubleValue()
  }
}
