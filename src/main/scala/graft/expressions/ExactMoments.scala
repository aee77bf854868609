package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** `exact_moments(q, p)` — the five exact raw moments
  * (Σq, Σp, Σq², Σp², Σqp) plus the row count, over two compact-decimal
  * columns, in ONE aggregate whose per-row arithmetic is pure 64/128-bit
  * integer math.
  *
  * Why it exists (round-18 profile of q88, guide §1.2 per-task work +
  * §4 expression choice): the portable-stats moment aggregation
  * `sum(qd*pd)` over `decimal(18,6)` casts pays BigDecimal per row —
  * Spark's `Decimal.*` ALWAYS routes through
  * `toJavaBigDecimal.multiply`, the `decimal(37,12)` product then pays
  * `changePrecision`, and the running `decimal(38,12)` sum crosses the
  * 10¹⁸ compact-long ceiling early in every partition, after which each
  * add is a BigDecimal allocation too. Measured at sf100: 2,023 CPU-s
  * for a 3-group aggregate over 600 M rows (~3.4 µs/row), ~27 of 32
  * cores busy on decimal boxing — the suite's 4th-worst row (74.5 s).
  *
  * The unscaled value of a `decimal(p≤18, s)` is one long, so the exact
  * moments are integer sums: q·p is a 128-bit product
  * (`Math.multiplyHigh` + low word), accumulated into a 128-bit
  * two's-complement accumulator with carry — overflow-free below
  * ~1.7e38 · 10⁻¹², the same magnitude where `decimal(38,12)` itself
  * saturates. The exact integer sums convert to the built-in sums'
  * Decimal types ONCE PER GROUP at eval, so results are BIT-IDENTICAL
  * to the separate `sum()` aggregates (ExactMomentsSpec pins equality
  * on random data, nulls included, through forced multi-partial
  * merges):
  *
  *   - `n`  = `count(lit(1))` — counts every row,
  *   - `sq`/`sp` = `sum(q)`/`sum(p)` as `decimal(min(38,p+10), s)`,
  *     null iff the group saw no non-null value (built-in sum contract),
  *   - `sqq`/`spp`/`sqp` = `sum(q*q)`/`sum(p*p)`/`sum(q*p)` as
  *     `decimal(min(38, 2p+11), 2s)` — a product term accumulates iff
  *     BOTH operands are non-null, exactly like the built-in
  *     `sum(a*b)` (null product skipped).
  *
  * 100 TB shape: unchanged from the sums it replaces — partial
  * map-side aggregation, one tiny (11-long) buffer per group on the
  * exchange instead of five decimal buffers.
  */
case class ExactMoments(
    qChild: Expression,
    pChild: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ExactMoments.Buf] {

  import ExactMoments._

  override def children: Seq[Expression] = Seq(qChild, pChild)

  override def checkInputDataTypes(): TypeCheckResult = children.map(_.dataType) match {
    case Seq(q: DecimalType, p: DecimalType)
      if q.precision <= Decimal.MAX_LONG_DIGITS && p.precision <= Decimal.MAX_LONG_DIGITS =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"exact_moments expects two decimal(p<=18, s) columns, got ${other.map(_.sql)}")
  }

  private lazy val Seq(qType, pType) =
    children.map(_.dataType.asInstanceOf[DecimalType])

  // DecimalType.bounded is private[sql]; 38 = DecimalType.MAX_PRECISION
  private def sumType(t: DecimalType): DecimalType =
    DecimalType(math.min(38, t.precision + 10), t.scale)
  private def prodSumType(a: DecimalType, b: DecimalType): DecimalType =
    DecimalType(math.min(38, a.precision + b.precision + 1 + 10), a.scale + b.scale)

  override lazy val dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sq", sumType(qType)),
    StructField("sp", sumType(pType)),
    StructField("sqq", prodSumType(qType, qType)),
    StructField("spp", prodSumType(pType, pType)),
    StructField("sqp", prodSumType(qType, pType))))

  override def nullable: Boolean = false

  override def createAggregationBuffer(): Buf = new Buf

  override def update(buf: Buf, input: InternalRow): Buf = {
    val qv = qChild.eval(input)
    val pv = pChild.eval(input)
    buf.n += 1
    if (qv != null) {
      val q = qv.asInstanceOf[Decimal].toUnscaledLong
      buf.seenQ = true
      buf.add(SQ, q >> 63, q)
      buf.mulAdd(SQQ, q, q)
      if (pv != null) buf.mulAdd(SQP, q, pv.asInstanceOf[Decimal].toUnscaledLong)
    }
    if (pv != null) {
      val p = pv.asInstanceOf[Decimal].toUnscaledLong
      buf.seenP = true
      buf.add(SP, p >> 63, p)
      buf.mulAdd(SPP, p, p)
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    buf.n += other.n
    buf.seenQ |= other.seenQ
    buf.seenP |= other.seenP
    var i = 0
    while (i < 5) {
      buf.add(i, other.acc(2 * i), other.acc(2 * i + 1))
      i += 1
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    def dec(i: Int, t: DecimalType, seen: Boolean): Decimal =
      if (!seen) null
      else {
        val bytes = ByteBuffer.allocate(16)
          .putLong(buf.acc(2 * i)).putLong(buf.acc(2 * i + 1)).array()
        Decimal(BigDecimal(
          new java.math.BigDecimal(new java.math.BigInteger(bytes), t.scale)),
          t.precision, t.scale)
      }
    new GenericInternalRow(Array[Any](
      buf.n,
      dec(SQ, sumType(qType), buf.seenQ),
      dec(SP, sumType(pType), buf.seenP),
      dec(SQQ, prodSumType(qType, qType), buf.seenQ),
      dec(SPP, prodSumType(pType, pType), buf.seenP),
      dec(SQP, prodSumType(qType, pType), buf.seenQ && buf.seenP)))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * 11 + 1)
    bb.putLong(buf.n)
    buf.acc.foreach(bb.putLong)
    bb.put((((if (buf.seenQ) 1 else 0)) | (if (buf.seenP) 2 else 0)).toByte)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Buf
    buf.n = bb.getLong
    var i = 0
    while (i < 10) { buf.acc(i) = bb.getLong; i += 1 }
    val flags = bb.get()
    buf.seenQ = (flags & 1) != 0
    buf.seenP = (flags & 2) != 0
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExactMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExactMoments =
    copy(qChild = newChildren(0), pChild = newChildren(1))

  override def prettyName: String = "exact_moments"
}

object ExactMoments {
  // accumulator slots: acc(2i) = high word, acc(2i+1) = low word
  final val SQ = 0
  final val SP = 1
  final val SQQ = 2
  final val SPP = 3
  final val SQP = 4

  final class Buf {
    var n: Long = 0L
    var seenQ: Boolean = false
    var seenP: Boolean = false
    val acc: Array[Long] = new Array[Long](10)

    /** acc(i) += (hi, lo) as a 128-bit two's-complement add. */
    def add(i: Int, hi: Long, lo: Long): Unit = {
      val oldLo = acc(2 * i + 1)
      val newLo = oldLo + lo
      acc(2 * i + 1) = newLo
      val carry = if (java.lang.Long.compareUnsigned(newLo, oldLo) < 0) 1L else 0L
      acc(2 * i) += hi + carry
    }

    /** acc(i) += a * b, product taken in full 128-bit precision. */
    def mulAdd(i: Int, a: Long, b: Long): Unit =
      add(i, Math.multiplyHigh(a, b), a * b)
  }
}
