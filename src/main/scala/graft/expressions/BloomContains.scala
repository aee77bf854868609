package graft.expressions

import java.io.ByteArrayInputStream
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_contains(filter, e)` → boolean: membership test against a
  * [[BloomFilterAgg]]-built filter. May return true for absent values
  * (bounded fpp), never false for present ones — so it is ONLY a
  * prefilter; q79 pairs it with an exact confirm join.
  *
  * The filter column in the intended plan is the one-row aggregate
  * broadcast via `crossJoin(broadcast(...))`, i.e. the SAME byte array
  * reference for every probe row in a task. Deserializing per row would
  * dwarf the membership test, so the expression keeps a per-instance
  * identity-keyed cache of the last deserialized filter — one
  * deserialization per task (per distinct filter object), the same trick
  * Spark's internal `BloomFilterMightContain` gets from its foldable
  * subquery argument, without requiring foldability. Codegen'd via a
  * reference to the expression instance, so the probe side stays inside
  * WholeStageCodegen.
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_contains expects a binary filter, got ${left.dataType.sql}")
    else right.dataType match {
      case ByteType | ShortType | IntegerType | LongType | StringType =>
        TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains supports integral and string keys, got ${dt.sql}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  // Identity-keyed single-entry cache: the broadcast hands every row the
  // same Array[Byte] instance, so `eq` avoids both re-deserialization and
  // content hashing of a multi-MB array.
  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedFilter: BloomFilter = _

  private def filterFor(bytes: Array[Byte]): BloomFilter = {
    if (!(bytes eq cachedBytes)) {
      cachedFilter = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
      cachedBytes = bytes
    }
    cachedFilter
  }

  // Entry point for generated code (and nullSafeEval): boxed key, typed
  // dispatch matching BloomFilterAgg.update.
  def test(bytes: Array[Byte], key: Any): Boolean = {
    val f = filterFor(bytes)
    right.dataType match {
      case StringType => f.mightContainBinary(key.asInstanceOf[UTF8String].getBytes)
      case _ => f.mightContainLong(key.asInstanceOf[Number].longValue())
    }
  }

  override protected def nullSafeEval(f: Any, k: Any): Any =
    test(f.asInstanceOf[Array[Byte]], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, k) => {
      val self = ctx.addReferenceObj("bloomContains", this, classOf[BloomContains].getName)
      val keyBoxed = right.dataType match {
        case StringType => k
        case _ => s"((Object)(Long)(long)$k)"
      }
      s"${ev.value} = $self.test($f, $keyBoxed);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
