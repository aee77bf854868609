package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_hash31(text)` → bigint: the polynomial rolling hash
  * `foldl(acc · 31 + codepoint) mod 1e9+7` over the text's Unicode code
  * points — q26's document fingerprint, fused.
  *
  * Exact-parity twin of the composable chain
  * `aggregate(transform(sequence(1, length(text)), i ->
  *            ascii(substr(text, i, 1))), 0L, (acc, c) -> ...)`:
  * Spark's `substr`/`length` index by code points and `ascii` returns the
  * code point, so a single forward code-point walk reproduces the fold
  * bit-for-bit. The composable form is O(len²) per document —
  * `substr(text, i, 1)` re-seeks the variable-width UTF-8 buffer from
  * byte 0 for every i (measured: 328 s of the sf10 verify on ~1 kB docs,
  * ~5·10¹¹ byte steps) — and allocates a sequence + transformed array per
  * row; this is one O(len) pass with no allocation beyond the decoded
  * string. Null text → null (the chain's aggregate over a null array).
  */
case class RollingHash31(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash31 expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(t: Any): Any = {
    val s = t.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  override def prettyName: String = "rolling_hash31"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
