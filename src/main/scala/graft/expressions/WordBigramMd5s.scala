package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-bigram md5 digests: `word_bigram_md5s(text)` →
  * array<string> — element i is the lowercase hex md5 of
  * `concat(tok[i], ' ', tok[i+1])` over `split(text, ' ')`.
  *
  * Exact-parity twin of q70's composable chain (split → transform
  * concat → md5 per bigram), built on one observation: tokens from a
  * single-space split are separated by exactly one space, so
  * `concat(tok[i], ' ', tok[i+1])` IS the contiguous byte range of the
  * original text from tok[i]'s start to tok[i+1]'s end — including
  * every empty-token case (consecutive/leading/trailing spaces, where
  * the empty token contributes nothing and the range still reproduces
  * the concat exactly). md5 therefore runs straight on text byte
  * windows: no token array, no per-bigram concat string, no HOF
  * interpreter.
  *
  * Edge parity with `case when size(toks) >= 2 then ... else array()`:
  * fewer than two tokens → empty array; null text → empty array too
  * (the chain's CASE condition is null → else branch), so the
  * expression is non-nullable and `explode` drops the doc either way.
  */
case class WordBigramMd5s(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_bigram_md5s expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = false

  // Per-THREAD digest: safe under concurrent eval of a shared instance
  // (see MinhashSigs — same contract), same per-task cost.
  @transient private lazy val mdTL: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private val HexBytes = "0123456789abcdef".getBytes("US-ASCII")

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    if (t == null) return new GenericArrayData(Array.empty[Any])
    val bytes = t.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    // token span boundaries around each 0x20 byte: token i spans
    // (starts(i), ends(i)); #tokens = #spaces + 1
    var spaces = 0
    var b = 0
    while (b < n) { if (bytes(b) == 0x20) spaces += 1; b += 1 }
    if (spaces == 0) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](spaces + 1)
    val ends = new Array[Int](spaces + 1)
    starts(0) = 0
    var ti = 0
    b = 0
    while (b < n) {
      if (bytes(b) == 0x20) { ends(ti) = b; ti += 1; starts(ti) = b + 1 }
      b += 1
    }
    ends(ti) = n
    val md = mdTL.get()
    val out = new Array[Any](spaces)
    var i = 0
    while (i < spaces) {
      md.reset()
      md.update(bytes, starts(i), ends(i + 1) - starts(i))
      val d = md.digest()
      // hex is pure ASCII: write nibbles straight into the UTF8String's
      // backing bytes — one allocation, no char[]/String/re-encode pass
      val hex = new Array[Byte](32)
      var j = 0
      while (j < 16) {
        hex(2 * j) = HexBytes((d(j) >> 4) & 0xf)
        hex(2 * j + 1) = HexBytes(d(j) & 0xf)
        j += 1
      }
      out(i) = UTF8String.fromBytes(hex)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "word_bigram_md5s"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
