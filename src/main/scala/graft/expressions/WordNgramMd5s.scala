package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native sliding-window word-n-gram md5 digests:
  * `word_ngram_md5s(text, w)` → array<binary> — element i is the RAW
  * 16-byte md5 of `concat_ws(' ', slice(split(text, ' '), i + 1, w))`,
  * one element per window position 1..(tokens − w + 1).
  *
  * [[WordBigramMd5s]] generalized to any window width, on the same
  * observation: tokens from a single-space split are separated by exactly
  * one space, so the w-token window joined by single spaces IS the
  * contiguous byte range of the original text from token i's start to
  * token (i + w − 1)'s end — including every empty-token case
  * (consecutive/leading/trailing spaces contribute empty tokens whose
  * join still reproduces the byte range exactly). md5 therefore runs
  * straight on text byte windows: no token array, no per-window concat
  * string, no HOF interpreter.
  *
  * Two deliberate differences from the bigram op, both for the q95/q96
  * consumers: windows are NOT deduplicated (per-doc occurrence structure
  * is the caller's to keep or collapse with `array_distinct`), and the
  * digest is emitted as BINARY(16) directly — the consumers shuffle raw
  * digests (the q70 lesson), so the hex + `unhex` round-trip of the
  * bigram op would be two wasted passes per element.
  *
  * Edge parity with the composable
  * `case when size(toks) >= w then transform(sequence(1, size(toks) - w + 1),
  *    i -> unhex(md5(concat_ws(' ', slice(toks, i, w))))) else array() end`
  * chain: fewer than w tokens → empty array; null text → empty array
  * (the chain's CASE condition is null → else branch), so the expression
  * is non-nullable. WordNgramMd5sSpec pins bit-parity on both paths.
  * CodegenFallback: one virtual call per row around a loop that is all
  * primitive-array work — codegen would buy nothing (same contract as
  * [[WordBigramMd5s]]/[[MinhashSigs]]).
  */
case class WordNgramMd5s(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"word_ngram_md5s expects (string, int), got ${left.dataType.simpleString} first")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "word_ngram_md5s expects a foldable integer window width")
    else if (right.eval() == null || right.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure(
        s"word_ngram_md5s width must be a positive integer, got ${right.eval()}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)

  override def nullable: Boolean = false

  @transient private lazy val w: Int = right.eval().asInstanceOf[Int]

  // Per-THREAD digest: safe under concurrent eval of a shared instance
  // (see MinhashSigs — same contract), same per-task cost.
  @transient private lazy val mdTL: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) return new GenericArrayData(Array.empty[Any])
    val bytes = t.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    // token span boundaries around each 0x20 byte: token i spans
    // (starts(i), ends(i)); #tokens = #spaces + 1
    var spaces = 0
    var b = 0
    while (b < n) { if (bytes(b) == 0x20) spaces += 1; b += 1 }
    val tokens = spaces + 1
    if (tokens < w) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](tokens)
    val ends = new Array[Int](tokens)
    starts(0) = 0
    var ti = 0
    b = 0
    while (b < n) {
      if (bytes(b) == 0x20) { ends(ti) = b; ti += 1; starts(ti) = b + 1 }
      b += 1
    }
    ends(ti) = n
    val md = mdTL.get()
    val windows = tokens - w + 1
    val out = new Array[Any](windows)
    var i = 0
    while (i < windows) {
      md.reset()
      md.update(bytes, starts(i), ends(i + w - 1) - starts(i))
      out(i) = md.digest()
      i += 1
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "word_ngram_md5s"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
