package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 16-bit SimHash of whitespace-tokenized text:
  * `simhash16(text)` → int — bit j is set when the sum over tokens of
  * ±1 votes (+1 if the (j+1)-th hex digit of the token's md5 is odd) is
  * ≥ 0.
  *
  * Exact-parity twin of the composable chain in
  * `SimilarityFunctions.tokenDigestsExpr` + `simhash16FromDigests`
  * (split on ' ' → filter empties → md5 per token → 16 aggregate
  * folds), bit-identical on every input so the native/fallback choice
  * can never flip an oracle — including the chain's edge semantics:
  *   - NULL text → 0, not null (each bit's `if(null >= 0, b, 0)` takes
  *     the CASE-else branch), so this expression is non-nullable;
  *   - zero tokens (empty/all-space text) → all votes 0 ≥ 0 → all 16
  *     bits set → 65535;
  *   - tokens are the byte ranges between 0x20 bytes (the space char is
  *     single-byte in UTF-8 and never appears inside a multi-byte
  *     sequence, so byte splitting == string splitting), and the md5 of
  *     a token string is the md5 of exactly those bytes;
  *   - hex digit j of the lowercase digest string is nibble j of the
  *     digest bytes (high nibble first), and '13579bdf'-membership is
  *     nibble oddness.
  *
  * The fold form hashes each token into a 32-char hex STRING, then runs
  * 16 interpreted aggregate passes over the digest array (a substr +
  * instr per (token, bit)). This is one pass: md5 once per token
  * straight from the text bytes, votes accumulated from the raw digest
  * nibbles — no hex strings, no digest array, no lambda interpreter.
  * CodegenFallback for the ArgmaxDot reason (the md5 work dwarfs one
  * virtual call); ExpressionThroughputSpec pins the speedup.
  */
case class SimHash16(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash16 expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = IntegerType

  /** Never null: the fold maps a null document to simhash 0. */
  override def nullable: Boolean = false

  // Per-THREAD digest: safe under concurrent eval of a shared instance
  // (see MinhashSigs — same contract), same per-task cost.
  @transient private lazy val mdTL: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    if (t == null) return 0
    val bytes = t.asInstanceOf[UTF8String].getBytes
    val md = mdTL.get()
    val votes = new Array[Int](16)
    var start = 0
    var i = 0
    val n = bytes.length
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        if (i > start) { // non-empty token
          md.reset()
          md.update(bytes, start, i - start)
          val d = md.digest()
          var j = 0
          while (j < 16) {
            val nibble =
              if ((j & 1) == 0) (d(j >> 1) >> 4) & 0xf else d(j >> 1) & 0xf
            votes(j) += (if ((nibble & 1) == 1) 1 else -1)
            j += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var h = 0
    var j = 0
    while (j < 16) {
      if (votes(j) >= 0) h |= 1 << j
      j += 1
    }
    h
  }

  override def prettyName: String = "simhash16"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
