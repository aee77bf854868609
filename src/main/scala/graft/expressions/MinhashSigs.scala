package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signatures over sampled char shingles:
  * `minhash_sigs(text, n, k)` → array<string> of k 4-hex-char slices —
  * slice j is the minimum over sampled shingles of hex chars
  * [4j, 4j+4) of the shingle's md5.
  *
  * Exact-parity twin of the composable chain in `Extensions.sigFrame`
  * (char shingles → first-codepoint-even sampling → md5 per shingle →
  * per-slice `array_min` of hex substrings):
  *   - shingles are the length-`n` CHARACTER windows (UTF-8 code
  *     points, matching `substr`/`length` semantics) — byte windows
  *     between precomputed char-start offsets, so the md5 input is
  *     exactly the shingle string's bytes;
  *   - the sample keeps shingles whose first CODE POINT is even —
  *     Spark's `ascii()` returns the full code point of the first
  *     character (pinned by the parity spec on multi-byte text);
  *   - lexicographic min over fixed-width lowercase hex equals numeric
  *     min over the 16-bit big-endian digest slice, so each slice min
  *     is tracked as an int and formatted once at the end;
  *   - no sampled shingles (or fewer than `n` chars — callers filter,
  *     but the contract holds) → all k slices null, exactly what
  *     `array_min` over an empty/`null` digest array yields.
  *
  * The fold form materializes every shingle as a string, md5s it to a
  * 32-char hex string, then runs k interpreted `array_min(transform)`
  * passes — measured ~48 s of task time at sf0.1 where raw md5 work is
  * ~1-2 s. This is one pass over the text bytes with zero intermediate
  * strings. CodegenFallback for the ArgmaxDot reason;
  * ExpressionThroughputSpec pins the speedup.
  */
case class MinhashSigs(text: Expression, nExpr: Expression, kExpr: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, nExpr, kExpr)

  private lazy val n: Int = nExpr.eval().asInstanceOf[Number].intValue()
  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"minhash_sigs expects string, got ${text.dataType.simpleString}")
    else VecCbsTypes.checkIntLit(nExpr, "n")
      .orElse(VecCbsTypes.checkIntLit(kExpr, "k"))
      .orElse(if (kExpr.eval().asInstanceOf[Number].longValue() > 8)
        Some("k slices must fit one md5 (k <= 8)") else None)
      .map(TypeCheckResult.TypeCheckFailure)
      .getOrElse(TypeCheckResult.TypeCheckSuccess)

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def nullable: Boolean = text.nullable

  // One digest per THREAD, not per instance: a Column tree shared by
  // concurrently executing driver-side queries evaluates the same
  // expression instance from two threads, where a single mutable digest
  // would interleave reset/update/digest and silently corrupt hashes.
  // Per-task cost is unchanged (one getInstance per task thread).
  @transient private lazy val mdTL: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  override def eval(input: InternalRow): Any = {
    val t = text.eval(input)
    if (t == null) return null
    val bytes = t.asInstanceOf[UTF8String].getBytes
    // one pass: char-start byte offsets (UTF-8: leading byte !=
    // 10xxxxxx), sized worst-case (all-ASCII text has nb chars — exact
    // there, slack only on multi-byte text)
    val nb = bytes.length
    val offs = new Array[Int](nb + 1)
    var chars = 0
    var b = 0
    while (b < nb) {
      if ((bytes(b) & 0xc0) != 0x80) { offs(chars) = b; chars += 1 }
      b += 1
    }
    offs(chars) = nb
    // all-null slices, built only on the degenerate paths
    def nulls = new GenericArrayData(new Array[Any](k))
    if (chars < n) return nulls
    val md = mdTL.get()
    val mins = new Array[Int](k)
    java.util.Arrays.fill(mins, Int.MaxValue)
    var any = false
    var i = 0
    val last = chars - n
    while (i <= last) {
      // first code point of the shingle (the ascii() sampling key)
      val b0 = bytes(offs(i)) & 0xff
      val cp =
        if (b0 < 0x80) b0
        else {
          var v = 0
          var len = 0
          if (b0 >= 0xf0) { v = b0 & 0x07; len = 3 }
          else if (b0 >= 0xe0) { v = b0 & 0x0f; len = 2 }
          else { v = b0 & 0x1f; len = 1 }
          var m = 1
          while (m <= len) { v = (v << 6) | (bytes(offs(i) + m) & 0x3f); m += 1 }
          v
        }
      if ((cp & 1) == 0) { // pmod(ascii, 2) == 0
        any = true
        md.reset()
        md.update(bytes, offs(i), offs(i + n) - offs(i))
        val d = md.digest()
        var j = 0
        while (j < k) {
          val v = ((d(2 * j) & 0xff) << 8) | (d(2 * j + 1) & 0xff)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) return nulls
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      out(j) = UTF8String.fromString(f"${mins(j)}%04x")
      j += 1
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "minhash_sigs"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(text = newChildren(0), nExpr = newChildren(1), kExpr = newChildren(2))
}
