package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object NormFingerprint {
  private val NonClean = java.util.regex.Pattern.compile("[^a-z0-9 ]")
  private val MultiSpace = java.util.regex.Pattern.compile(" +")
  private val HexDigits = "0123456789abcdef".toCharArray

  private[expressions] def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexDigits(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Normalized bytes of an ALL-ASCII input, written into `out` (caller
    * sizes it >= n): lowercase, [^a-z0-9 ] → space, collapse space runs,
    * trim — one pass, because on ASCII the three chain steps commute
    * into a per-byte map followed by the collapse. Returns the length.
    */
  private[expressions] def normalizeAscii(bytes: Array[Byte], out: Array[Byte]): Int = {
    var o = 0
    var pendingSpace = false // a space run seen after at least one kept char
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b = bytes(i)
      val mapped: Byte =
        if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) b
        else if (b >= 'A' && b <= 'Z') (b + 32).toByte
        else ' '
      if (mapped == ' ') {
        if (o > 0) pendingSpace = true // leading spaces trim away
      } else {
        if (pendingSpace) { out(o) = ' '; o += 1; pendingSpace = false }
        out(o) = mapped
        o += 1
      }
      i += 1
    }
    o // trailing pendingSpace trims away
  }
}

/** Native fused content fingerprint: `norm_fingerprint(text)` → the
  * lowercase md5 hex of the NORMALIZED text — one pass replacing q26's
  * `md5(trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]",
  * " "), " +", " ")))` chain, whose two java.util.regex passes each
  * re-scan and re-allocate the full document (q26 was 152 s at sf100,
  * nearly all of it this chain — the rolling-hash half is already the
  * native `rolling_hash31`).
  *
  * Two paths, chosen per row:
  *   - ALL-ASCII input (every byte < 0x80 — the entire testdata corpus,
  *     and the overwhelming share of any real one): a single byte walk.
  *     On ASCII, `lower` is a byte map and the two regex replaces
  *     compose into map-to-space + collapse-runs + trim, so the
  *     normalized bytes are built directly and md5'd with no String,
  *     no Pattern, no intermediate allocations beyond one buffer.
  *   - any multi-byte input: the exact chain, executed directly —
  *     `UTF8String.toLowerCase` (the same lowercasing Spark's `lower`
  *     performs under the default collation, including its full-Unicode
  *     mappings: Kelvin K → k, İ → i + combining dot), then the same
  *     two compiled java.util.regex patterns `regexp_replace` runs,
  *     then the space trim. Bit-identical by construction because it IS
  *     the chain, minus expression-tree overhead.
  * NULL → NULL, matching the chain. NativeTextSpec pins parity on both
  * paths, including the Unicode lowercase edge cases. CodegenFallback
  * for the SimHash16 reason (md5 dominates one virtual call).
  */
case class NormFingerprint(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"norm_fingerprint expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType

  // Per-thread digest: safe under concurrent eval of a shared instance
  // (the MinhashSigs/SimHash16 contract).
  @transient private lazy val mdTL: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  override protected def nullSafeEval(t: Any): Any = {
    val u = t.asInstanceOf[UTF8String]
    val bytes = u.getBytes
    val md = mdTL.get()
    md.reset()
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) { if (bytes(i) < 0) ascii = false; i += 1 }
    if (ascii) {
      val out = new Array[Byte](bytes.length)
      val len = NormFingerprint.normalizeAscii(bytes, out)
      md.update(out, 0, len)
    } else {
      val lowered = u.toLowerCase.toString
      val cleaned = NormFingerprint.MultiSpace.matcher(
        NormFingerprint.NonClean.matcher(lowered).replaceAll(" "))
        .replaceAll(" ")
      // cleaned is [a-z0-9 ]-only here, so trim == strip ' ' ends and
      // the bytes are exactly the chars
      var s = 0
      var e = cleaned.length
      while (s < e && cleaned.charAt(s) == ' ') s += 1
      while (e > s && cleaned.charAt(e - 1) == ' ') e -= 1
      md.update(cleaned.substring(s, e).getBytes("UTF-8"))
    }
    NormFingerprint.hex(md.digest())
  }

  override def prettyName: String = "norm_fingerprint"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
