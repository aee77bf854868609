package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object QualityComponents {
  /** The stopword list IS the quality formula's list
    * ([[graft.functions.TextFunctions.StopwordsByLang]] head = "en") —
    * one source of truth with the chain and the oracle.
    */
  private val stopwords: Array[Array[Byte]] =
    graft.functions.TextFunctions.StopwordsByLang.head._2
      .map(_.getBytes("UTF-8")).toArray

  private def isStopword(bytes: Array[Byte], start: Int, end: Int): Boolean = {
    val len = end - start
    var s = 0
    while (s < stopwords.length) {
      val w = stopwords(s)
      if (w.length == len) {
        var k = 0
        while (k < len && w(k) == bytes(start + k)) k += 1
        if (k == len) return true
      }
      s += 1
    }
    false
  }

  /** (n_tokens, sum_len, punct_cnt, stop_occ, len, bpe_tokens) in one
    * byte walk. bpe_tokens counts matches of the BPE-ish segmentation
    * regex [[graft.functions.TextFunctions.BpePattern]]
    * (`[a-z]+|[0-9]+|[^a-z0-9 ]`): a left-to-right greedy scan emits one
    * token per maximal lowercase run, per maximal digit run, and per
    * single OTHER codepoint (uppercase, punctuation, non-ASCII), spaces
    * matching nothing — which is exactly a run-class walk.
    */
  private[expressions] def components(bytes: Array[Byte]): Array[Int] = {
    var nTokens, sumLen, punct, stopOcc, len, bpe = 0
    var tokStart = 0 // byte offset of the current token's first byte
    var tokChars = 0 // codepoints in the current token
    var run = 0 // BPE run class: 0 none, 1 lowercase alpha, 2 digit
    var i = 0
    val n = bytes.length
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        if (tokChars > 0) { // non-empty token closes
          nTokens += 1
          sumLen += tokChars
          if (isStopword(bytes, tokStart, i)) stopOcc += 1
        }
        if (i < n) len += 1 // the space itself: one codepoint, never punct
        tokStart = i + 1
        tokChars = 0
        run = 0
        i += 1
      } else {
        val b = bytes(i)
        val step = UTF8String.numBytesForFirstByte(b)
        // [^a-z0-9 ] on codepoints: uppercase, punctuation, control, and
        // every non-ASCII codepoint count; lowercase/digit/space do not
        val ascii = step == 1 && b >= 0
        val alpha = ascii && b >= 'a' && b <= 'z'
        val digit = ascii && b >= '0' && b <= '9'
        if (!(alpha || digit)) punct += 1
        if (alpha) { if (run != 1) { bpe += 1; run = 1 } }
        else if (digit) { if (run != 2) { bpe += 1; run = 2 } }
        else { bpe += 1; run = 0 }
        len += 1
        tokChars += 1
        // clamp a trailing truncated multi-byte sequence to the buffer
        // end so the i == n iteration still closes the final token
        i = math.min(i + step, n)
      }
    }
    Array(nTokens, sumLen, punct, stopOcc, len, bpe)
  }
}

/** Native fused quality-signal extractor:
  * `quality_components(text)` → struct<n_tokens:int, sum_len:int,
  * punct_cnt:int, stop_occ:int, len:int, bpe_tokens:int> — the one-pass
  * twin of q24's five-expression chain (split + filter + size, an interpreted
  * `aggregate` lambda summing token lengths, a full-text
  * `regexp_extract_all` for the punctuation count, an `isin` filter
  * pass for stopword occurrences, and length). Each chain member walked
  * the text separately — the regex alone allocates a match list the
  * size of the punctuation count — and together they made q24 the
  * second most expensive map-only row at sf100 (156 s). One walk over
  * the raw bytes produces all five.
  *
  * Exact-parity contract (NativeTextSpec pins it against the chain):
  *   - tokens are the non-empty byte ranges between 0x20 bytes (the
  *     space byte never occurs inside a multi-byte UTF-8 sequence, so
  *     byte splitting == `split(text, ' ')`), counts and per-token
  *     lengths in CODEPOINTS (Spark's `length`);
  *   - punct_cnt counts codepoints matching `[^a-z0-9 ]` — uppercase,
  *     punctuation, control chars, and every non-ASCII codepoint (the
  *     regex class is ASCII-negated), one per codepoint exactly as
  *     java.util.regex matches a negated class per code point;
  *   - stop_occ is the multiset count of tokens equal to an "en"
  *     stopword ([[graft.functions.TextFunctions.StopwordsByLang]]);
  *   - len is `length(text)` in codepoints; NULL text → NULL struct
  *     (the chain nulls every component);
  *   - bpe_tokens is `size(regexp_extract_all(text, BpePattern, 0))` —
  *     the q25 segmentation count — computed as a run-class walk (see
  *     [[QualityComponents.components]]), so q25 and q24 share one
  *     expression and one text pass.
  * Int fields like the chain's (size/aggregate-over-int-zero are int);
  * the chain would overflow sum_len past 2³¹ chars of tokens per doc —
  * no real document — and this expression inherits that bound.
  * CodegenFallback for the SimHash16 reason.
  */
case class QualityComponents(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quality_components expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_len", IntegerType, nullable = false),
    StructField("punct_cnt", IntegerType, nullable = false),
    StructField("stop_occ", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("bpe_tokens", IntegerType, nullable = false)))

  override protected def nullSafeEval(t: Any): Any = {
    val c = QualityComponents.components(t.asInstanceOf[UTF8String].getBytes)
    new GenericInternalRow(Array[Any](c(0), c(1), c(2), c(3), c(4), c(5)))
  }

  override def prettyName: String = "quality_components"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
