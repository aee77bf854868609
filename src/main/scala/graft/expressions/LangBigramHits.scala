package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object LangBigramHits {
  /** The profile table IS [[graft.functions.TextFunctions.CharBigramProfiles]]
    * — one source of truth, so a profile tune can never desync the native
    * path from the composable chain or the oracle.
    */
  val Profiles: Seq[(String, Seq[String])] =
    graft.functions.TextFunctions.CharBigramProfiles

  val ProfileCount: Int = Profiles.size

  /** 128×128 ASCII-pair → language bitmask (bit j = profile j contains
    * the bigram). All profile bigrams are 2 ASCII chars by construction
    * (enforced below); a pair involving any non-ASCII codepoint scores 0
    * in every profile, exactly like the chain's equality test against
    * ASCII literals.
    */
  private val mask: Array[Byte] = {
    // Per-pair mask is one byte: (1 << j).toByte silently drops bit 8 on
    // write, and sign-extension would make `mk & (1 << j)` spuriously
    // nonzero for j >= 8 whenever bit 7 is set. Fail loud at class init
    // if the profile table ever outgrows the byte.
    require(ProfileCount <= 8,
      s"language bitmask is Array[Byte]: at most 8 profiles supported, " +
        s"CharBigramProfiles has $ProfileCount — widen mask to Array[Int]")
    val m = new Array[Byte](128 * 128)
    Profiles.zipWithIndex.foreach { case ((lang, profile), j) =>
      profile.foreach { bg =>
        require(bg.length == 2 && bg(0) < 128 && bg(1) < 128,
          s"profile $lang bigram '$bg' must be 2 ASCII chars")
        val k = bg(0) * 128 + bg(1)
        m(k) = (m(k) | (1 << j)).toByte
      }
    }
    m
  }

  private[expressions] def count(bytes: Array[Byte]): Array[Int] = {
    val counts = new Array[Int](ProfileCount)
    var prev = -1 // previous codepoint when ASCII, else -1
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b = bytes(i)
      val step = UTF8String.numBytesForFirstByte(b)
      val cur = if (step == 1 && b >= 0) b.toInt else -1
      if (prev >= 0 && cur >= 0) {
        val mk = mask(prev * 128 + cur)
        if (mk != 0) {
          var j = 0
          while (j < ProfileCount) {
            if ((mk & (1 << j)) != 0) counts(j) += 1
            j += 1
          }
        }
      }
      prev = cur
      i += step
    }
    counts
  }
}

/** Native fused n-gram-profile language scorer:
  * `lang_bigram_hits(text)` → array<int> of multiset profile-bigram hit
  * counts, one per language in
  * [[graft.functions.TextFunctions.CharBigramProfiles]] order — the
  * one-pass twin of running `TextFunctions.ngramProfileHits` once per
  * language. The chain materializes the text's full char-2-gram shingle
  * array (one substr PER POSITION, each an O(position) UTF-8 re-seek →
  * O(len²) on long docs) and then filters it through an interpreted
  * lambda, and does ALL of that once per language; this walks the text
  * bytes once, stepping codepoints with Spark's own
  * `numBytesForFirstByte`, and scores every language from a 16 KB
  * pair→bitmask table (q47 was 272 s at sf100 — the suite's most
  * expensive map-only row — and the cost was exactly this chain ×4).
  *
  * Exact-parity contract with the chain, per language (NativeTextSpec
  * pins it, including multi-byte and the degenerate shapes):
  *   - a position counts for language L iff the 2-codepoint substring
  *     equals one of L's ASCII profile bigrams — so any pair involving
  *     a multi-byte codepoint never counts;
  *   - texts with < 2 codepoints produce 0 for every language (the
  *     chain's descending-sequence corner yields only 1-char substrings,
  *     which match no 2-char profile entry);
  *   - NULL text → NULL (the chain's size(filter(transform(NULL))) is
  *     NULL under non-legacy size semantics).
  * CodegenFallback for the SimHash16 reason: the per-row walk dwarfs
  * one virtual call, and fallback keeps the surrounding projection
  * inside WholeStageCodegen.
  */
case class LangBigramHits(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lang_bigram_hits expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(t: Any): Any =
    ArrayData.toArrayData(
      LangBigramHits.count(t.asInstanceOf[UTF8String].getBytes))

  override def prettyName: String = "lang_bigram_hits"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
