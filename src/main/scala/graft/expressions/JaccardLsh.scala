package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The q20 LSH banding constants, owned here so the fused expressions,
  * the composable fallback, and the DuckDB oracle all read ONE source.
  * [[Bands]] bands of [[Rows]] minhashes; permutation j is
  * `(A(j)·h32 + C(j)) mod 2³¹` over the gram's 32-bit md5-prefix hash —
  * every product stays under 2⁶³, so 64-bit integer arithmetic is exact
  * and bit-identical on Spark and DuckDB. Constants are fixed draws
  * (odd multipliers < 2³¹) from one seeded generator.
  */
object JaccardLsh {
  /** 64 bands × 2 rows since round 12 (48 × 2 before): the signature
    * shingle widened to [[SigShingle]] words, which shifts a pair's
    * signature Jaccard DOWN by O(w/|doc|) relative to its verified
    * bigram Jaccard; 16 extra bands lift the candidate-recall curve back
    * over LshRecallSpec's original floors (theory at the planted levels:
    * 0.89 / 0.97 / 0.9995 / ~1) at +33 % map-only signature cost, while
    * the background candidate rate stays ~3,500× below the bigram
    * signature's (E[1−(1−J₄²)⁶⁴] ≈ 1.3e-5 per pair, measured sf0.1).
    */
  val Bands = 64
  val Rows = 2

  /** Word-shingle width of the CANDIDATE signature (round 12). The verify
    * predicate is unchanged — exact word-BIGRAM Jaccard ≥ τ — but the
    * minhash signature runs over [[SigShingle]]-word shingles. Rationale,
    * measured on the bench corpus (SCALING.md round-12): the corpus has a
    * 31-word closed vocabulary, so the BIGRAM universe is ≤ 961 grams and
    * two unrelated docs share common bigrams at background J ≈ 0.05–0.1 —
    * at r = 2, b = 48 that passes ~26 % of ALL pairs as candidates, the
    * measured Θ(N²·c) slot term (179 M slots at sf10). Widening the
    * signature shingle grows the gram universe geometrically (31⁴) and
    * background J collapses ~4,700× (measured E[1−(1−J₄²)⁴⁸] = 1e-5 vs
    * 4.7e-2 for bigrams) while TRUE near-dups — which share contiguous
    * token runs, not scattered vocabulary coincidences — keep shingle-J
    * within O(w/|doc|) of their bigram J. This is the standard production
    * dedup choice (MinHash over 4–13-word shingles). The miss class
    * becomes "no band collision on the 4-shingle minhash": a pair with
    * bigram-J ≥ τ but NO shared 4-token run is (by design) not a
    * candidate; LshRecallSpec pins the recall floors for run-sharing
    * near-dups at the τ = 0.2 threshold, and the DuckDB oracle replays
    * the identical 4-shingle signature, so the contract is mirrored.
    * Docs with < [[SigShingle]] tokens emit no signature and cannot pair.
    */
  val SigShingle = 4

  val (a, c): (Array[Long], Array[Long]) = {
    val r = new java.util.Random(2020L)
    val a = Array.fill(Bands * Rows)((r.nextInt(Int.MaxValue) | 1).toLong)
    val c = Array.fill(Bands * Rows)(r.nextInt(Int.MaxValue).toLong * 2)
    (a, c)
  }

  /** Shared core of [[BigramH60s]] / [[NgramH60s]]: the DISTINCT 60-bit
    * md5-prefix hashes of a text's `w`-word shingles, one pass over the
    * raw UTF-8 bytes. A shingle's digest input is the w tokens joined by
    * a single 0x20 byte (2w−1 md5 updates, no concat allocation); h60 is
    * the digest's first 8 bytes big-endian shifted right 4; distinctness
    * is by h60 with first-occurrence order.
    */
  private[expressions] def ngramH60s(
      bytes: Array[Byte], w: Int, md: java.security.MessageDigest): Array[Long] = {
    val n = bytes.length
    var nTok = 0
    var b = 0
    while (b < n) {
      if (bytes(b) != 0x20) {
        nTok += 1
        while (b < n && bytes(b) != 0x20) b += 1
      } else b += 1
    }
    if (nTok < w) return Array.emptyLongArray
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var ti = 0
    b = 0
    while (b < n) {
      if (bytes(b) != 0x20) {
        starts(ti) = b
        while (b < n && bytes(b) != 0x20) b += 1
        ends(ti) = b
        ti += 1
      } else b += 1
    }
    val seen = new java.util.HashSet[java.lang.Long](nTok * 2)
    val out = new Array[Long](nTok - w + 1)
    var m = 0
    var i = 0
    while (i <= nTok - w) {
      md.reset()
      var t = 0
      while (t < w) {
        if (t > 0) md.update(SpaceByte, 0, 1)
        md.update(bytes, starts(i + t), ends(i + t) - starts(i + t))
        t += 1
      }
      val d = md.digest()
      var h = 0L
      var j = 0
      while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      val h60 = h >>> 4
      if (seen.add(h60)) { out(m) = h60; m += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(out, m)
  }

  private val SpaceByte = Array[Byte](0x20)
}

/** `bigram_h60s(text)` → array<long> of the DISTINCT 60-bit md5-prefix
  * hashes of the text's word bigrams — the q20 gram fingerprint, fused.
  *
  * Exact-parity twin of the composable chain
  * `transform(array_distinct(bigrams(tokens(text))),
  *            g -> conv(substr(md5(g), 1, 15), 16, 10))`:
  * tokens are the non-empty runs between 0x20 bytes, a bigram's digest
  * input is `tokA ⧺ 0x20 ⧺ tokB` (three md5 updates — no concat
  * allocation), h60 is the digest's first 8 bytes big-endian shifted
  * right 4 (= the first 15 hex chars as an integer), and distinctness
  * is by h60 with first-occurrence order. The fold form allocates a
  * token array, a bigram string, a 32-char hex string, and an
  * interpreted `conv` per gram; this is one pass over the raw bytes.
  * CodegenFallback for the ArgmaxDot reason; ExpressionThroughputSpec
  * pins the speedup and BigramH60sSpec the parity.
  */
case class BigramH60s(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bigram_h60s expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  @transient private lazy val mdTL: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    if (t == null) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    UnsafeArrayData.fromPrimitiveArray(
      JaccardLsh.ngramH60s(t.asInstanceOf[UTF8String].getBytes, 2, mdTL.get()))
  }

  override def prettyName: String = "bigram_h60s"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `ngram_h60s(text, w)` → array<long> of the DISTINCT 60-bit md5-prefix
  * hashes of the text's `w`-word shingles — [[BigramH60s]] generalized to
  * any shingle width. q20's candidate signature runs this at
  * [[JaccardLsh.SigShingle]] (see that constant's scaladoc for why the
  * signature shingle is WIDER than the verified bigram predicate).
  * `w` must be a foldable positive integer; a doc with fewer than `w`
  * tokens yields an empty array. Exact-parity twin of the composable
  * `transform(array_distinct(shingles_w(tokens(text))),
  *            g -> conv(substr(md5(g), 1, 15), 16, 10))` chain, where a
  * shingle's digest input is its w tokens joined by single spaces.
  * CodegenFallback for the ArgmaxDot reason; JaccardLshSpec pins parity.
  */
case class NgramH60s(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"ngram_h60s expects (string, int), got ${left.dataType.simpleString} first")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "ngram_h60s expects a foldable integer shingle width")
    else if (right.eval() == null || right.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure(
        s"ngram_h60s width must be a positive integer, got ${right.eval()}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  @transient private lazy val w: Int = right.eval().asInstanceOf[Int]
  @transient private lazy val mdTL: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    UnsafeArrayData.fromPrimitiveArray(
      JaccardLsh.ngramH60s(t.asInstanceOf[UTF8String].getBytes, w, mdTL.get()))
  }

  override def prettyName: String = "ngram_h60s"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `jac_band_keys(ghs)` → array<long> of the [[JaccardLsh.Bands]] LSH
  * band bucket keys of a gram-hash array. Minhash j is
  * `min over grams of (perm_j(h32)·2³² + h32)` with
  * `perm_j(x) = (A(j)·x + C(j)) mod 2³¹` and `h32 = h60 >>> 28` — the
  * low 32 bits of each min are the argmin gram's h32. Band b's key
  * packs its two argmins into one signed 64-bit value with NO overflow
  * on either engine: `(k₁ − 2³¹)·2³² + k₂` spans exactly
  * [−2⁶³, 2⁶³−1], so DuckDB's checked BIGINT arithmetic replays it.
  *
  * Emitting finished KEYS (not the 96 raw mins) matters: a 96-element
  * intermediate consumed by 96 `element_at`s gets INLINED by projection
  * collapse, re-evaluating the producer once per reference (measured
  * 43 s of task time at sf0.1); one `posexplode` of this array
  * evaluates it once per row. The exploded 96-way packed-long min
  * aggregate is the composable parity twin. Empty gram array → empty
  * result (the caller drops sig-less docs, matching the aggregate form
  * which never saw a group).
  */
case class JacBandKeys(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  // containsNull=false only: eval reads each slot with getLong, which on
  // a null slot would return an undefined 0 and silently fold a phantom
  // gram into every minhash (round-10 advice). bigram_h60s output and the
  // composable `transform(...)` chain are both containsNull=false, so the
  // tighter contract costs nothing; an arbitrary SQL caller with nullable
  // arrays gets an analysis error, never a wrong answer. Values must be
  // NON-NEGATIVE (h60s are 60-bit): eval's `>>> 28` equals the composable
  // twin's `div 268435456` exactly on [0, 2⁶³); a negative input would
  // diverge, and the bigram_h60s producer can't emit one.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"jac_band_keys expects array<bigint> with non-null elements " +
        s"(non-negative 60-bit gram hashes, e.g. bigram_h60s output), " +
        s"got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val arr = child.eval(input)
    if (arr == null) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val ghs = arr.asInstanceOf[ArrayData]
    val n = ghs.numElements()
    if (n == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val k = JaccardLsh.Bands * JaccardLsh.Rows
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val a = JaccardLsh.a
    val c = JaccardLsh.c
    var i = 0
    while (i < n) {
      val h32 = ghs.getLong(i) >>> 28
      var j = 0
      while (j < k) {
        // mod/mul by powers of two as mask/shift — the operands are
        // non-negative, so this is value-identical to the composable
        // twin's `% 2³¹ · 2³²` and ~10× cheaper than integer division
        val packed = ((a(j) * h32 + c(j)) & 0x7fffffffL) << 32 | h32
        if (packed < mins(j)) mins(j) = packed
        j += 1
      }
      i += 1
    }
    val keys = new Array[Long](JaccardLsh.Bands)
    var b = 0
    while (b < JaccardLsh.Bands) {
      val k1 = mins(JaccardLsh.Rows * b) & 0xffffffffL
      val k2 = mins(JaccardLsh.Rows * b + 1) & 0xffffffffL
      keys(b) = ((k1 - 2147483648L) << 32) + k2
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(keys)
  }

  override def prettyName: String = "jac_band_keys"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `sorted_inter_size(a, b)` → int: the intersection size of two
  * ascending-sorted distinct bigint arrays, by a single merge walk — no
  * hash set, no output array. q20's exact-verify stage calls this once
  * per candidate pair (Θ(N²·c) pairs on a closed-vocabulary corpus —
  * see Extensions.q20JaccardPairs), where `size(array_intersect(...))`
  * pays a per-call hash-set build; the merge walk is the same count at
  * ~10× less cost (ExpressionThroughputSpec pins it).
  *
  * PRECONDITION (documented for arbitrary SQL callers, like
  * jac_band_keys' non-negativity): both inputs sorted ascending with
  * distinct elements — q20 guarantees it with one array_sort per DOC
  * (bigram_h60s emits first-occurrence order; order is irrelevant to
  * every other consumer). Unsorted input returns the number of matches
  * a single forward merge pass happens to find — never an error, never
  * a crash, just not the set intersection.
  */
case class SortedInterSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, false), ArrayType(LongType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_inter_size expects two array<bigint> with non-null " +
          s"elements, got ${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val va = a.getLong(i)
      val vb = b.getLong(j)
      if (va == vb) { c += 1; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    c
  }

  override def prettyName: String = "sorted_inter_size"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
