package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization encoder:
  * `pq_codes(vec, cbs, m, sub_dim)` → `array<struct<code:int,
  * score:double>>` of length `m` — element s is the codebook entry whose
  * SUBSPACE s (dims `[s·sub_dim, (s+1)·sub_dim)`) has the highest dot
  * product against the same subspace of `vec`, ties to the first
  * (lowest cb_id) entry via strict `>`.
  *
  * Exact-parity twin of the composable fold in
  * `graft.queries.Extensions.pqCodesExpr` (transform over subspaces ×
  * aggregate over entries × slice/zip_with dot), bit-identical on every
  * input so the native/fallback choice can never flip an oracle:
  *   - per (entry, subspace): both slices clamp to the arrays' lengths;
  *     UNEQUAL slice lengths mean zip_with would pad with null and
  *     poison the dot — the entry is skipped for that subspace. EQUAL
  *     (even empty) slices dot to a valid double (empty → 0.0, which
  *     CAN win over the -Inf seed — fold semantics, preserved).
  *   - a null element inside either slice poisons that dot (skip); a
  *     null codebook entry or null cb_vec is skipped; a selected entry
  *     with null cb_id carries the null code through.
  *   - comparison is [[NanSafe.gt]] (NaN largest, ±0.0 equal) — the
  *     fold's `when(d > acc.d)` ordering.
  *   - no winner (all poisoned) leaves the fold's seed: (-1, -Inf).
  *
  * The fold form runs those ~m·k·sub_dim FMAs through the HOF
  * interpreter with a slice allocation per (entry, subspace) — for
  * q63/q64's geometry (8×16×8 = 1,024 FMAs/row) that interpretation
  * overhead IS the query's corpus-pass cost. This is one fused loop
  * over the ArrayData buffers; CodegenFallback for the same reason as
  * [[ArgmaxDot]] (the arithmetic dwarfs one virtual call).
  * ExpressionThroughputSpec pins the speedup.
  */
case class PqCodes(vec: Expression, cbs: Expression,
    mExpr: Expression, subDimExpr: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(vec, cbs, mExpr, subDimExpr)

  private lazy val m: Int = mExpr.eval().asInstanceOf[Number].intValue()
  private lazy val subDim: Int = subDimExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    VecCbsTypes.check("pq_codes", vec, cbs) match {
      case TypeCheckResult.TypeCheckSuccess =>
        VecCbsTypes.checkIntLit(mExpr, "m")
          .orElse(VecCbsTypes.checkIntLit(subDimExpr, "sub_dim"))
          .map(TypeCheckResult.TypeCheckFailure)
          .getOrElse(TypeCheckResult.TypeCheckSuccess)
      case f => f
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("code", IntegerType), StructField("score", DoubleType))),
    containsNull = false)

  override def nullable: Boolean = vec.nullable || cbs.nullable

  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: InternalRow): Any = {
    val vecAny = vec.eval(input)
    val cbsAny = cbs.eval(input)
    if (vecAny == null || cbsAny == null) return null
    val v = vecAny.asInstanceOf[ArrayData]
    val cb = cbsAny.asInstanceOf[ArrayData]
    val vn = v.numElements()
    val k = cb.numElements()
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val start = s * subDim
      // slice(vec, start+1, subDim) clamped to the array's end
      val aLen = math.max(0, math.min(subDim, vn - start))
      var bestD = Double.NegativeInfinity
      var bestId: Any = -1
      var c = 0
      while (c < k) {
        val entry = if (cb.isNullAt(c)) null else cb.getStruct(c, 2)
        val cbVec = if (entry == null || entry.isNullAt(1)) null else entry.getArray(1)
        if (cbVec != null) {
          val bLen = math.max(0, math.min(subDim, cbVec.numElements() - start))
          // unequal slice lengths → zip_with pads null → poisoned dot
          if (aLen == bLen) {
            var d = 0.0
            var i = 0
            var sawNull = false
            while (i < aLen && !sawNull) {
              if (v.isNullAt(start + i) || cbVec.isNullAt(start + i)) sawNull = true
              else { d += v.getDouble(start + i) * cbVec.getDouble(start + i); i += 1 }
            }
            if (!sawNull && NanSafe.gt(d, bestD)) {
              bestD = d
              bestId = if (entry.isNullAt(0)) null else entry.getInt(0)
            }
          }
        }
        c += 1
      }
      out(s) = new GenericInternalRow(Array[Any](bestId, bestD))
      s += 1
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "pq_codes"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0), cbs = newChildren(1),
      mExpr = newChildren(2), subDimExpr = newChildren(3))
}
