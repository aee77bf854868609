package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native argmax-dot coarse-quantizer assignment:
  * `argmax_dot(vec, cbs)` → `struct(d: double, id: int)` — the codebook
  * entry of `cbs` (`array<struct<cb_id:int, cb_vec:array<double>>>`) with
  * the highest dot product against `vec`, ties to the FIRST (array-order,
  * i.e. lowest cb_id when the codebook is sorted) entry via strict `>`.
  *
  * Exact-parity twin of the composable fold in
  * [[graft.engine.KmeansCodebook.best]]: dots accumulate in element
  * order, comparison is strict, seed is (-∞, -1) — bit-identical output,
  * so the fallback/native choice can never flip an oracle. The fold form
  * runs each multiply-add through Spark's higher-order-function
  * interpreter (a lambda closure per element, a boxed Double per step,
  * and a zip_with array allocation per codebook entry); this is one fused
  * loop over the ArrayData buffers — the K·dim FMA work is the entire
  * per-row cost.
  *
  * CodegenFallback is deliberate: the expression's work is K·dim ≥ 4096
  * FMAs per row, so the one virtual call + boxed struct of fallback is
  * noise (same call as [[TopKPairs]]); a doGenCode would buy <1 % here,
  * unlike [[CosineSimilarity]] whose whole body is ~64 FMAs.
  * ExpressionThroughputSpec pins the speedup over the fold form.
  */
case class ArgmaxDot(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    VecCbsTypes.check("argmax_dot", left, right)

  override def dataType: DataType =
    StructType(Seq(StructField("d", DoubleType), StructField("id", IntegerType)))

  override def prettyName: String = "argmax_dot"

  /** [[NanSafe.gt]] — Spark SQL's comparison, so `when(d > acc.d)` in
    * the fold and this loop agree on every input, degenerate or not.
    */
  private def gtNanSafe(x: Double, y: Double): Boolean = NanSafe.gt(x, y)

  override protected def nullSafeEval(vecAny: Any, cbsAny: Any): Any = {
    val vec = vecAny.asInstanceOf[ArrayData]
    val cbs = cbsAny.asInstanceOf[ArrayData]
    var bestD = Double.NegativeInfinity
    // Any, not Int: a selected entry with a null cb_id must yield a null
    // id field, exactly as the fold's struct carries the null through.
    var bestId: Any = -1
    // A null ELEMENT in vec poisons every entry's dot in the fold form
    // (x*null → null), so no entry can ever be selected: return the
    // fold's seed directly. Scanned once here instead of per entry.
    var v = 0
    val vn = vec.numElements()
    while (v < vn) {
      if (vec.isNullAt(v)) return new GenericInternalRow(Array[Any](bestD, bestId))
      v += 1
    }
    val k = cbs.numElements()
    var c = 0
    while (c < k) {
      // Fold-parity on degenerate inputs. The fold form null-poisons the
      // dot of any entry that is itself null, has a null cb_vec, is
      // length-mismatched (zip_with pads with null), or contains a null
      // ELEMENT in either array (x*null → null, acc+null → null) — and a
      // null dot is never selected (`when(null > acc.d)` keeps acc). So
      // this loop SKIPS all four shapes rather than NPE-ing on the null
      // containers or reading ArrayData's 0.0 for null slots: the
      // native/fold choice can never flip a result.
      val entry = if (cbs.isNullAt(c)) null else cbs.getStruct(c, 2)
      val cbVec = if (entry == null || entry.isNullAt(1)) null else entry.getArray(1)
      if (cbVec != null && vec.numElements() == cbVec.numElements()) {
        val n = cbVec.numElements()
        var d = 0.0
        var i = 0
        var sawNull = false
        while (i < n && !sawNull) {
          if (cbVec.isNullAt(i)) sawNull = true
          else { d += vec.getDouble(i) * cbVec.getDouble(i); i += 1 }
        }
        // Nan-safe `>` with Spark's comparison semantics (NaN is the
        // LARGEST double; +0.0 == -0.0), not Java `>` (NaN-never-wins)
        // and not Double.compare (-0.0 < +0.0): either alternative could
        // flip a selected cell between the native and fold forms on
        // degenerate dots.
        if (!sawNull && gtNanSafe(d, bestD)) {
          bestD = d
          bestId = if (entry.isNullAt(0)) null else entry.getInt(0)
        }
      }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestD, bestId))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
