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

  override def checkInputDataTypes(): TypeCheckResult = {
    val okVec = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val okCbs = right.dataType match {
      case ArrayType(StructType(Array(f0, f1)), _) =>
        f0.dataType == IntegerType && (f1.dataType match {
          case ArrayType(DoubleType, _) => true
          case _ => false
        })
      case _ => false
    }
    if (okVec && okCbs) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"argmax_dot expects (array<double>, array<struct<int, array<double>>>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType =
    StructType(Seq(StructField("d", DoubleType), StructField("id", IntegerType)))

  override def prettyName: String = "argmax_dot"

  /** Spark SQL's double comparison (GreaterThan codegen's nan-safe
    * compare): NaN == NaN, NaN greater than everything else, +0.0 equal
    * to -0.0 — so `when(d > acc.d)` in the fold and this loop agree on
    * every input, degenerate or not.
    */
  private def gtNanSafe(x: Double, y: Double): Boolean = {
    val xn = java.lang.Double.isNaN(x)
    val yn = java.lang.Double.isNaN(y)
    if ((xn && yn) || x == y) false
    else if (xn) true
    else if (yn) false
    else x > y
  }

  override protected def nullSafeEval(vecAny: Any, cbsAny: Any): Any = {
    val vec = vecAny.asInstanceOf[ArrayData]
    val cbs = cbsAny.asInstanceOf[ArrayData]
    var bestD = Double.NegativeInfinity
    var bestId = -1
    val k = cbs.numElements()
    var c = 0
    while (c < k) {
      val entry = cbs.getStruct(c, 2)
      val cbVec = entry.getArray(1)
      // Fold-parity on degenerate inputs: a length-mismatched entry in
      // the fold form gets a NULL dot (zip_with pads with null, the
      // product poisons the aggregate) and is therefore never selected —
      // skip it here rather than score a min-length partial dot.
      if (vec.numElements() == cbVec.numElements()) {
        val n = cbVec.numElements()
        var d = 0.0
        var i = 0
        while (i < n) {
          d += vec.getDouble(i) * cbVec.getDouble(i)
          i += 1
        }
        // Nan-safe `>` with Spark's comparison semantics (NaN is the
        // LARGEST double; +0.0 == -0.0), not Java `>` (NaN-never-wins)
        // and not Double.compare (-0.0 < +0.0): either alternative could
        // flip a selected cell between the native and fold forms on
        // degenerate dots.
        if (gtNanSafe(d, bestD)) { bestD = d; bestId = entry.getInt(0) }
      }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestD, bestId))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
