package graft.expressions

/** Spark SQL's double comparison semantics (the nan-safe compare behind
  * GreaterThan's codegen): NaN == NaN, NaN greater than everything else,
  * +0.0 equal to -0.0. Native expressions that mirror a `when(d > acc.d)`
  * HOF fold must use THIS ordering — Java `>` (NaN-never-wins) or
  * `Double.compare` (-0.0 < +0.0) could flip a selected entry between
  * the native and fold forms on degenerate dots.
  */
private[expressions] object NanSafe {
  def gt(x: Double, y: Double): Boolean = {
    val xn = java.lang.Double.isNaN(x)
    val yn = java.lang.Double.isNaN(y)
    if ((xn && yn) || x == y) false
    else if (xn) true
    else if (yn) false
    else x > y
  }
}

/** Shared (vec, codebook) input validation for the native argmax twins
  * ([[ArgmaxDot]], [[PqCodes]]) — one definition, so a future widening
  * of the accepted codebook shape cannot drift between them.
  */
private[expressions] object VecCbsTypes {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.types._

  def check(fname: String, vec: Expression, cbs: Expression): TypeCheckResult = {
    val okVec = vec.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val okCbs = cbs.dataType match {
      case ArrayType(StructType(Array(f0, f1)), _) =>
        f0.dataType == IntegerType && (f1.dataType match {
          case ArrayType(DoubleType, _) => true
          case _ => false
        })
      case _ => false
    }
    if (okVec && okCbs) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fname expects (array<double>, array<struct<int, array<double>>>, ...), got " +
        s"(${vec.dataType.simpleString}, ${cbs.dataType.simpleString})")
  }

  /** A positive int-range foldable integral literal, or the failure. */
  def checkIntLit(e: Expression, name: String): Option[String] =
    if (!e.foldable) Some(s"$name must be a literal")
    else if (!Seq(ByteType, ShortType, IntegerType, LongType).contains(e.dataType))
      Some(s"$name must be an integral literal, got ${e.dataType.sql}")
    else if (e.eval() == null || e.eval().asInstanceOf[Number].longValue() < 1
      || e.eval().asInstanceOf[Number].longValue() > Int.MaxValue)
      Some(s"$name must be in [1, ${Int.MaxValue}], got ${e.eval()}")
    else None
}
