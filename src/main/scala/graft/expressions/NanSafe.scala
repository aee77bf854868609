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
