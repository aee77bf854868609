package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic numeric helpers.
  *
  * Spark's `round(double, n)` goes through Double.toString + decimal
  * HALF_UP, which can disagree with engines that round the binary value
  * (e.g. DuckDB) whenever the shortest decimal representation lands exactly
  * on a .5 boundary. `floor(x * 10^n + 0.5) / 10^n` is pure double
  * arithmetic — identical IEEE ops on identical inputs in any engine — so
  * oracle hash-compares are bit-exact. (Halves round toward +inf; fine for
  * our metrics, which are ratios/similarities.)
  */
object NumFunctions {

  def portableRound(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    floor(c * p + lit(0.5)).cast("double") / lit(p)
  }

  def r2(c: Column): Column = portableRound(c, 2)
  def r4(c: Column): Column = portableRound(c, 4)

  /** The same rounding as SQL text, for oracle generation. */
  def roundSql(expr: String, digits: Int): String = {
    val p = math.pow(10, digits).toLong
    s"floor(($expr) * $p + 0.5) / $p.0"
  }
}
