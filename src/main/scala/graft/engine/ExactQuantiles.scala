package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated per-group percentiles via DISTRIBUTION aggregation
  * — the scale-out replacement for Spark's `percentile` aggregate on
  * big groups.
  *
  * Spark's `Percentile` buffers a value→count OpenHashMap per group,
  * serializes every partial map to the group's single reducer, merges
  * them single-threaded, then sorts the merged key set — so a 3-group
  * query over 600 M rows runs its heavy tail on 3 cores (q41 measured
  * 211.6 s at sf100, the whole suite's worst row). This operator gets
  * the SAME exact answer from relational pieces that all scale out:
  *
  *   1. `groupBy(group, value).count` — map-side partial combine crushes
  *      600 M rows to ~30 M (group, value) pairs BEFORE the exchange;
  *      the shuffle carries the distribution, never the rows, and the
  *      aggregation is codegen'd with as many reducers as partitions.
  *   2. One window pass per group ordered by value: running `__cum` and
  *      total `__n` share a single hash exchange.
  *   3. Each requested percentile picks its two covering values with
  *      conditional aggregates (a row covers 0-based positions
  *      [cum−cnt, cum)), then interpolates.
  *
  * Interpolation reproduces `Percentile.getPercentile` EXACTLY — same
  * position arithmetic (`p * (n−1)` in doubles), same operand order
  * (`(hi − pos) * v_lo + (pos − lo) * v_hi`), same short-circuits
  * (integral position, or one value covering both indices, returns the
  * value untouched) — so results are bit-identical to the built-in
  * aggregate (ExactQuantilesSpec pins equality on adversarial
  * distributions), and DuckDB's `quantile_cont` oracle keeps matching.
  *
  * Caller contract: NULL values are ignored (like the built-in); a
  * group whose values are ALL null is dropped rather than emitted with
  * null percentiles — callers needing those groups should seed them.
  *
  * 100 TB shape: one exchange of the (group, value) distribution, one
  * per-group sort of distinct values. Worst case (all values distinct)
  * degrades to the same order of work as a range-partitioned sort while
  * staying spill-safe (hash aggregate + window sort both spill); the
  * built-in's map state would OOM a reducer first.
  */
object ExactQuantiles {

  /** @param ps (output column name, percentile in [0,1]) pairs.
    * Output: one row per group — `group` column plus one double column
    * per requested percentile, raw (callers apply their own rounding).
    */
  def byCounts(
      df: DataFrame, group: String, value: String,
      ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      s"percentiles must be in [0,1]: $ps")
    val counts = df
      .filter(col(value).isNotNull)
      .groupBy(col(group), col(value))
      .agg(count(lit(1)).as("__cnt"))
    val wOrd = Window.partitionBy(col(group)).orderBy(col(value))
    val wAll = Window.partitionBy(col(group))
    val cum = counts
      .withColumn("__cum", sum(col("__cnt")).over(wOrd))
      .withColumn("__n", sum(col("__cnt")).over(wAll))
      .withColumn("__cumb", col("__cum") - col("__cnt"))
    // 0-based target position per percentile, exactly Percentile's
    // arithmetic: Double percentage * (Long count − 1), floor/ceil → Long
    def pos(p: Double) = lit(p) * (col("__n") - 1).cast("double")
    val aggs = ps.flatMap { case (name, p) =>
      val lo = floor(pos(p))
      val hi = ceil(pos(p))
      Seq(
        max(when(col("__cumb") <= lo && col("__cum") > lo, col(value)))
          .as(s"__lo_$name"),
        max(when(col("__cumb") <= hi && col("__cum") > hi, col(value)))
          .as(s"__hi_$name"))
    } :+ max(col("__n")).as("__n")
    val picked = cum.groupBy(col(group)).agg(aggs.head, aggs.tail: _*)
    val out = ps.foldLeft(picked) { case (d, (name, p)) =>
      val po = pos(p)
      val lo = floor(po)
      val hi = ceil(po)
      val vLo = col(s"__lo_$name").cast("double")
      val vHi = col(s"__hi_$name").cast("double")
      d.withColumn(name,
        when(lo === hi || vLo === vHi, vLo)
          .otherwise((hi.cast("double") - po) * vLo +
            (po - lo.cast("double")) * vHi))
    }
    out.select(col(group) +: ps.map { case (name, _) => col(name) }: _*)
  }
}
