package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Materialize.PinOps

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
  *   2. A TWO-PHASE prefix sum for the per-group cumulative, the
  *      [[Ranking.globalRank]] pattern: range-repartition the
  *      distribution on (group, value) so every task holds a contiguous
  *      slice, run the running total WITHIN each (slice, group) cell,
  *      then close the gap with a tiny per-(slice, group) subtotal
  *      frame — offsets and group totals come from windows over that
  *      frame (≤ P + G − 1 rows, P = shuffle partitions, G = groups)
  *      and broadcast-join back. The heavy sort runs over VALUE RANGES,
  *      so its parallelism is the partition count, NOT the group count
  *      — a 3-group query still saturates the cluster. (A plain
  *      `Window.partitionBy(group)` cumulative would put each group's
  *      whole distinct set through one task — for few groups over
  *      unbounded measures that is a serial external-sort tail, the
  *      exact shape class the operator exists to escape.)
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
  * The cumulative counts feeding it are exact longs, so the two-phase
  * plan cannot perturb a bit.
  *
  * Caller contract: NULL values are ignored (like the built-in); by
  * default a group whose values are ALL null is dropped rather than
  * emitted with null percentiles — pass `keepAllNullGroups = true` to
  * left-join the full group set back (null percentiles for the dead
  * groups) and make the operator a drop-in replacement for the
  * aggregate's row set.
  *
  * 100 TB shape: one exchange of the (group, value) distribution, one
  * pinned range exchange (sampled bounds — both downstream reads must
  * see the same slice ids), one (slice, group)-cell sort whose
  * parallelism is the partition count. The broadcast offset frame is
  * ≤ P + G − 1 rows — for the operator's target regime (few groups,
  * unbounded measures) that is a handful of rows; at G large enough to
  * strain a broadcast (millions of groups), per-group parallelism
  * already saturates any cluster and the built-in aggregate's per-group
  * state is small — use it instead.
  */
object ExactQuantiles {

  /** Input-size gate between the two cumulative strategies (round 18):
    * below this optimizer-estimated input size, the per-group cumulative
    * runs as a single `Window.partitionBy(group)` pass — 3 stages, zero
    * pins — because the two-phase prefix sum's fixed structure (2 pins,
    * a sampled range exchange, the offset frame and its broadcast, ~12
    * stages) costs more than it parallelizes on small data (measured at
    * sf0.1: 3.23 s two-phase vs ~1.9 s one-phase bench rows; the
    * one-phase plan was also the r17 shape that measured 24.1 s at
    * sf100, so the default keeps it through ~10 GB inputs). Above the
    * gate — the unbounded-measure / 100 TB regime where one group's
    * distinct set through one window task is a serial external-sort
    * tail — the range-sliced two-phase takes over (parallelism =
    * partition count). Both paths produce BIT-IDENTICAL rows
    * (ExactQuantilesSpec pins equality on adversarial distributions),
    * so the gate can never change a result, only the plan. Stats
    * fallback is safe-by-direction: an unknown size estimates huge
    * (defaultSizeInBytes) and routes to the scale path. Conf override:
    * `spark.graft.quantiles.twoPhaseMinBytes`.
    */
  val TwoPhaseMinBytesConf = "spark.graft.quantiles.twoPhaseMinBytes"
  val TwoPhaseMinBytesDefault: Long = 10L << 30

  /** @param ps (output column name, percentile in [0,1]) pairs.
    * @param keepAllNullGroups when true, groups whose values are all
    *   NULL are emitted with null percentiles (the built-in aggregate's
    *   row set) at the cost of one extra distinct over the group column.
    * Output: one row per group — `group` column plus one double column
    * per requested percentile, raw (callers apply their own rounding).
    */
  def byCounts(
      df: DataFrame, group: String, value: String,
      ps: Seq[(String, Double)],
      keepAllNullGroups: Boolean = false): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      s"percentiles must be in [0,1]: $ps")
    val minBytes = df.sparkSession.conf
      .get(TwoPhaseMinBytesConf, TwoPhaseMinBytesDefault.toString).toLong
    val inputBytes = scala.util.Try(
      df.queryExecution.optimizedPlan.stats.sizeInBytes).toOption
      .getOrElse(BigInt(Long.MaxValue))
    if (inputBytes < minBytes)
      onePhase(df, group, value, ps, keepAllNullGroups)
    else twoPhase(df, group, value, ps, keepAllNullGroups)
  }

  /** Small-input cumulative: one `Window.partitionBy(group).orderBy(value)`
    * running sum over the distribution — the r17 plan shape. Parallelism
    * of the window stage is the GROUP COUNT, which is exactly why the
    * size gate exists; below the gate the whole distribution is a few
    * hundred thousand rows and the window's single pass beats the
    * two-phase's fixed stage/pin structure. Interpolation/pick stages
    * are shared with [[twoPhase]], so the arithmetic cannot drift.
    */
  private def onePhase(
      df: DataFrame, group: String, value: String,
      ps: Seq[(String, Double)], keepAllNullGroups: Boolean): DataFrame = {
    val counts = df
      .filter(col(value).isNotNull)
      .groupBy(col(group), col(value))
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(col(group)).orderBy(col(value))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wN = Window.partitionBy(col(group))
    val cum = counts
      .withColumn("__cum", sum(col("__cnt")).over(w))
      .withColumn("__n", sum(col("__cnt")).over(wN))
      .withColumn("__cumb", col("__cum") - col("__cnt"))
    finish(df, pickInterpolate(cum, group, value, ps), group, ps, keepAllNullGroups)
  }

  private def twoPhase(
      df: DataFrame, group: String, value: String,
      ps: Seq[(String, Double)],
      keepAllNullGroups: Boolean): DataFrame = {
    // The distribution is PINNED before the range exchange:
    // repartitionByRange SAMPLES its child to pick bounds, and without
    // the pin that sampling pass re-reads the whole partial-aggregate
    // exchange and re-runs the final aggregation (measured at sf10: the
    // 430 MB exchange read twice, +2 s on a 4 s query). Pinning the
    // ~distinct-pairs frame (tiny next to the partial exchange) makes
    // the sample read materialized blocks instead.
    val counts = df
      .filter(col(value).isNotNull)
      .groupBy(col(group), col(value))
      .agg(count(lit(1)).as("__cnt"))
      .pinned
    // Phase 1 of the prefix sum: contiguous (group, value) slices. The
    // range exchange's sampled bounds are not deterministic across
    // recomputations — pinned because both the subtotal frame and the
    // cumulative read it (same rationale as Ranking.globalRank).
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = counts
      .repartitionByRange(parts, col(group), col(value))
      .withColumn("__pid", spark_partition_id())
      .pinned
    // Phase 2: per-(slice, group) subtotals → running offsets and group
    // totals. ≤ P + G − 1 rows (each slice is contiguous, so a group
    // spans a contiguous run of slices); every window here is over ≤ P
    // rows per group — scale-free.
    val wOff = Window.partitionBy(col(group)).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wN = Window.partitionBy(col(group))
    val offsets = ranged
      .groupBy(col("__pid"), col(group)).agg(sum(col("__cnt")).as("__sub"))
      .withColumn("__off", coalesce(sum(col("__sub")).over(wOff), lit(0L)))
      .withColumn("__n", sum(col("__sub")).over(wN))
      .select(col("__pid").as("__opid"), col(group).as("__og"),
        col("__off"), col("__n"))
    // The heavy sort: cumulative within each (slice, group) cell. Cell
    // count ≈ P + G − 1, each cell ≤ one slice — parallelism is the
    // partition count regardless of how few groups there are.
    val wLocal = Window.partitionBy(col("__pid"), col(group)).orderBy(col(value))
    val cum = ranged
      .withColumn("__lcum", sum(col("__cnt")).over(wLocal))
      .join(broadcast(offsets),
        col("__pid") === col("__opid") && col(group) <=> col("__og"))
      .withColumn("__cum", col("__lcum") + col("__off"))
      .withColumn("__cumb", col("__cum") - col("__cnt"))
      .drop("__opid", "__og")
    finish(df, pickInterpolate(cum, group, value, ps), group, ps, keepAllNullGroups)
  }

  /** Shared pick + interpolate over a cumulative-distribution frame with
    * columns (group, value, __cnt, __cum, __cumb, __n) — BOTH cumulative
    * strategies route here, so the interpolation arithmetic (the
    * bit-identity contract with Spark's `Percentile`) exists exactly
    * once.
    */
  private def pickInterpolate(
      cum: DataFrame, group: String, value: String,
      ps: Seq[(String, Double)]): DataFrame = {
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
    val interp = ps.foldLeft(picked) { case (d, (name, p)) =>
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
    interp.select(col(group) +: ps.map { case (name, _) => col(name) }: _*)
  }

  /** Shared keepAllNullGroups closing join (see [[byCounts]] scaladoc). */
  private def finish(
      df: DataFrame, out: DataFrame, group: String,
      ps: Seq[(String, Double)], keepAllNullGroups: Boolean): DataFrame =
    if (!keepAllNullGroups) out
    else df.select(col(group)).distinct()
      .join(out.withColumnRenamed(group, "__g"),
        col(group) <=> col("__g"), "left")
      .select(col(group) +: ps.map { case (name, _) => col(name) }: _*)
}
