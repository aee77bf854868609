package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed range join (point-in-interval): pair every point row with
  * the interval rows that contain it, optionally under equi-keys. Spark
  * plans a raw `s <= p AND p <= e` predicate as a broadcast-nested-loop
  * (or cartesian) join — quadratic and a non-starter at scale. The
  * scalable form is BINNING: each interval replicates to the fixed-width
  * bins it overlaps, each point maps to exactly one bin, and the match
  * becomes a hash-partitioned EQUI-join on (keys, bin) followed by the
  * exact containment filter — the same shape q60 uses for its
  * same-user 300 s pairs, generalized to arbitrary intervals and keys.
  *
  * Cost model at 100 TB: the interval side grows by the replication
  * factor avg(ceil(len / binWidth)) + 1, the point side not at all, and
  * everything downstream is one shuffle per side into a codegen'd hash
  * join. Pick binWidth near the TYPICAL interval length: too small
  * inflates interval replication, too large piles unrelated rows into
  * each bin (the filter then discards them post-join). Unbounded interval
  * lengths are the failure mode (one year-long interval replicates 10^5
  * bins at minute width) — the per-row `assert_true` guard fails loudly
  * instead of silently materializing that explosion; split or cap such
  * intervals upstream.
  */
object RangeJoin {

  /** Join `points` to the `intervals` rows whose [startCol, endCol]
    * contains pointCol, matching `keys` (point-side name -> interval-side
    * name) exactly. All three range columns must be numeric and on the
    * same scale (cast timestamps to epoch seconds, dates to epoch days,
    * upstream). The two sides must have DISJOINT column names (rename
    * before joining — output = point columns ++ interval columns, and
    * self-derived sides would otherwise be ambiguous). Intervals with
    * end < start fail loudly (they would silently never match).
    *
    * @param maxBins hard ceiling on bins per interval (replication guard)
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      keys: Seq[(String, String)] = Nil,
      binWidth: Long = 3600L,
      maxBins: Int = 1024): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"range join: column names must be disjoint across sides " +
        s"(shared: ${overlap.mkString(", ")}) — rename before joining")

    // assert_true rides the FILTER so column pruning can't drop it: a
    // valid row maps to null (isNull -> keep), a bad one raises.
    val guard = assert_true(
      col(endCol) >= col(startCol) &&
        (col(endCol) - col(startCol)) <= lit(binWidth) * maxBins,
      lit(s"range join: interval invalid or spans more than $maxBins bins " +
        s"of $binWidth — raise binWidth/maxBins or split upstream")).isNull
    val iv = intervals
      .filter(guard)
      .withColumn("__ibin", explode(sequence(
        floor(col(startCol) / binWidth), floor(col(endCol) / binWidth))))
    val pt = points.withColumn("__pbin", floor(col(pointCol) / binWidth))
    val cond = keys.map { case (p, i) => col(p) === col(i) }
      .foldLeft(col("__pbin") === col("__ibin"))(_ && _)
    pt.join(iv, cond)
      .filter(col(startCol) <= col(pointCol) && col(pointCol) <= col(endCol))
      .drop("__pbin", "__ibin")
  }

  /** Interval × interval overlap join: pair every left interval with the
    * right intervals it overlaps ([ls,le] ∩ [rs,re] nonempty), matching
    * `keys` exactly. Both sides replicate to their covered bins; a pair
    * overlapping across SEVERAL shared bins would duplicate, so each pair
    * is emitted only in its CANONICAL bin — the bin of max(ls, rs), the
    * overlap's first instant, which both intervals provably cover —
    * giving exactly-once output with no post-join dedup shuffle. Same
    * column-disjointness contract and replication guards as
    * [[pointInInterval]]; cost doubles only in that BOTH sides carry the
    * replication factor.
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      keys: Seq[(String, String)] = Nil,
      binWidth: Long = 3600L,
      maxBins: Int = 1024): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlapCols = left.columns.toSet.intersect(right.columns.toSet)
    require(overlapCols.isEmpty,
      s"range join: column names must be disjoint across sides " +
        s"(shared: ${overlapCols.mkString(", ")}) — rename before joining")

    def guarded(df: DataFrame, s: String, e: String, bin: String): DataFrame =
      df.filter(assert_true(
          col(e) >= col(s) && (col(e) - col(s)) <= lit(binWidth) * maxBins,
          lit(s"range join: interval invalid or spans more than $maxBins " +
            s"bins of $binWidth — raise binWidth/maxBins or split upstream")).isNull)
        .withColumn(bin, explode(sequence(
          floor(col(s) / binWidth), floor(col(e) / binWidth))))

    val lv = guarded(left, leftStart, leftEnd, "__lbin")
    val rv = guarded(right, rightStart, rightEnd, "__rbin")
    val cond = keys.map { case (l, r) => col(l) === col(r) }
      .foldLeft(col("__lbin") === col("__rbin"))(_ && _)
    lv.join(rv, cond)
      .filter(col(leftStart) <= col(rightEnd) &&
        col(rightStart) <= col(leftEnd) &&
        floor(greatest(col(leftStart), col(rightStart)) / binWidth) === col("__lbin"))
      .drop("__lbin", "__rbin")
  }
}
