package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-column data skipping — the
  * layout half of Delta/Iceberg `OPTIMIZE ZORDER BY`, expressed as a plain
  * DataFrame transform so any sink in this repo can write the result.
  *
  * Why it matters at 100 TB: min/max stats (parquet row-group footers
  * here; file-level stats in a lakehouse catalog) can only skip data for
  * predicates on the SORT prefix. A lexicographic sort by (a, b) gives b
  * full-range stats in every file, so `WHERE b = x` scans everything.
  * Interleaving the bits of per-column bucket ranks puts rows close in
  * EVERY dimension into the same files: each of the clustered columns
  * gets narrow per-file ranges, and point/range predicates on ANY of them
  * skip most of the table (ZOrderSpec measures both layouts' per-file
  * range widths).
  *
  * Bucketing is linear min/max scaling via `width_bucket` (one pass for
  * the bounds, O(1) codegen'd per row — no per-row boundary search).
  * Heavily skewed columns cluster better under rank-based buckets (what
  * Delta's range_partition_id does); pre-transform such a column (e.g.
  * log) before clustering. Nulls bucket to 0, the curve's origin.
  *
  * The transform is one range shuffle on the z-value (the same cost any
  * OPTIMIZE/sort rewrite pays) + an in-partition sort; downstream writes
  * produce one file per range partition, each covering a compact z-range.
  */
object ZOrder {

  /** `df` clustered on the Morton curve over `cols`.
    *
    * @param bits          bucket bits per column (2^bits buckets);
    *                      bits * cols.length must fit a signed long
    * @param numPartitions target file count; 0 = spark.sql.shuffle.partitions
    */
  def zOrdered(df: DataFrame, cols: Seq[String], bits: Int = 8,
      numPartitions: Int = 0): DataFrame = {
    require(cols.nonEmpty, "z-order needs at least one column")
    require(bits >= 1 && bits * cols.length <= 62,
      s"bits($bits) * cols(${cols.length}) must be in [1, 62]")
    val buckets = 1 << bits

    // One pass for the per-column bounds (the only driver-side state:
    // 2 doubles per column).
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__mn_$c"),
      max(col(c).cast("double")).as(s"__mx_$c")))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()

    // Per-column bucket index in [0, buckets): linear width_bucket scaling
    // clamped at the edges (width_bucket emits 0 below min and buckets+1
    // at/above max); constant columns and nulls land at 0.
    val bucketCols: Seq[Column] = cols.zipWithIndex.map { case (c, i) =>
      val mn = Option(bounds.get(2 * i)).fold(0.0)(_.asInstanceOf[Double])
      val mx = Option(bounds.get(2 * i + 1)).fold(0.0)(_.asInstanceOf[Double])
      if (mx <= mn) lit(0L)
      else coalesce(
        least(greatest(
          width_bucket(col(c).cast("double"), lit(mn), lit(mx), lit(buckets)),
          lit(1L)), lit(buckets.toLong)) - 1L,
        lit(0L))
    }

    // Interleave: output bit (j * n + i) = bit j of column i's bucket —
    // a static tree of bits * n shift/mask/or terms, fully codegen'd.
    val n = cols.length
    val z = (0 until bits).foldLeft(lit(0L)) { (acc, j) =>
      bucketCols.zipWithIndex.foldLeft(acc) { case (a, (b, i)) =>
        a.bitwiseOR(shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), j * n + i))
      }
    }

    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    df.withColumn("__z", z)
      .repartitionByRange(parts, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Cluster and write through the managed versioned-snapshot sink. */
  def write(df: DataFrame, path: String, cols: Seq[String], bits: Int = 8,
      numPartitions: Int = 0): Unit =
    Tables.overwrite(zOrdered(df, cols, bits, numPartitions), path)
}
