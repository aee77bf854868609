package graft.io

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Rollup state contract: staged partials merge to the direct aggregation
  * (count/sum exact, HLL by lossless-union estimate equality), re-append
  * replaces, label scoping prunes at plan time, crash leftovers are
  * invisible to readers.
  */
class RollupSpec extends SparkSpec {
  import spark.implicits._

  private val spec = Rollup.Spec(
    groupKeys = Seq("seg"), sumCols = Seq("v"), distinctCols = Seq("u"))

  private def batch(day: Int, n: Int) =
    (1 to n).map { i =>
      (s"s${i % 3}", (day * 1000 + i).toDouble / 8, (i % (50 + day)).toLong)
    }.toDF("seg", "v", "u")

  test("merged partials equal the direct aggregation over all batches") {
    val dir = Files.createTempDirectory("rollup").toString
    val b1 = batch(1, 400); val b2 = batch(2, 300); val b3 = batch(3, 500)
    Rollup.append(spark, dir, "2026-01-01", b1, spec)
    Rollup.append(spark, dir, "2026-01-02", b2, spec)
    Rollup.append(spark, dir, "2026-01-03", b3, spec)
    assert(Rollup.batches(spark, dir) == Seq("2026-01-01", "2026-01-02", "2026-01-03"))

    val merged = Rollup.query(spark, dir, spec)
      .orderBy("seg").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDecimal(2), r.getLong(3))).toSeq
    val direct = b1.union(b2).union(b3)
      .groupBy($"seg").agg(
        count(lit(1)).as("count"),
        sum($"v".cast("decimal(28,6)")).as("sum_v"),
        hll_sketch_estimate(hll_sketch_agg($"u")).as("approx_distinct_u"))
      .orderBy("seg").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDecimal(2), r.getLong(3))).toSeq
    // counts and sums EXACT; the sketch estimate identical because
    // same-lgK union is lossless (sum scales differ only in metadata)
    assert(merged.map(t => (t._1, t._2, t._3.doubleValue, t._4)) ==
      direct.map(t => (t._1, t._2, t._3.doubleValue, t._4)))
  }

  test("re-append replaces a batch instead of duplicating it") {
    val dir = Files.createTempDirectory("rollup").toString
    Rollup.append(spark, dir, "d1", batch(1, 200), spec)
    val before = Rollup.query(spark, dir, spec).agg(sum($"count")).head().getLong(0)
    // restated day: same label, different content — must replace
    Rollup.append(spark, dir, "d1", batch(1, 150), spec)
    val after = Rollup.query(spark, dir, spec).agg(sum($"count")).head().getLong(0)
    assert(before == 200 && after == 150)
  }

  test("label scoping prunes to the requested batch dirs at plan time") {
    val dir = Files.createTempDirectory("rollup").toString
    Rollup.append(spark, dir, "d1", batch(1, 100), spec)
    Rollup.append(spark, dir, "d2", batch(2, 100), spec)
    Rollup.append(spark, dir, "d3", batch(3, 100), spec)
    val scoped = Rollup.query(spark, dir, spec, labels = Seq("d1", "d3"))
    assert(scoped.agg(sum($"count")).head().getLong(0) == 200)
    // partition pruning: d2's directory never enters the scan (inputFiles
    // reports the PRE-pruning index, so ask the scan node itself)
    val top = scoped.queryExecution.executedPlan
    val physical = top match { // AQE wraps the real plan
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val selected = physical.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.toPartitionArray.map(_.filePath.toString)
    }.flatten
    assert(selected.nonEmpty && selected.forall(f => !f.contains("batch=d2")))
  }

  test("numeric-looking labels survive: batch column is pinned to string") {
    val dir = Files.createTempDirectory("rollup").toString
    // '007' and '1e3' are the inference traps: unpinned, Spark coerces
    // them to 7 and 1000.0, so batches() and col("batch") disagree and a
    // label filter matches nothing.
    Rollup.append(spark, dir, "007", batch(1, 100), spec)
    Rollup.append(spark, dir, "1e3", batch(2, 150), spec)
    assert(Rollup.batches(spark, dir) == Seq("007", "1e3"))
    val scoped = Rollup.query(spark, dir, spec, labels = Seq("007"))
    assert(scoped.agg(sum($"count")).head().getLong(0) == 100)
    val labels = Rollup.query(spark, dir, spec, labels = Seq("007", "1e3"))
    assert(labels.agg(sum($"count")).head().getLong(0) == 250)
  }

  test("a crashed staging dir is invisible to readers and a rerun heals it") {
    val dir = Files.createTempDirectory("rollup").toString
    Rollup.append(spark, dir, "d1", batch(1, 100), spec)
    // simulate a crash mid-append of d2: staging exists, no publish
    Rollup.partial(batch(2, 100), spec).write.mode("overwrite")
      .parquet(s"$dir/.batch=d2.staging")
    assert(Rollup.batches(spark, dir) == Seq("d1"))
    assert(Rollup.query(spark, dir, spec).agg(sum($"count")).head().getLong(0) == 100)
    // rerun of the crashed batch publishes cleanly over the leftover
    Rollup.append(spark, dir, "d2", batch(2, 100), spec)
    assert(Rollup.query(spark, dir, spec).agg(sum($"count")).head().getLong(0) == 200)
  }
}
