package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained rollup: per-batch PARTIAL aggregates persisted
  * as parquet, merged on read — the materialized-dashboard pattern for an
  * append-only 100 TB fact. Each load aggregates ONLY its own batch
  * (count / decimal sums / HLL sketches per group), writes a few KB–MB of
  * partials under `batch=<label>/`, and every later query — any batch
  * range, any time — is a merge over stored partials with ZERO rescans of
  * fact history. All three partial kinds are algebraic/mergeable with NO
  * accuracy loss at the merge: counts and decimal sums add exactly,
  * same-lgK HLL union is register-max-lossless (HllSketchSpec), so the
  * staged result equals the direct aggregation over the union of batches
  * (RollupSpec pins count/sum exactly and the sketch by estimate
  * equality).
  *
  * Storage contract (single-writer per batch label, like the other
  * sinks): a batch publishes by stage → `_SUCCESS` check → atomic rename,
  * so readers never list a PARTIAL batch; re-appending an existing label
  * REPLACES it (idempotent reloads — reruns and restated days), with the
  * old dir parked dot-prefixed until the swap lands, mirroring
  * [[Tables]]' restore-on-abort guarantee. Batch labels surface as a
  * `batch` partition column (pinned to STRING on read — inference would
  * coerce numeric-looking labels), so a label-range query prunes to
  * exactly the requested dirs at plan time.
  *
  * Replace atomicity, precisely: the INITIAL publication of a label is a
  * single rename — fully read-atomic. RE-appending an existing label is
  * two renames (park old, publish new); a reader that lists the store in
  * the microseconds between them sees that one batch ABSENT (never
  * partial, never mixed). Crash between the renames leaves the parked
  * dir, and the next append of that label (the natural retry) restores or
  * replaces it. If readers must be concurrent with same-label restatement,
  * coordinate externally or version the label (`label_v2`) — the
  * fact-table sinks ([[Tables]]) own the snapshot-isolation story; a
  * rollup cache of restated history accepts this window by design.
  */
object Rollup {

  /** What the rollup maintains per group: exact count, exact decimal sums
    * of `sumCols`, mergeable HLL distinct sketches of `distinctCols`.
    */
  final case class Spec(
      groupKeys: Seq[String],
      sumCols: Seq[String] = Nil,
      distinctCols: Seq[String] = Nil)

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** One batch's partial-aggregate frame (what lands in its dir). */
  private[io] def partial(df: DataFrame, spec: Spec): DataFrame = {
    val aggs =
      Seq(count(lit(1)).as("rollup_count")) ++
        spec.sumCols.map(c => sum(col(c).cast("decimal(28,6)")).as(s"sum_$c")) ++
        spec.distinctCols.map(c => hll_sketch_agg(col(c)).as(s"hll_$c"))
    df.groupBy(spec.groupKeys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Aggregate ONE batch and publish its partials under `batch=<label>`.
    * Rerunning with the same label replaces the previous partials.
    */
  def append(spark: SparkSession, stateDir: String, label: String,
      df: DataFrame, spec: Spec): Unit = {
    val fs = fsOf(spark, stateDir)
    val target = new Path(stateDir, s"batch=$label")
    val staging = new Path(stateDir, s".batch=$label.staging")
    val parked = new Path(stateDir, s".batch=$label.replaced")
    // a crash between a previous append's renames left the survivor
    // parked — restore it BEFORE staging (never destroy the last good
    // batch until the replacement is durable)
    AtomicPublish.recover(fs, target, parked)
    fs.delete(staging, true)
    partial(df, spec).write.mode("overwrite").parquet(staging.toString)
    if (!fs.exists(new Path(staging, "_SUCCESS")))
      throw new java.io.IOException(s"Rollup: $staging has no _SUCCESS marker after commit")
    AtomicPublish.replace(fs, staging, target, parked, "Rollup")
  }

  /** Stored batch labels (sorted), from the directory listing only. */
  def batches(spark: SparkSession, stateDir: String): Seq[String] = {
    val fs = fsOf(spark, stateDir)
    val root = new Path(stateDir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("batch=") && !n.startsWith("."))
      .map(_.stripPrefix("batch="))
      .sorted
  }

  /** Merge stored partials to final values — over every batch, or only
    * `labels` (pruned at plan time via the `batch` partition column).
    * Output per group: `count`, `sum_<c>` (exact decimal), and
    * `approx_distinct_<c>` (lossless-union HLL estimate).
    */
  def query(spark: SparkSession, stateDir: String, spec: Spec,
      labels: Seq[String] = Nil): DataFrame = {
    // Partition-column type inference would coerce numeric-looking labels
    // ('007' → 7, '1e3' → 1000.0), silently desyncing `batches()` output
    // from the `batch` column — a label filter could then match nothing.
    // Pin `batch` to STRING with an explicit read schema: data schema
    // sampled from one committed batch dir (cheap: parquet footer reads),
    // plus the partition column. Partition pruning on `batch` is
    // unaffected — the filter still prunes dirs at plan time.
    val stored = batches(spark, stateDir)
    require(stored.nonEmpty, s"Rollup: no batches under $stateDir")
    val dataSchema = spark.read
      .parquet(new Path(stateDir, s"batch=${stored.head}").toString).schema
    val all = spark.read
      .schema(dataSchema.add("batch", org.apache.spark.sql.types.StringType))
      .parquet(stateDir)
    val scoped = if (labels.isEmpty) all else all.filter(col("batch").isin(labels: _*))
    val aggs =
      Seq(sum(col("rollup_count")).as("count")) ++
        spec.sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")) ++
        spec.distinctCols.map(c =>
          hll_sketch_estimate(hll_union_agg(col(s"hll_$c"))).as(s"approx_distinct_$c"))
    scoped.groupBy(spec.groupKeys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
