package graft.io

import java.time.LocalDate
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Scd2

/** Incremental SCD2 history storage — kills the O(history) full-snapshot
  * rewrite the plain [[Tables.overwrite]] sink pays on every merge (the
  * reference gets the equivalent from Delta's file-level MERGE,
  * Silver Layer.py:86-118).
  *
  * Layout: the history is ONE parquet table partitioned by `end_date`.
  * SCD2 gives that column a special shape — current rows have
  * `end_date IS NULL` (the Hive default partition), and every row expired
  * by the merge of day D has `end_date = D` — so the partition key is also
  * the mutation boundary:
  *
  * {{{
  *   silver/doctors/
  *     _scd2_schema.json                       ← schema-of-record sidecar
  *     end_date=__HIVE_DEFAULT_PARTITION__/    ← the current snapshot
  *     end_date=2026-02-01/                    ← rows expired on 2026-02-01
  *     end_date=2026-03-01/                    ← … immutable once written
  * }}}
  *
  * A merge therefore:
  *  - READS only the current partition plus the asOf day's existing delta
  *    (both partition-pruned — older closed history never rescans);
  *  - WRITES exactly two partition directories via STAGED SWAPS: the asOf
  *    delta (the day's newly-expired rows UNIONED with any already-expired
  *    same-day rows, so multiple merges per day — streaming micro-batches,
  *    intraday reruns — accumulate instead of replacing each other), then
  *    the rewritten current snapshot. Older closed partitions are never
  *    touched — byte-identical across merges.
  *
  * Staged swap = write the new directory under a dot-prefixed staging name
  * (invisible to partition discovery), then delete-target + rename. The
  * only crash window is between that delete and rename, and [[recover]] —
  * run at the head of every merge — closes it by promoting a complete
  * staging whose target is missing (and clearing stale stagings whose
  * target survived). The merge output is materialized (localCheckpoint)
  * BEFORE any directory is mutated, so the plan never reads a directory
  * it is about to replace. Crash anywhere ⇒ rerun the same (batch, asOf)
  * load: every line of the publish sequence is idempotent under that
  * rerun (Scd2IncrementalSpec / Scd2CrashSpec).
  *
  * Cost per merge is O(current + batch) read and O(current + day-delta)
  * write, independent of accumulated history: at 100 TB of history with a
  * GB-scale current dimension, this is the difference between a daily
  * full-table rewrite and a daily current-partition refresh. (Delta's
  * file-level MERGE narrows the write further, to only the FILES holding
  * matched keys; partition-level is the finest granularity plain parquet
  * supports. Combine with [[Tables.saveBucketed]]-style layouts if the
  * current partition itself outgrows a rewrite.)
  *
  * Contract: single writer per table; a reader racing the swap of a
  * partition can observe it briefly absent (the documented tradeoff vs the
  * versioned-snapshot sink — snapshot isolation plus partition-level
  * mutation needs a real txn log).
  */
object Scd2History {

  private val CurrentDirName = s"${Scd2.EndDate}=__HIVE_DEFAULT_PARTITION__"
  private def deltaDirName(asOf: LocalDate) = s"${Scd2.EndDate}=$asOf"
  private def stagingName(dir: String) = s".$dir.staging"
  private val StagingRe = ("""^\.(""" + Scd2.EndDate + """=.+)\.staging$""").r

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Close the staged-swap crash window: a complete staging directory whose
    * target partition is MISSING is the interrupted swap's new content —
    * promote it; one whose target survived is stale pre-swap output —
    * clear it. Returns the promoted partition names. Runs at the head of
    * every merge; safe to call anytime under the single-writer contract.
    */
  def recover(spark: SparkSession, path: String): Seq[String] = {
    val fs = fsOf(spark, path)
    val root = new Path(path)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq.flatMap { st =>
      st.getPath.getName match {
        case StagingRe(target) =>
          val targetDir = new Path(root, target)
          if (!fs.exists(targetDir)) {
            if (!fs.rename(st.getPath, targetDir))
              throw new java.io.IOException(s"Scd2History.recover: failed to promote ${st.getPath}")
            Some(target)
          } else {
            fs.delete(st.getPath, true)
            None
          }
        case _ => None
      }
    }
  }

  /** Write `rows` (WITHOUT the end_date column — it is encoded in the
    * directory name) as partition `dirName` via the staged swap.
    */
  private def publishPartition(spark: SparkSession, path: String,
      dirName: String, rows: DataFrame): Unit = {
    val fs = fsOf(spark, path)
    val root = new Path(path)
    val staging = new Path(root, stagingName(dirName))
    if (fs.exists(staging)) fs.delete(staging, true)
    rows.write.mode("overwrite").parquet(staging.toString)
    val target = new Path(root, dirName)
    if (fs.exists(target)) fs.delete(target, true)
    if (!fs.rename(staging, target))
      throw new java.io.IOException(s"Scd2History: failed to publish $staging to $target")
  }

  /** The current snapshot: reads ONLY the `end_date IS NULL` partition
    * (partition pruning — the closed history is not even listed into the
    * scan).
    */
  def readCurrent(spark: SparkSession, path: String): DataFrame =
    readAll(spark, path).filter(col(Scd2.EndDate).isNull)

  /** The full history (all partitions) — for point-in-time reads
    * ([[Scd2.snapshotAt]], [[Scd2.pointInTimeJoin]]). Delegates to
    * [[Tables.read]]: the schema sidecar is the schema-of-record
    * (deterministic under evolution, null-fills pre-evolution files, O(1)
    * planning instead of a mergeSchema footer scan).
    */
  def readAll(spark: SparkSession, path: String): DataFrame =
    Tables.read(spark, path)

  /** First load: stamp the SCD2 triplet and lay down the partitioned
    * table (everything lands in the current partition).
    */
  def bootstrap(source: DataFrame, asOf: LocalDate, path: String): Unit = {
    val spark = source.sparkSession
    val stamped = Scd2.bootstrap(source, asOf)
    stamped.write.mode("overwrite").partitionBy(Scd2.EndDate).parquet(path)
    Tables.writeSchemaSidecar(spark, path, stamped.schema)
  }

  /** Schema evolution at the merge boundary (Delta mergeSchema semantics):
    * a batch column the history lacks is added to the history side as a
    * typed null (old rows read back null); a history column the batch
    * lacks is null-filled on the batch side — which change detection then
    * treats as a real value→null transition, expiring the row. Both
    * directions are EXPLICIT: the merged schema is the union, recorded in
    * the sidecar.
    */
  private def align(current: DataFrame, batch: DataFrame): (DataFrame, DataFrame) = {
    val triplet = Seq(Scd2.EffectiveDate, Scd2.EndDate, Scd2.IsCurrent)
    val curBiz = current.columns.filterNot(triplet.contains)
    val newCols = batch.columns.filterNot(curBiz.contains)
    val missing = curBiz.filterNot(batch.columns.contains)
    val curAligned = newCols.foldLeft(current)((df, c) =>
      df.withColumn(c, lit(null).cast(batch.schema(c).dataType)))
    val batchAligned = missing.foldLeft(batch)((df, c) =>
      df.withColumn(c, lit(null).cast(current.schema(c).dataType)))
    (curAligned, batchAligned)
  }

  /** Small-file compaction for the closed partitions — the maintenance op
    * this layout eventually needs: each merge writes its expired delta
    * through the session's shuffle parallelism, so a closed partition is
    * born as up-to-`shuffle.partitions` tiny shards. Compaction reads the
    * closed rows, hash-repartitions BY the partition key — every day's
    * rows colocate onto one task, so each closed partition compacts to ONE
    * file; `parallelism` only spreads distinct days across tasks — and
    * dynamic-overwrites only the closed partitions (data identical on both
    * sides of any crash, so the multi-partition commit needs no swap
    * protocol here). The current partition and the DATA are untouched
    * (CompactionSpec). Safe anytime under the single-writer contract;
    * rerunning is idempotent.
    */
  def compactClosed(spark: SparkSession, path: String, parallelism: Int = 1): Unit = {
    val closed = readAll(spark, path).filter(col(Scd2.EndDate).isNotNull)
    Tables.overwritePartitionsDynamic(
      closed.repartition(parallelism, col(Scd2.EndDate)),
      path, Seq(Scd2.EndDate))
  }

  /** Incremental merge: full [[Scd2.merge]] semantics against the current
    * partition only, published as two staged partition swaps (day delta
    * first, then current — see the object doc for the crash analysis).
    */
  def merge(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      keys: Seq[String],
      compareCols: Seq[String],
      asOf: LocalDate): Unit = {
    recover(spark, path)
    val (current, alignedBatch) = align(readCurrent(spark, path), batch)
    // Materialize BEFORE mutating any directory the plan reads. The merge
    // output is current-sized — the cheap thing to pin.
    val merged = Scd2.merge(current, alignedBatch, keys, compareCols, asOf)
      .localCheckpoint(true)
    Tables.writeSchemaSidecar(spark, path, merged.schema) // schema-ahead is harmless; stale-behind is not
    // Day-delta accumulation: a second merge on the same asOf (streaming
    // micro-batches, intraday rerun with changed data) must ADD its expired
    // rows to the day's partition, not replace them. distinct() collapses
    // the exact duplicates an idempotent rerun produces.
    val existingDelta = readAll(spark, path)
      .filter(col(Scd2.EndDate) === lit(asOf.toString).cast("date"))
    val delta = merged.filter(!col(Scd2.IsCurrent))
      .unionByName(existingDelta)
      .distinct()
      .localCheckpoint(true)
    if (!delta.isEmpty) // a no-change day publishes no (empty) delta partition
      publishPartition(spark, path, deltaDirName(asOf), delta.drop(Scd2.EndDate))
    publishPartition(spark, path, CurrentDirName,
      merged.filter(col(Scd2.IsCurrent)).drop(Scd2.EndDate))
  }
}
