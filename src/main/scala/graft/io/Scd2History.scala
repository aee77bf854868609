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

  /** Close the staged-swap crash window: a COMPLETE staging directory whose
    * target partition is MISSING is the interrupted swap's new content —
    * promote it; anything else (stale pre-swap output whose target
    * survived, or a partial staging from a crash mid-write) is cleared.
    * Completeness is proven by Spark's `_SUCCESS` marker — written only at
    * job commit — so a crash midway through the staging write (a day's
    * FIRST delta has no pre-existing target to distinguish it) can never
    * promote half a delta as live history. Returns the promoted partition
    * names. Runs at the head of every merge; safe to call anytime under
    * the single-writer contract.
    */
  def recover(spark: SparkSession, path: String): Seq[String] = {
    val fs = fsOf(spark, path)
    val root = new Path(path)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq.flatMap { st =>
      st.getPath.getName match {
        case StagingRe(target) =>
          val targetDir = new Path(root, target)
          val complete = fs.exists(new Path(st.getPath, "_SUCCESS"))
          if (complete && !fs.exists(targetDir)) {
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
    // The marker is load-bearing: recover() treats its absence as "partial
    // write, discard". A session configured to skip _SUCCESS (e.g.
    // marksuccessfuljobs=false) must fail HERE, before the delete below
    // opens the crash window recovery could no longer close.
    if (!fs.exists(new Path(staging, "_SUCCESS")))
      throw new java.io.IOException(
        s"Scd2History: $staging has no _SUCCESS marker after commit — " +
          "crash recovery requires mapreduce.fileoutputcommitter.marksuccessfuljobs=true")
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
    *
    * `parallelism` defaults to the CLOSED-PARTITION COUNT — one task per
    * day, the widest layout that still yields one file per partition — so
    * a years-deep history does not funnel through a single task; pass an
    * explicit value only to trade task count against file count (e.g. a
    * small cluster compacting 10⁴ days).
    */
  def compactClosed(spark: SparkSession, path: String, parallelism: Int = 0): Unit = {
    val nClosed = listClosedPartitions(spark, path).size
    if (nClosed == 0) return
    val tasks = if (parallelism > 0) parallelism else nClosed
    val closed = readAll(spark, path).filter(col(Scd2.EndDate).isNotNull)
    Tables.overwritePartitionsDynamic(
      closed.repartition(tasks, col(Scd2.EndDate)),
      path, Seq(Scd2.EndDate))
  }

  /** The closed (immutable) partition directory names under `path`. */
  def listClosedPartitions(spark: SparkSession, path: String): Seq[String] = {
    val fs = fsOf(spark, path)
    val root = new Path(path)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath.getName).filter(n =>
      n.startsWith(s"${Scd2.EndDate}=") && n != CurrentDirName)
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

  // --------------------------------------------------------------------
  // Unified bucketed + incremental layout — the two 100 TB properties at
  // once. [[merge]] above writes only current + delta but full-outer-joins
  // a plain-parquet current (BOTH sides shuffle); the round-2 bucketed
  // variant ([[Tables.overwriteBucketed]] of the whole history) merges
  // exchange-free but rewrites everything. Here the CURRENT rows live in a
  // catalog table BUCKETED (and sorted) on the merge key while closed rows
  // keep the end_date-partitioned path layout:
  //
  //   silver/doctors__history/            ← closed partitions + sidecar
  //     _scd2_schema.json
  //     end_date=2026-02-01/              ← immutable once written
  //   catalog table silver_doctors        ← current rows, bucketed by key
  //
  // A merge then reads the current side PRE-PARTITIONED (the only exchange
  // in the plan is the incoming batch moving to the bucket layout —
  // Scd2BucketedSpec asserts it), appends the day's expired delta to its
  // own path partition, and rewrites ONLY the current table (bucketed, via
  // the staged catalog swap). Cost: O(batch) shuffle, O(current + delta)
  // write — the full equivalent of Delta's file-level MERGE
  // (Silver Layer.py:86-118) with plain parquet + a metastore.
  //
  // The stored current table carries business columns + effective_date
  // only: end_date/is_current are constants (null/true) for every current
  // row, so they are reconstructed on read rather than stored — which also
  // makes it impossible for a buggy writer to park an expired row in the
  // current table.
  // --------------------------------------------------------------------

  /** The current snapshot of the unified layout: the bucketed catalog
    * table with the constant half of the SCD2 triplet reconstructed.
    * Projections over literals preserve the scan's bucketed distribution,
    * so frames read here join/aggregate on the merge key exchange-free.
    */
  def readCurrentBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
      .withColumn(Scd2.EndDate, lit(null).cast("date"))
      .withColumn(Scd2.IsCurrent, lit(true))

  /** Full history of the unified layout: closed path partitions (sidecar
    * schema-of-record, null-filled under evolution) plus the current
    * table. `allowMissingColumns` covers the crash window where the
    * sidecar is ahead of the not-yet-swapped current table (schema-ahead
    * is harmless — the missing column reads null, exactly what the
    * post-swap table would hold for pre-evolution rows).
    */
  def readAllBucketed(spark: SparkSession, path: String, table: String): DataFrame =
    readAll(spark, path).unionByName(
      readCurrentBucketed(spark, table), allowMissingColumns = true)

  /** First load of the unified layout: current rows into the bucketed
    * table, an empty closed-history root + sidecar beside it.
    */
  def bootstrapBucketed(source: DataFrame, asOf: LocalDate, path: String,
      table: String, keys: Seq[String], numBuckets: Int): Unit = {
    val spark = source.sparkSession
    val stamped = Scd2.bootstrap(source, asOf)
    fsOf(spark, path).mkdirs(new Path(path))
    Tables.writeSchemaSidecar(spark, path, stamped.schema)
    Tables.overwriteBucketed(
      stamped.drop(Scd2.EndDate, Scd2.IsCurrent), table, keys, numBuckets)
  }

  /** Incremental merge on the unified layout. Plan shape: ONE exchange
    * (the batch); writes: the day's delta partition (staged swap) + the
    * current table (staged catalog swap). Crash anywhere ⇒ rerun the same
    * (batch, asOf) load — [[Tables.recoverStaged]] + [[recover]] close the
    * swap windows and the merge itself is idempotent (an already-applied
    * batch detects no changes, and the delta union + distinct absorbs
    * re-emitted expired rows).
    */
  def mergeBucketed(
      spark: SparkSession,
      path: String,
      table: String,
      batch: DataFrame,
      keys: Seq[String],
      compareCols: Seq[String],
      asOf: LocalDate,
      numBuckets: Int): Unit = {
    Tables.recoverStaged(spark, table)
    recover(spark, path)
    val (current, alignedBatch) = align(readCurrentBucketed(spark, table), batch)
    // Materialized BEFORE any mutation: the delta publish and the staged
    // current-table write must not re-execute a plan whose inputs are
    // being swapped underneath it.
    val merged = Scd2.merge(current, alignedBatch, keys, compareCols, asOf)
      .localCheckpoint(true)
    Tables.writeSchemaSidecar(spark, path, merged.schema)
    val existingDelta = readAll(spark, path)
      .filter(col(Scd2.EndDate) === lit(asOf.toString).cast("date"))
    val delta = merged.filter(!col(Scd2.IsCurrent))
      .unionByName(existingDelta)
      .distinct()
      .localCheckpoint(true)
    if (!delta.isEmpty)
      publishPartition(spark, path, deltaDirName(asOf), delta.drop(Scd2.EndDate))
    Tables.overwriteBucketed(
      merged.filter(col(Scd2.IsCurrent)).drop(Scd2.EndDate, Scd2.IsCurrent),
      table, keys, numBuckets)
  }
}
