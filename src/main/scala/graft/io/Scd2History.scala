package graft.io

import java.time.LocalDate
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Materialize.PinOps
import graft.engine.Scd2

/** Incremental SCD2 history storage — kills the O(history) full-snapshot
  * rewrite the plain [[Tables.overwrite]] sink pays on every merge (the
  * reference gets the equivalent from Delta's file-level MERGE,
  * Silver Layer.py:86-118).
  *
  * Layout: one directory per `end_date` value — the SCD2 mutation
  * boundary (current rows have null end_date; rows expired by the merge
  * of day D carry end_date = D) — and inside each, the
  * [[Tables.overwriteKeeping]] versioned-snapshot pattern at PARTITION
  * granularity: numbered generation directories plus a tiny `_gen`
  * pointer naming the live one.
  *
  * {{{
  *   silver/doctors/
  *     _scd2_schema.json                       ← schema-of-record sidecar
  *     end_date=__HIVE_DEFAULT_PARTITION__/    ← the current snapshot
  *       _gen                                  ← "2": the live generation
  *       gen=00000001/                         ← previous gen (reader grace)
  *       gen=00000002/                         ← live gen
  *     end_date=2026-02-01/                    ← rows expired 2026-02-01
  *       _gen
  *       gen=00000001/
  * }}}
  *
  * Every mutation is publish-flip-GC: write the new generation directory
  * under a dot-prefixed staging name, RENAME it into place (the target
  * never pre-exists, so the rename is an atomic creation — there is no
  * delete-then-rename window), atomically flip the partition's `_gen`
  * pointer, then GC all generations except the new live one and the
  * immediately-previous one. A reader therefore NEVER observes a missing
  * or partial partition: it resolves each `_gen` once at plan time and
  * reads complete, immutable generation directories whose files outlive
  * the next merge (the grace copy). The reader contract matches
  * [[Tables.overwrite]]'s: a scan that spans TWO merges of the same
  * partition can lose its grace files — at that point the snapshot it
  * planned is two generations stale.
  *
  * `end_date` is stored as a DATA column in the files (not parsed from
  * the directory name): generation directories are plain parquet leaf
  * dirs, so no partition-discovery rules constrain the layout, and every
  * file carries a single end_date value — parquet min/max stats make an
  * end_date filter skip the file as cheaply as partition pruning would.
  * The common access paths don't even rely on that: [[readCurrent]] and
  * the merge's same-day delta read list ONLY the directories they need
  * (directory-name pruning at plan construction).
  *
  * A merge READS the current generation plus the asOf day's live delta,
  * and WRITES at most two generations: the day's delta — the newly
  * expired rows unioned with the day's existing delta, so intraday
  * re-merges (streaming micro-batches, reruns with changed data)
  * accumulate; skipped entirely when nothing new expired, which keeps an
  * idempotent rerun byte-identical — then the rewritten current
  * snapshot. Older closed partitions are never touched. Cost per merge:
  * O(current + batch) read, O(current + day-delta) write, independent of
  * accumulated history.
  *
  * Crash anywhere ⇒ rerun the same (batch, asOf) load: [[recover]]
  * clears incomplete stagings (proof of completeness is Spark's
  * `_SUCCESS` marker), an un-flipped orphan generation is unreferenced
  * and GC'd by the next publish, and the merge itself re-detects the
  * same changes (Scd2IncrementalSpec / Scd2CrashSpec).
  *
  * Contract: single writer per table, ENFORCED by epoch fencing
  * ([[Fencing]]): every load acquires a token at start and re-checks it
  * before each pointer flip, so a zombie writer superseded mid-merge
  * aborts loudly instead of clobbering the newer writer's commit
  * (FencingSpec). Full lost-update-free concurrency would additionally
  * need the store to check tokens on write (Delta's txn log, object-store
  * conditional PUTs) — same boundary as [[Tables.overwrite]].
  */
object Scd2History {

  private[io] val CurrentDirName = s"${Scd2.EndDate}=__HIVE_DEFAULT_PARTITION__"
  private def deltaDirName(asOf: LocalDate) = s"${Scd2.EndDate}=$asOf"

  /** Per-partition live-generation pointer file; [[Tables.read]] also
    * dispatches on the current partition's pointer to recognize the
    * layout.
    */
  private[io] val GenPtr = "_gen"
  private def genDirName(g: Int) = f"gen=$g%08d"
  private val GenDirRe = """^gen=(\d{8})$""".r
  private val StagingRe = """^\..+\.staging$""".r

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def listGens(fs: FileSystem, dir: Path): Seq[Int] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.flatMap(st => st.getPath.getName match {
      case GenDirRe(n) => Some(n.toInt)
      case _ => None
    })

  private def readGenPtr(fs: FileSystem, dir: Path): Option[Int] = {
    val f = new Path(dir, GenPtr)
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      try scala.util.Try(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toInt).toOption
      finally in.close()
    }
  }

  /** Atomic pointer flip — FileContext rename-with-OVERWRITE, the same
    * primitive [[Tables.overwriteKeeping]] flips `_current` with.
    */
  private def writeGenPtr(spark: SparkSession, dir: Path, gen: Int): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val tmp = new Path(dir, s".$GenPtr.tmp")
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(dir.toUri, conf)
    val out = fc.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE, org.apache.hadoop.fs.CreateFlag.OVERWRITE))
    try out.write(gen.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fc.rename(tmp, new Path(dir, GenPtr), org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Publish `rows` (full schema, `end_date` included as a data column)
    * as the new live generation of `partDir`: staged write, atomic rename
    * into a NEVER-pre-existing target, fencing check, pointer flip,
    * GC-with-grace.
    */
  private def publishGen(spark: SparkSession, path: String, partDir: String,
      rows: DataFrame, epoch: Long): Unit = {
    val fs = fsOf(spark, path)
    val root = new Path(path)
    val dir = new Path(root, partDir)
    val newGen = listGens(fs, dir).maxOption.getOrElse(0) + 1
    val staging = new Path(root, s".$partDir.${genDirName(newGen)}.staging")
    if (fs.exists(staging)) fs.delete(staging, true)
    rows.write.mode("overwrite").parquet(staging.toString)
    // The marker is load-bearing: recover() treats its absence as "partial
    // write, discard". A session configured to skip _SUCCESS must fail
    // HERE, before anything becomes visible.
    if (!fs.exists(new Path(staging, "_SUCCESS")))
      throw new java.io.IOException(
        s"Scd2History: $staging has no _SUCCESS marker after commit — " +
          "crash recovery requires mapreduce.fileoutputcommitter.marksuccessfuljobs=true")
    // Zombie-writer fence, twice: before the rename (absent a race this
    // leaves nothing behind but a staging for recover() to clear) and
    // again at the last instant before the flip makes anything visible —
    // the rename in between is additive, so aborting there is still safe.
    Fencing.check(fs, root, epoch)
    fs.mkdirs(dir)
    val target = new Path(dir, genDirName(newGen))
    if (fs.exists(target))
      throw new java.io.IOException(
        s"Scd2History: $target already exists — concurrent writer detected (single-writer contract)")
    if (!fs.rename(staging, target))
      throw new java.io.IOException(s"Scd2History: failed to publish $staging to $target")
    Fencing.check(fs, root, epoch)
    val prevLive = readGenPtr(fs, dir)
    writeGenPtr(spark, dir, newGen)
    // GC: keep the new live generation plus the immediately-previous live
    // one (grace for readers that resolved it before this flip).
    listGens(fs, dir)
      .filterNot(g => g == newGen || prevLive.contains(g))
      .foreach(g => fs.delete(new Path(dir, genDirName(g)), true))
  }

  /** Clear incomplete or orphaned staging directories (a crash anywhere
    * before the rename). Nothing is ever promoted from a staging — a
    * rerun of the same (batch, asOf) load regenerates the content — so
    * recovery can never publish half a write. Returns the cleared names.
    * Runs at the head of every merge; safe anytime under the
    * single-writer contract.
    */
  def recover(spark: SparkSession, path: String): Seq[String] = {
    val fs = fsOf(spark, path)
    val root = new Path(path)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq.flatMap { st =>
      st.getPath.getName match {
        case n @ StagingRe() =>
          fs.delete(st.getPath, true)
          Some(n)
        case _ => None
      }
    }
  }

  /** The live generation leaf directories: for each partition dir, the
    * one its `_gen` pointer names (a dir without a pointer is a crash
    * orphan mid-first-publish — invisible until its writer reruns).
    */
  private def liveLeaves(fs: FileSystem, root: Path,
      only: Option[String] = None): Seq[Path] = {
    if (!fs.exists(root)) return Seq.empty
    val partDirs = only match {
      case Some(name) => Seq(new Path(root, name)).filter(fs.exists)
      case None => fs.listStatus(root).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"${Scd2.EndDate}="))
        .map(_.getPath)
    }
    partDirs.flatMap(d => readGenPtr(fs, d).map(g => new Path(d, genDirName(g))))
  }

  private def readLeaves(spark: SparkSession, path: String,
      only: Option[String]): DataFrame = {
    val fs = fsOf(spark, path)
    val leaves = liveLeaves(fs, new Path(path), only).map(_.toString)
    val schema = Tables.readSchemaSidecar(spark, path).getOrElse(
      throw new IllegalStateException(s"Scd2History: no schema sidecar under $path"))
    if (leaves.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    // Schema-of-record read: pre-evolution generations null-fill newer
    // columns; column order is pinned by the sidecar everywhere.
    else spark.read.schema(schema).parquet(leaves: _*)
  }

  /** The full history: every partition's live generation. */
  def readAll(spark: SparkSession, path: String): DataFrame =
    readLeaves(spark, path, None)

  /** Live generation leaf directories, for external readers that build
    * their own scans (the path catalog): empty when `path` holds no
    * pointer-carrying partitions, i.e. is not (yet) this layout.
    */
  def liveLeafPaths(spark: SparkSession, path: String): Seq[String] =
    liveLeaves(fsOf(spark, path), new Path(path), None).map(_.toString)

  /** The current snapshot: lists and reads ONLY the current partition's
    * live generation — the closed history is not even listed, let alone
    * scanned (directory-name pruning at plan construction).
    */
  def readCurrent(spark: SparkSession, path: String): DataFrame =
    readLeaves(spark, path, Some(CurrentDirName))

  /** The rows expired on `asOf` — that day's live delta generation, an
    * empty frame if the day has none. Directory-pruned: only the one day
    * dir is listed. The day's NEW current versions are
    * `readCurrent(…).filter(effective_date = asOf)`; together these two
    * frames are the load's full change set (what downstream incremental
    * consumers — [[graft.pipeline.Gold.runIncremental]] — key off).
    */
  def readExpiredOn(spark: SparkSession, path: String, asOf: LocalDate): DataFrame =
    readDay(spark, path, asOf)

  /** The asOf day's live delta (empty frame if the day has none). */
  private def readDay(spark: SparkSession, path: String, asOf: LocalDate): DataFrame =
    readLeaves(spark, path, Some(deltaDirName(asOf)))

  /** First load: stamp the SCD2 triplet and publish everything as the
    * current partition's first generation.
    */
  def bootstrap(source: DataFrame, asOf: LocalDate, path: String): Unit = {
    val spark = source.sparkSession
    val stamped = Scd2.bootstrap(source, asOf)
    val epoch = Fencing.acquire(fsOf(spark, path), new Path(path))
    Tables.writeSchemaSidecar(spark, path, stamped.schema)
    publishGen(spark, path, CurrentDirName, stamped, epoch)
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
    * this layout eventually needs: each merge writes its delta through the
    * session's shuffle parallelism, so a closed partition's generation is
    * born as up-to-`shuffle.partitions` tiny shards. Compaction reads the
    * closed live rows in ONE job, hash-repartitioned BY end_date — every
    * day's rows colocate onto one task, so each day compacts to ONE file;
    * `parallelism` defaults to the closed-partition count (one task per
    * day — a years-deep history does not funnel through a single task; an
    * explicit value trades task count against file count) — stages the
    * per-day outputs, then publishes each day through the same
    * pointer-flip protocol as a merge: readers racing a compaction keep
    * their grace generation. The current partition and the DATA are
    * untouched (CompactionSpec); rerunning is idempotent.
    */
  def compactClosed(spark: SparkSession, path: String, parallelism: Int = 0): Unit = {
    val fs = fsOf(spark, path)
    val root = new Path(path)
    val days = listClosedPartitions(spark, path)
      .filter(d => readGenPtr(fs, new Path(root, d)).isDefined)
    if (days.isEmpty) return
    val epoch = Fencing.acquire(fs, root)
    val tasks = if (parallelism > 0) parallelism else days.size
    val closed = readAll(spark, path).filter(col(Scd2.EndDate).isNotNull)
      .repartition(tasks, col(Scd2.EndDate))
    // One distributed job into a staging root, then per-day atomic
    // publishes (rename + pointer flip) — a crash mid-loop leaves the
    // remaining days on their old live generation; rerun re-compacts.
    val staging = new Path(root, ".compact.staging")
    if (fs.exists(staging)) fs.delete(staging, true)
    // The partition column must not be dropped from the files: copy it so
    // the directory layout gets end_date=D while the data keeps end_date.
    closed.withColumn("__part_end_date", col(Scd2.EndDate))
      .write.mode("overwrite").partitionBy("__part_end_date").parquet(staging.toString)
    if (!fs.exists(new Path(staging, "_SUCCESS")))
      throw new java.io.IOException(s"Scd2History: $staging has no _SUCCESS marker after commit")
    days.foreach { day =>
      val srcDay = new Path(staging, day.replace(s"${Scd2.EndDate}=", "__part_end_date="))
      if (fs.exists(srcDay)) {
        val dir = new Path(root, day)
        val newGen = listGens(fs, dir).maxOption.getOrElse(0) + 1
        val target = new Path(dir, genDirName(newGen))
        if (!fs.rename(srcDay, target))
          throw new java.io.IOException(s"Scd2History: failed to publish compacted $srcDay to $target")
        Fencing.check(fs, root, epoch) // superseded mid-loop: stop before this day's flip
        val prevLive = readGenPtr(fs, dir)
        writeGenPtr(spark, dir, newGen)
        listGens(fs, dir)
          .filterNot(g => g == newGen || prevLive.contains(g))
          .foreach(g => fs.delete(new Path(dir, genDirName(g)), true))
      }
    }
    fs.delete(staging, true)
  }

  /** The closed (non-current) partition directory names under `path`. */
  def listClosedPartitions(spark: SparkSession, path: String): Seq[String] = {
    val fs = fsOf(spark, path)
    val root = new Path(path)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath.getName).filter(n =>
      n.startsWith(s"${Scd2.EndDate}=") && n != CurrentDirName)
  }

  /** Incremental merge: full [[Scd2.merge]] semantics against the current
    * partition only, published as at most two pointer-flipped generations
    * (day delta first, then current — see the object doc for the crash
    * analysis). A rerun whose delta adds nothing new skips the delta
    * publish entirely, keeping closed partitions byte-identical.
    */
  def merge(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      keys: Seq[String],
      compareCols: Seq[String],
      asOf: LocalDate): Unit =
    // Fencing token for this load — checked before every pointer flip, so
    // a zombie writer superseded mid-merge aborts instead of clobbering
    // (FencingSpec drives the interleaving through the seam below).
    mergeFenced(spark, path, batch, keys, compareCols, asOf,
      Fencing.acquire(fsOf(spark, path), new Path(path)))

  private[io] def mergeFenced(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      keys: Seq[String],
      compareCols: Seq[String],
      asOf: LocalDate,
      epoch: Long): Unit = {
    val fs = fsOf(spark, path)
    recover(spark, path)
    val (current, alignedBatch) = align(readCurrent(spark, path), batch)
    // Materialize BEFORE publishing: the generation writes must not
    // re-execute a plan whose input pointers are about to move. The merge
    // output is current-sized — the cheap thing to pin.
    val merged = Scd2.merge(current, alignedBatch, keys, compareCols, asOf)
      .pinned
    Tables.writeSchemaSidecar(spark, path, merged.schema) // schema-ahead is harmless; stale-behind is not
    publishDelta(spark, path, merged, asOf, epoch)
    publishGen(spark, path, CurrentDirName, merged.filter(col(Scd2.IsCurrent)), epoch)
    Fencing.gc(fs, new Path(path), epoch)
  }

  /** Day-delta accumulation: a second merge on the same asOf (streaming
    * micro-batches, intraday rerun with changed data) ADDS its expired
    * rows to the day's partition. `exceptAll` makes the idempotent-rerun
    * case (identical expired rows re-emitted) a publish-free no-op.
    */
  private def publishDelta(spark: SparkSession, path: String,
      merged: DataFrame, asOf: LocalDate, epoch: Long): Unit = {
    val cols = merged.columns.map(col).toIndexedSeq
    val expired = merged.filter(!col(Scd2.IsCurrent)).select(cols: _*)
    val existing = readDay(spark, path, asOf).select(cols: _*)
    if (!expired.exceptAll(existing).isEmpty) {
      val delta = expired.unionByName(existing).distinct().pinned
      publishGen(spark, path, deltaDirName(asOf), delta, epoch)
    }
  }

  // --------------------------------------------------------------------
  // Unified bucketed + incremental layout — the two 100 TB properties at
  // once. [[merge]] above writes only current + delta but full-outer-joins
  // a plain-parquet current (BOTH sides shuffle); the round-2 bucketed
  // variant ([[Tables.overwriteBucketed]] of the whole history) merges
  // exchange-free but rewrites everything. Here the CURRENT rows live in a
  // catalog table BUCKETED (and sorted) on the merge key while closed rows
  // keep the generation-pointer path layout above:
  //
  //   silver/doctors__history/            ← closed partitions + sidecar
  //     _scd2_schema.json
  //     end_date=2026-02-01/gen=00000001/ ← pointer-flipped generations
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
    *
    * `numBuckets` also CAPS the current-table write parallelism:
    * [[Tables.saveBucketed]] repartitions to one task per bucket (the
    * one-file-per-bucket contract that read-side sort elision depends
    * on), so a large history behind a small bucket count funnels its
    * rewrite through few tasks — size numBuckets to the WRITE cluster,
    * not just the read side (same guidance at [[mergeBucketed]]).
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
    * (the batch); writes: the day's delta generation (pointer flip) + the
    * current table (staged catalog swap). Crash anywhere ⇒ rerun the same
    * (batch, asOf) load — [[Tables.recoverStaged]] + [[recover]] close the
    * swap windows and the merge itself is idempotent (an already-applied
    * batch detects no changes, and the delta `exceptAll` absorbs
    * re-emitted expired rows without re-publishing).
    *
    * `numBuckets` caps the current-table rewrite's write parallelism
    * (one task per bucket — see [[bootstrapBucketed]]): size it to the
    * write cluster; every daily merge pays that rewrite.
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
    // The path side is fenced like [[merge]]; the catalog-table swap is
    // only as protected as the metastore's rename atomicity — a zombie is
    // still stopped before the DELTA publish, bounding the damage to the
    // recoverable staged-table state.
    val epoch = Fencing.acquire(fsOf(spark, path), new Path(path))
    Tables.recoverStaged(spark, table)
    recover(spark, path)
    val (current, alignedBatch) = align(readCurrentBucketed(spark, table), batch)
    // Materialized BEFORE any mutation: the delta publish and the staged
    // current-table write must not re-execute a plan whose inputs are
    // being swapped underneath it.
    val merged = Scd2.merge(current, alignedBatch, keys, compareCols, asOf)
      .pinned
    Tables.writeSchemaSidecar(spark, path, merged.schema)
    publishDelta(spark, path, merged, asOf, epoch)
    Tables.overwriteBucketed(
      merged.filter(col(Scd2.IsCurrent)).drop(Scd2.EndDate, Scd2.IsCurrent),
      table, keys, numBuckets)
    Fencing.gc(fsOf(spark, path), new Path(path), epoch)
  }
}
