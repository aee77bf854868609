package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.{SparkSession, SQLContext}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamSemDedup

/** The composed crash drill the per-component specs don't run: the SAME
  * sf1-rate sustained load as [[StreamSustained]] (identical closed-form
  * plant rules and invariants — [[SustainedLoad]]), with every documented
  * crash window injected MID-RUN while the stream keeps ingesting:
  *
  *   1. **Compaction crash AFTER publish, before source-dir deletes**
  *      (batch 4): the folded batch dirs are restored after
  *      compactHistory returns — byte-identical to a process kill in
  *      that window. The history then carries duplicate rows for four
  *      live batches; the claim under test is that duplicates inflate
  *      only `n_dups` (dup_of is a min; the next compaction's
  *      dropDuplicates self-heals) — audited as zero mislabels and a
  *      duplicate-free final history.
  *   2. **Engine crash-replay of a committed batch** (batch 6): the
  *      query is STOPPED, the batch's checkpoint commit entry deleted
  *      (the sink-wrote-commit-lost window, StreamReplaySpec's
  *      `uncommit`), and the stream restarted from the checkpoint —
  *      Structured Streaming itself replays the batch through the real
  *      recovery path. Claim: the batch_id overwrite layout + the
  *      `batch_id < current` history fence make the replay idempotent
  *      under load (row counts and labels identical to a single run).
  *   3. **Compaction crash BETWEEN park and publish** (batch 9): the
  *      min batch dir is renamed to its `.compact.parked.` name and the
  *      compaction abandoned (the window inside AtomicPublish.replace;
  *      same simulation as StreamSemDedupSpec's recovery test). Four
  *      batches then stream against a history whose oldest dir is
  *      invisible — a documented transient-miss window, never a
  *      mislabel — until the batch-14 compaction's recovery preamble
  *      restores it and folds everything.
  *
  * The final audit is [[SustainedLoad.audit]] — the EXACT invariant set
  * of the no-crash run (zero content mislabels, zero base-doc drops,
  * recall floors, history == kept with no duplicate ids, bounded dirs,
  * flat wall). If the three windows compose into any visible loss, the
  * audit fails and so does the exit code.
  *
  *   StreamCrashReplay [rowsPerBatch] [batches]   # default 20000 20
  */
object StreamCrashReplay {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val batches = if (args.length > 1) args(1).toInt else 20
    require(n > 0 && n < SustainedLoad.Stride,
      s"rowsPerBatch=$n out of range: id stride is ${SustainedLoad.Stride}")
    // The injection schedule (publish-crash at 4, replay at 6, park-crash
    // at 9, recovery at 14) is closed-form for >= 15 batches, same as
    // StreamSustained's compaction points.
    require(batches >= 15, s"batches=$batches < 15: the injection schedule " +
      "is closed-form for >= 15 batches")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val out = java.nio.file.Files.createTempDirectory("crash_out").toString
    val hist = java.nio.file.Files.createTempDirectory("crash_hist").toString
    val ckpt = java.nio.file.Files.createTempDirectory("crash_ck").toString
    val snap = java.nio.file.Files.createTempDirectory("crash_snap").toString

    val cells = SustainedLoad.trainCells(spark, n)

    implicit val ctx: SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Double])]
    def start() = StreamSemDedup.writer(in.toDF().toDF("vec_id", "vec"),
        cells, hist, out, tau = SustainedLoad.Tau)
      .option("checkpointLocation", ckpt).outputMode("update").start()
    var q = start()

    val fs = new Path(hist).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val conf = spark.sparkContext.hadoopConfiguration
    def histDir(b: Long) = new Path(hist, s"batch_id=$b")

    /** StreamReplaySpec's crash window: the batch's sink writes landed,
      * its checkpoint commit did not.
      */
    def uncommit(batchId: Long): Unit = {
      val f = Paths.get(s"$ckpt/commits/$batchId")
      require(Files.exists(f), s"expected commit log entry $f")
      Files.delete(f)
      Files.deleteIfExists(Paths.get(s"$ckpt/commits/.$batchId.crc"))
    }

    val secs = new scala.collection.mutable.ArrayBuffer[Double]
    var folded = 0
    try {
      for (b <- 0 until batches) {
        in.addData((0 until n).map(i =>
          (SustainedLoad.id(b, i), SustainedLoad.vec(n)(b, i))))
        val t0 = System.nanoTime()
        q.processAllAvailable()
        val s = (System.nanoTime() - t0) / 1e9
        secs += s
        println(f"batch $b%2d: $s%7.2f s  (${n / s}%,.0f rows/s)")

        if (b == 4) {
          // Injection 1: publish landed, source-dir deletes lost. Folded
          // dirs are snapshotted before the real compaction and restored
          // after it — the on-disk state a kill in that window leaves.
          val srcs = (1L to 3L).map(histDir).filter(fs.exists)
          srcs.foreach(p => FileUtil.copy(fs, p, fs,
            new Path(snap, p.getName), false, conf))
          val nf = StreamSemDedup.compactHistory(spark, hist, b - 1L)
          srcs.foreach(p => FileUtil.copy(fs, new Path(snap, p.getName),
            fs, p, false, conf))
          folded += nf
          println(s"  compaction at batch $b folded $nf dirs; " +
            s"CRASH INJECTED: ${srcs.size} folded dirs restored (deletes lost)")
        }
        if (b == 6) {
          // Injection 2: kill after the sink wrote batch 6, before its
          // commit — restart replays it through the engine.
          q.stop()
          uncommit(6L)
          val t1 = System.nanoTime()
          q = start()
          q.processAllAvailable()
          println(f"  CRASH INJECTED at batch 6: uncommit + restart, " +
            f"replay took ${(System.nanoTime() - t1) / 1e9}%.2f s")
          require(Files.exists(Paths.get(s"$ckpt/commits/6")),
            "replayed batch 6 must re-commit")
        }
        if (b == 9) {
          // Injection 3: compaction killed between park and publish —
          // the min dir sits parked (invisible to every reader) until
          // the next compaction's recovery preamble restores it.
          // (Same simulation as StreamSemDedupSpec's recovery test.)
          val minDir = fs.listStatus(new Path(hist)).map(_.getPath)
            .filter(_.getName.startsWith("batch_id="))
            .minBy(_.getName.stripPrefix("batch_id=").toLong)
          fs.rename(minDir, new Path(hist, s".compact.parked.${minDir.getName}"))
          println(s"  CRASH INJECTED at batch $b: ${minDir.getName} parked, " +
            "compaction abandoned")
        }
        if (b == 14) {
          // Real compaction: recovery preamble restores the parked dir,
          // then everything <= 13 folds (with the dedup self-heal).
          val nf = StreamSemDedup.compactHistory(spark, hist, b - 1L)
          println(s"  compaction at batch $b folded $nf dirs (recovery)")
          folded += nf
        }
      }
    } finally q.stop()

    // Expected folds: 3 at batch 4 (dirs 0-3), 0 at 9 (crashed), 13 at
    // 14 (recovered dir 0 + restored dups 1-3 + unfolded 4-13).
    val failures = SustainedLoad.audit(spark, out, hist, n, batches,
      folded, foldedMin = 16, dirsMax = 8, secs = secs.toSeq)
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
