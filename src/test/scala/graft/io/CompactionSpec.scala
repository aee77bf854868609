package graft.io

import java.nio.file.{Files, Path => JPath, Paths}
import java.time.LocalDate
import scala.jdk.CollectionConverters._
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scd2History.compactClosed: collapses each closed partition's per-merge
  * write shards into one file without changing a row, leaving the current
  * partition alone.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  /** Data files of the LIVE generation of a partition dir (resolve the
    * `_gen` pointer, list that generation).
    */
  private def liveFiles(dir: JPath): Seq[JPath] =
    if (!Files.exists(dir) || !Files.exists(dir.resolve("_gen"))) Seq.empty
    else {
      val gen = Files.readString(dir.resolve("_gen")).trim.toInt
      val genDir = dir.resolve(f"gen=$gen%08d")
      if (!Files.exists(genDir)) Seq.empty
      else Files.list(genDir).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    }

  test("closed partitions compact to one file each; rows identical; current untouched") {
    val path = Files.createTempDirectory("graft_compact").toString
    val keys = Seq("id")
    val compare = Seq("v")
    // AQE would coalesce these tiny test deltas to one task (hiding the
    // multi-shard shape a real merge produces); pin it off so each merge
    // writes its delta through the full shuffle width, as at scale
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      // 3 merges, each expiring some keys -> 2 closed partitions, each
      // written through multiple shuffle tasks (multi-file)
      Scd2History.bootstrap(
        (1L to 200L).map(i => (i, "a")).toDF("id", "v"), LocalDate.parse("2026-01-01"), path)
      Scd2History.merge(spark, path,
        (1L to 200L).map(i => (i, if (i % 2 == 0) "b" else "a")).toDF("id", "v"),
        keys, compare, LocalDate.parse("2026-02-01"))
      Scd2History.merge(spark, path,
        (1L to 200L).map(i => (i, if (i % 3 == 0) "c" else if (i % 2 == 0) "b" else "a")).toDF("id", "v"),
        keys, compare, LocalDate.parse("2026-03-01"))
    } finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")

    def canon() = Scd2History.readAll(spark, path)
      .select(col("id"), col("v"), col("effective_date").cast("string"),
        col("end_date").cast("string"), col("is_current"))
      .collect().map(_.mkString("|")).sorted.toSeq
    val before = canon()
    val closedDirs = Seq("end_date=2026-02-01", "end_date=2026-03-01")
      .map(d => Paths.get(path, d))
    closedDirs.foreach(d => assert(liveFiles(d).size > 1,
      s"$d expected multi-file pre-compaction (got ${liveFiles(d).size})"))
    val currentFiles = liveFiles(Paths.get(path, "end_date=__HIVE_DEFAULT_PARTITION__"))
      .map(f => f.getFileName.toString -> Files.getLastModifiedTime(f)).toMap

    // Default parallelism = closed-partition count: the write stage must
    // run one task PER closed partition (2 here), not funnel the whole
    // history through a single task.
    val taskCounts = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        taskCounts.add(sc.stageInfo.numTasks)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Scd2History.compactClosed(spark, path)
      Thread.sleep(500) // listener bus is async; let it drain
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(taskCounts.asScala.map(_.toInt).exists(_ == closedDirs.size),
      s"expected a ${closedDirs.size}-task compaction stage, saw stages of ${taskCounts.asScala.mkString(",")} tasks")

    closedDirs.foreach(d => assert(liveFiles(d).size == 1,
      s"$d expected exactly one file post-compaction"))
    assert(canon() == before, "compaction must not change a row")
    val currentAfter = liveFiles(Paths.get(path, "end_date=__HIVE_DEFAULT_PARTITION__"))
      .map(f => f.getFileName.toString -> Files.getLastModifiedTime(f)).toMap
    assert(currentAfter == currentFiles, "current partition untouched")

    // idempotent rerun
    Scd2History.compactClosed(spark, path)
    assert(canon() == before)
    closedDirs.foreach(d => assert(liveFiles(d).size == 1))
  }
}
