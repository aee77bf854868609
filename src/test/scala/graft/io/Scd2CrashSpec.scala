package graft.io

import java.nio.file.{Files, Paths}
import java.time.LocalDate
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The review-driven hardening of the incremental sink's publish path:
  * same-asOf merges ACCUMULATE the day's delta (streaming micro-batch /
  * intraday-rerun cadence), and the staged partition swaps recover from a
  * crash in their delete-rename window.
  */
class Scd2CrashSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("id")
  private val compare = Seq("v")
  private val d1 = LocalDate.parse("2026-01-01")
  private val d2 = LocalDate.parse("2026-02-01")

  private def currentOf(path: String) =
    Scd2History.readCurrent(spark, path)
      .select("id", "v").as[(Long, String)].collect().toMap

  test("two different merges on the same asOf accumulate the day's expired delta") {
    val path = Files.createTempDirectory("graft_sameday").toString
    Scd2History.bootstrap(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), d1, path)
    // micro-batch 1 of day d2 changes key 1; micro-batch 2 changes key 2
    Scd2History.merge(spark, path, Seq((1L, "a2"), (2L, "b")).toDF("id", "v"), keys, compare, d2)
    Scd2History.merge(spark, path, Seq((1L, "a2"), (2L, "b2")).toDF("id", "v"), keys, compare, d2)

    val expired = Scd2History.readAll(spark, path).filter(!col("is_current"))
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(expired == Set((1L, "a"), (2L, "b")),
      "batch 1's expired row must survive batch 2's same-day publish")
    assert(currentOf(path) == Map(1L -> "a2", 2L -> "b2"))
  }

  test("a reader that planned before a merge completes on its pre-merge snapshot") {
    val path = Files.createTempDirectory("graft_readerrace").toString
    Scd2History.bootstrap(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), d1, path)
    Scd2History.merge(spark, path, Seq((1L, "a2"), (2L, "b")).toDF("id", "v"), keys, compare, d2)

    // the racing reader: resolves the live generations NOW (plan + file
    // listing), executes only after the writer publishes again
    val preCurrent = Scd2History.readCurrent(spark, path)
    val preAll = Scd2History.readAll(spark, path)
    preCurrent.queryExecution.executedPlan // force planning/listing
    preAll.queryExecution.executedPlan

    // the writer merges (publishes a new current generation and GCs —
    // keeping the one the reader resolved as its grace copy)
    Scd2History.merge(spark, path, Seq((1L, "a3"), (2L, "b")).toDF("id", "v"), keys, compare, d2)

    // the pre-planned reader COMPLETES, on the snapshot it resolved: no
    // missing partition, no FileNotFound, pre-merge values
    assert(preCurrent.select("id", "v").as[(Long, String)].collect().toMap
      == Map(1L -> "a2", 2L -> "b"))
    assert(preAll.count() == 3) // 2 current + 1 expired, as of plan time
    // a FRESH reader sees the post-merge state
    assert(currentOf(path) == Map(1L -> "a3", 2L -> "b"))
  }

  test("recover clears incomplete stagings; an unflipped orphan generation stays invisible and is GC'd") {
    val path = Files.createTempDirectory("graft_stalestaging").toString
    Scd2History.bootstrap(Seq((1L, "a")).toDF("id", "v"), d1, path)
    Scd2History.merge(spark, path, Seq((1L, "a2")).toDF("id", "v"), keys, compare, d2)
    // a crashed writer left a partial staging (no _SUCCESS): cleared, never
    // promoted — a rerun of the load regenerates the content instead
    val stale = Paths.get(path).resolve(".end_date=2026-02-01.gen=00000002.staging")
    Files.createDirectories(stale)
    Files.writeString(stale.resolve("part-stale.parquet"), "junk")
    assert(Scd2History.recover(spark, path) == Seq(stale.getFileName.toString))
    assert(!Files.exists(stale), "incomplete staging cleared")
    assert(Scd2History.recover(spark, path).isEmpty, "recovery is idempotent")
    // the real partition is untouched
    assert(Scd2History.readAll(spark, path).filter(!col("is_current")).count() == 1)

    // a crash AFTER the rename but BEFORE the pointer flip: the orphan
    // generation is unreferenced — readers never see it...
    val dayDir = Paths.get(path).resolve("end_date=2026-02-01")
    val orphan = dayDir.resolve("gen=00000099")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("part-orphan.parquet"), "junk")
    assert(Scd2History.readAll(spark, path).filter(!col("is_current")).count() == 1,
      "unflipped generation is invisible to readers")
    // ...and the next publish of that partition GCs it
    Scd2History.merge(spark, path, Seq((1L, "a3")).toDF("id", "v"), keys, compare, d2)
    assert(!Files.exists(orphan), "orphan generation GC'd by the next publish")
  }

  test("crash between delta and current swap: rerunning the same load converges") {
    val path = Files.createTempDirectory("graft_midcrash").toString
    Scd2History.bootstrap(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), d1, path)
    val batch = Seq((1L, "a2"), (2L, "b")).toDF("id", "v")
    Scd2History.merge(spark, path, batch, keys, compare, d2)
    // crash replay: delta published, current partition still OLD (restore
    // the pre-merge current from a fresh bootstrap of the same batch1)
    val root = Paths.get(path)
    val cur = root.resolve("end_date=__HIVE_DEFAULT_PARTITION__")
    def deleteRec(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) Files.list(p).forEach(deleteRec(_))
      Files.delete(p)
    }
    deleteRec(cur)
    val tmp = Files.createTempDirectory("graft_midcrash_boot").toString
    Scd2History.bootstrap(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), d1, tmp)
    Files.move(Paths.get(tmp).resolve("end_date=__HIVE_DEFAULT_PARTITION__"), cur)

    // the documented recovery: rerun the same (batch, asOf) load
    Scd2History.merge(spark, path, batch, keys, compare, d2)
    assert(currentOf(path) == Map(1L -> "a2", 2L -> "b"))
    val expired = Scd2History.readAll(spark, path).filter(!col("is_current"))
      .select("id", "v").as[(Long, String)].collect().toSeq
    assert(expired == Seq((1L, "a")), "delta deduped, not duplicated, across the rerun")
  }
}
