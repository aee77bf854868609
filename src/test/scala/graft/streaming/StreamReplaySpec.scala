package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import java.time.LocalDate
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Crash-replay exactly-once: kill a query after its sink wrote but BEFORE
  * the checkpoint commit recorded the batch (the dangerous window —
  * simulated by deleting the last entry of the commit log), restart from
  * the checkpoint, and assert the replayed batch changed nothing:
  *  - Scd2Sink: no duplicate SCD2 versions, history bit-stable;
  *  - HrAlerts → BatchIdSink: no duplicate alerts.
  * This documents the idempotence contract both foreachBatch sinks rely
  * on: stable batchId + idempotent per-batch write.
  */
class StreamReplaySpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  /** Remove the commit-log entry of `batchId`, making the engine believe
    * the batch never finished — it replays on restart.
    */
  private def uncommit(ckpt: String, batchId: Long): Unit = {
    val f = Paths.get(s"$ckpt/commits/$batchId")
    assert(Files.exists(f), s"expected commit log entry $f")
    Files.delete(f)
    // the local ChecksumFileSystem keeps a .crc sidecar; a stale one blocks
    // the replayed batch from re-committing
    Files.deleteIfExists(Paths.get(s"$ckpt/commits/.$batchId.crc"))
  }

  test("Scd2Sink: replayed micro-batch re-merges idempotently — no duplicate versions") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[DocUpdate]
    val dir = Files.createTempDirectory("graft_replay_scd2").toString
    val path = s"$dir/doctors"
    val ckpt = s"$dir/_ckpt"
    def start() = Scd2Sink.start(
      input.toDF(), path, ckpt,
      keys = Seq("doctor_id"), compareCols = Seq("speciality", "years"),
      orderCols = Seq("years"),
      asOfForBatch = id => LocalDate.parse("2026-01-01").plusMonths(id))

    val q1 = start()
    input.addData(DocUpdate("d1", "Oncology", 10), DocUpdate("d2", "Cardiology", 5))
    q1.processAllAvailable()
    input.addData(DocUpdate("d1", "Oncology", 11), DocUpdate("d3", "Neurology", 2))
    q1.processAllAvailable()
    q1.stop()

    def snapshot() = graft.io.Tables.read(spark, path)
      .select(col("doctor_id"), col("years"), col("effective_date").cast("string"),
        col("end_date").cast("string"), col("is_current"))
      .collect().map(_.mkString("|")).sorted.toSeq
    val before = snapshot()
    assert(before.size == 4)

    // crash window: batch 1's sink write landed, its commit didn't
    uncommit(ckpt, 1)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    assert(snapshot() == before, "replay must not duplicate versions or re-expire rows")
    val cur = graft.io.Tables.read(spark, path).filter(col("is_current"))
    assert(cur.groupBy("doctor_id").count().filter(col("count") > 1).count() == 0)
  }

  test("HrAlerts through BatchIdSink: replayed batch overwrites its own output — no duplicate alerts") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[VitalReading]
    val dir = Files.createTempDirectory("graft_replay_hr").toString
    val out = s"$dir/alerts"
    val ckpt = s"$dir/_ckpt"
    def start() = BatchIdSink.writer(
      HrAlerts.alerts(input.toDS(), threshold = 120, streakLen = 3), out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()

    val q1 = start()
    input.addData(
      VitalReading("p1", 130, t("2026-01-01 08:00:00")),
      VitalReading("p1", 131, t("2026-01-01 08:02:00")),
      VitalReading("p1", 140, t("2026-01-01 08:04:00")))
    q1.processAllAvailable()
    input.addData(
      VitalReading("p2", 130, t("2026-01-01 08:00:00")),
      VitalReading("p2", 131, t("2026-01-01 08:02:00")),
      VitalReading("p2", 140, t("2026-01-01 08:04:00")))
    q1.processAllAvailable()
    q1.stop()

    val alerts = BatchIdSink.readAll(spark, out)
      .select("patient_id", "streak").as[(String, Int)].collect().toSeq.sorted
    assert(alerts.contains(("p1", 3)) && alerts.contains(("p2", 3)))
    assert(alerts.distinct == alerts, "no duplicates before the crash")

    val lastCommit = Files.list(Paths.get(s"$ckpt/commits")).iterator()
    val maxId = scala.jdk.CollectionConverters.IteratorHasAsScala(lastCommit).asScala
      .map(_.getFileName.toString).filter(_.forall(_.isDigit)).map(_.toLong).max
    uncommit(ckpt, maxId)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val after = BatchIdSink.readAll(spark, out)
      .select("patient_id", "streak").as[(String, Int)].collect().toSeq.sorted
    assert(after == alerts, "replay duplicated or dropped alerts")
  }
}
