package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class HrAlertsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("alert fires once per streak of 3 consecutive high readings, resets on normal") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[VitalReading]
    val q = HrAlerts.alerts(in.toDS(), threshold = 120, streakLen = 3)
      .writeStream.format("memory").queryName("hr_alerts").outputMode("append").start()
    try {
      in.addData(
        // p1: 3 high in a row (out of order within the batch) → one alert
        VitalReading("p1", 130, t("2026-01-01 08:02:00")),
        VitalReading("p1", 125, t("2026-01-01 08:00:00")),
        VitalReading("p1", 140, t("2026-01-01 08:04:00")),
        // p2: high, normal, high, high → no alert yet (reset in the middle)
        VitalReading("p2", 130, t("2026-01-01 08:00:00")),
        VitalReading("p2", 90, t("2026-01-01 08:02:00")),
        VitalReading("p2", 131, t("2026-01-01 08:04:00")),
        VitalReading("p2", 132, t("2026-01-01 08:06:00")))
      q.processAllAvailable()
      val a1 = spark.table("hr_alerts").as[HrAlert].collect()
      assert(a1.toSeq.map(a => (a.patient_id, a.streak)) == Seq(("p1", 3)))
      assert(a1.head.first_ts == t("2026-01-01 08:00:00") && a1.head.last_ts == t("2026-01-01 08:04:00"))

      // p1 keeps running high: streak continues but no second alert (4th high);
      // p2 completes its streak across micro-batches (state carried over)
      in.addData(
        VitalReading("p1", 135, t("2026-01-01 08:06:00")),
        VitalReading("p2", 133, t("2026-01-01 08:08:00")))
      q.processAllAvailable()
      val a2 = spark.table("hr_alerts").as[HrAlert].collect()
      assert(a2.count(_.patient_id == "p1") == 1, "long run fires once")
      val p2 = a2.filter(_.patient_id == "p2")
      assert(p2.map(a => (a.streak, a.first_ts)).toSeq ==
        Seq((3, t("2026-01-01 08:04:00"))), "cross-batch streak completes")
    } finally q.stop()
  }
}
