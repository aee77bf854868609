package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class VitalEvent(vital_id: String, patient_id: String, hr: Int, ts: Timestamp)
case class AdmissionEvent(admission_id: String, patient_id: String, adm_ts: Timestamp, reason: String)

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("interval join matches readings inside the horizon, drops the rest") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vitals = MemoryStream[VitalEvent]
    val adms = MemoryStream[AdmissionEvent]
    val joined = StreamJoin.vitalsWithAdmission(
      vitals.toDF(), adms.toDF(), lateness = "10 minutes", horizon = "2 hours")
    val q = joined.writeStream.format("memory").queryName("sj").outputMode("append").start()
    try {
      adms.addData(
        AdmissionEvent("a1", "p1", t("2026-01-01 08:00:00"), "Chest Pain"),
        AdmissionEvent("a2", "p2", t("2026-01-01 09:00:00"), "Fracture"))
      vitals.addData(
        VitalEvent("v1", "p1", 80, t("2026-01-01 08:30:00")),  // inside a1's horizon
        VitalEvent("v2", "p1", 85, t("2026-01-01 11:00:00")),  // past a1 + 2h → no match
        VitalEvent("v3", "p2", 70, t("2026-01-01 09:10:00")),  // inside a2's horizon
        VitalEvent("v4", "p3", 60, t("2026-01-01 09:00:00")))  // no admission → no match
      q.processAllAvailable()
      // advance both watermarks so all joinable state resolves
      adms.addData(AdmissionEvent("a9", "p9", t("2026-01-01 23:00:00"), "x"))
      vitals.addData(VitalEvent("v9", "p9", 1, t("2026-01-01 23:30:00")))
      q.processAllAvailable()
      val rows = spark.table("sj")
        .select("vital_id", "admission_id").as[(String, String)].collect().toSet
      assert(rows.contains(("v1", "a1")) && rows.contains(("v3", "a2")))
      assert(rows.contains(("v9", "a9")))
      assert(!rows.exists(_._1 == "v2") && !rows.exists(_._1 == "v4"))
    } finally q.stop()
  }
}
