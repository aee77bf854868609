package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class RawVital(vital_id: String, patient_id: String, temperature: String,
    heart_rate: String, ts: String)

class VitalsStreamSpec extends SparkSpec {
  import spark.implicits._

  private def mkStream() = {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    MemoryStream[RawVital]
  }

  test("stateless clean+anomaly stream flags fever/tachycardia, drops tokens") {
    val input = mkStream()
    val q = VitalsStream.anomalies(VitalsStream.clean(input.toDF()))
      .writeStream.format("memory").queryName("anomalies_out")
      .outputMode("append").start()
    try {
      input.addData(
        RawVital("v1", "p1", "104.5", "80", "2025-01-01T10:00:00"),  // fever
        RawVital("v2", "p1", "98.6", "130", "2025-01-01T10:01:00"),  // tachycardia
        RawVital("v3", "p2", "TEMP_ERR", "90", "2025-01-01T10:02:00"), // clean, no anomaly
        RawVital("v4", "p2", "105.0", "125", "2025-01-01T10:03:00")) // both
      q.processAllAvailable()
      val out = spark.table("anomalies_out")
        .select("vital_id", "anomaly").as[(String, String)].collect().toMap
      assert(out == Map("v1" -> "fever", "v2" -> "tachycardia", "v4" -> "fever+tachycardia"))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark removes re-delivered vital_ids") {
    val input = mkStream()
    val q = VitalsStream.dedupWithinWatermark(VitalsStream.clean(input.toDF()), "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        RawVital("v1", "p1", "98.6", "80", "2025-01-01T10:00:00"),
        RawVital("v1", "p1", "98.6", "80", "2025-01-01T10:00:00"), // exact dup in-batch
        RawVital("v2", "p1", "99.1", "82", "2025-01-01T10:05:00"))
      q.processAllAvailable()
      input.addData(
        RawVital("v1", "p1", "98.6", "80", "2025-01-01T10:01:00")) // re-delivery, inside watermark
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("vital_id").as[String].collect().toSeq
      assert(ids.sorted == Seq("v1", "v2"))
    } finally q.stop()
  }

  test("session windows split on the gap and emit after the watermark") {
    val input = mkStream()
    val q = VitalsStream.sessionVitals(
      VitalsStream.dedupWithinWatermark(VitalsStream.clean(input.toDF()), "10 minutes"),
      gap = "15 minutes")
      .writeStream.format("memory").queryName("session_out")
      .outputMode("append").start()
    try {
      input.addData(
        RawVital("v1", "p1", "98.6", "80", "2025-01-01T10:00:00"),
        RawVital("v2", "p1", "98.7", "90", "2025-01-01T10:10:00"),  // same session (10 min gap)
        RawVital("v3", "p1", "98.8", "100", "2025-01-01T11:00:00")) // new session (50 min gap)
      q.processAllAvailable()
      input.addData(RawVital("v9", "p2", "98.0", "70", "2025-01-01T13:00:00")) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("session_out")
        .select(col("patient_id"), col("session_start").cast("string"),
          col("n_readings"), col("avg_hr"))
        .as[(String, String, Long, Double)].collect().toSet
      assert(rows == Set(
        ("p1", "2025-01-01 10:00:00", 2L, 85.0),
        ("p1", "2025-01-01 11:00:00", 1L, 100.0)))
    } finally q.stop()
  }

  test("windowed aggregate emits closed windows once the watermark passes") {
    val input = mkStream()
    val q = VitalsStream.pipeline(input.toDF(), lateness = "10 minutes", windowLen = "1 hour")
      .writeStream.format("memory").queryName("window_out")
      .outputMode("append").start()
    try {
      input.addData(
        RawVital("v1", "p1", "98.6", "80", "2025-01-01T10:05:00"),
        RawVital("v2", "p1", "99.5", "100", "2025-01-01T10:45:00"),
        RawVital("v3", "p2", "101.0", "90", "2025-01-01T10:30:00"))
      q.processAllAvailable()
      // nothing emitted yet: window [10:00,11:00) still open
      assert(spark.table("window_out").count() == 0)
      // advance event time past 11:00 + 10 min lateness → closes the window
      input.addData(RawVital("v9", "p1", "98.0", "70", "2025-01-01T12:00:00"))
      q.processAllAvailable()
      val rows = spark.table("window_out")
        .select(col("patient_id"), col("window_start").cast("string"),
          col("n_readings"), col("avg_hr"), col("max_temp"))
        .as[(String, String, Long, Double, Double)].collect().toSet
      assert(rows == Set(
        ("p1", "2025-01-01 10:00:00", 2L, 90.0, 99.5),
        ("p2", "2025-01-01 10:00:00", 1L, 90.0, 101.0)))
    } finally q.stop()
  }
}
