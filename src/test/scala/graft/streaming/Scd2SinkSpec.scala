package graft.streaming

import java.nio.file.Files
import java.time.LocalDate
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class DocUpdate(doctor_id: String, speciality: String, years: Int)
case class DocUpdateSeq(doctor_id: String, speciality: String, years: Int, seq: Long)

class Scd2SinkSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batches merge into SCD2 history: change expires + reinserts") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[DocUpdate]
    val dir = Files.createTempDirectory("graft_scd2sink").toString
    val path = s"$dir/doctors"
    val q = Scd2Sink.start(
      input.toDF(), path, s"$dir/_ckpt",
      keys = Seq("doctor_id"), compareCols = Seq("speciality", "years"),
      orderCols = Seq("years"),
      asOfForBatch = id => LocalDate.parse("2026-01-01").plusMonths(id))
    try {
      input.addData(DocUpdate("d1", "Oncology", 10), DocUpdate("d2", "Cardiology", 5))
      q.processAllAvailable()
      val s1 = graft.io.Tables.read(spark, path)
      assert(s1.count() == 2 && s1.filter(col("is_current")).count() == 2)

      // batch 2: d1 changes, d3 appears, d2 silent
      input.addData(DocUpdate("d1", "Oncology", 11), DocUpdate("d3", "Neurology", 2))
      q.processAllAvailable()
      val s2 = graft.io.Tables.read(spark, path)
      assert(s2.count() == 4)
      val cur = s2.filter(col("is_current"))
        .select("doctor_id", "years").as[(String, Int)].collect().toMap
      assert(cur == Map("d1" -> 11, "d2" -> 5, "d3" -> 2))
      val expired = s2.filter(!col("is_current"))
        .select(col("doctor_id"), col("end_date").cast("string"))
        .as[(String, String)].collect().toSeq
      assert(expired == Seq(("d1", "2026-02-01")))
    } finally q.stop()
  }

  test("two versions of one key in a single micro-batch: latest wins, history stays key-unique") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[DocUpdateSeq]
    val dir = Files.createTempDirectory("graft_scd2sink_multi").toString
    val path = s"$dir/doctors"
    val q = Scd2Sink.start(
      input.toDF(), path, s"$dir/_ckpt",
      keys = Seq("doctor_id"), compareCols = Seq("speciality", "years"),
      orderCols = Seq("seq"),
      asOfForBatch = id => LocalDate.parse("2026-01-01").plusMonths(id))
    try {
      // backlog batch: d1 arrives twice with different payloads — seq order,
      // not arrival order, must pick the survivor
      input.addData(
        DocUpdateSeq("d1", "Oncology", 12, seq = 2L),
        DocUpdateSeq("d1", "Oncology", 10, seq = 1L),
        DocUpdateSeq("d2", "Cardiology", 5, seq = 1L))
      q.processAllAvailable()
      val s1 = graft.io.Tables.read(spark, path)
      assert(s1.count() == 2, "one row per key, not one per version")
      val cur1 = s1.filter(col("is_current"))
        .select("doctor_id", "years").as[(String, Int)].collect().toMap
      assert(cur1 == Map("d1" -> 12, "d2" -> 5))

      // second backlog batch: d1 again duplicated; history must expire the
      // old d1 exactly once and stay key-unique among current rows
      input.addData(
        DocUpdateSeq("d1", "Oncology", 14, seq = 4L),
        DocUpdateSeq("d1", "Oncology", 13, seq = 3L))
      q.processAllAvailable()
      val s2 = graft.io.Tables.read(spark, path)
      val cur2 = s2.filter(col("is_current"))
        .select("doctor_id", "years").as[(String, Int)].collect().toMap
      assert(cur2 == Map("d1" -> 14, "d2" -> 5))
      assert(s2.filter(col("is_current")).groupBy("doctor_id").count()
        .filter(col("count") > 1).count() == 0, "current rows key-unique")
      assert(s2.filter(!col("is_current")).count() == 1, "exactly one expired d1 row")
    } finally q.stop()
  }
}
