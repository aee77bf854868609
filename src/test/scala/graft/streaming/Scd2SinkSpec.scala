package graft.streaming

import java.nio.file.Files
import java.time.LocalDate
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class DocUpdate(doctor_id: String, speciality: String, years: Int)

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
      asOfForBatch = id => LocalDate.parse("2026-01-01").plusMonths(id))
    try {
      input.addData(DocUpdate("d1", "Oncology", 10), DocUpdate("d2", "Cardiology", 5))
      q.processAllAvailable()
      val s1 = spark.read.parquet(path)
      assert(s1.count() == 2 && s1.filter(col("is_current")).count() == 2)

      // batch 2: d1 changes, d3 appears, d2 silent
      input.addData(DocUpdate("d1", "Oncology", 11), DocUpdate("d3", "Neurology", 2))
      q.processAllAvailable()
      val s2 = spark.read.parquet(path)
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
}
