package graft.pipeline

import java.nio.file.{Files, Paths}
import java.time.LocalDate
import scala.jdk.CollectionConverters._
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pipeline-level incremental load: run silver on the real raw data, then
  * run again with a MODIFIED batch (changed values + a new row) and assert
  * the SCD2 history reflects it — the "incremental loads, upserts" story
  * end-to-end, not just at the operator level.
  */
class IncrementalLoadSpec extends SparkSpec {

  test("changed doctor rows expire and re-insert; new rows append") {
    val warehouse = Files.createTempDirectory("graft_incr").toString
    val raw1 = "/root/reference/hospital_raw_data"

    // batch 2 = batch 1 with two edits + one brand-new doctor
    val raw2 = Files.createTempDirectory("graft_raw2").toString
    val lines = Files.readAllLines(Paths.get(s"$raw1/doctors_raw.csv")).asScala.toVector
    val header = lines.head
    val body = lines.tail
    val changed = body.zipWithIndex.map {
      case (l, 0) => { val c = l.split(",", -1); c(3) = "Neurology"; c.mkString(",") } // speciality change
      case (l, 1) => { val c = l.split(",", -1); c(4) = "40"; c.mkString(",") }        // experience change
      case (l, _) => l
    } :+ "00000000-0000-0000-0000-00000000beef,New,Doctor,Oncology,7"
    Files.write(Paths.get(s"$raw2/doctors_raw.csv"), (header +: changed).asJava)

    val entity = Silver.entities.find(_.name == "doctors").get
    Silver.runEntity(spark, raw1, warehouse, entity, LocalDate.parse("2026-01-01"))
    val after1 = graft.io.Tables.read(spark, Silver.silverPath(warehouse, "doctors"))
    val n1 = after1.count()
    assert(after1.filter(!col("is_current")).count() == 0)

    Silver.runEntity(spark, raw2, warehouse, entity, LocalDate.parse("2026-02-01"))
    val after2 = graft.io.Tables.read(spark, Silver.silverPath(warehouse, "doctors"))

    // two changed keys: expired old version + new current version; one new key
    assert(after2.filter(!col("is_current")).count() == 2)
    assert(after2.filter(col("is_current")).count() == n1 + 1)
    assert(after2.count() == n1 + 3)
    val expired = after2.filter(!col("is_current"))
      .select(col("end_date").cast("string")).distinct()
      .as[String](org.apache.spark.sql.Encoders.STRING).collect().toSeq
    assert(expired == Seq("2026-02-01"))
    // the new doctor is present and current
    assert(after2.filter(col("doctor_id") === "00000000-0000-0000-0000-00000000beef" &&
      col("is_current")).count() == 1)
    // changed key k0: both versions exist, one current with the new speciality
    val k0 = body.head.split(",", -1)(0)
    val versions = after2.filter(col("doctor_id") === k0)
      .select(col("speciality"), col("is_current"))
      .as[(String, Boolean)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.scalaBoolean))
      .collect().toSet
    assert(versions.exists(v => v._2 && v._1 == "Neurology"))
    assert(versions.exists(v => !v._2))
  }
}
