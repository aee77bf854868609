package graft.pipeline

import java.nio.file.{Files, Paths}
import java.time.LocalDate
import scala.jdk.CollectionConverters._
import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.functions._

/** The quarantine path: rows failing an entity's required-column checks
  * land in `silver/<entity>__quarantine` with reasons instead of silently
  * vanishing (the reference `dropna`s them, SL:69), and the row accounting
  * reconciles: cleaned = silver-current-batch + quarantined + key-deduped.
  */
class QuarantineSpec extends SparkSpec {

  private val rawDir = "/root/reference/hospital_raw_data"
  private val entity = Silver.entities.find(_.name == "doctors").get

  /** doctors batch with two required-null rows (empty doctor_id field —
    * the CSV shape that reads as null) and one duplicate key row.
    */
  private def dirtyBatch(): String = {
    val lines = Files.readAllLines(Paths.get(s"$rawDir/doctors_raw.csv")).asScala.toVector
    val out = lines ++ Seq(
      ",Ghost,One,Cardiology,5",
      ",Ghost,Two,Oncology,9",
      lines(1)) // exact duplicate of the first data row
    val d = Files.createTempDirectory("graft_quar_raw").toString
    Files.write(Paths.get(s"$d/doctors_raw.csv"), out.asJava)
    d
  }

  test("reference data is key-clean: a full load quarantines nothing") {
    val wh = Files.createTempDirectory("graft_quar_clean").toString
    Silver.run(spark, rawDir, wh, LocalDate.parse("2026-01-01"))
    Silver.entities.foreach { e =>
      val q = Silver.readQuarantine(spark, wh, e.name)
      assert(q.forall(_.count() == 0), s"${e.name}: unexpected quarantined rows")
    }
  }

  test("required-null rows quarantine with reasons; accounting reconciles; loads accumulate") {
    val wh = Files.createTempDirectory("graft_quar").toString
    val raw = dirtyBatch()
    val d1 = LocalDate.parse("2026-01-01")
    Silver.runEntity(spark, raw, wh, entity, d1)

    // independent expectations straight off the cleaned frame
    val cleanedAll = entity.clean(Silver.readRaw(spark, raw, entity))
    val nClean = cleanedAll.count()
    val bad = entity.required.map(col(_).isNull).reduce(_ || _)
    val nDeadExpected = cleanedAll.filter(bad).count()
    val nOk = cleanedAll.filter(!bad).count()
    val nUnique = cleanedAll.filter(!bad).select(entity.keys.map(col): _*).distinct().count()
    assert(nDeadExpected == 2 && nOk == nClean - 2)
    // the injected duplicate (plus any duplicates already in the reference
    // file) collapse to one survivor per key
    assert(nOk - nUnique >= 1, "key dedup removed at least the injected duplicate")

    val quarantined = Silver.readQuarantine(spark, wh, "doctors").get
    assert(quarantined.count() == nDeadExpected)
    assert(quarantined.select("quarantine_reason").distinct()
      .collect().map(_.getString(0)).toSet == Set("doctor_id"))
    assert(quarantined.columns.contains("load_date"))

    val silverCurrent = Tables.read(spark, Silver.silverPath(wh, "doctors"))
      .filter(col("is_current")).count()
    // cleaned = silver current + quarantined + key-deduped
    assert(nClean == silverCurrent + nDeadExpected + (nOk - nUnique))

    // second load (same batch, next day): quarantine accumulates per
    // load_date; the first partition is untouched
    Silver.runEntity(spark, raw, wh, entity, d1.plusMonths(1))
    val q2 = Silver.readQuarantine(spark, wh, "doctors").get
    assert(q2.count() == 2 * nDeadExpected)
    assert(q2.select("load_date").distinct().count() == 2)
  }

  test("bucketed variant routes quarantine identically; accounting reconciles") {
    val wh = Files.createTempDirectory("graft_quar_bkt").toString
    val raw = dirtyBatch()
    val table = Silver.silverTable("doctors")
    try {
      Silver.runEntityBucketed(spark, raw, wh, entity, LocalDate.parse("2026-01-01"))

      val cleanedAll = entity.clean(Silver.readRaw(spark, raw, entity))
      val nClean = cleanedAll.count()
      val bad = entity.required.map(col(_).isNull).reduce(_ || _)
      val nDead = cleanedAll.filter(bad).count()
      val nOk = nClean - nDead
      val nUnique = cleanedAll.filter(!bad).select(entity.keys.map(col): _*).distinct().count()

      val quarantined = Silver.readQuarantine(spark, wh, "doctors").get
      assert(quarantined.count() == nDead)
      assert(quarantined.select("quarantine_reason").distinct()
        .collect().map(_.getString(0)).toSet == Set("doctor_id"))

      val silverCurrent =
        graft.io.Scd2History.readCurrentBucketed(spark, table).count()
      // cleaned = silver current + quarantined + key-deduped
      assert(nClean == silverCurrent + nDead + (nOk - nUnique))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${table}__staging")
      spark.sql(s"DROP TABLE IF EXISTS ${table}__old")
    }
  }
}
