package graft.pipeline

import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import java.time.LocalDate
import scala.jdk.CollectionConverters._
import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Gold.runIncremental: a day's load rebuilds ONLY the (year, month) fact
  * partitions its silver delta touched —
  *
  *  1. content equals a full rebuild of the fact from current silver;
  *  2. untouched month partitions are byte-identical across the refresh;
  *  3. a month EMPTIED by a date amendment (its only row moved to another
  *     month) disappears instead of serving the stale row;
  *  4. the rebuilt months include the BUSINESS month of a backdated
  *     amendment, not the load month.
  */
class GoldIncrementalSpec extends SparkSpec {

  private val entity = Silver.entities.find(_.name == "admissions").get
  private val header = "admission_id,patient_id,doctor_id,admission_date,discharge_date,reason,room_no"

  private def dump(rows: Seq[String]): String = {
    val d = Files.createTempDirectory("graft_goldincr_raw").toString
    Files.write(Paths.get(s"$d/admissions_raw.csv"), (header +: rows).asJava)
    d
  }

  // batch 1: one admission in each of Jan / Feb / Mar 2026
  private val batch1 = Seq(
    "A1,P1,D1,2026-01-10,2026-01-12,Checkup,101",
    "A2,P2,D1,2026-02-05,2026-02-07,Surgery,102",
    "A3,P3,D2,2026-03-15,2026-03-18,Checkup,103")
  // batch 2: A2's date amended Feb -> Mar (Feb empties), A3's room
  // changes in place (Mar touched anyway), A4 lands backdated in January
  private val batch2 = Seq(
    "A1,P1,D1,2026-01-10,2026-01-12,Checkup,101",
    "A2,P2,D1,2026-03-06,2026-03-08,Surgery,102",
    "A3,P3,D2,2026-03-15,2026-03-18,Checkup,104",
    "A4,P4,D2,2026-01-20,2026-01-22,Emergency,105")

  private def monthDigests(factPath: String): Map[String, String] = {
    val root = Paths.get(factPath)
    if (!Files.exists(root)) Map.empty
    else Files.walk(root).iterator().asScala
      .filter(f => Files.isRegularFile(f) &&
        !f.getFileName.toString.startsWith(".") && !f.getFileName.toString.startsWith("_"))
      .map { f =>
        val md = MessageDigest.getInstance("MD5")
        (root.relativize(f).toString,
          md.digest(Files.readAllBytes(f)).map("%02x".format(_)).mkString)
      }.toMap
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(df.columns.sorted.map(c => col(c).cast("string")): _*)
      .collect().map(_.mkString("|")).sorted.toSeq

  test("refresh rebuilds touched months only; emptied month disappears; content = full rebuild") {
    val wh = Files.createTempDirectory("graft_goldincr_wh").toString
    val factPath = Gold.goldPath(wh, "fact_admissions")
    val d1 = LocalDate.parse("2026-04-01")
    val d2 = LocalDate.parse("2026-05-01")

    Silver.runEntity(spark, dump(batch1), wh, entity, d1)
    Gold.runIncremental(spark, wh, d1)
    assert(Tables.read(spark, factPath).count() == 3)
    val after1 = monthDigests(factPath)
    assert(after1.keys.exists(_.contains("admission_month=2")), "Feb partition exists after load 1")

    Silver.runEntity(spark, dump(batch2), wh, entity, d2)
    Gold.runIncremental(spark, wh, d2)

    // 1. content identical to a full rebuild from current silver
    val expected = Gold.factAdmissions(spark, wh).toOption.get
    assert(canon(Tables.read(spark, factPath)) == canon(expected))
    assert(Tables.read(spark, factPath).count() == 4)

    val after2 = monthDigests(factPath)
    // 2. January WAS touched (backdated A4) — and March (A2 moved in,
    //    A3 changed); both rewritten. Nothing else existed, so instead
    //    assert the load-month partition was NOT created: the refresh keys
    //    off business dates, not the load date
    assert(!after2.keys.exists(_.contains("admission_month=5")),
      "no partition for the LOAD month — business dates drive the refresh")
    // 3. the emptied February partition is gone entirely
    assert(!after2.keys.exists(_.contains("admission_month=2")),
      s"Feb must disappear when its only row moves out: ${after2.keys.mkString(", ")}")
    // 4. rebuilt months carry the new state
    val mar = Tables.read(spark, factPath).filter(col("admission_month") === 3)
    assert(mar.count() == 2)
    assert(mar.filter(col("admission_id") === "A3").select("room_no")
      .head().getInt(0) == 104)
  }

  test("untouched months are byte-identical across a refresh that changes others") {
    val wh = Files.createTempDirectory("graft_goldincr_wh2").toString
    val factPath = Gold.goldPath(wh, "fact_admissions")
    Silver.runEntity(spark, dump(batch1), wh, entity, LocalDate.parse("2026-04-01"))
    Gold.runIncremental(spark, wh, LocalDate.parse("2026-04-01"))
    val before = monthDigests(factPath)

    // load 2 touches only March (in-place room change on A3)
    val b2 = Seq(
      "A1,P1,D1,2026-01-10,2026-01-12,Checkup,101",
      "A2,P2,D1,2026-02-05,2026-02-07,Surgery,102",
      "A3,P3,D2,2026-03-15,2026-03-18,Checkup,999")
    Silver.runEntity(spark, dump(b2), wh, entity, LocalDate.parse("2026-05-01"))
    Gold.runIncremental(spark, wh, LocalDate.parse("2026-05-01"))

    val after = monthDigests(factPath)
    before.filter(!_._1.contains("admission_month=3")).foreach { case (f, digest) =>
      assert(after.get(f).contains(digest), s"untouched partition file $f changed")
    }
    assert(after.exists { case (f, d) =>
      f.contains("admission_month=3") && !before.get(f).contains(d)
    } || after.keys.count(_.contains("admission_month=3")) !=
      before.keys.count(_.contains("admission_month=3")),
      "March was rebuilt")
    assert(Tables.read(spark, factPath).filter(col("admission_id") === "A3")
      .select("room_no").head().getInt(0) == 999)
  }
}
