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

  test("3-day chain on reference raw: day-2 updates and a day-3 backdated amendment " +
      "rebuild only touched months; SCD2 history grows append-only") {
    import scala.jdk.CollectionConverters._
    val warehouse = Files.createTempDirectory("graft_incr3").toString
    val raw1 = "/root/reference/hospital_raw_data"
    val entity = Silver.entities.find(_.name == "admissions").get
    val factPath = Gold.goldPath(warehouse, "fact_admissions")

    // reference header: admission_id,patient_id,admission_date,discharge_date,reason,room_no,doctor_id
    val lines = Files.readAllLines(Paths.get(s"$raw1/admissions_raw.csv")).asScala.toVector
    val header = lines.head
    val body = lines.tail
    val keyCount = body.map(_.split(",", -1)(0)).groupBy(identity).view.mapValues(_.size).toMap
    // editable rows: appear once (key-unique dedup can't pick a twin) and
    // carry a parseable admission_date; pick three in distinct months
    val editable = body.zipWithIndex.filter { case (l, _) =>
      val c = l.split(",", -1)
      keyCount(c(0)) == 1 && c(2).matches("\\d{4}-\\d{2}-\\d{2}")
    }
    val byMonth = editable.groupBy(_._1.split(",", -1)(2).substring(0, 7))
      .toSeq.sortBy(_._1).map(_._2.head)
    assert(byMonth.size >= 4, "need 4 distinct business months to edit")
    val Seq((rowA, idxA), (rowB, idxB), (rowC, idxC)) = byMonth.take(3): @unchecked
    def monthOf(line: String) = {
      val d = line.split(",", -1)(2)
      (d.substring(0, 4).toInt, d.substring(5, 7).toInt)
    }
    def dump(rows: Vector[String]): String = {
      val d = Files.createTempDirectory("graft_incr3_raw").toString
      Files.write(Paths.get(s"$d/admissions_raw.csv"), (header +: rows).asJava)
      d
    }
    def history = graft.io.Tables.read(spark, Silver.silverPath(warehouse, "admissions"))
    def versionSet = history
      .select(col("admission_id"), col(graft.engine.Scd2.EffectiveDate).cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    def monthDigests: Map[String, String] = {
      val root = Paths.get(factPath)
      Files.walk(root).iterator().asScala
        .filter(f => Files.isRegularFile(f) && {
          val n = f.getFileName.toString; !n.startsWith(".") && !n.startsWith("_") })
        .map { f =>
          val md = java.security.MessageDigest.getInstance("MD5")
          (root.relativize(f).toString,
            md.digest(Files.readAllBytes(f)).map("%02x".format(_)).mkString)
        }.toMap
    }
    def partsOf(ks: Set[String]) =
      ks.map(_.split("/").take(2).mkString("/"))

    // ---- day 1: first load, first gold build (all months)
    Silver.runEntity(spark, raw1, warehouse, entity, LocalDate.parse("2026-01-01"))
    Gold.runIncremental(spark, warehouse, LocalDate.parse("2026-01-01"), log = _ => ())
    val h1 = versionSet
    val n1 = history.count()
    val d1 = monthDigests

    // ---- day 2: two in-place updates (room change) in two different months
    def setRoom(line: String, room: String) = {
      val c = line.split(",", -1); c(5) = room; c.mkString(",")
    }
    val body2 = body
      .updated(idxA, setRoom(rowA, "901"))
      .updated(idxB, setRoom(rowB, "902"))
    Silver.runEntity(spark, dump(body2), warehouse, entity, LocalDate.parse("2026-02-01"))
    Gold.runIncremental(spark, warehouse, LocalDate.parse("2026-02-01"), log = _ => ())
    val h2 = versionSet
    assert(h1.subsetOf(h2), "SCD2 history lost versions on day 2 — not append-only")
    assert(history.count() == n1 + 2, "exactly the two updated keys gain a version")
    val d2 = monthDigests
    val changed12 = (d1.keySet ++ d2.keySet).filter(k => d1.get(k) != d2.get(k))
    val expected12 = Set(monthOf(rowA), monthOf(rowB)).map { case (y, m) =>
      s"admission_year=$y/admission_month=$m" }
    assert(partsOf(changed12) == expected12,
      s"day 2 must rewrite exactly the two edited months: got ${partsOf(changed12)}")

    // ---- day 3: backdated amendment — rowC's admission moves one month earlier
    val cC = rowC.split(",", -1)
    val (yC, mC) = monthOf(rowC)
    val (yPrev, mPrev) = if (mC == 1) (yC - 1, 12) else (yC, mC - 1)
    val amended = { cC(2) = f"$yPrev%04d-$mPrev%02d-15"; cC.mkString(",") }
    val body3 = body2.updated(idxC, amended)
    Silver.runEntity(spark, dump(body3), warehouse, entity, LocalDate.parse("2026-03-01"))
    Gold.runIncremental(spark, warehouse, LocalDate.parse("2026-03-01"), log = _ => ())
    val h3 = versionSet
    assert(h2.subsetOf(h3), "SCD2 history lost versions on day 3 — not append-only")
    assert(history.count() == n1 + 3)
    val d3 = monthDigests
    val changed23 = (d2.keySet ++ d3.keySet).filter(k => d2.get(k) != d3.get(k))
    val expected23 = Set((yC, mC), (yPrev, mPrev)).map { case (y, m) =>
      s"admission_year=$y/admission_month=$m" }
    assert(partsOf(changed23) == expected23,
      s"day 3 must rewrite the OLD business month and the backdated one: got ${partsOf(changed23)}")
    // the amended admission serves from its new month, once
    val served = spark.read.parquet(factPath)
      .filter(col("admission_id") === cC(0))
      .select("admission_year", "admission_month").collect()
    assert(served.map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((yPrev, mPrev)))
    // and the fact equals a full rebuild from current silver
    val full = Gold.factAdmissions(spark, warehouse).toOption.get
    val fact = spark.read.parquet(factPath)
    assert(fact.count() == full.count())
    assert(fact.select(full.columns.map(col): _*).exceptAll(full).count() == 0)
  }

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
