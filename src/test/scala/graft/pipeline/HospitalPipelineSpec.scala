package graft.pipeline

import java.nio.file.Files
import java.time.LocalDate
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end fixture test (SURVEY.md §5.2 item 3): full medallion run over
  * the reference's shipped raw data, asserting layer invariants.
  */
class HospitalPipelineSpec extends SparkSpec {

  private val rawDir = "/root/reference/hospital_raw_data"
  private lazy val warehouse = {
    val dir = Files.createTempDirectory("graft_wh").toString
    Silver.run(spark, rawDir, dir, LocalDate.parse("2026-01-01"))
    Gold.run(spark, dir, LocalDate.parse("2026-02-01"))
    dir
  }

  private def silver(name: String) = graft.io.Tables.read(spark, Silver.silverPath(warehouse, name))
  private def gold(name: String) = graft.io.Tables.read(spark, Gold.goldPath(warehouse, name))

  test("silver: all six entities materialize with SCD2 triplet") {
    Silver.entities.foreach { e =>
      val df = silver(e.name)
      assert(df.count() > 0, e.name)
      assert(Seq("effective_date", "end_date", "is_current").forall(df.columns.contains), e.name)
      // bootstrap run: everything current, no end dates
      assert(df.filter(!col("is_current")).count() == 0, e.name)
    }
  }

  test("silver: business keys unique among current rows") {
    Silver.entities.foreach { e =>
      val dups = silver(e.name).filter(col("is_current"))
        .groupBy(e.keys.map(col): _*).count().filter(col("count") > 1).count()
      assert(dups == 0, s"${e.name} has $dups duplicate current keys")
    }
  }

  test("silver: cleaning is total — typed columns, no surviving tokens") {
    // numeric columns arrived as strings with tokens; post-clean they are typed
    assert(silver("patients").schema("age").dataType.typeName == "integer")
    assert(silver("doctors").schema("experience_years").dataType.typeName == "integer")
    assert(silver("vitals").schema("temperature").dataType.typeName == "double")
    assert(silver("vitals").schema("heart_rate").dataType.typeName == "integer")
    assert(silver("procedures").schema("cost").dataType.typeName == "double")
    assert(silver("admissions").schema("room_no").dataType.typeName == "integer")
    // gender strictly whitelisted
    val genders = silver("patients").select("gender").distinct()
      .collect().map(_.getString(0)).toSet
    assert(genders.subsetOf(Set("M", "F", "O", null)))
  }

  test("silver admissions: discharge never precedes admission") {
    val bad = silver("admissions")
      .filter(col("discharge_date") < col("admission_date")).count()
    assert(bad == 0)
  }

  test("silver billing: amounts are doubles with errors coerced to 0.0, patient_id kept") {
    val b = silver("billing")
    assert(b.schema("amount").dataType.typeName == "double")
    assert(b.filter(col("amount").isNull).count() == 0)
    assert(b.columns.contains("patient_id"))
    assert(b.filter(col("amount") === 0.0).count() > 0) // error tokens landed as 0.0
  }

  test("gold: fact partition columns match their date columns") {
    val fb = gold("fact_billing")
    assert(fb.filter(year(col("billing_date")) =!= col("billing_year") ||
      month(col("billing_date")) =!= col("billing_month")).count() == 0)
    val fa = gold("fact_admissions")
    assert(fa.filter(year(col("admission_date")) =!= col("admission_year")).count() == 0)
  }

  test("gold: agg_revenue_month reconciles with fact_billing") {
    val fromFact = gold("fact_billing")
      .groupBy("billing_year", "billing_month")
      .agg(sum("amount").as("rev"), count(lit(1)).as("n"))
    val agg = gold("agg_revenue_month")
    val joined = agg.join(fromFact, Seq("billing_year", "billing_month"))
    assert(joined.count() == agg.count())
    assert(joined.filter(abs(col("total_revenue") - col("rev")) > 1e-6).count() == 0)
    assert(joined.filter(col("lines_count") =!= col("n")).count() == 0)
  }

  test("gold: dim_date spans earliest silver date to asOf with no gaps") {
    val d = gold("dim_date")
    val n = d.count()
    val (lo, hi) = d.agg(min(col("date")).cast("string"), max(col("date")).cast("string"))
      .as[(String, String)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.STRING))
      .collect().head
    assert(hi == "2026-02-01")
    val expected = java.time.temporal.ChronoUnit.DAYS.between(
      LocalDate.parse(lo), LocalDate.parse(hi)) + 1
    assert(n == expected)
  }

  test("second silver run with same raw data is a no-op (merge idempotence)") {
    warehouse // force first run
    val before = Silver.entities.map(e => e.name -> silver(e.name).count()).toMap
    Silver.run(spark, rawDir, warehouse, LocalDate.parse("2026-03-01"))
    Silver.entities.foreach { e =>
      val df = silver(e.name)
      assert(df.count() == before(e.name), e.name)
      assert(df.filter(!col("is_current")).count() == 0, e.name)
    }
  }

  test("gold: doctor activity realized from admissions (reference dead-code fix)") {
    val da = gold("fact_doctor_activity")
    assert(da.count() > 0)
    assert(da.filter(col("doctor_id").isNull).count() == 0)
  }
}
