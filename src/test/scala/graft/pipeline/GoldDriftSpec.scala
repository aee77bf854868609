package graft.pipeline

import java.nio.file.Files
import java.time.LocalDate
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Schema-drift tolerance (reference GL:29,87-99,136-142,196-207): a
  * missing silver table or column degrades/skips the affected gold tables
  * with a logged reason — it never aborts the layer.
  */
class GoldDriftSpec extends SparkSpec {
  import spark.implicits._

  private def freshWarehouse(): String =
    Files.createTempDirectory("graft_gold_drift").toString

  test("missing is_current degrades dims to all rows (GL:29)") {
    val wh = freshWarehouse()
    // un-versioned patients table: no is_current / SCD2 columns at all
    Seq(("p1", "Ann", "Lee", "F", 40, "a@x.com", "123", "Rome"),
      ("p2", "Bob", "Kim", "M", 50, "b@x.com", "456", "Oslo"))
      .toDF("patient_id", "first_name", "last_name", "gender", "age", "email", "phone", "city")
      .write.parquet(Silver.silverPath(wh, "patients"))
    val dim = Gold.dimPatient(spark, wh)
    assert(dim.isRight && dim.toOption.get.count() == 2)
  }

  test("missing silver table / missing columns / missing ts column skip with reasons") {
    val wh = freshWarehouse()
    // patients: fine (versioned)
    Seq(("p1", "Ann", "Lee", "F", 40, "a@x.com", "123", "Rome", true))
      .toDF("patient_id", "first_name", "last_name", "gender", "age", "email", "phone", "city", "is_current")
      .write.parquet(Silver.silverPath(wh, "patients"))
    // billing: drifted — amount column is gone
    Seq(("b1", 0, "p1", "ICU", "2026-01-02"))
      .toDF("billing_id", "line_no", "patient_id", "service", "billing_date")
      .select(col("*"), col("billing_date").cast("date").as("bd"))
      .drop("billing_date").withColumnRenamed("bd", "billing_date")
      .write.parquet(Silver.silverPath(wh, "billing"))
    // vitals: drifted — no recognizable timestamp column
    Seq(("v1", "p1", 72, 36.8)).toDF("vital_id", "patient_id", "heart_rate", "temperature")
      .write.parquet(Silver.silverPath(wh, "vitals"))
    // doctors, admissions, procedures: absent entirely

    val logged = scala.collection.mutable.ArrayBuffer.empty[String]
    val skipped = Gold.run(spark, wh, LocalDate.parse("2026-02-01"), logged.append)

    assert(skipped == logged.toSeq)
    def reason(table: String): String =
      skipped.find(_.startsWith(s"Skipping $table")).getOrElse(fail(s"$table was not skipped"))
    assert(reason("dim_doctor").contains("silver.doctors not found"))
    assert(reason("fact_billing").contains("missing columns in silver.billing: amount"))
    assert(reason("fact_admissions").contains("silver.admissions not found"))
    assert(reason("fact_vitals").contains("no timestamp column"))
    assert(reason("fact_doctor_activity").contains("silver.admissions not found"))
    assert(reason("agg_revenue_month").contains("missing columns"))
    assert(reason("agg_admissions_reason_month").contains("not found"))

    // the healthy tables still built
    assert(graft.io.Tables.read(spark, Gold.goldPath(wh, "dim_patient")).count() == 1)
    // dim_date still builds: billing_date is the only usable probe
    val dates = graft.io.Tables.read(spark, Gold.goldPath(wh, "dim_date"))
    assert(dates.agg(min(col("date")).cast("string")).as[String].head() == "2026-01-02")
  }

  test("no usable date column anywhere: dim_date falls back to 2020-01-01 (GL:101)") {
    val wh = freshWarehouse()
    val dim = Gold.dimDate(spark, wh, LocalDate.parse("2020-01-05"))
    assert(dim.agg(min(col("date")).cast("string")).as[String].head() == "2020-01-01")
    assert(dim.count() == 5)
  }
}
