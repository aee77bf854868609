package graft.pipeline

import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.DateDim
import graft.io.Tables

/** Silver→Gold star schema: reference parity for Notebooks/Gold Layer.py.
  *
  * Dimensions are current-snapshot projections (GL:26-80); facts are
  * date-derived and PARTITIONED BY (year, month) (GL:152-156,183-186,
  * 221-224 — the layout that gives partition pruning at scale); the two
  * aggregate tables mirror GL:260-288. fact_doctor_activity realizes the
  * reference's dead-code intent (GL:230-252) from admissions' doctor_id
  * (SURVEY.md §7.4).
  */
object Gold {

  def goldPath(warehouse: String, name: String): String = s"$warehouse/gold/$name"

  private def silver(spark: SparkSession, warehouse: String, name: String): DataFrame =
    spark.read.parquet(Silver.silverPath(warehouse, name))

  private def current(df: DataFrame): DataFrame = df.filter(col("is_current"))

  /** GL:26-54. */
  def dimPatient(spark: SparkSession, warehouse: String): DataFrame =
    current(silver(spark, warehouse, "patients"))
      .select("patient_id", "first_name", "last_name", "gender", "age", "email", "phone", "city")

  /** GL:57-80. */
  def dimDoctor(spark: SparkSession, warehouse: String): DataFrame =
    current(silver(spark, warehouse, "doctors"))
      .select("doctor_id", "first_name", "last_name", "speciality", "experience_years")

  /** GL:84-125: calendar from the earliest silver date to asOf, fully
    * in-plan (the reference collects per-column mins to the driver).
    */
  def dimDate(spark: SparkSession, warehouse: String, asOf: LocalDate): DataFrame = {
    val starts = Seq(
      current(silver(spark, warehouse, "admissions")).select(to_date(col("admission_date")).as("d")),
      current(silver(spark, warehouse, "billing")).select(to_date(col("billing_date")).as("d")),
      current(silver(spark, warehouse, "procedures")).select(to_date(col("performed_at")).as("d")),
      current(silver(spark, warehouse, "vitals")).select(to_date(col("ts")).as("d")))
      .reduce(_ unionByName _)
    val bounds = starts.na.drop().agg(min(col("d")).as("start"))
      .withColumn("end", lit(asOf.toString).cast("date"))
    DateDim.withCalendarAttrs(
      bounds.select(explode(sequence(col("start"), col("end"))).as("date")))
  }

  /** GL:131-156. */
  def factBilling(spark: SparkSession, warehouse: String): DataFrame =
    current(silver(spark, warehouse, "billing"))
      .na.drop(Seq("billing_date"))
      .select(
        col("billing_id"), col("patient_id"), col("service"), col("amount"),
        col("billing_date"),
        year(col("billing_date")).as("billing_year"),
        month(col("billing_date")).as("billing_month"))

  /** GL:160-186. */
  def factAdmissions(spark: SparkSession, warehouse: String): DataFrame =
    current(silver(spark, warehouse, "admissions"))
      .na.drop(Seq("admission_date"))
      .select(
        col("admission_id"), col("patient_id"), col("doctor_id"),
        col("admission_date"), col("discharge_date"), col("reason"), col("room_no"),
        datediff(col("discharge_date"), col("admission_date")).as("length_of_stay_days"),
        year(col("admission_date")).as("admission_year"),
        month(col("admission_date")).as("admission_month"))

  /** GL:190-224. */
  def factVitals(spark: SparkSession, warehouse: String): DataFrame =
    current(silver(spark, warehouse, "vitals"))
      .na.drop(Seq("ts"))
      .select(
        col("vital_id"), col("patient_id"), col("ts").as("timestamp"),
        to_date(col("ts")).as("vital_date"),
        col("heart_rate"), col("temperature"),
        year(col("ts")).as("vital_year"),
        month(col("ts")).as("vital_month"))

  /** GL:230-252 intent: per-doctor monthly admission activity. */
  def factDoctorActivity(spark: SparkSession, warehouse: String): DataFrame =
    factAdmissions(spark, warehouse)
      .na.drop(Seq("doctor_id"))
      .groupBy(col("doctor_id"), col("admission_year"), col("admission_month"))
      .agg(
        count(lit(1)).as("admissions_count"),
        avg(col("length_of_stay_days")).as("avg_los_days"))

  /** GL:260-271. */
  def aggRevenueMonth(spark: SparkSession, warehouse: String): DataFrame =
    factBilling(spark, warehouse)
      .groupBy(col("billing_year"), col("billing_month"))
      .agg(sum(col("amount")).as("total_revenue"), count(lit(1)).as("lines_count"))

  /** GL:275-288. */
  def aggAdmissionsReasonMonth(spark: SparkSession, warehouse: String): DataFrame =
    factAdmissions(spark, warehouse)
      .groupBy(col("admission_year"), col("admission_month"), col("reason"))
      .agg(
        count(lit(1)).as("admissions_count"),
        avg(col("length_of_stay_days")).as("avg_los_days"))

  /** Build all gold tables; facts keep the reference's (year, month)
    * partition layout.
    */
  def run(spark: SparkSession, warehouse: String, asOf: LocalDate): Unit = {
    Tables.overwrite(dimPatient(spark, warehouse), goldPath(warehouse, "dim_patient"))
    Tables.overwrite(dimDoctor(spark, warehouse), goldPath(warehouse, "dim_doctor"))
    Tables.overwrite(dimDate(spark, warehouse, asOf), goldPath(warehouse, "dim_date"))
    Tables.overwritePartitioned(factBilling(spark, warehouse),
      goldPath(warehouse, "fact_billing"), Seq("billing_year", "billing_month"))
    Tables.overwritePartitioned(factAdmissions(spark, warehouse),
      goldPath(warehouse, "fact_admissions"), Seq("admission_year", "admission_month"))
    Tables.overwritePartitioned(factVitals(spark, warehouse),
      goldPath(warehouse, "fact_vitals"), Seq("vital_year", "vital_month"))
    Tables.overwrite(factDoctorActivity(spark, warehouse), goldPath(warehouse, "fact_doctor_activity"))
    Tables.overwrite(aggRevenueMonth(spark, warehouse), goldPath(warehouse, "agg_revenue_month"))
    Tables.overwrite(aggAdmissionsReasonMonth(spark, warehouse), goldPath(warehouse, "agg_admissions_reason_month"))
  }
}
