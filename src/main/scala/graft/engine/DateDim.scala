package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Calendar dimension builder — reference: Gold Layer.py:84-125.
  *
  * The reference collects min(date) to the Python driver per candidate
  * column, then fans out `spark.range(1)` → `explode(sequence(start, end))`.
  * We keep the fan-out shape but stay fully in-plan: the min/max bounds come
  * from a 1-row aggregate crossed with the generator, so no scalar ever
  * crosses to the driver and the whole thing is one job.
  */
object DateDim {

  /** One row per day in [min(dateCol), max(dateCol)] of `df`, with the
    * reference's calendar attributes (Gold Layer.py:117-122).
    */
  def fromColumn(df: DataFrame, dateCol: Column): DataFrame = {
    val bounds = df.agg(
      min(to_date(dateCol)).as("start"),
      max(to_date(dateCol)).as("end"))
    withCalendarAttrs(
      bounds
        .select(explode(sequence(col("start"), col("end"))).as("date")))
  }

  /** One row per day in the literal range [start, end] (ISO strings). */
  def fromRange(spark: SparkSession, start: String, end: String): DataFrame =
    withCalendarAttrs(
      spark.range(1).select(
        explode(sequence(to_date(lit(start)), to_date(lit(end)))).as("date")))

  /** Calendar attributes of a `date` column (Gold Layer.py:117-122):
    * year, month, day, week, weekday ("EEE"), month_name ("MMMM").
    */
  def withCalendarAttrs(df: DataFrame): DataFrame =
    df.withColumn("year", year(col("date")))
      .withColumn("month", month(col("date")))
      .withColumn("day", dayofmonth(col("date")))
      .withColumn("week", weekofyear(col("date")))
      .withColumn("weekday", date_format(col("date"), "EEE"))
      .withColumn("month_name", date_format(col("date"), "MMMM"))
}
