package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

class CleaningSpec extends SparkSpec {
  import spark.implicits._

  test("cleanCast: token→null, value→typed, garbage→null (total function)") {
    val df = Seq("87", "ERR", null, "EXP_ERR", " 42 ", "x9").toDF("v")
    val out = df.select(Cleaning.cleanCast(col("v"), IntegerType).as("c")).as[Option[Int]].collect()
    assert(out.toSeq == Seq(Some(87), None, None, None, Some(42), None))
  }

  test("cleanDate parses ISO and nulls tokens") {
    val df = Seq("2024-03-01", "ERR", null, "-").toDF("d")
    val out = df.select(Cleaning.cleanDate(col("d")).cast("string").as("c")).as[Option[String]].collect()
    assert(out.toSeq == Seq(Some("2024-03-01"), None, None, None))
  }

  test("digitsOnly strips formatting (phone pattern, SL:413-416)") {
    val out = Seq("(555) 123-4567", "555.123.4567x89").toDF("p")
      .select(Cleaning.digitsOnly(col("p")).as("c")).as[String].collect()
    assert(out.toSeq == Seq("5551234567", "555123456789"))
  }

  test("scrubbedDouble: numeric scrub with default (billing amounts, SL:184-198)") {
    val df = Seq("$1,234.50", "BAD_AMOUNT", null, "-12.5").toDF("a")
    val out = df.select(Cleaning.scrubbedDouble(col("a"), lit(0.0)).as("c")).as[Double].collect()
    assert(out.toSeq == Seq(1234.5, 0.0, 0.0, -12.5))
  }

  test("whitelist keeps only allowed values (gender M/F/O, SL:406-410)") {
    val out = Seq("M", "F", "O", "xx", null).toDF("g")
      .select(Cleaning.whitelist(col("g"), Seq("M", "F", "O")).as("c")).as[Option[String]].collect()
    assert(out.toSeq == Seq(Some("M"), Some("F"), Some("O"), None, None))
  }

  test("nullIfBefore: discharge < admission ⇒ null (SL:44-48)") {
    val df = Seq(("2024-01-10", "2024-01-05"), ("2024-01-10", "2024-01-15"))
      .toDF("a", "d")
      .select(to_date(col("a")).as("a"), to_date(col("d")).as("d"))
    val out = df.select(Cleaning.nullIfBefore(col("d"), col("a")).cast("string").as("c"))
      .as[Option[String]].collect()
    assert(out.toSeq == Seq(None, Some("2024-01-15")))
  }

  test("titleTrim normalizes reason text (SL:49)") {
    val out = Seq("  fever ", "INJURY").toDF("r")
      .select(Cleaning.titleTrim(col("r")).as("c")).as[String].collect()
    assert(out.toSeq == Seq("Fever", "Injury"))
  }

  test("quarantine splits rows with null essentials and tags the reason") {
    val df = Seq(
      ("a1", Some("p1"), Some(1)),
      (null, Some("p2"), Some(2)),
      ("a3", None, Some(3)),
      (null, None, None)).toDF("id", "pid", "v")
    val (clean, quarantined) = Cleaning.quarantine(df, Seq("id", "pid"))
    assert(clean.select("id").as[String].collect().toSeq == Seq("a1"))
    val reasons = quarantined.select("id", "quarantine_reason")
      .as[(Option[String], String)].collect().toSet
    assert(reasons == Set(
      (None, "id"), (Some("a3"), "pid"), (None, "id,pid")))
  }

  test("cleanCast double keeps negatives and decimals") {
    val out = Seq("98.6", "TEMP_ERR", "-3.5").toDF("t")
      .select(Cleaning.cleanCast(col("t"), DoubleType).as("c")).as[Option[Double]].collect()
    assert(out.toSeq == Seq(Some(98.6), None, Some(-3.5)))
  }
}
