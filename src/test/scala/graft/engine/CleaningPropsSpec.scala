package graft.engine

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests mirroring the reference generator's dirty-union fields
  * (generate_hospital_data.py:26-36: value | error-token | null) —
  * cleaning must be TOTAL: output is typed-value-or-null, never a token.
  */
object CleaningPropsSpec extends Properties("Cleaning") {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dirtyInt: Gen[String] = Gen.oneOf(
    Gen.choose(0, 120).map(_.toString),
    Gen.oneOf("ERR", "EXP_ERR", "TEMP_ERR", "COST_ERR", "BAD_AMOUNT", "-", "null", ""),
    Gen.const(null: String))

  property("cleanCast(int) is total: Some(parsed) or None, never a token") =
    forAll(Gen.listOfN(12, dirtyInt)) { vals =>
      val out = vals.toDF("v")
        .select(Cleaning.cleanCast(col("v"), IntegerType).as("c"))
        .as[Option[Int]].collect()
      out.zip(vals).forall {
        case (Some(n), raw) => raw != null && raw.trim.nonEmpty && raw.trim.forall(_.isDigit) && n == raw.trim.toInt
        case (None, raw) => raw == null || !raw.trim.forall(_.isDigit) || raw.trim.isEmpty
      }
    }

  private val dirtyDate: Gen[String] = Gen.oneOf(
    Gen.choose(1, 28).map(d => f"2024-03-$d%02d"),
    Gen.oneOf("ERR", "-", "null"),
    Gen.const(null: String))

  property("cleanDate is total and round-trips ISO dates") =
    forAll(Gen.listOfN(12, dirtyDate)) { vals =>
      val out = vals.toDF("v")
        .select(Cleaning.cleanDate(col("v")).cast("string").as("c"))
        .as[Option[String]].collect()
      out.zip(vals).forall {
        case (Some(d), raw) => raw == d
        case (None, raw) => raw == null || !raw.startsWith("2024")
      }
    }
}
