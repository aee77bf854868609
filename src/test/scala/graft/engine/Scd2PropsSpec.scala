package graft.engine

import java.time.LocalDate
import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** SCD2 structural invariants under random batch sequences (SURVEY.md §5.2
  * item 4): whatever the batches, the merged history must stay well-formed.
  */
object Scd2PropsSpec extends Properties("Scd2") {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // batches over a small key space with nullable values → lots of
  // unchanged / changed / new / NULL-transition collisions
  private val batchGen: Gen[List[(String, Option[Int])]] =
    Gen.listOfN(6, Gen.zip(
      Gen.oneOf("k1", "k2", "k3", "k4"),
      Gen.option(Gen.choose(0, 3))))
      .map(_.distinctBy(_._1)) // unique business keys per batch

  property("history stays well-formed after two random merges") =
    forAll(batchGen, batchGen) { (b1, b2) =>
      (b1.nonEmpty && b2.nonEmpty) ==> {
        val d1 = LocalDate.parse("2024-01-01")
        val d2 = LocalDate.parse("2024-06-01")
        val t0 = Scd2.bootstrap(b1.toDF("id", "v"), d1)
        val merged = Scd2.merge(t0, b2.toDF("id", "v"), Seq("id"), Seq("v"), d2)
          .cache()
        try {
          // exactly one current row per key
          val dupCur = merged.filter(col("is_current"))
            .groupBy("id").count().filter(col("count") > 1).count() == 0
          // every key ever seen has a current row
          val keys = (b1.map(_._1) ++ b2.map(_._1)).toSet
          val curKeys = merged.filter(col("is_current"))
            .select("id").as[String].collect().toSet
          // expired rows are closed with d2 and non-current
          val closedOk = merged.filter(!col("is_current"))
            .filter(col("end_date").isNull || col("end_date") =!= lit(d2.toString).cast("date"))
            .count() == 0
          // current rows carry exactly the latest value for keys in b2
          val b2map = b2.toMap
          val latestOk = merged.filter(col("is_current"))
            .select("id", "v").as[(String, Option[Int])].collect()
            .forall { case (k, v) => b2map.get(k).forall(_ == v) }
          dupCur && curKeys == keys && closedOk && latestOk
        } finally { merged.unpersist(); () }
      }
    }
}
