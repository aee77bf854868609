package graft.engine

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Properties of the SCD2-source dedup contract: keyUnique must be
  * key-unique, deterministic under row order and partitioning, and
  * idempotent — its output feeding Scd2.merge is what keeps histories
  * uncorrupted, so these invariants are load-bearing.
  */
object DedupPropsSpec extends Properties("Dedup.keyUnique") {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowsGen: Gen[List[(String, Option[String], Option[Int])]] =
    Gen.listOfN(12, Gen.zip(
      Gen.oneOf("k1", "k2", "k3", "k4", "k5"),
      Gen.option(Gen.oneOf("a", "b", "c")),
      Gen.option(Gen.choose(0, 2))))

  property("one row per key; deterministic under shuffled input order and partitioning") =
    forAll(rowsGen) { rows =>
      rows.nonEmpty ==> {
        def run(rs: List[(String, Option[String], Option[Int])], parts: Int) =
          Dedup.keyUnique(rs.toDF("id", "name", "n").repartition(parts), Seq("id"))
            .collect().map(_.toSeq).toSet
        val a = run(rows, 1)
        val b = run(scala.util.Random.shuffle(rows), 3)
        val keyUnique = a.map(_.head).size == a.size
        val sameKeys = a.map(_.head) == rows.map(_._1).toSet
        (a == b) :| s"order/partitioning changed the survivors: $a vs $b" &&
          keyUnique :| "duplicate keys survived" &&
          sameKeys :| "keys lost or invented"
      }
    }

  property("idempotent: keyUnique(keyUnique(df)) == keyUnique(df)") =
    forAll(rowsGen) { rows =>
      rows.nonEmpty ==> {
        val once = Dedup.keyUnique(rows.toDF("id", "name", "n"), Seq("id"))
        val twice = Dedup.keyUnique(once, Seq("id"))
        once.collect().map(_.toSeq).toSet == twice.collect().map(_.toSeq).toSet
      }
    }
}
