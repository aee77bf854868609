package graft.expressions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property contract for bounded_sorted_list: for ANY input multiset,
  * group assignment, partitioning, and cap, the result equals
  * `sorted.take(k)` of the group's values — i.e. the aggregate is
  * order-insensitive and merge-correct, which is exactly what lets the
  * capped bucket queries stay deterministic under cluster re-layout.
  */
object BoundedSortedListPropsSpec extends Properties("BoundedSortedList") {

  private lazy val spark = TestSpark.spark

  private val gen = for {
    n <- Gen.choose(1, 60)
    values <- Gen.listOfN(n, Gen.zip(Gen.choose(0, 3), Gen.choose(-50L, 50L)))
    k <- Gen.choose(1, 8)
    parts <- Gen.choose(1, 7)
  } yield (values, k, parts)

  property("equals per-group sorted.take(k), any partitioning") =
    forAll(gen) { case (values, k, parts) =>
      import spark.implicits._
      val df = values.toDF("g", "v").repartition(parts)
      val got = df.groupBy("g")
        .agg(expr(s"bounded_sorted_list($k, v)").as("vs"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toList).toMap
      val want = values.groupBy(_._1)
        .map { case (g, vs) => g -> vs.map(_._2).sorted.take(k) }
      got == want
    }
}
