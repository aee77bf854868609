package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** bounded_sorted_list: the O(cap)-state replacement for
  * array_sort(collect_list) in the bucket pair generators.
  */
class BoundedSortedListSpec extends SparkSpec {
  import spark.implicits._

  test("under the cap it equals array_sort(collect_list), any partitioning") {
    val df = Seq(
      (1, 5L), (1, 3L), (1, 9L), (2, 7L), (2, 1L), (3, 4L)
    ).toDF("g", "id").repartition(7) // force multi-partition partials + merge
    val got = df.groupBy("g").agg(expr("bounded_sorted_list(10, id)").as("ids"))
    val want = df.groupBy("g").agg(array_sort(collect_list(col("id"))).as("ids"))
    assert(got.collect().map(r => (r.getInt(0), r.getSeq[Long](1))).toMap ==
      want.collect().map(r => (r.getInt(0), r.getSeq[Long](1))).toMap)
  }

  test("over the cap it keeps exactly the k smallest, ascending, deterministically") {
    val df = (1L to 1000L).map(i => (1, 1001L - i)).toDF("g", "id").repartition(13)
    val got = df.groupBy("g").agg(expr("bounded_sorted_list(5, id)").as("ids"))
      .collect().head.getSeq[Long](1)
    assert(got == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("struct elements order field-by-field like array_sort") {
    val df = Seq((1, 30L, 7), (1, 10L, 9), (1, 20L, 8)).toDF("g", "id", "h")
      .select(col("g"), struct(col("id"), col("h")).as("m"))
    val got = df.groupBy("g").agg(expr("bounded_sorted_list(2, m)").as("ms"))
      .select(explode(col("ms")).as("m")).select("m.id").as[Long].collect().toSeq
    assert(got == Seq(10L, 20L))
  }

  test("rejects non-literal or invalid k") {
    val df = Seq((1, 2L)).toDF("g", "id")
    intercept[Exception] {
      df.groupBy("g").agg(expr("bounded_sorted_list(id, id)")).collect()
    }
    intercept[Exception] {
      df.groupBy("g").agg(expr("bounded_sorted_list(0, id)")).collect()
    }
  }
}
