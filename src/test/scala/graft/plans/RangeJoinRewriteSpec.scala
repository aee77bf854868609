package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Optimizer rewrite of BETWEEN theta-joins into binned equi-joins:
  * bit-identical results vs the nested-loop plan, the plan actually
  * flips to a hash join, the rule is inert without its conf, the
  * replication guard fails loudly, and the fixed-point batch does not
  * re-match its own output.
  */
class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val Key = RangeJoinRewrite.BinWidthKey

  private def withBinWidth[T](w: String)(body: => T): T = {
    spark.conf.set(Key, w)
    try body finally spark.conf.unset(Key)
  }

  private def points = Seq(
    (1L, "a", 5L), (2L, "a", 10L), (3L, "a", 25L), (4L, "b", 10L), (5L, "a", 99L)
  ).toDF("pid", "pkey", "pt")

  private def intervals = Seq(
    (101L, "a", 3L, 12L), (102L, "a", 11L, 26L), (103L, "b", 9L, 10L),
    (104L, "a", 50L, 50L), (105L, "a", 30L, 20L) // inverted: matches nothing
  ).toDF("iid", "ikey", "s", "e")

  private def thetaJoin: DataFrame =
    points.join(intervals,
      $"pkey" === $"ikey" && $"s" <= $"pt" && $"pt" <= $"e")
      .select("pid", "iid")

  test("rewritten results match the nested-loop plan bit for bit") {
    val baseline = thetaJoin.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rewritten = withBinWidth("10") {
      thetaJoin.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(baseline == rewritten)
    assert(rewritten == Set((1L, 101L), (2L, 101L), (3L, 102L), (4L, 103L)))
  }

  // A PURE range predicate (no equi-key) is the nested-loop worst case —
  // with an equi-key Spark already hash-joins on it and evaluates the
  // range as a residual (the rewrite then just sharpens the join key).
  private def pureRangeJoin: DataFrame =
    points.join(intervals, $"s" <= $"pt" && $"pt" <= $"e")
      .select("pid", "iid")

  test("the plan flips from nested-loop to hash equi-join") {
    val before = pureRangeJoin
    before.collect()
    val beforePlan = before.queryExecution.executedPlan.toString
    assert(beforePlan.contains("BroadcastNestedLoopJoin") ||
      beforePlan.contains("CartesianProduct"))

    withBinWidth("10") {
      val after = pureRangeJoin
      after.collect()
      val afterPlan = after.queryExecution.executedPlan.toString
      assert(!afterPlan.contains("BroadcastNestedLoopJoin"))
      assert(!afterPlan.contains("CartesianProduct"))
      assert(afterPlan.contains("Generate explode")) // interval bin replication
    }
  }

  test("keyless rewrite returns the same rows as nested-loop") {
    val base = pureRangeJoin.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rw = withBinWidth("10") {
      pureRangeJoin.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(base == rw)
  }

  test("strict < bounds are preserved exactly") {
    val strict = points.join(intervals,
      $"pkey" === $"ikey" && $"s" < $"pt" && $"pt" < $"e")
      .select("pid", "iid")
    val base = strict.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rw = withBinWidth("10") {
      strict.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(base == rw)
    assert(!rw.contains((2L, 103L))) // pt=10 is NOT < e=10
  }

  test("inert without the conf; no residual effect after unset") {
    val plan = { val df = pureRangeJoin; df.collect(); df.queryExecution.executedPlan.toString }
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"))
  }

  test("replication guard fails loudly on an interval spanning too many bins") {
    spark.conf.set(Key, "1")
    spark.conf.set(RangeJoinRewrite.MaxBinsKey, "5")
    try {
      val wide = Seq((9L, "a", 0L, 1000L)).toDF("iid", "ikey", "s", "e")
      val ex = intercept[Exception] {
        points.join(wide, $"pkey" === $"ikey" && $"s" <= $"pt" && $"pt" <= $"e")
          .collect()
      }
      assert(ex.getMessage != null)
    } finally {
      spark.conf.unset(Key)
      spark.conf.unset(RangeJoinRewrite.MaxBinsKey)
    }
  }

  test("timestamps via epoch seconds: q71's shape rewrites and agrees") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.io.Tables.load(spark, dir, "events")
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("pe"), $"user_id".as("pu"), $"ts".cast("long").as("psec"))
    val iv = ev.filter($"event_type" === "view")
      .groupBy($"user_id".as("iu"), to_date($"ts").as("iday"))
      .agg(min($"ts".cast("long")).as("ssec"), max($"ts".cast("long")).as("esec"))
    def join = p.join(iv,
      $"pu" === $"iu" && $"ssec" <= $"psec" && $"psec" <= $"esec")
      .select("pe", "iday")
    val base = join.collect().map(_.toSeq).sortBy(_.toString)
    val rw = withBinWidth("21600") { join.collect().map(_.toSeq).sortBy(_.toString) }
    assert(base.length == rw.length && base.sameElements(rw))
  }
}
