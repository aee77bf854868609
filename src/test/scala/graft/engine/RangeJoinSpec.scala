package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Range join via interval binning: containment semantics across bin
  * boundaries, multi-bin intervals, keyed matching, the loud-failure
  * guards, and the equi-join plan contract (no nested-loop/cartesian).
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    // (pid, key, t)
    (1L, "a", 5L), (2L, "a", 10L), (3L, "a", 25L), (4L, "b", 10L), (5L, "a", 99L)
  ).toDF("pid", "pkey", "pt")

  private def intervals = Seq(
    // (iid, key, s, e) — bin width 10: iv1 spans bins 0-1, iv2 bins 1-2
    (101L, "a", 3L, 12L), (102L, "a", 11L, 26L), (103L, "b", 9L, 10L),
    (104L, "a", 50L, 50L)
  ).toDF("iid", "ikey", "s", "e")

  test("containment with keys, across bin boundaries and multi-bin spans") {
    val out = RangeJoin.pointInInterval(points, intervals, "pt", "s", "e",
        keys = Seq("pkey" -> "ikey"), binWidth = 10L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 101L),  // 5 in [3,12]
      (2L, 101L),  // 10 in [3,12] — same bin
      (3L, 102L),  // 25 in [11,26] — interval spans two bins
      (4L, 103L)   // keyed: b-point only matches the b-interval
    ))             // 5 (t=99) matches nothing; 104 is a point interval missed
  }

  test("a point exactly on an interval edge matches; outside-by-one does not") {
    val out = RangeJoin.pointInInterval(
      Seq((1L, 9L), (2L, 10L), (3L, 8L)).toDF("pid", "pt"),
      Seq((9L, 9L, 9L)).toDF("iid", "s", "e"),
      "pt", "s", "e", binWidth = 4L)
      .select("pid").as[Long].collect().toSet
    assert(out == Set(1L))
  }

  test("invalid interval (end < start) fails loudly, not silently empty") {
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, Seq((1L, "a", 20L, 10L)).toDF("iid", "ikey", "s", "e"),
        "pt", "s", "e", keys = Seq("pkey" -> "ikey"), binWidth = 10L).collect()
    }
    assert(ex.getMessage != null)
  }

  test("interval wider than maxBins fails loudly (replication guard)") {
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points,
        Seq((1L, "a", 0L, 1000L)).toDF("iid", "ikey", "s", "e"),
        "pt", "s", "e", keys = Seq("pkey" -> "ikey"), binWidth = 10L, maxBins = 5)
        .collect()
    }
    assert(ex.getMessage != null)
  }

  test("shared column names are rejected up front") {
    val ex = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, points, "pt", "pt", "pt", binWidth = 10L)
    }
    assert(ex.getMessage.contains("disjoint"))
  }

  test("interval overlap: exactly-once across shared bins, edges, keys") {
    val l = Seq(
      // (lid, key, s, e) — bin width 10
      (1L, "a", 0L, 25L),   // spans bins 0-2
      (2L, "a", 40L, 45L),
      (3L, "b", 0L, 5L)
    ).toDF("lid", "lkey", "ls", "le")
    val r = Seq(
      (11L, "a", 5L, 22L),  // overlaps lid=1 in bins 0,1,2 -> must emit ONCE
      (12L, "a", 25L, 30L), // touches lid=1 at exactly 25 (edge) -> overlap
      (13L, "a", 26L, 30L), // just past lid=1 -> no overlap
      (14L, "b", 4L, 9L)    // keyed: only matches the b interval
    ).toDF("rid", "rkey", "rs", "re")
    val out = RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re",
        keys = Seq("lkey" -> "rkey"), binWidth = 10L)
      .select("lid", "rid").as[(Long, Long)].collect()
    // exactly-once: no duplicates even for the 3-shared-bin pair
    assert(out.length == out.distinct.length)
    assert(out.toSet == Set((1L, 11L), (1L, 12L), (3L, 14L)))
  }

  test("plan: equi-join on (key, bin), no nested-loop or cartesian") {
    val out = RangeJoin.pointInInterval(points, intervals, "pt", "s", "e",
      keys = Seq("pkey" -> "ikey"), binWidth = 10L)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
