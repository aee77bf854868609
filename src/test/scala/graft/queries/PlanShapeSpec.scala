package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Mechanical plan-shape pins (q34 + q89-q92) —
  * the PLAN_AUDIT.md table as assertions, so a shape regression (a new
  * cartesian, a join strategy flip, a global window sneaking in) fails
  * `sbt test` instead of waiting for a human diff of the audit doc.
  * Invariant-style bounds, not exact exchange counts: AQE and data size
  * legitimately move small-side strategies, while the properties pinned
  * here are the ones that must hold at ANY size.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): String = {
    df.count() // let AQE settle on the final plan
    df.queryExecution.executedPlan.toString
  }

  private def count(hay: String, needle: String): Int =
    needle.r.findAllMatchIn(hay).length

  test("q89 train split: map-only + one aggregate — no joins, no window") {
    val p = planOf(Extensions.q89TrainSplit(spark, dir))
    assert(count(p, "Join") == 0, p)
    assert(count(p, "Window") == 0, p)
    assert(count(p, "CartesianProduct") == 0, p)
  }

  test("q34 ivf assign: map-only over the pinned corpus — no shuffle, no window, no equi-join") {
    val p = planOf(Extensions.q34IvfAssign(spark, dir))
    // assignment = pinned corpus x one-row broadcast codebook (the one
    // legitimate nested-loop: a single-row build side) + per-row argmax
    // fold. The codebook is memoized (train-once), so NO training
    // exchanges may appear in the query's own plan.
    assert(count(p, "Exchange") == count(p, "BroadcastExchange"),
      "assignment must add zero SHUFFLE exchanges (broadcasting the one-row codebook is the only allowed Exchange): " + p)
    assert(count(p, "BroadcastExchange") == 1, p)
    assert(count(p, "Window") == 0, p)
    assert(count(p, "BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin") == 0, p)
    assert(count(p, "BroadcastNestedLoop") == 1,
      "exactly the one-row codebook broadcast: " + p)
  }

  test("q90 semdedup: one equi-join over the pinned frame, no cartesian, no corpus re-scan") {
    val p = planOf(Extensions.q90Semdedup(spark, dir))
    assert(count(p, "CartesianProduct|BroadcastNestedLoop") == 0, p)
    assert(count(p, "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)") == 1, p)
    // the banded pairing reads the PINNED ranked frame (lineage
    // truncated): training and ranking never re-run per join side
    assert(count(p, "Scan parquet") == 0, p)
    assert(count(p, "Window") == 0, p)
  }

  test("q91 token budget: broadcast-only joins, window confined to boundary buckets") {
    val p = planOf(Extensions.q91TokenBudget(spark, dir))
    assert(count(p, "CartesianProduct|BroadcastNestedLoop") == 0, p)
    assert(count(p, "SortMergeJoin|ShuffledHashJoin") == 0,
      "driver-classified bucket frames must broadcast: " + p)
    // exactly one window, partitioned by (source, boundary bucket) —
    // never an unpartitioned global cumulative sum: the Window node's
    // spec must name the bucket partition key on its own line
    assert(count(p, "Window") == 1, p)
    assert("(?m)^.*Window.*__bucket.*$".r.findFirstIn(p).isDefined,
      "q91's window lost its (group, __bucket) partition spec:\n" + p)
  }

  test("q92 sample quantiles: two aggregation stages, no join, no window, no data sort") {
    val p = planOf(Extensions.q92SampleQuantiles(spark, dir))
    assert(count(p, "Join") == 0, p)
    assert(count(p, "Window") == 0, p)
    assert(count(p, "CartesianProduct") == 0, p)
  }
}
