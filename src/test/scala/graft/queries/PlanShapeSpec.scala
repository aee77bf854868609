package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Mechanical plan-shape pins — the PLAN_AUDIT.md table as assertions, so
  * a shape regression (a new cartesian, a join strategy flip, a global
  * window sneaking in) fails `sbt test` instead of waiting for a human
  * diff of the audit doc. Covers q34/q89–q92 plus the bench's top-10 most
  * expensive queries (q04, q20, q58, q61, q64, q70, q72, q79, q87, q91).
  * Invariant-style bounds, not exact exchange counts: AQE and data size
  * legitimately move small-side strategies, while the properties pinned
  * here are the ones that must hold at ANY size. Nested-loop allowances
  * are the documented scale-free ONE-ROW-build crosses (PLAN_AUDIT.md) —
  * the pin is that their COUNT never grows.
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

  test("q04 dedup exact: one hash-aggregate pass — no joins, no window, one scan") {
    val p = planOf(graft.queries.Parity.q04DedupExact(spark, dir))
    assert(count(p, "Join") == 0, p)
    assert(count(p, "Window") == 0, p)
    assert(count(p, "Scan parquet") == 1, p)
  }

  test("q20 jaccard pairs: equi-joins on digests only, shared gram frame pinned once") {
    val p = planOf(Extensions.q20JaccardPairs(spark, dir))
    assert(count(p, "CartesianProduct|BroadcastNestedLoop") == 0, p)
    // both join sides read the ONE checkpointed gram frame — a parquet
    // scan here means tokenize/hash re-runs per side
    assert(count(p, "Scan parquet") == 0, p)
    assert(count(p, "Window") == 0, p)
  }

  test("q58 tfidf top-k: the only cross is the one-row corpus count; no rank window") {
    val p = planOf(Extensions.q58TfidfTopk(spark, dir))
    assert(count(p, "CartesianProduct") == 0, p)
    assert(count(p, "BroadcastNestedLoop") == 1,
      "exactly the one-row doc-count broadcast: " + p)
    // round-14 rework: per-doc top-k is the O(k)-state bounded heap
    // aggregate — a Window node means the row_number formulation (which
    // repartitions AND SORTS the full (doc, term) frame) regressed back
    assert(count(p, "Window") == 0,
      "q58's top-k must be the heap aggregate, not a rank window:\n" + p)
  }

  test("q61 dedup clusters: iterative equi-joins, no cartesian, lineage truncated") {
    val p = planOf(Extensions.q61DedupClusters(spark, dir))
    assert(count(p, "CartesianProduct|BroadcastNestedLoop") == 0, p)
    assert(count(p, "Window") == 0, p)
    // converged result reads checkpointed rounds, never re-scans parquet
    assert(count(p, "Scan parquet") == 0, p)
  }

  test("q64 ivf-pq search: codebook crosses are one-row builds; candidate joins are equi") {
    val p = planOf(Extensions.q64IvfpqSearch(spark, dir))
    assert(count(p, "CartesianProduct") == 0, p)
    assert(count(p, "BroadcastNestedLoop") <= 3,
      "only the one-row codebook/ADC broadcasts may cross: " + p)
    assert(count(p, "BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin") >= 1,
      "cell-probe candidate selection must be an equi-join: " + p)
    assert(count(p, "Scan parquet") == 0, p)
  }

  test("q70 bigram fluency: digest-only shuffles, shared gram frame pinned once") {
    val p = planOf(Extensions.q70BigramFluency(spark, dir))
    assert(count(p, "CartesianProduct|BroadcastNestedLoop") == 0, p)
    assert(count(p, "Scan parquet") == 0, p)
    assert(count(p, "Window") == 0, p)
    // The closed-vocab df side passes the size gate, so the 500 M-row
    // (at sf100) probe side must NOT shuffle for the score join — the
    // r14 fix for r13's one `weak` (map-side spill of the pair distinct).
    assert(count(p, "BroadcastHashJoin") >= 1,
      "the vocab-sized df side lost its broadcast: " + p)
  }

  test("q72 interval overlap: binning turns BETWEEN into a hash equi-join") {
    val p = planOf(Extensions.q72IntervalOverlap(spark, dir))
    assert(count(p, "CartesianProduct|BroadcastNestedLoop") == 0,
      "a range theta-join leaked past the binned rewrite: " + p)
    assert(count(p, "BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin") >= 1, p)
  }

  test("q79 bloom join: literal probe filters before the single confirm join") {
    val p = planOf(Extensions.q79BloomJoin(spark, dir))
    assert(count(p, "CartesianProduct|BroadcastNestedLoop") == 0,
      "the image must ride a foldable literal, never a crossed column: " + p)
    assert(count(p, "BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin") == 1, p)
    assert(p.contains("bloom_contains"),
      "the pre-join bloom probe filter disappeared from the plan:\n" + p)
  }

  test("q87 deciles: range-partitioned rank; the only cross is the one-row total") {
    val df = Extensions.q87Deciles(spark, dir)
    val p = planOf(df)
    assert(count(p, "CartesianProduct") == 0, p)
    assert(count(p, "BroadcastNestedLoop") == 1,
      "exactly the one-row total-count broadcast: " + p)
    // decile boundaries come from range partitioning + per-partition
    // offsets, never a global unpartitioned rank window. Inspect the
    // optimized plan's Window nodes directly — the round-10 advice showed
    // the old string regex could never match a real plan print (an
    // unpartitioned-but-ordered window prints its ORDER columns first),
    // so it passed vacuously.
    val globalWindows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty,
      s"q87 grew an unpartitioned global window:\n${globalWindows.mkString("\n")}")
  }
}
