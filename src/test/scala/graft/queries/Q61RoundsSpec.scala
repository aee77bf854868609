package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-count pins for connectedComponents — the O(log diameter)
  * convergence guarantee as a regression gate.
  *
  * The q61 oracle only checks the final labels; both the plain
  * min-propagation loop (rounds = diameter) and the pointer-jumping loop
  * (rounds = O(log diameter)) produce identical labels, so a regression
  * that drops the jump step stays oracle-green while turning a
  * template-drift chain (A≈B≈C≈… with no short-cut edges — the worst
  * realistic dup-cluster shape) into a round-cap abort at scale. These
  * pins fail that edit in `sbt test` instead.
  *
  * Round budget math for a path of n nodes under prop+jump: the collapsed
  * distance after round r is 2^(r+1)-2 (prop moves one hop, jump doubles),
  * so a 4,000-node chain converges in ~12 rounds including the final
  * no-change round — 16 is the budget with slack, and far under the
  * loop's hard 50-round abort.
  */
class Q61RoundsSpec extends SparkSpec {
  import spark.implicits._

  test("planted 4,000-doc near-dup chain: one cluster in <= 16 rounds") {
    val n = 4000L
    val pairs = spark.range(1, n).select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
    val (got, rounds) = Extensions.connectedComponentsWithRounds(pairs)
    assert(rounds <= 16, s"chain of $n took $rounds rounds — jump step regressed?")
    val reps = got.agg(countDistinct(col("cluster_rep"))).as[Long].head()
    assert(reps == 1L)
    assert(got.filter(col("cluster_rep") === 1L && col("cluster_size") === n).count() == n)
  }

  test("clique-like flood (500 docs through one shared bucket): <= 4 rounds") {
    // the common real shape: a boilerplate flood where every doc pairs
    // with the bucket minimum — star graph, diameter 2
    val pairs = spark.range(2, 501).select(lit(1L).as("a_id"), col("id").as("b_id"))
    val (got, rounds) = Extensions.connectedComponentsWithRounds(pairs)
    assert(rounds <= 4, s"star flood took $rounds rounds")
    assert(got.agg(countDistinct(col("cluster_rep"))).as[Long].head() == 1L)
  }

  test("real q18 pair frame (sf0.001): converges in <= 6 rounds") {
    val (_, rounds) = Extensions.connectedComponentsWithRounds(
      Extensions.q18LshPairs(spark, "/root/testdata/sf0.001"))
    assert(rounds <= 6, s"sf0.001 near-dup graph took $rounds rounds")
  }

  test("jump keeps labels identical to the ClusterPropsSpec ground truth shape") {
    // mixed shapes in one frame: a chain, a star, and an isolated pair
    val pairs = ((1L to 30L).sliding(2).map(w => (w(0), w(1))).toSeq ++
      (101L to 120L).map(i => (100L, i)) :+ ((500L, 501L))).toDF("a_id", "b_id")
    val got = Extensions.connectedComponents(pairs)
      .select("doc_id", "cluster_rep", "cluster_size").as[(Long, Long, Long)]
      .collect().toSet
    val want = (1L to 30L).map((_, 1L, 30L)).toSet ++
      (100L to 120L).map((_, 100L, 21L)).toSet ++
      Set((500L, 500L, 2L), (501L, 500L, 2L))
    assert(got == want)
  }
}
