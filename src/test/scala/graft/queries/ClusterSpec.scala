package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Connected-components dedup clustering (q61's engine): transitive chains
  * collapse to one cluster with the minimum id as representative.
  */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  test("a transitive chain and a separate component cluster correctly") {
    // chain 1-2-3-4 (pairwise links only), pair {10,11}, and {20,21,22}
    // linked through 21 — three components
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L)
    ).toDF("a_id", "b_id").repartition(5)

    val got = Extensions.connectedComponents(pairs)
      .select("doc_id", "cluster_rep", "cluster_size")
      .as[(Long, Long, Long)].collect().toSet

    val want = Set(
      (1L, 1L, 4L), (2L, 1L, 4L), (3L, 1L, 4L), (4L, 1L, 4L),
      (10L, 10L, 2L), (11L, 10L, 2L),
      (20L, 20L, 3L), (21L, 20L, 3L), (22L, 20L, 3L))
    assert(got == want)
  }

  test("a long chain converges (diameter > a couple of rounds)") {
    val n = 12L
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val got = Extensions.connectedComponents(pairs)
    assert(got.select(countDistinct(col("cluster_rep"))).as[Long].head() == 1L)
    assert(got.filter(col("cluster_size") === n).count() == n)
  }
}
