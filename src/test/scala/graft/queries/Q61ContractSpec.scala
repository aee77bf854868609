package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The contraction strategy (`spark.graft.q61.contract=true`) must be
  * OUTPUT-IDENTICAL to the static-edge loop on every graph shape — it is
  * a pure per-round cost optimization (the edge frame shrinks as
  * components converge) with the same labels/jump/fixpoint machinery.
  */
class Q61ContractSpec extends SparkSpec {
  import spark.implicits._

  private def both(pairs: DataFrame): (Set[(Long, Long, Long)], Set[(Long, Long, Long)], Int, Int) = {
    def run(): (Set[(Long, Long, Long)], Int) = {
      val (df, rounds) = Extensions.connectedComponentsWithRounds(pairs)
      (df.select("doc_id", "cluster_rep", "cluster_size")
        .as[(Long, Long, Long)].collect().toSet, rounds)
    }
    val (classic, cr) = run()
    spark.conf.set("spark.graft.q61.contract", "true")
    val (contracted, kr) =
      try run() finally spark.conf.unset("spark.graft.q61.contract")
    (classic, contracted, cr, kr)
  }

  test("mixed shapes: chain + star + pair — identical labels, bounded rounds") {
    val pairs = ((1L to 30L).sliding(2).map(w => (w(0), w(1))).toSeq ++
      (101L to 120L).map(i => (100L, i)) :+ ((500L, 501L))).toDF("a_id", "b_id")
    val (classic, contracted, _, kr) = both(pairs)
    assert(contracted == classic)
    assert(kr <= 16, s"contracted rounds $kr")
  }

  test("4,000-doc chain: identical single cluster within the jump round budget") {
    val n = 4000L
    val pairs = spark.range(1, n)
      .selectExpr("id as a_id", "id + 1 as b_id")
    val (classic, contracted, cr, kr) = both(pairs)
    assert(contracted == classic)
    assert(kr <= math.max(cr, 16), s"contracted $kr rounds vs classic $cr")
  }

  test("seeded random graphs: identical labels across densities") {
    val rnd = new scala.util.Random(61)
    for (density <- Seq(30, 120, 400)) {
      val pairs = Seq.fill(density)((rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .toDF("a_id", "b_id")
      val (classic, contracted, _, _) = both(pairs)
      assert(contracted == classic, s"divergence at density $density")
    }
  }

  test("real q18 pair frame (sf0.001): identical labels") {
    val (classic, contracted, _, _) =
      both(Extensions.q18LshPairs(spark, "/root/testdata/sf0.001"))
    assert(contracted == classic)
  }
}
