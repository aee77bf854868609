package graft.queries

import graft.SparkSpec

/** q30's HLL++ sketches must land inside the promised error envelope of the
  * exact counts (q29) — the correctness contract for the rows-only query.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_percentile within 2% of exact at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val exact = Parity.q41Percentiles(spark, dir)
      .as[(String, Double, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val approx = Parity.q43ApproxPercentiles(spark, dir)
      .as[(String, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    exact.foreach { case (k, (p50, p90)) =>
      assert(math.abs(approx(k)._1 - p50) / p50 < 0.02, s"$k p50")
      assert(math.abs(approx(k)._2 - p90) / p90 < 0.02, s"$k p90")
    }
  }

  test("approx_count_distinct within 5% of exact at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val exact = Parity.q29DistinctCount(spark, dir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val approx = Parity.q30ApproxDistinct(spark, dir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, (p, s)) =>
      val (pa, sa) = approx(k)
      assert(math.abs(pa - p).toDouble / p < 0.05, s"$k parts: exact=$p approx=$pa")
      assert(math.abs(sa - s).toDouble / s < 0.05, s"$k supps: exact=$s approx=$sa")
    }
  }
}
