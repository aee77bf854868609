package graft.queries

import graft.SparkSpec

/** q30/q43 carry their error envelopes IN the query since round 3 (exact
  * twin + within-bound booleans, hash-checked by the driver's DuckDB
  * oracle). This spec pins the envelope columns to `true` on real data and
  * the exact columns to their standalone twins (q29/q41), so a sketch
  * regression fails here with a named group, not just as an oracle hash
  * mismatch.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("q43: approx_percentile inside its 2% envelope; exact columns equal q41") {
    val dir = "/root/testdata/sf0.001"
    val rows = Parity.q43ApproxPercentiles(spark, dir)
      .as[(String, Double, Double, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (k, _, _, ok50, ok90) =>
      assert(ok50 && ok90, s"$k sketch escaped its envelope")
    }
    val exact = Parity.q41Percentiles(spark, dir)
      .as[(String, Double, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    rows.foreach { case (k, p50, p90, _, _) =>
      assert((p50, p90) == exact(k), s"$k exact columns drifted from q41")
    }
  }

  test("q30: approx_count_distinct inside its 5% envelope; exact columns equal q29") {
    val dir = "/root/testdata/sf0.001"
    val rows = Parity.q30ApproxDistinct(spark, dir)
      .as[(String, Long, Long, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (k, _, _, okP, okS) =>
      assert(okP && okS, s"$k sketch escaped its envelope")
    }
    val exact = Parity.q29DistinctCount(spark, dir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    rows.foreach { case (k, p, s, _, _) =>
      assert((p, s) == exact(k), s"$k exact columns drifted from q29")
    }
  }
}
