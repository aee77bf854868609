package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The q83 staging contract: same-lgK HLL union is register-max and
  * therefore LOSSLESS — sketch-per-partial + union estimates exactly what
  * one direct sketch over the union of inputs estimates, under any
  * partition/grouping layout. That equality is what makes persisted
  * per-partition sketches a safe substitute for rescanning history.
  */
class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  test("union of per-group sketches == direct sketch, any layout") {
    val df = (1L to 20000L).map(i => (i % 12, i % 3001)).toDF("g", "v")
    val direct = df.agg(hll_sketch_estimate(hll_sketch_agg($"v")).as("e"))
      .head().getLong(0)
    for (parts <- Seq(1, 4, 32)) {
      val staged = df.repartition(parts)
        .groupBy($"g").agg(hll_sketch_agg($"v").as("sk"))
        .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("e"))
        .head().getLong(0)
      assert(staged === direct, s"parts=$parts: staged $staged != direct $direct")
    }
  }

  test("estimate lands in the documented envelope for lgK default") {
    val n = 5000L
    val est = (1L to n).toDF("v")
      .agg(hll_sketch_estimate(hll_sketch_agg($"v")).as("e"))
      .head().getLong(0)
    assert(math.abs(est - n).toDouble / n <= 0.05)
  }

  test("q83 output: envelope holds and exact counts match a plain distinct") {
    val dir = "/root/testdata/sf0.001"
    val out = Extensions.q83HllUnion(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getBoolean(2)), "some flag fell outside the 5% envelope")
  }
}
