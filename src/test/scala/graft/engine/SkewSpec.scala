package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one hot key
  private def skewed = (1 to 1000).map { i =>
    (if (i <= 900) "hot" else s"k${i % 17}", i.toLong, i * 0.5)
  }.toDF("k", "row_id", "v")

  test("saltedSumCount equals direct aggregation") {
    val direct = skewed.groupBy("k")
      .agg(sum(col("v")).as("sum_v"), count(lit(1)).as("cnt"))
      .as[(String, Double, Long)].collect().toSet
    val salted = Skew.saltedSumCount(skewed, Seq("k"), "v", Seq(col("row_id")), buckets = 8)
      .as[(String, Double, Long)].collect().toSet
    // sums of the same doubles in different order: compare with tolerance
    val d = direct.map(t => t._1 -> ((t._2, t._3))).toMap
    val s = salted.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(d.keySet == s.keySet)
    d.foreach { case (k, (sv, c)) =>
      assert(math.abs(s(k)._1 - sv) < 1e-6 && s(k)._2 == c, k)
    }
  }

  test("salt spreads a hot key over the requested buckets") {
    val salts = skewed.filter(col("k") === "hot")
      .select(Skew.saltCol(Seq(col("row_id")), 8).as("s"))
      .distinct().as[Int].collect().toSet
    assert(salts.size > 4 && salts.forall(s => s >= 0 && s < 8))
  }

  test("saltedJoin equals plain inner join") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "label")
    val plain = skewed.join(dim, Seq("k")).select("k", "row_id", "label")
      .as[(String, Long, String)].collect().toSet
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), Seq(col("row_id")), buckets = 8)
      .select("k", "row_id", "label").as[(String, Long, String)].collect().toSet
    assert(salted == plain)
  }

  /** AQE's skew-join split is the no-code-change complement to manual
    * salting: at runtime the oversized partition is split into chunks and
    * the other side's matching partition is replicated. This pins the
    * config that makes it fire (thresholds scaled down to test size) and
    * asserts the AQE-final plan actually marked the join skewed.
    */
  test("AQE skew join splits the hot partition at runtime") {
    val conf = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      // one hot key carrying ~100x the payload of the others
      val fact = (1L to 60000L).map { i =>
        (if (i <= 54000) "hot" else s"k${i % 40}", ("x" * 40) + i)
      }.toDF("k", "payload")
      val dim = (0 until 40).map(i => (s"k$i", i)).toDF("k", "attr")
        .union(Seq(("hot", -1)).toDF("k", "attr"))
      val joined = fact.join(dim, "k")
      // collect() executes THIS DataFrame's QueryExecution, so the
      // inspected plan is the AQE-final one (count() would plan afresh)
      assert(joined.collect().length == 60000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
