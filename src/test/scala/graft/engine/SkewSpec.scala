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
}
