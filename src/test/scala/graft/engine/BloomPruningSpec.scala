package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join pruning — the 100 TB lever for selective
  * fact ⋈ filtered-dim joins that are too big to broadcast: Catalyst
  * builds a Bloom filter from the filtered (creation) side and pushes a
  * `might_contain` probe into the fact scan, so most fact rows die at the
  * scan instead of crossing the join shuffle. This spec pins the session
  * flags that make the injection fire and asserts the plan + result, so a
  * regression in our session defaults (or a Spark upgrade changing the
  * thresholds) is caught here rather than at cluster scale.
  */
class BloomPruningSpec extends SparkSpec {
  import spark.implicits._

  test("selective dim filter injects a bloom probe into the fact side") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    // fact too big to broadcast (by config), dim filtered hard
    (1L to 200000L).map(i => (i % 1000, i.toDouble)).toDF("k", "v")
      .write.parquet(s"$dir/fact")
    (0L until 1000L).map(i => (i, s"d$i")).toDF("k", "name")
      .write.parquet(s"$dir/dim")
    val conf = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("name") === "d7")
      val joined = fact.join(dim, "k")
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"bloom filter not injected:\n$plan")
      assert(joined.count() == 200) // 200000/1000 rows per key
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
