package graft.queries

import graft.SparkSpec

class WidenSpec extends SparkSpec {

  test("widenIfNarrow leaves an already-wide input untouched (no extra exchange)") {
    val target = spark.sparkContext.defaultParallelism
    val wide = spark.range(0, 1000).toDF("doc_id").repartition(target + 1)
    assert(Extensions.widenIfNarrow(spark, wide) eq wide)
  }

  test("widenIfNarrow widens a single-partition input to session parallelism") {
    val narrow = spark.range(0, 1000).toDF("doc_id").coalesce(1)
    val out = Extensions.widenIfNarrow(spark, narrow)
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
  }

  test("spark.graft.widen.enabled=false makes widenIfNarrow the identity " +
       "(cluster mode: no gratuitous exchange)") {
    spark.conf.set("spark.graft.widen.enabled", "false")
    try {
      val narrow = spark.range(0, 1000).toDF("doc_id").coalesce(1)
      val out = Extensions.widenIfNarrow(spark, narrow)
      assert(out eq narrow) // identity — not even a new plan node
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"conf-off plan has an exchange:\n$plan")
    } finally spark.conf.set("spark.graft.widen.enabled", "true")
  }
}
