package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed tables make repeated equi-joins exchange-free: both sides are
  * pre-shuffled on disk, so the join plan contains NO Exchange operators
  * (the shuffle was paid once at write time). This spec asserts the plan
  * shape, not just the result.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key plans without any Exchange") {
    val left = (1L to 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
      .repartition(7) // deliberately misaligned input partitioning
    val right = (1L to 1000L).map(i => (i, i * 2.0)).toDF("k", "rv")
    Tables.saveBucketed(left, "bkt_left", Seq("k"), 4)
    Tables.saveBucketed(right, "bkt_right", Seq("k"), 4)
    // the r17 writer contract: exactly ONE data file per bucket, however
    // the input was partitioned (the old writer wrote tasks×buckets files)
    val leftDir = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "bkt_left")
    val dataFiles = leftDir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(dataFiles == 4, s"expected 4 bucket files, found $dataFiles in $leftDir")
    try {
      // disable broadcast so the join genuinely tests the shuffle path
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // trust the bucket sort metadata (off by default since SPARK-28595;
      // safe because saveBucketed guarantees one sorted file per bucket)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected exchange-free join, got:\n$plan")
      // saveBucketed repartitions to the bucket spec before writing (r17):
      // ONE sorted file per bucket, so with the ordering flag the sort-
      // merge join plans without per-query Sort operators either
      assert(!"Sort \\[".r.findFirstIn(plan).isDefined,
        s"expected sort-free bucketed join (single sorted file per bucket), got:\n$plan")
      assert(joined.count() == 1000)
      val sample = joined.filter(col("k") === 7L).select("lv", "rv")
        .as[(String, Double)].collect().toSeq
      assert(sample == Seq(("l7", 14.0)))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("bucketed aggregation on the bucket key also skips the exchange") {
    val df = (1L to 500L).map(i => (i % 50, i.toDouble)).toDF("k", "v")
    Tables.saveBucketed(df, "bkt_agg", Seq("k"), 4)
    try {
      val agg = spark.table("bkt_agg").groupBy("k").agg(sum("v"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(agg.count() == 50)
    } finally spark.sql("DROP TABLE IF EXISTS bkt_agg")
  }
}
