package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runs the q30 production-sketch aggregate in a loop so a profiler /
  * jstack can sample the hot frames (HllDiag companion).
  */
object HllLoop {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    for (_ <- 1 to 300)
      li.groupBy(col("l_returnflag")).agg(
        approx_count_distinct(col("l_partkey"), 0.01),
        approx_count_distinct(col("l_suppkey"), 0.01))
        .write.mode("overwrite").format("noop").save()
    spark.stop()
  }
}
